package graft.catalog

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("reconcile ladder: empty DB loads") {
    val d = Reconcile.versionDecision(Nil, "71")
    assert(d == Left(Reconcile.Load("nothing in DB")))
  }

  test("reconcile ladder: multiple versions reload") {
    assert(Reconcile.versionDecision(Seq("71", "72"), "71").swap.exists(_.isInstanceOf[Reconcile.Reload]))
  }

  test("reconcile ladder: lexical version compare ('7A' > '79')") {
    assert(Reconcile.versionDecision(Seq("79"), "7A").swap.exists(_.isInstanceOf[Reconcile.Reload]))
    assert(Reconcile.versionDecision(Seq("7A"), "79") == Right(()))
  }

  test("reconcile ladder: spec diff forces reload; identical specs skip") {
    val fileSpecs = Seq(("hv000", "RECH0", "Country", 3), ("hv001", "RECH0", "Cluster", 6))
      .toDF("name", "recordname", "label", "len")
    val dbSame = fileSpecs
    val dbDiff = Seq(("hv000", "RECH0", "Country", 3)).toDF("name", "recordname", "label", "len")

    assert(Reconcile.decide(Seq("71"), "71", fileSpecs, dbSame,
      Reconcile.ColumnSpecDiffCols).isInstanceOf[Reconcile.Skip])
    assert(Reconcile.decide(Seq("71"), "71", fileSpecs, dbDiff,
      Reconcile.ColumnSpecDiffCols).isInstanceOf[Reconcile.Reload])
  }

  test("latestVersion picks lexical max per group") {
    val files = Seq(("511", "ir", "71"), ("511", "ir", "7A"), ("511", "hr", "61"))
      .toDF("survey", "ftype", "ver")
    val latest = SpecCatalog.latestVersion(files, Seq("survey", "ftype"), "ver")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(latest == Set(("ir", "7A"), ("hr", "61")))
  }

  test("observedWidths reports per-column max length") {
    val df = Seq(("a", "xx"), ("bbb", "y")).toDF("c1", "c2")
    val w = SpecCatalog.observedWidths(df).collect().head
    assert(w.getInt(0) == 3 && w.getInt(1) == 2)
  }
}
