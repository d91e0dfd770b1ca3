package graft.query

import graft.SparkTestBase
import graft.model.RelationshipSpec
import org.scalatest.funsuite.AnyFunSuite

class RelationJoinsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val hh = Seq(
    ("  1 0 10    ", "04"),
    ("  1 0 11    ", "02")).toDF("hhid", "hv009")

  private val people = Seq(
    ("  1 0 10     2 ", "31"),
    ("  1 0 10      2", "28"),
    ("  1 0 11     1 ", "45")).toDF("caseid", "v012")

  test("caseid→hhid prefix join lands every individual in its household") {
    val joined = RelationJoins.joinHousehold(people, hh)
    assert(joined.count() == 3)
    val byHh = joined.groupBy("hhid").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byHh("  1 0 10    ") == 2 && byHh("  1 0 11    ") == 1)
  }

  test("named-link relation joins on the padded column without trimming") {
    val rel = RelationshipSpec("BJHR71", "HH_PERSON", "RECH0", "hhid", "RECH1", "hhid")
    val rech1 = Seq(("  1 0 10    ", "1"), ("  1 0 10    ", "2")).toDF("hhid", "hvidx")
    val out = RelationJoins.join(rel, hh, rech1)
    assert(out.count() == 2)
  }

  test("*ROWID* relation joins on the caller's occurrence column") {
    val rel = RelationshipSpec("BJHR71", "SELF", "A", RelationJoins.RowIdSentinel, "B", RelationJoins.RowIdSentinel)
    val a = Seq((1L, "x"), (2L, "y")).toDF("rowid", "va")
    val b = Seq((1L, "p"), (2L, "q"), (3L, "r")).toDF("rowid", "vb")
    val out = RelationJoins.join(rel, a, b)
    assert(out.count() == 2)
  }

  test("joinAll skips relations whose tables are missing, with a note") {
    val rels = Seq(
      RelationshipSpec("F", "OK", "A", RelationJoins.RowIdSentinel, "B", RelationJoins.RowIdSentinel),
      RelationshipSpec("F", "NOPE", "A", RelationJoins.RowIdSentinel, "MISSING", "x"))
    val a = Seq((1L, "x")).toDF("rowid", "va")
    val b = Seq((1L, "p")).toDF("rowid", "vb")
    val (joined, notes) = RelationJoins.joinAll(rels, Map("A" -> a, "B" -> b))
    assert(joined.size == 1 && joined.head._1.relName == "OK")
    assert(notes.size == 1 && notes.head.contains("MISSING"))
  }
}
