package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("constraintReport: planted violations counted, NULL predicate = violation, integer ppm") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "O"), (2L, -5.0, "F"), (3L, null, "X"),
      (null, 20.0, "O"), (5L, 30.0, "P"))
      .toDF("id", "price", "status")
    val rep = Quality.constraintReport(df, Seq(
      "id_not_null" -> col("id").isNotNull,
      "price_positive" -> (col("price") > 0), // NULL price → NULL predicate → violation
      "status_domain" -> col("status").isin("O", "F", "P")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep("id_not_null") == (1L, 5L, 200000L))
    assert(rep("price_positive") == (2L, 5L, 400000L)) // the -5 AND the null
    assert(rep("status_domain") == (1L, 5L, 200000L))
  }

  test("constraintReport folds every check into one aggregate (one scan, one exchange)") {
    val df = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val plan = Quality.constraintReport(df, Seq(
      "a" -> col("id").isNotNull, "b" -> (col("v") > 0), "c" -> (col("id") < 1000)))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert("Scan".r.findAllIn(plan).size == 1, plan)
  }

  test("uniquenessViolations: duplicate keys surface with copy counts; unique table empty") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (3L, "e"), (3L, "f"))
      .toDF("k", "v")
    val got = Quality.uniquenessViolations(df, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 3L))
    assert(Quality.uniquenessViolations(df.dropDuplicates("k"), Seq("k")).isEmpty)
  }

  test("referentialViolations: orphans grouped per key, NULL FKs in their own group") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "ok"), (7L, "orphan"), (7L, "orphan2"), (null, "nofk"))
      .toDF("fk", "v")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Quality.referentialViolations(child, "fk", parent, "pk")
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) -> r.getLong(1)).toMap
    assert(got == Map(Some(7L) -> 2L, None -> 1L))
  }

  test("requireConstraints throws naming the failing check; passes clean") {
    val df = Seq((1L, 1.0), (2L, -1.0)).toDF("id", "v")
    Quality.requireConstraints(df, Seq("id_not_null" -> col("id").isNotNull))
    val e = intercept[IllegalArgumentException] {
      Quality.requireConstraints(df, Seq("v_positive" -> (col("v") > 0)))
    }
    assert(e.getMessage.contains("v_positive=1"))
  }

  test("winsorize clamps to per-group percentile bounds, preserving rows") {
    // group A: 1..10 → p10/p90 interpolated = 1.9 / 9.1 (percentile is
    // exact linear interpolation); group B constant
    val df = ((1 to 10).map(i => ("A", i.toDouble)) ++
      Seq(("B", 5.0), ("B", 5.0), ("B", 5.0))).toDF("g", "v")
    val w = Quality.winsorize(df, "v", Seq("g"), 0.10, 0.90)
    assert(w.count() == 13)
    val a = w.filter(col("g") === "A")
      .select("v", "lo", "hi", "w_value")
      .as[(Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(a.head == ((1.0, 1.9, 9.1, 1.9)))  // clamped up
    assert(a.last == ((10.0, 1.9, 9.1, 9.1))) // clamped down
    assert(a(4) == ((5.0, 1.9, 9.1, 5.0)))    // interior untouched
    val b = w.filter(col("g") === "B").select("w_value").as[Double].collect()
    assert(b.forall(_ == 5.0))
  }

  test("observeConstraints: the audit rides a single existing action") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -5.0), (3L, null), (null, 20.0))
      .toDF("id", "price")
    val constraints = Seq(
      "id_not_null" -> col("id").isNotNull,
      "price_positive" -> (col("price") > 0))
    val (instrumented, obs) = Quality.observeConstraints(df, constraints)
    // ONE action — e.g. the ingest write a load would run anyway
    assert(instrumented.count() == 4)
    val got = Quality.observationMetrics(spark, obs, constraints.map(_._1))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // must equal the standalone (extra-pass) report
    val want = Quality.constraintReport(df, constraints)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    assert(got("id_not_null") == ((1L, 4L, 250000L)))
    assert(got("price_positive") == ((2L, 4L, 500000L))) // -5 and the NULL price
  }

  test("rankNormalize: exact integer margins, ties share, singleton is 0") {
    val df = Seq(("A", 10.0), ("A", 20.0), ("A", 20.0), ("A", 40.0), ("B", 7.0))
      .toDF("g", "v")
    val got = Quality.rankNormalize(df, "v", Seq("g"))
      .select("g", "v", "pr_x1e9").as[(String, Double, Long)].collect().toSet
    // n=4: margins at rank-1 / 3 → 0, 1/3, 1/3, 1 (ties share rank 2)
    assert(got == Set(
      ("A", 10.0, 0L), ("A", 20.0, 333333333L), ("A", 40.0, 1000000000L),
      ("B", 7.0, 0L)))
  }

  test("histogram: fixed bins with under/overflow buckets") {
    val df = Seq(("A", -5.0), ("A", 0.0), ("A", 9.9), ("A", 10.0), ("A", 25.0), ("A", 100.0))
      .toDF("g", "v")
    val got = Quality.histogram(df, "v", Seq("g"), lo = 0.0, hi = 100.0, nBins = 10)
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("A", -1, 1L),  // -5 underflows
      ("A", 0, 2L),   // 0.0 and 9.9
      ("A", 1, 1L),   // 10.0 lands exactly on the bin-1 edge
      ("A", 2, 1L),   // 25.0
      ("A", 10, 1L))) // 100.0 = hi → overflow bucket
  }

  test("winsorize rejects a degenerate percentile range") {
    val df = Seq(("A", 1.0)).toDF("g", "v")
    assertThrows[IllegalArgumentException] {
      Quality.winsorize(df, "v", Seq("g"), 0.9, 0.1)
    }
  }

  test("histogram: a value one ulp below hi stays in bucket nBins-1 (ADVICE r6)") {
    // lo=0, hi=0.1, nBins=3: binWidth 0.1/3 rounds so that the largest
    // double below hi has floor((v-lo)/binWidth) == 3 — without the clamp
    // this IN-RANGE value lands in the overflow bucket and the documented
    // [lo,hi) contract breaks at the edge
    val v = Math.nextDown(0.1)
    assert(v < 0.1 && math.floor(v / (0.1 / 3)) >= 3) // the trap is real
    val got = Quality.histogram(
      Seq(("A", v), ("A", 0.1), ("A", -0.5)).toDF("g", "x"),
      "x", Seq("g"), lo = 0.0, hi = 0.1, nBins = 3)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got == Map(2 -> 1L, 3 -> 1L, -1 -> 1L))
  }

  test("winsorize resolves column names like the rest of the API (ADVICE r6)") {
    // a name expr()-splicing would fail to parse; the typed Column path
    // must handle it exactly as col() does
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 100.0)).toDF("g", "the value")
    val out = Quality.winsorize(df, "the value", Seq("g"), 0.0, 0.5)
    assert(out.count() == 3)
    assert(out.columns.contains("w_value"))
  }
}
