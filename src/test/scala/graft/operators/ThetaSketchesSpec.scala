package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ThetaSketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("theta sketch is exact below saturation; estimate matches distinct count") {
    val df = (1L to 500L).map(i => ("a", i)).toDF("slice", "item")
    val est = ThetaSketches.thetaSliceSketches(df, col("slice"), col("item"))
      .select(ThetaSketches.thetaEstimate(col("sketch"))).as[Double].head()
    assert(est == 500.0) // lgK=12 → exact mode well past 500 distinct
  }

  test("intersection estimate recovers the exact overlap on small sets") {
    // A = 1..300, B = 200..500 → overlap 101
    val df = ((1L to 300L).map(("A", _)) ++ (200L to 500L).map(("B", _)))
      .toDF("slice", "item")
    val sk = ThetaSketches.thetaSliceSketches(df, col("slice"), col("item"))
    val inter = sk.filter($"slice" === "A").select($"sketch".as("a"))
      .crossJoin(sk.filter($"slice" === "B").select($"sketch".as("b")))
      .select(ThetaSketches.thetaEstimate(
        ThetaSketches.thetaIntersect($"a", $"b"))).as[Double].head()
    assert(inter == 101.0)
  }

  test("union expression ≡ sketching the concatenation") {
    val df = ((1L to 200L).map(("A", _)) ++ (150L to 400L).map(("B", _)))
      .toDF("slice", "item")
    val sk = ThetaSketches.thetaSliceSketches(df, col("slice"), col("item"))
    val unionEst = sk.agg(collect_list($"sketch")).as[Seq[Array[Byte]]].head() match {
      case Seq(x, y) =>
        Seq((x, y)).toDF("a", "b")
          .select(ThetaSketches.thetaEstimate(ThetaSketches.thetaUnion($"a", $"b")))
          .as[Double].head()
    }
    assert(unionEst == 400.0)
  }

  test("partial-aggregation merge path: estimate is partition-invariant") {
    val df = (1L to 2000L).map(i => ("s", i % 700)).toDF("slice", "item")
    val e1 = ThetaSketches.thetaSliceSketches(df.repartition(1), col("slice"), col("item"))
      .select(ThetaSketches.thetaEstimate(col("sketch"))).as[Double].head()
    val e16 = ThetaSketches.thetaSliceSketches(df.repartition(16), col("slice"), col("item"))
      .select(ThetaSketches.thetaEstimate(col("sketch"))).as[Double].head()
    assert(e1 == e16 && e1 == 700.0)
  }

  test("thetaUnionAgg folds per-batch sketch rows to the exact distinct count") {
    // simulate 3 "batches" sketched independently, with items split so
    // only a correct union reproduces the total
    val batches = Seq((1L to 50L), (30L to 80L), (70L to 120L))
    val rows = batches.map { r =>
      ThetaSketches.thetaSliceSketches(
        r.map(("s", _)).toDF("slice", "item"), col("slice"), col("item"))
        .select("slice", "sketch")
    }.reduce(_ unionAll _)
    val est = rows.groupBy($"slice")
      .agg(ThetaSketches.thetaUnionAgg($"sketch").as("sk"))
      .select(ThetaSketches.thetaEstimate($"sk")).as[Double].head()
    assert(est == 120.0)
  }

  test("intersection violations frame is empty on real overlapping slices") {
    val rnd = new scala.util.Random(31)
    val df = (1 to 5000).map { _ =>
      (s"slice${rnd.nextInt(4)}", rnd.nextInt(800).toLong)
    }.toDF("slice", "item")
    assert(ThetaSketches.thetaIntersectViolations(
      df, col("slice"), col("item")).count() == 0)
    // and the contract CAN trip: corrupt one sketch pair by lying about
    // exact counts — simulated by intersecting disjoint slices but
    // asserting a huge exact overlap is out of bounds
    val disjoint = ((1L to 100L).map(("A", _)) ++ (1000L to 1100L).map(("B", _)))
      .toDF("slice", "item")
    val sk = ThetaSketches.thetaSliceSketches(disjoint, col("slice"), col("item"))
    val ub = sk.filter($"slice" === "A").select($"sketch".as("a"))
      .crossJoin(sk.filter($"slice" === "B").select($"sketch".as("b")))
      .select(ThetaSketches.thetaUpperBound(
        ThetaSketches.thetaIntersect($"a", $"b"), 3)).as[Double].head()
    assert(ub == 0.0) // disjoint exact sketches → intersection provably empty
  }

  test("pairwise union honors the inputs' lgK instead of downsampling (ADVICE r6)") {
    // two disjoint 40k-item slices sketched at lgK 14 (16384 nominal
    // entries): a union built at the DataSketches default lgK 12 silently
    // downsamples to 4096 entries; at the inputs' lgK the union of these
    // estimation-mode sketches keeps the finer resolution → strictly
    // narrower 3σ bounds, and the estimate stays within its own bounds
    val df = ((1L to 40000L).map(("A", _)) ++ (100000L to 140000L).map(("B", _)))
      .toDF("slice", "item")
    val sk = ThetaSketches.thetaSliceSketches(df, col("slice"), col("item"), lgK = 14)
    val pair = sk.filter($"slice" === "A").select($"sketch".as("a"))
      .crossJoin(sk.filter($"slice" === "B").select($"sketch".as("b")))
    def widthAt(lgK: Int): Double = pair.select(
      ThetaSketches.thetaUpperBound(ThetaSketches.thetaUnion($"a", $"b", lgK), 3) -
        ThetaSketches.thetaLowerBound(ThetaSketches.thetaUnion($"a", $"b", lgK), 3))
      .as[Double].head()
    assert(widthAt(14) < widthAt(12),
      "lgK-14 union should carry narrower bounds than the downsampled default")
    val est = pair.select(ThetaSketches.thetaEstimate(
      ThetaSketches.thetaUnion($"a", $"b", lgK = 14))).as[Double].head()
    assert(math.abs(est - 80001.0) / 80001.0 < 0.05)
  }
}
