package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Input-contract tests for the native vector-average aggregate (ADVICE r9:
  * the TypedImperativeAggregate reads 4-byte float slots, so it must REJECT
  * array<double> at analysis and null elements at runtime instead of
  * silently producing wrong centroids).
  */
class VectorStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("vectorAvg computes the element-wise mean of float arrays") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 6.0f)).toDF("v")
    val r = df.agg(VectorStats.vectorAvg(col("v"))).head.getSeq[Float](0)
    assert(r === Seq(2.0f, 4.0f))
  }

  test("null ROWS are skipped (a cluster of only-null vectors yields null)") {
    val df = Seq(Some(Seq(2.0f, 4.0f)), None, None).toDF("v")
    val r = df.agg(VectorStats.vectorAvg(col("v"))).head.getSeq[Float](0)
    assert(r === Seq(2.0f, 4.0f))
    val allNull = Seq[Option[Seq[Float]]](None, None).toDF("v")
    assert(allNull.agg(VectorStats.vectorAvg(col("v"))).head.isNullAt(0))
  }

  test("array<double> input is rejected at analysis, not misread") {
    val df = Seq(Seq(1.0, 2.0)).toDF("v")
    val e = intercept[Exception] {
      df.agg(VectorStats.vectorAvg(col("v"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("float") ||
      e.getMessage.toLowerCase.contains("type"))
  }

  test("a null ELEMENT fails loudly instead of reading as 0.0") {
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS v")
    val e = intercept[Exception] {
      df.agg(VectorStats.vectorAvg(col("v"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null element")))
  }
}
