package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: rows of `points` matched to rows of
  * `intervals` with `lo <= x < hi` (or `<= hi` inclusive).
  *
  * Catalyst plans a bare range predicate as BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) — fine for a broadcast-sized interval table,
  * fatal otherwise. [[banded]] restores an equi-join shape: both sides are
  * bucketed by `x div bandWidth` (intervals explode to every band they
  * overlap), the join keys on the band id, and the exact range predicate
  * filters within band. Cost: shuffle on band ids + |interval| × bands
  * duplication — the standard trade, sized by `bandWidth` ≈ typical
  * interval length.
  */
object RangeJoin {

  /** Naive form for broadcast-sized interval tables (kept for contrast and
    * as the oracle anchor).
    */
  def naive(
      points: DataFrame, intervals: DataFrame,
      xCol: String, loCol: String, hiCol: String,
      inclusiveHi: Boolean = false): DataFrame = {
    val hiPred =
      if (inclusiveHi) points(xCol) <= intervals(hiCol)
      else points(xCol) < intervals(hiCol)
    points.join(broadcast(intervals), points(xCol) >= intervals(loCol) && hiPred)
  }

  /** Band id for one column: exact integer floor-division when the column
    * is integral (double math loses resolution above 2^53 and truncates
    * toward zero on negatives), FLOOR — never cast-truncation — on the
    * fractional path. Both paths implement the same mathematical floor, so
    * a LongType point column bands identically to a DoubleType interval
    * column; truncation-toward-zero would disagree with the integral path
    * on negatives and silently drop matches.
    */
  private def bandOf(df: DataFrame, colName: String, bandWidth: Long): Column =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        expr(s"(`$colName` - pmod(`$colName`, ${bandWidth}L)) div ${bandWidth}L")
      case _ => floor(col(colName) / bandWidth).cast("long")
    }

  /** Banded equi-join form for large interval tables. */
  def banded(
      points: DataFrame, intervals: DataFrame,
      xCol: String, loCol: String, hiCol: String,
      bandWidth: Long,
      inclusiveHi: Boolean = false): DataFrame = {
    require(bandWidth > 0)
    val p = points.withColumn("_band", bandOf(points, xCol, bandWidth))
    val iv = intervals.withColumn("_band",
      explode(sequence(bandOf(intervals, loCol, bandWidth),
        bandOf(intervals, hiCol, bandWidth))))
    val hiPred =
      if (inclusiveHi) p(xCol) <= iv(hiCol) else p(xCol) < iv(hiCol)
    p.join(iv, p("_band") === iv("_band") && p(xCol) >= iv(loCol) && hiPred)
      .drop("_band")
  }
}
