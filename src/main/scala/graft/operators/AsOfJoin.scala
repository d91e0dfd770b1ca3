package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `rightTime <= leftTime` within the same key (the time-series lookup
  * Spark has no built-in operator for).
  *
  * Implementation is the union + last-value-over-ordered-window pattern, NOT
  * a theta join: tag both sides, union them on (key, time), and carry the
  * latest right-side payload forward with `last(…, ignoreNulls)` over an
  * unbounded-preceding window — then keep only left rows. Cost: ONE shuffle
  * on the key (the window partition), linear state, no candidate-pair
  * explosion; a naive `l.key = r.key AND r.ts <= l.ts` theta join explodes
  * to |matches|² per key before its aggregation. Ties (equal timestamps)
  * resolve to the right row (right sorts before left at the same instant),
  * matching "at or before" semantics.
  */
object AsOfJoin {

  /** `left` rows enriched with the as-of row of `right`.
    *
    * @param rightCols the right-side columns to carry (must not collide with
    *                  left column names); rows with no as-of match get nulls
    *                  (left-outer semantics; filter on any carried col for
    *                  inner).
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTimeCol: String, rightTimeCol: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"right columns ${rightCols.intersect(leftCols)} collide with left")
    val reserved = Seq("_t", "_side", "_k", "_p")
    require(reserved.intersect(leftCols ++ rightCols).isEmpty,
      s"column names $reserved are reserved by asOf")

    // the right-side payload travels as ONE struct so the carried values are
    // a single whole right row — per-column last(ignoreNulls) would mix
    // fields from different rows whenever a payload column is NULL
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val l = left
      .select(Seq(col(leftTimeCol).as("_t"), lit(1).as("_side"), col(keyCol).as("_k")) ++
        leftCols.map(col) :+ lit(null).cast(payloadType).as("_p"): _*)
    // SQL join equality never matches NULL keys, and `r.ts <= l.ts` is never
    // true for a NULL timestamp — but the window partitioner groups NULL
    // keys together and sorts NULL _t FIRST (it would seed every row of the
    // key), so drop both up front; NULL-keyed/timed left rows then fall
    // through with a null match (left-outer)
    val r = right.filter(col(keyCol).isNotNull && col(rightTimeCol).isNotNull)
      .select(Seq(col(rightTimeCol).as("_t"), lit(0).as("_side"), col(keyCol).as("_k")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("_p"): _*)

    // right (_side=0) sorts before left (_side=1) at equal _t → "at or before"
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col("_p").getField(c).as(c)): _*)
  }

  /** [[asOf]] with a STALENESS bound: the carried match is nulled when the
    * as-of row is older than `maxAgeSeconds` before the left time — the
    * feature-store lookup ("latest value, but a reading staler than X is no
    * reading"). Left-outer like [[asOf]]; the right time column is always
    * carried (callers need it to reason about staleness) and must be named
    * in `rightCols` or not collide.
    *
    * Same one-key-shuffle union-window plan — the age check is a pure
    * post-projection, so bounding staleness costs nothing over [[asOf]],
    * where the equivalent theta join (`r.ts BETWEEN l.ts - maxAge AND
    * l.ts`) pays per-key candidate pairs.
    *
    * CALLER CONTRACT on ties: rows on the right sharing an exact (key,
    * time) make "the" as-of row ambiguous — collapse them first (e.g.
    * per-(key, time) max of a tie-break id) so the carried payload is
    * deterministic.
    */
  def asOfWithin(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTimeCol: String, rightTimeCol: String,
      rightCols: Seq[String], maxAgeSeconds: Long): DataFrame = {
    require(maxAgeSeconds >= 0)
    val carried = (rightCols :+ rightTimeCol).distinct
    val joined = asOf(left, right, keyCol, leftTimeCol, rightTimeCol, carried)
    val fresh = unix_micros(col(rightTimeCol).cast("timestamp")) >=
      unix_micros(col(leftTimeCol).cast("timestamp")) - maxAgeSeconds * 1000000L
    joined.select(
      left.columns.map(col).toSeq ++
        carried.map(c => when(fresh, col(c)).as(c)): _*)
  }
}
