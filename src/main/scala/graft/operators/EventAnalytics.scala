package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch analytics over event streams: ordered-funnel conversion and cohort
  * retention — the two queries every product-events warehouse runs daily,
  * and natural companions to the engine's sessionization
  * ([[graft.streaming.EventStream]]).
  *
  * Design for 100 TB: both operators shuffle on the user key only (events
  * never self-join on time windows), and every stage of the funnel keys the
  * SAME column, so Catalyst reuses one hash-partitioning across the chained
  * joins instead of re-exchanging per stage.
  */
object EventAnalytics {

  /** Ordered funnel: for each stage i, the number of users who completed
    * stages 0..i IN ORDER — a user reaches stage i+1 only with a qualifying
    * event strictly after their earliest completion of stage i (the classic
    * "view → click → purchase" conversion measure; out-of-order events don't
    * count).
    *
    * Shape: stage 0 is one grouped min over the filtered events; each later
    * stage is an equi-join of the (small, shrinking) reached-set against the
    * stage's filtered events plus a grouped min — all keyed on the user
    * column. Returns (stage: 1-based Int, users: Long).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]
  ): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
    def stageCount(i: Int, r: DataFrame): DataFrame =
      r.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), col("users"))
    val counts = Seq.newBuilder[DataFrame]
    counts += stageCount(0, reached)
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = events.filter(col(typeCol) === st)
        .select(col(userCol).as("u2"), col(tsCol).as("ts2"))
        .join(reached, col("u2") === col("u") && col("ts2") > col("t"))
        .groupBy(col("u2").as("u")).agg(min(col("ts2")).as("t"))
      counts += stageCount(i, reached)
    }
    counts.result().reduce(_ union _)
  }

  /** Time-constrained funnel: stages must complete within `windowSeconds`
    * of the user's FIRST stage-1 event (the first-entry anchor — the
    * product-analytics convention). Per stage the reached-set keeps the
    * EARLIEST qualifying event after the previous stage's chosen time;
    * greedy-earliest dominates any other chain choice for completing the
    * remaining stages inside the deadline, so "reached stage i" is exact
    * for the first-entry anchoring. (A user who would only convert when
    * anchored at a LATER stage-1 event does not count — that alternative
    * semantics is a different, strictly more expensive operator; this one
    * is the standard dashboard number.) Same scale shape as [[funnel]]:
    * per stage one equi-join of the shrinking reached-set + one grouped
    * min, all keyed on the user column.
    */
  def funnelWithin(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      windowSeconds: Long
  ): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
      .withColumn("t0", col("t"))
    def stageCount(i: Int, r: DataFrame): DataFrame =
      r.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), col("users"))
    val counts = Seq.newBuilder[DataFrame]
    counts += stageCount(0, reached)
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = events.filter(col(typeCol) === st)
        .select(col(userCol).as("u2"), col(tsCol).as("ts2"))
        .join(reached,
          col("u2") === col("u") && col("ts2") > col("t") &&
            col("ts2") <= col("t0") + expr(s"INTERVAL $windowSeconds SECONDS"))
        .groupBy(col("u2").as("u"), col("t0")).agg(min(col("ts2")).as("t"))
      counts += stageCount(i, reached)
    }
    counts.result().reduce(_ union _)
  }

  /** Cohort retention: users cohorted by their first-seen day; for every
    * (cohort day, day offset) cell, the number of distinct cohort users
    * active that many days after their first day. The day-0 diagonal is the
    * cohort size.
    *
    * Shape: one grouped min for first-seen, one equi-join back on the user
    * key (the first-seen frame is per-user — small relative to events;
    * Catalyst/AQE broadcasts it when it fits), one distinct-count aggregate.
    * Returns (cohort: Date, day_offset: Int, users: Long).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol).as("u"))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    events.select(col(userCol).as("u2"), to_date(col(tsCol)).as("day"))
      .join(firsts, col("u2") === col("u"))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count_distinct(col("u")).as("users"))
  }

  /** Time-series densification: per-key daily event counts with the silent
    * days filled in as zero, from each key's first day through its last —
    * the gap-fill step before any rolling/trend computation (a rolling mean
    * over a sparse frame silently skips the zeros).
    *
    * Shape: one grouped min/max per key, then `explode(sequence(first,
    * last))` generates each key's calendar INSIDE its partition — no range
    * join, no driver-side calendar table — and the counts left-join back on
    * (key, day). Fan-out is bounded by each key's active span. Returns
    * (key, day, n).
    */
  def dailyGapFill(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val counts = events
      .groupBy(col(keyCol).as("k2"), to_date(col(tsCol)).as("day2"))
      .agg(count(lit(1)).as("n2"))
    val calendar = events
      .groupBy(col(keyCol).as(keyCol))
      .agg(min(to_date(col(tsCol))).as("first_day"),
        max(to_date(col(tsCol))).as("last_day"))
      .select(col(keyCol),
        explode(sequence(col("first_day"), col("last_day"))).as("day"))
    calendar
      .join(counts, col(keyCol) === col("k2") && col("day") === col("day2"), "left")
      .select(col(keyCol), col("day"), coalesce(col("n2"), lit(0L)).as("n"))
  }

  /** Per-key daily volume anomalies: days whose GAP-FILLED count deviates
    * from the key's own mean by more than `sigmaX100`/100 sample standard
    * deviations (z-score outliers — the data-quality tripwire over ingest
    * volumes: a silent day and a double-delivery day both flag). Gap-fill
    * first is load-bearing: without the zero days, a key's mean/σ are
    * computed over active days only and a fully silent day can never flag.
    *
    * Shape: [[dailyGapFill]] + one window over each key's days (partition
    * by key — no global pass); keys with σ = 0 (perfectly constant volume)
    * or a single day never flag. Returns (key, day, n, mean_x100,
    * stddev_x100) for flagged days, stats integer-scaled for a stable
    * engine-portable output.
    */
  def dailyAnomalies(
      events: DataFrame, keyCol: String, tsCol: String,
      sigmaX100: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
    dailyGapFill(events, keyCol, tsCol)
      .withColumn("__mean", avg(col("n")).over(w))
      .withColumn("__sd", stddev_samp(col("n")).over(w))
      .filter(col("__sd").isNotNull && col("__sd") > 0.0 &&
        abs(col("n") - col("__mean")) * 100.0 > col("__sd") * sigmaX100)
      .select(col(keyCol), col("day"), col("n"),
        round(col("__mean") * 100).cast("long").as("mean_x100"),
        round(col("__sd") * 100).cast("long").as("stddev_x100"))
  }
}
