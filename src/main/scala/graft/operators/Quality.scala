package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ-shaped gate): row-level
  * predicates audited in ONE pass over the table, plus the two checks a
  * row-local predicate cannot express — key uniqueness and referential
  * integrity — as the aggregations they actually are.
  *
  * The reference runs exactly these checks procedurally at load time:
  * schema/width reconciliation before a table is (re)created (ref
  * lib03_Update_Metadata.py's column-vs-spec diff), NOT-NULL id columns
  * implied by the CSPro id items, and existence probes against already-
  * loaded surveys (ref lib04_Update_Table_Data.py:509-541's skip-if-done).
  * Here they are data, not control flow: a report frame a pipeline can
  * gate on, alert on, or store next to the load.
  *
  * Scale shape: [[constraintReport]] is a single partial-aggregated scan
  * whatever the constraint count (every check is a conditional count in the
  * same aggregate — adding a check adds a column, not a pass);
  * [[uniquenessViolations]] is one key shuffle; [[referentialViolations]]
  * one anti join (broadcast when the parent's key side is small, e.g.
  * dimension tables).
  */
object Quality {

  /** One row per named constraint: rows audited, rows violating, and the
    * violation share in ppm (integer — exact, hash-gate-stable). A
    * constraint is a row-level Column predicate that is TRUE when the row
    * PASSES. NULL predicate results count as violations (a check that
    * cannot evaluate did not pass — the conservative read for gating).
    *
    * One pass: all constraints fold into a single aggregate; the long-form
    * report is a bounded (#constraints-row) explode of that 1-row frame.
    */
  def constraintReport(
      df: DataFrame, constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    require(constraints.map(_._1).distinct.size == constraints.size,
      "constraint names must be unique")
    // coalesce: sum over an EMPTY frame is NULL — an empty batch must audit
    // as (0 rows, 0 violations), not nulls (the streaming face sums reports)
    val aggs = count(lit(1)).as("_rows") +:
      constraints.map { case (name, pass) =>
        coalesce(sum(when(coalesce(pass, lit(false)), 0L).otherwise(1L)), lit(0L))
          .as(s"_v_$name")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("_rows"), explode(array(constraints.map { case (name, _) =>
        struct(lit(name).as("check_name"), col(s"_v_$name").as("n_violations"))
      }: _*)).as("c"))
      // integer ppm: counts ≤ 2^53/1e6 keep the double product exact, so
      // floor IS integer division (`//` in the oracle); `/` on longs in
      // Spark SQL returns double, which would hash-drift vs any engine
      // computing the exact ratio differently
      .select(col("c.check_name").as("check_name"),
        col("c.n_violations").as("n_violations"),
        col("_rows").as("n_rows"),
        when(col("_rows") === 0L, 0L)
          .otherwise(floor(col("c.n_violations") * 1000000L / col("_rows")).cast("long"))
          .as("violation_ppm"))
  }

  /** Keys of `df` that appear more than once: (key cols…, n_copies). Empty
    * ⇔ the key is unique. One key shuffle (partial-agg count), answer-sized
    * output.
    */
  def uniquenessViolations(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1L)
  }

  /** Child rows whose foreign key matches no parent row, as
    * (child key value, n_orphans). SQL NULL semantics on purpose: NULL
    * foreign keys are reported in their own group (a NULL FK matches
    * nothing — whether that is legal is a separate [[constraintReport]]
    * not-null check). Anti join on the parent's DISTINCT keys — broadcast
    * by Catalyst when the parent is dimension-sized.
    */
  def referentialViolations(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
      .groupBy(col(childKey))
      .agg(count(lit(1)).as("n_orphans"))

  /** Gate form: throw if any constraint in the report has violations
    * (pipelines that must stop a bad load rather than record it). Bounded
    * collect: the report has one row per constraint.
    */
  def requireConstraints(
      df: DataFrame, constraints: Seq[(String, Column)]): Unit = {
    val bad = constraintReport(df, constraints)
      .filter(col("n_violations") > 0L)
      .collect()
    require(bad.isEmpty,
      "constraint violations: " + bad.map(r =>
        s"${r.getAs[String]("check_name")}=${r.getAs[Long]("n_violations")}").mkString(", "))
  }

  /** Winsorize `valueCol` per group: clamp to the [`pLo`, `pHi`] exact
    * interpolated percentiles computed WITHIN each group. Returns the
    * input plus `lo`, `hi`, and `w_value` (the clamped value) — row count
    * and order preserved.
    *
    * The robust-statistics primitive for outlier-tolerant normalization
    * of numeric features (heavy-tailed quality scores, token counts,
    * prices) before they feed mixture weights or thresholds. Two passes
    * over the group: one aggregation for the bounds (exact `percentile`,
    * matching the a10 oracle parity with `quantile_cont`), one broadcast
    * join back — the bounds frame is one row per group, so the join back
    * to the fact rows never shuffles the fact side.
    */
  /** Piggyback the constraint audit on an EXISTING action via
    * `Dataset.observe`: returns the instrumented frame plus the
    * [[org.apache.spark.sql.Observation]] handle. Whatever job the caller
    * runs next (a sink write, a count) ALSO produces the audit — zero
    * extra scans, where [[constraintReport]] is its own pass. The metric
    * names are `n_rows` and one `v_<name>` per constraint, same
    * NULL-predicate-counts-as-violation semantics. `observationMetrics`
    * renders the handle as a report matching `constraintReport`'s rows
    * (the spec pins the equivalence).
    *
    * This is the shape a 100 TB load wants: the audit rides the ingest
    * job's one pass over the data instead of doubling it.
    */
  def observeConstraints(
      df: DataFrame, constraints: Seq[(String, Column)]): (DataFrame, org.apache.spark.sql.Observation) = {
    require(constraints.nonEmpty, "no constraints given")
    val obs = org.apache.spark.sql.Observation()
    val aggs = count(lit(1)).as("n_rows") +:
      constraints.map { case (name, pass) =>
        coalesce(sum(when(coalesce(pass, lit(false)), 0L).otherwise(1L)), lit(0L))
          .as(s"v_$name")
      }
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Render a completed observation (an action has run on the instrumented
    * frame) as (check_name, n_violations, n_rows, violation_ppm) rows —
    * the same shape and ppm arithmetic as [[constraintReport]].
    */
  def observationMetrics(
      spark: org.apache.spark.sql.SparkSession,
      obs: org.apache.spark.sql.Observation,
      constraintNames: Seq[String]): DataFrame = {
    import spark.implicits._
    val m = obs.get
    val n = m("n_rows").asInstanceOf[Long]
    constraintNames.map { name =>
      val v = m(s"v_$name").asInstanceOf[Long]
      (name, v, n, if (n == 0L) 0L else v * 1000000L / n)
    }.toDF("check_name", "n_violations", "n_rows", "violation_ppm")
  }

  /** Rank (quantile) normalization per group: each row gains `pr_x1e9` =
    * ⌊(rank − 1)·10⁹ / (n − 1)⌋ over `valueCol` within its group — the
    * uniform-margin feature map, EXACT integer arithmetic end to end
    * (rank ties share a value, single-row groups map to 0), so the output
    * hash-reproduces across engines where float percent_rank can differ in
    * the last ulp.
    *
    * SCALE SHAPE (rewritten after the round-13 sf1 anchor caught the old
    * plan 14.8× slower at 10× rows): `rank()` depends only on the VALUE,
    * never the row, so ranks are computed on the (group, value) DISTINCT
    * table — `rank(v) = 1 + Σ count(values < v)` via one cumulative sum —
    * and joined back to the rows. The row-level window this replaces
    * partitioned by the group columns alone; with few groups (the common
    * shape: 3 return flags, a handful of languages) that plan sort-spills
    * every row of a group through ONE task, which is exactly the
    * single-partition-window failure mode at 100 TB. Here the per-task
    * window input is the group's distinct values (bounded by value
    * cardinality, not corpus rows) and the corpus-sized work is a
    * map-side-combined groupBy + a key-shuffle join.
    */
  def rankNormalize(
      df: DataFrame, valueCol: String, groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(gcols: _*)
    val ranked = df
      .groupBy(gcols :+ col(valueCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w)) // inclusive cumsum
      .withColumn("__rk", col("__cum") - col("__c") + 1L) // 1 + strictly-smaller
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("pr_x1e9",
        when(col("__n") === 1L, 0L)
          // staged in DECIMAL(38,0): (rk-1)·1e9 overflows BIGINT under
          // ANSI once a group exceeds ~9.2e9 rows — exactly the 100 TB
          // single-group scale this rewrite exists for (ADVICE r13).
          // Result is identical below that bound (integral division,
          // quotient < 1e9 always fits)
          .otherwise(expr(
            "CAST(CAST(__rk - 1 AS DECIMAL(38,0)) * 1000000000 DIV (__n - 1) AS BIGINT)")))
      // renamed join keys: `ranked` derives from `df`, so joining on the
      // original attribute names would be an ambiguous self-join
      .select(groupCols.map(c => col(c).as(s"__g_$c")) ++
        Seq(col("__v"), col("pr_x1e9")): _*)
    // null-safe equi-join: a NULL value is a rankable group of its own
    // (ordered first, matching the old window's null-first order)
    val cond = groupCols.foldLeft(df(valueCol) <=> ranked("__v")) {
      (acc, c) => acc && (df(c) <=> ranked(s"__g_$c"))
    }
    df.join(ranked, cond, "inner")
      .select(df.columns.map(df(_)) :+ ranked("pr_x1e9"): _*)
  }

  /** Fixed-bin histogram per group over `[lo, hi)` with `nBins` equal
    * buckets; values below/above land in buckets −1 / `nBins`. One
    * partial-aggregated pass — profile cost tracks the scan, never the
    * bucket count. Empty buckets are absent (join a bucket spine to
    * densify). In-range buckets are clamped to `nBins − 1`: a value
    * marginally below `hi` can float-round so that
    * `floor((v−lo)/binWidth) == nBins`, which would conflate an in-range
    * value with the overflow bucket (ADVICE r6).
    */
  def histogram(
      df: DataFrame, valueCol: String, groupCols: Seq[String],
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1 && hi > lo)
    val bucket = when(col(valueCol) < lo, lit(-1))
      .when(col(valueCol) >= hi, lit(nBins))
      .otherwise(least(
        floor((col(valueCol) - lit(lo)) / lit((hi - lo) / nBins)).cast("int"),
        lit(nBins - 1)))
    df.groupBy((groupCols.map(col) :+ bucket.as("bucket")): _*)
      .agg(count(lit(1)).as("n"))
  }

  def winsorize(
      df: DataFrame, valueCol: String, groupCols: Seq[String],
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentile range [$pLo, $pHi]")
    // typed Column API, not SQL-string splicing: a column name needing
    // backticks (dots, spaces) would fail to parse or resolve elsewhere
    // under expr() interpolation (ADVICE r6)
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), lit(pLo)).as("lo"),
        percentile(col(valueCol), lit(pHi)).as("hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn("w_value",
        least(greatest(col(valueCol), col("lo")), col("hi")))
  }
}
