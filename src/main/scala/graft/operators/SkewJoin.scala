package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split handles most skew at runtime (enabled in
  * [[graft.GraftSession]]); salting is the plan-level fallback for the
  * pathological case AQE can't fix — one key holding a double-digit share of
  * the rows (DHS-shaped data: one giant survey, one dominant record type; web
  * corpora: empty-text digests, null-ish keys).
  *
  * Shape: the skewed (big) side gets a deterministic salt in [0, buckets)
  * derived from the whole row via xxhash64, widening one hot key into
  * `buckets` shuffle keys; the other side is exploded `buckets`× so every
  * salted key finds its match. Join stays an equi-join on (key, salt) —
  * sort-merge/shuffled-hash planning, no Cartesian anywhere. The explode
  * multiplies the SMALL side only, so cost is bounded by
  * |small| × buckets, the standard trade.
  */
object SkewJoin {

  /** Per-row salt in [0, buckets), a pure content hash of `cols`.
    *
    * DETERMINISM IS LOAD-BEARING: the salt feeds the shuffle key, and Spark
    * recomputes only the lost map partitions after a fetch failure
    * (SPARK-23207). A salt mixed from `monotonically_increasing_id` or
    * `spark_partition_id` changes on recompute — rows land in different
    * buckets than the first attempt and reducers that already fetched old
    * outputs silently drop or duplicate them. On a 1000-executor cluster,
    * where executor loss is routine, that is silent corruption. A content
    * hash recomputes to the same bucket every attempt.
    *
    * The cost: byte-identical rows share a bucket. Pass a unique-id column
    * (every real corpus has one — doc_id, digest, file+offset) to spread
    * them; see [[saltedJoin]]'s `uniqueIdCol`.
    */
  def salt(cols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Equi-join `big ⋈ small` on `keys`, salted into `buckets`.
    *
    * Join types that preserve UNMATCHED small-side rows (right/full outer)
    * are rejected: the small side is exploded buckets×, so an unmatched
    * small row would surface once per salt. inner / left variants / semi /
    * anti are all exact (each big row carries exactly one salt).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String], buckets: Int,
      joinType: String = "inner", uniqueIdCol: Option[String] = None): DataFrame = {
    require(buckets > 0)
    val jt = joinType.toLowerCase.replace("_", "")
    require(!Set("right", "rightouter", "full", "fullouter", "outer").contains(jt),
      s"saltedJoin cannot preserve unmatched small-side rows (joinType=$joinType): " +
        "the exploded small side would emit them once per salt bucket")
    // salt input: a caller-supplied unique id spreads even byte-identical
    // hot-key rows; the whole-row fallback is equally retry-safe but leaves
    // exact duplicate rows sharing a bucket (residual skew bounded by the
    // max duplicate-row multiplicity)
    val saltCols = uniqueIdCol match {
      case Some(id) => (keys :+ id).map(col)
      case None     => big.columns.map(col).toSeq
    }
    val b = big.withColumn("_salt", salt(saltCols, buckets))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1)))) // int bounds → array<int>
    b.join(s, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Keys holding more than a `1/heavyShareDenom` share of `df`, detected on
    * a seeded sample: `sample → partial-agg count → share filter`, all
    * declarative (the 1-row total joins in, no driver scalar). The sample
    * keeps detection cost at ~`sampleFraction` of one key-column scan — at
    * corpus scale the full groupBy this replaces shuffles every distinct
    * key. Detection errors only mis-ROUTE (a missed heavy key falls back to
    * the unsalted path, a false heavy wastes `buckets` small-side copies);
    * correctness of [[adaptiveSaltedJoin]] never depends on the estimate.
    * The seed is fixed: like [[salt]], routing feeds shuffle keys and must
    * reproduce on partition recompute.
    */
  def detectHeavyKeys(
      df: DataFrame, keys: Seq[String],
      heavyShareDenom: Long = 200L, sampleFraction: Double = 0.05): DataFrame = {
    require(heavyShareDenom > 1 && sampleFraction > 0 && sampleFraction <= 1.0)
    val just = df.select(keys.map(col): _*)
    val sampled = if (sampleFraction >= 1.0) just
      else just.sample(withReplacement = false, sampleFraction, seed = 7L)
    val counts = sampled.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
    counts
      .crossJoin(broadcast(sampled.agg(count(lit(1)).as("_total")))) // 1-row total
      .filter(col("_n") * heavyShareDenom > col("_total"))
      .select(keys.map(col): _*)
  }

  /** [[saltedJoin]] that salts ONLY the heavy keys: light keys join plainly
    * (salt 0 both sides), heavy keys widen into `buckets` shuffle keys with
    * the small side replicated for those keys alone. Blanket salting pays
    * |small| × buckets explode; here the explode cost is
    * |small ∩ heavy keys| × buckets — on a realistic corpus (a handful of
    * pathological keys) that is ~|small|, while the hot keys still spread
    * across `buckets` reducers. Routing is one broadcast membership join on
    * each side — single pass, no big-side union-of-filters double scan.
    *
    * `heavyKeys` defaults to [[detectHeavyKeys]] on `big`; pass a
    * precomputed frame (key columns only) to reuse a profile across joins.
    * Result is EXACTLY `big.join(small, keys, joinType)` for the same join
    * types [[saltedJoin]] accepts (each big row carries exactly one salt;
    * NULL keys take salt 0 on both sides and match or fall through exactly
    * as in the plain join).
    */
  def adaptiveSaltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String], buckets: Int,
      heavyKeys: Option[DataFrame] = None,
      joinType: String = "inner", uniqueIdCol: Option[String] = None,
      heavyShareDenom: Long = 200L, sampleFraction: Double = 0.05): DataFrame = {
    require(buckets > 0)
    val jt = joinType.toLowerCase.replace("_", "")
    require(!Set("right", "rightouter", "full", "fullouter", "outer").contains(jt),
      s"adaptiveSaltedJoin cannot preserve unmatched small-side rows (joinType=$joinType)")
    val reserved = Seq("_salt", "_hv")
    require(reserved.intersect(big.columns ++ small.columns).isEmpty,
      s"column names $reserved are reserved by adaptiveSaltedJoin")
    val hk = broadcast(
      heavyKeys.getOrElse(detectHeavyKeys(big, keys, heavyShareDenom, sampleFraction))
        .select(keys.map(col): _*).distinct().withColumn("_hv", lit(1)))
    val saltCols = uniqueIdCol match {
      case Some(id) => (keys :+ id).map(col)
      case None     => big.columns.map(col).toSeq
    }
    val b = big.join(hk, keys, "left")
      .withColumn("_salt",
        when(col("_hv").isNotNull, salt(saltCols, buckets)).otherwise(lit(0)))
      .drop("_hv")
    val s = small.join(hk, keys, "left")
      .withColumn("_salt", explode(
        when(col("_hv").isNotNull, sequence(lit(0), lit(buckets - 1)))
          .otherwise(array(lit(0)))))
      .drop("_hv")
    b.join(s, keys :+ "_salt", joinType).drop("_salt")
  }
}
