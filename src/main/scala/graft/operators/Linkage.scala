package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StringSim

/** Fuzzy record linkage at scale: blocking joins and the sorted-
  * neighborhood method.
  *
  * The reference resolves entities by exact keys only (surveyid/fileid
  * equi-joins, `SurveyMetadataHelper`); a curation engine additionally
  * needs approximate matching over name/title fields. Both operators here
  * avoid the n² comparison space the classical way:
  *
  *  - [[blockedPairs]]: candidate pairs share a cheap deterministic
  *    blocking key, so the comparison space is Σ|block|² instead of n².
  *    On a cluster this is ONE shuffle (hash-partition by block key) and
  *    the expensive comparator runs only inside blocks. Skewed blocks are
  *    the operator's known failure mode at 100 TB — pair it with
  *    [[blockSizes]] to audit the block histogram, and cap with
  *    `maxBlockSize` (oversized blocks are dropped and reported, the
  *    standard ER compromise, rather than silently exploding a task).
  *
  *  - [[sortedNeighborhoodPairs]]: order records inside each block by a
  *    sort key and compare each record only to its `window` predecessors.
  *    Comparison count is n·w by construction regardless of block-size
  *    skew. The rank join is an EQUI-join on (block, rank − offset) via an
  *    exploded offset sequence — no range-join fallback, no per-block
  *    quadratic task; rank assignment is the only per-block window and it
  *    is O(n log n) shuffle-sort, the same cost class as any groupBy.
  */
object Linkage {

  /** Per-block candidate counts: the audit a blocking strategy needs
    * before it is trusted on the full corpus (a single mega-block turns a
    * linkage run into a cartesian task).
    */
  def blockSizes(records: DataFrame, blockKey: Column): DataFrame =
    records.groupBy(blockKey.as("block")).agg(count(lit(1)).as("n"))
      .withColumn("candidate_pairs", col("n") * (col("n") - 1) / 2)

  /** All intra-block pairs (a.id < b.id) of `records` scored by
    * Jaro-Winkler over `nameCol`, keeping pairs with score ≥ `threshold`.
    * Blocks larger than `maxBlockSize` are excluded (dropped blocks are
    * discoverable via [[blockSizes]]); pass Int.MaxValue to disable.
    */
  def blockedPairs(
      records: DataFrame, idCol: String, nameCol: String, blockKey: Column,
      threshold: Double, maxBlockSize: Int = Int.MaxValue): DataFrame = {
    val keyed0 = records.select(
      col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("block"))
    val keyed =
      if (maxBlockSize == Int.MaxValue) keyed0
      else {
        val ok = keyed0.groupBy("block").agg(count(lit(1)).as("n"))
          .filter(col("n") <= maxBlockSize).select("block")
        // block-count frame is tiny (≤ #blocks rows) — broadcast the gate
        keyed0.join(broadcast(ok), "block")
      }
    val a = keyed.select(col("block"), col("id").as("a_id"), col("name").as("a_name"))
    val b = keyed.select(col("block"), col("id").as("b_id"), col("name").as("b_name"))
    a.join(b, Seq("block"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", StringSim.jaroWinkler(col("a_name"), col("b_name")))
      .filter(col("sim") >= threshold)
      .select("block", "a_id", "b_id", "a_name", "b_name", "sim")
  }

  /** Entity assignment from match pairs: connected components over the
    * pair graph ([[Dedup.connectedComponentsAltStar]] — O(log n) rounds,
    * skew-safe), each record labeled with its component's minimum id.
    * Records in no pair are their own entity. One column added: `entity`.
    */
  def entities(records: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val cc = Dedup.connectedComponentsAltStar(
      pairs.select(col("a_id").as("doc_a"), col("b_id").as("doc_b")))
      .select(col("doc").as(idCol), col("cluster").as("entity"))
    records.join(cc, Seq(idCol), "left")
      .withColumn("entity", coalesce(col("entity"), col(idCol)))
  }

  /** Golden-record survivorship: one canonical record per entity, chosen
    * by the caller's ordering (e.g. most recent, most complete) with the
    * record id as the final deterministic tie-break. Output: the winning
    * record's full row plus `entity` and `n_members`. One key shuffle on
    * the entity id (window top-1 + grouped count share it).
    */
  def goldenRecords(
      labeled: DataFrame, idCol: String, orderBy: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("entity"))
      .orderBy(orderBy :+ col(idCol).asc: _*)
    val sizes = labeled.groupBy(col("entity")).agg(count(lit(1)).as("n_members"))
    labeled.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .join(sizes, "entity")
  }

  /** Sorted-neighborhood candidate pairs: within each block, records are
    * ranked by (`sortKey`, id) and each record is paired with its `window`
    * immediate predecessors. Output one row per candidate pair with both
    * ids, both sort keys, and the rank distance — similarity scoring is
    * the caller's (so the same neighborhood generator serves Levenshtein,
    * Jaro-Winkler, or embedding comparators).
    *
    * Pair generation is an equi-join on (block, rank − offset): the right
    * side explodes each record into `window` rows keyed by the rank it
    * would be a successor of. Both sides shuffle-partition on the same
    * compound key, so the join is local after one exchange and the output
    * is exactly n·window rows before boundary trimming — skew-immune by
    * construction.
    */
  def sortedNeighborhoodPairs(
      records: DataFrame, idCol: String, blockKey: Column, sortKey: Column,
      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val keyed = records.select(
      col(idCol).as("id"), blockKey.as("block"), sortKey.as("skey"))
    val w = Window.partitionBy("block").orderBy(col("skey"), col("id"))
    val ranked = keyed.withColumn("rn", row_number().over(w))
    val a = ranked.select(
      col("block"), col("rn"), col("id").as("a_id"), col("skey").as("a_key"))
    // successor side: record at rank r pairs with ranks r+1 .. r+window,
    // so emit it under each target rank and equi-join
    val b = ranked
      .withColumn("off", explode(sequence(lit(1), lit(window))))
      .select(col("block"), (col("rn") + col("off")).as("rn"),
        col("id").as("b_id"), col("skey").as("b_key"), col("off"))
    a.join(b, Seq("block", "rn"))
      .select(col("block"), col("b_id").as("a_id"), col("a_id").as("b_id"),
        col("b_key").as("a_key"), col("a_key").as("b_key"),
        col("off").as("rank_distance"))
  }
}
