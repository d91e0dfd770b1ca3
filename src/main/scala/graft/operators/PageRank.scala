package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point (integer-arithmetic) PageRank over an edge list.
  *
  * Power iteration with damping d = 0.85, run entirely in scaled BIGINT
  * arithmetic: ranks are micro-units of `scale` (default 10¹²), per-edge
  * contributions are `rank div outdeg`, and the update is
  * `(base·15 + inflow·85) div 100` — every operation is an exact integer
  * op, so the result is bit-identical regardless of aggregation order,
  * partitioning, or engine. That is the property that makes a distributed
  * PageRank verifiable: floating-point power iteration sums differ in the
  * last ulps between any two run plans, but the integer fixed-point
  * version hash-matches an independent implementation exactly (the DuckDB
  * oracle replays the same recurrence in SQL). Quantization error is
  * bounded by one unit per edge per round — at scale=10¹² that is 10⁻¹²
  * relative, far below anything a ranking consumer can observe.
  *
  * Scale shape per iteration: one shuffle keyed on `src` for the
  * rank-to-edge join (edges are pre-joined with out-degrees ONCE and
  * materialized — the static frame), one aggregation keyed on `dst` for
  * the inflow sum, one left join back to the node set. All joins are
  * equi-joins on node id; the rank frame (|V| rows, two longs) is
  * re-materialized per round and the previous round's checkpoint freed,
  * exactly the alt-star discipline (`Dedup.connectedComponentsAltStar`).
  * Hub in-degree skew lands in the inflow SUM aggregation — partial
  * aggregation combines map-side, so a 10⁸-in-degree node costs one long
  * per upstream partition, not a shuffled row per edge.
  *
  * No driver-side collect: |V| enters the recurrence through a 1-row
  * count frame cross-joined onto the node set (the NgramLm pattern).
  */
object PageRank {

  /** Ranks after `iters` rounds over directed `edges` (cols `src`, `dst`;
    * duplicates are dropped). Returns (node, rank) with ranks in units of
    * 1/`scale`; Σrank ≈ scale (minus integer-floor dust). Dangling (sink)
    * nodes' mass is redistributed uniformly each round — canonical
    * PageRank, so the conservation claim holds on graphs WITH sinks too;
    * on sink-free graphs the dangling term is exactly zero and the
    * recurrence is unchanged (the oracle's case). Nodes are those incident
    * to at least one edge (isolated nodes have no edge row to arrive on —
    * prepend them to `edges` as self-loops if they matter).
    */
  def ranks(edges0: DataFrame, iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0)
    val edges = graft.CacheScope.localCheckpoint(
      edges0.select(col("src"), col("dst")).distinct())
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // static per-edge frame: (src, dst, outdeg), reused every round
    val edgesDeg = graft.CacheScope.localCheckpoint(edges.join(deg, "src"))
    graft.CacheScope.unpersistCheckpoint(edges)
    val nodes = edgesDeg.select(col("src").as("node"))
      .union(edgesDeg.select(col("dst").as("node"))).distinct()
    // 1-row frame referenced every round — checkpointed so the node-set
    // distinct doesn't rerun per iteration
    val nTotal = graft.CacheScope.localCheckpoint(
      nodes.groupBy().agg(count(lit(1)).as("n")))
    // base = scale div |V|, attached as a column (no driver scalar)
    var r = graft.CacheScope.localCheckpoint(
      nodes.crossJoin(nTotal)
        .select(col("node"), expr(s"CAST($scale DIV n AS BIGINT)").as("base"))
        .withColumn("r", col("base")))
    // nodes with no outgoing edge: their whole rank is dangling mass each
    // round (1-row frames cross-joined on — no driver scalar, same pattern
    // as |V|). Sink-free graphs make this frame sum to 0 and the update
    // reduces to the plain recurrence.
    // derived from edgesDeg, NOT deg — deg's plan reads the `edges`
    // checkpoint freed above
    val sinkNodes = graft.CacheScope.localCheckpoint(
      nodes.join(edgesDeg.select(col("src").as("node")), Seq("node"), "left_anti"))
    var round = 0
    while (round < iters) {
      val inflow = edgesDeg
        .join(r.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"), expr("CAST(r DIV outdeg AS BIGINT)").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      val dangling = r.join(sinkNodes, Seq("node"), "left_semi")
        .groupBy().agg(coalesce(sum(col("r")), lit(0L)).as("dmass"))
      val next = graft.CacheScope.localCheckpoint(
        r.select(col("node"), col("base"))
          .join(inflow.select(col("dst").as("node"), col("inflow")), Seq("node"), "left")
          .crossJoin(dangling).crossJoin(nTotal)
          .select(col("node"), col("base"),
            expr("CAST((base * 15 + (coalesce(inflow, CAST(0 AS BIGINT)) + CAST(dmass DIV n AS BIGINT)) * 85) DIV 100 AS BIGINT)").as("r")))
      // round N-1's checkpoint has no consumer once round N is materialized
      graft.CacheScope.unpersistCheckpoint(r)
      r = next
      round += 1
    }
    r.select(col("node"), col("r"))
  }

  /** Undirected expansion: both directions of every (a, b). */
  def undirected(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
}
