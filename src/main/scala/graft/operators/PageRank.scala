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
  * Scale shape per iteration: the rank-to-edge equi-join (the rank frame
  * is |V| rows of two longs — AQE converts it to a broadcast join when it
  * fits, a shuffle join when it does not), then the inflow aggregation
  * keyed on `dst` (partial aggregation combines map-side, so a
  * 10⁸-in-degree hub costs one long per upstream partition, not a
  * shuffled row per edge), then the left join back onto the static node
  * frame. The static frames (edges ⋈ out-degrees; node/base/n) are
  * materialized exactly once; setup is two jobs — the node-set pass
  * derives the node universe AND the sink flag from one aggregation
  * (max over a src-side marker), replacing the separate distinct +
  * anti-join of the naive shape.
  *
  * Sink handling is a plan-time fork (r7 advice: amortize per-round job
  * overhead). One tiny probe (`isEmpty` of the zero-flag slice of the
  * checkpointed node frame) decides:
  *  - **sink-free** (every `PageRank.undirected` graph, and any graph
  *    where each node has ≥1 out-edge): the dangling term is identically
  *    zero, the recurrence is linear in the rank frame, and the rank frame
  *    is consumed exactly ONCE per round — so `unroll` rounds are chained
  *    into a single plan per materialization. Jobs drop from one per
  *    round to one per `unroll` rounds with zero duplicated work (no
  *    frame in the unrolled plan has two consumers).
  *  - **general** (sinks present): dangling mass is redistributed
  *    uniformly each round — canonical PageRank — which makes the rank
  *    frame a two-consumer frame (inflow join + dangling sum), so each
  *    round is checkpointed individually; unrolling here would re-execute
  *    the shared subplan 2^k times, a loss, not a win.
  * Both paths compute the identical integer recurrence (the general
  * update with dmass = 0 IS the fast-path update), so the fork can never
  * change a result — only the job count.
  *
  * No driver-side data: |V| enters the recurrence through a 1-row count
  * frame cross-joined onto the node set (the NgramLm pattern). The sink
  * probe reads zero data values — it is a plan-time emptiness test, the
  * same class of decision AQE makes from runtime statistics.
  *
  * Cluster-fault note: materializations go through
  * [[graft.CacheScope.localCheckpoint]], which honors the session's
  * `spark.graft.checkpoint.reliable` flag — set it (plus
  * `SparkContext.setCheckpointDir`) on a real cluster to make iterations
  * survive executor loss; see the CacheScope scaladoc for the tradeoff.
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
    *
    * `unroll`: on sink-free graphs, how many rounds to chain into one
    * materialization (lineage depth per checkpoint; bounds both job count
    * and recovery re-execution). Ignored when sinks are present.
    */
  def ranks(edges0: DataFrame, iters: Int, scale: Long = 1000000000000L,
      unroll: Int = 4): DataFrame = {
    require(iters >= 0)
    require(unroll >= 1)
    // NOT checkpointed: the two consumers below (deg's grouping and the
    // join's probe side) canonicalize to the same distinct subplan, so
    // exchange reuse computes it once inside the edgesDeg job — a separate
    // eager checkpoint of the raw edge set would only add a job.
    val edges = edges0.select(col("src"), col("dst")).distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // static per-edge frame: (src, dst, outdeg), reused every round
    val edgesDeg = graft.CacheScope.localCheckpoint(edges.join(deg, "src"))
    // node set + sink detection in ONE aggregation pass: a node has an
    // out-edge iff it appears on the src side, so max(has_out) per node
    // replaces the separate distinct + anti-join of the naive shape
    val nodeInfo = edgesDeg.select(col("src").as("node"), lit(1).as("has_out"))
      .union(edgesDeg.select(col("dst").as("node"), lit(0).as("has_out")))
      .groupBy(col("node")).agg(max(col("has_out")).as("has_out"))
    val nTotal = nodeInfo.groupBy().agg(count(lit(1)).as("n"))
    // static (node, base, n, has_out) frame: base = scale div |V| attached
    // as a column (no driver scalar); n rides along for the dangling
    // division in the general path
    val nodeBase = graft.CacheScope.localCheckpoint(
      nodeInfo.crossJoin(nTotal)
        .select(col("node"), expr(s"CAST($scale DIV n AS BIGINT)").as("base"),
          col("n"), col("has_out")))
    // plan-time probes over the checkpoint — emptiness of the sink slice,
    // and |V| to pick the rank-frame join strategy. Both are strategy
    // decisions from runtime statistics (the same class of decision AQE
    // makes), not data entering the result.
    val sinkFree = nodeBase.filter(col("has_out") === 0).isEmpty
    // take(1), not head(): an empty edge set has no node rows (both paths
    // then run vacuously over empty frames and return an empty result)
    val nNodes = nodeBase.select(col("n")).take(1).headOption.map(_.getLong(0)).getOrElse(0L)
    // the rank frame is |V| rows of two longs; under ~2M nodes (~32 MB)
    // broadcasting it beats re-exchanging the |E|-row edge frame every
    // round. Above that, leave both sides to AQE's shuffle-join planning.
    val bcastRanks = nNodes <= 2000000L
    if (sinkFree) rankSinkFree(edgesDeg, nodeBase, iters, unroll, bcastRanks)
    else rankGeneral(edgesDeg, nodeBase, iters, bcastRanks)
  }

  /** [[ranks]] over an UNDIRECTED pair set — same integer recurrence, same
    * result as `ranks(undirected(pairs))`, with the setup work the
    * undirected structure makes redundant removed (guide §2.3/§2.4: shuffle
    * fewer bytes, remove shuffles outright):
    *
    *  - the edge dedup runs over the PAIR set BEFORE doubling (pairs are
    *    normalized to (least, greatest) so a pair arriving in both
    *    orientations dedups to one undirected edge, exactly as
    *    `undirected(...).distinct()` would) — half the exchange rows of
    *    dedup-after-double, and one scan of the input instead of two;
    *  - both directions exist for every edge, so every incident node
    *    appears on the src side: the node universe is `distinct(src)` over
    *    the edge frame — the two-leg union + max(has_out) aggregation of
    *    the general path is redundant;
    *  - a node with an in-edge always has the reverse out-edge, so sinks
    *    cannot exist: the sink probe is skipped and the single-consumer
    *    unrolled recurrence ([[rankSinkFree]]) applies unconditionally.
    *
    * Each bullet is a structural identity of the doubled frame, not an
    * approximation — the outputs are bit-identical (PageRankSpec pins
    * equality against `ranks(undirected(...))`).
    */
  def ranksUndirected(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int, scale: Long = 1000000000000L, unroll: Int = 4): DataFrame = {
    require(iters >= 0)
    require(unroll >= 1)
    val und = pairs
      .select(least(col(aCol), col(bCol)).as("lo"), greatest(col(aCol), col(bCol)).as("hi"))
      .distinct()
    // doubling a distinct normalized pair set yields a distinct edge set
    // (the two legs can only collide on lo = hi, excluded from leg 2)
    val edges = und.select(col("lo").as("src"), col("hi").as("dst"))
      .unionAll(und.filter(col("lo") =!= col("hi"))
        .select(col("hi").as("src"), col("lo").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesDeg = graft.CacheScope.localCheckpoint(edges.join(deg, "src"))
    val nodeInfo = edgesDeg.select(col("src").as("node")).distinct()
    val nTotal = nodeInfo.groupBy().agg(count(lit(1)).as("n"))
    val nodeBase = graft.CacheScope.localCheckpoint(
      nodeInfo.crossJoin(nTotal)
        .select(col("node"), expr(s"CAST($scale DIV n AS BIGINT)").as("base"), col("n")))
    val nNodes = nodeBase.select(col("n")).take(1).headOption.map(_.getLong(0)).getOrElse(0L)
    val bcastRanks = nNodes <= 2000000L
    rankSinkFree(edgesDeg, nodeBase, iters, unroll, bcastRanks)
  }

  /** One shuffle per round, rank frame single-consumer → `unroll` rounds
    * per materialization with no duplicated subplan.
    */
  private def rankSinkFree(edgesDeg: DataFrame, nodeBase: DataFrame,
      iters: Int, unroll: Int, bcastRanks: Boolean): DataFrame = {
    var r = nodeBase.select(col("node"), col("base").as("r"))
    var lastCp: Option[DataFrame] = None
    var round = 0
    var sinceCp = 0
    while (round < iters) {
      val rSel = r.select(col("node").as("src"), col("r"))
      val inflow = edgesDeg
        .join(if (bcastRanks) broadcast(rSel) else rSel, "src")
        .select(col("dst"), expr("CAST(r DIV outdeg AS BIGINT)").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      val inflowSel = inflow.select(col("dst").as("node"), col("inflow"))
      r = nodeBase
        .join(if (bcastRanks) broadcast(inflowSel) else inflowSel, Seq("node"), "left")
        .select(col("node"),
          expr("CAST((base * 15 + coalesce(inflow, CAST(0 AS BIGINT)) * 85) DIV 100 AS BIGINT)")
            .as("r"))
      round += 1
      sinceCp += 1
      if (sinceCp >= unroll || round == iters) {
        val cp = graft.CacheScope.localCheckpoint(r)
        // the previous checkpoint has no consumer once this one exists
        lastCp.foreach(graft.CacheScope.unpersistCheckpoint)
        lastCp = Some(cp)
        r = cp
        sinceCp = 0
      }
    }
    r.select(col("node"), col("r"))
  }

  /** Canonical dangling-mass redistribution: the rank frame feeds both the
    * inflow join and the dangling sum (1-row frame cross-joined on — no
    * driver scalar, same pattern as |V|), so each round materializes.
    */
  private def rankGeneral(edgesDeg: DataFrame, nodeBase: DataFrame,
      iters: Int, bcastRanks: Boolean): DataFrame = {
    // filter over the checkpointed static frame — no extra materialization
    val sinkNodes = nodeBase.filter(col("has_out") === 0).select(col("node"))
    var r = nodeBase.select(col("node"), col("base").as("r"))
    var lastCp: Option[DataFrame] = None
    var round = 0
    while (round < iters) {
      val rSel = r.select(col("node").as("src"), col("r"))
      val inflow = edgesDeg
        .join(if (bcastRanks) broadcast(rSel) else rSel, "src")
        .select(col("dst"), expr("CAST(r DIV outdeg AS BIGINT)").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      val dangling = r
        .join(if (bcastRanks) broadcast(sinkNodes) else sinkNodes, Seq("node"), "left_semi")
        .groupBy().agg(coalesce(sum(col("r")), lit(0L)).as("dmass"))
      val inflowSel = inflow.select(col("dst").as("node"), col("inflow"))
      val next = graft.CacheScope.localCheckpoint(
        nodeBase
          .join(if (bcastRanks) broadcast(inflowSel) else inflowSel, Seq("node"), "left")
          .crossJoin(dangling)
          .select(col("node"),
            expr("CAST((base * 15 + (coalesce(inflow, CAST(0 AS BIGINT)) + CAST(dmass DIV n AS BIGINT)) * 85) DIV 100 AS BIGINT)")
              .as("r")))
      lastCp.foreach(graft.CacheScope.unpersistCheckpoint)
      lastCp = Some(next)
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
