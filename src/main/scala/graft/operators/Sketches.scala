package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Corpus-statistics operators: exact n-gram frequencies (the declarative
  * path — partial aggregation makes the shuffle carry one row per distinct
  * n-gram per partition) and a Misra–Gries heavy-hitters sketch (the
  * bounded-memory path for when the distinct universe itself is too large
  * to shuffle).
  */
object Sketches {

  /** All word n-grams of a token array, NON-distinct (each occurrence
    * counts — unlike [[TextOps.shingles]], whose distinctness is the set
    * semantics dedup wants). Short-doc guard: the `when` keeps `slice` off
    * negative lengths, returning the empty array.
    *
    * Construction note: `tokenArr` is referenced only at TOP level (n
    * slices + the size guard), never inside the per-element lambda. When a
    * caller passes a computed expression (`TextOps.tokens(col)`), Catalyst's
    * projection collapse inlines it at every reference site — a reference
    * inside `transform`'s lambda re-evaluates the whole tokenizer PER GRAM
    * (measured 26 s vs 5 s for the exact top-k at the 20× stress scale);
    * top-level references cost n+2 evaluations per ROW.
    */
  def ngramOccurrences(tokenArr: Column, n: Int): Column = {
    require(n >= 1)
    val m = size(tokenArr) - (n - 1)
    val grams =
      if (n == 1) tokenArr
      else {
        // arrays_zip names non-attribute children positionally: "0".."n-1"
        val zipped = arrays_zip((0 until n).map(j => slice(tokenArr, lit(j + 1), m)): _*)
        transform(zipped,
          s => concat_ws(" ", (0 until n).map(j => s.getField(j.toString)): _*))
      }
    when(m > 0, grams).otherwise(array().cast("array<string>"))
  }

  /** Exact corpus-wide top-k n-grams by occurrence count, total-ordered
    * (count desc, n-gram asc) so the cut at k is deterministic.
    *
    * Scale shape: explode → hash aggregate. Partial (map-side) aggregation
    * means the shuffle moves one row per distinct n-gram per input
    * partition, not one per occurrence; the final top-k is a
    * TakeOrdered over the aggregated frame — no global sort materialized.
    * On an open-vocabulary corpus the shuffle still carries the FULL
    * distinct n-gram universe (one row per distinct gram per partition) —
    * prefer [[ngramTop]], which bounds that exchange and falls back here
    * only when it cannot certify the cut.
    */
  def ngramTopExact(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs
      .select(explode(ngramOccurrences(TextOps.tokens(col(textCol)), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(k)

  /** Corpus-wide top-k n-grams with a BOUNDED exchange — same answer as
    * [[ngramTopExact]], certified.
    *
    * Two passes over the gram stream (one scan when a [[graft.CacheScope]]
    * is open): (1) a Misra–Gries summary of `capacity` counters nominates
    * candidates — the shuffle carries at most `capacity` counters per map
    * partition instead of the full distinct universe; (2) the ≤ `capacity`
    * survivors are exactly recounted through a broadcast semi-join, so the
    * second shuffle is candidate-bounded too. The summary guarantees every
    * gram with true count > N/(capacity+1) survives pass 1; when the k-th
    * recounted candidate beats that bound — checked on the collected ≤ k
    * result rows, never the corpus — no absent gram can belong in the
    * top-k and the answer is PROVABLY the exact one. A distribution too
    * flat to certify (k-th count ≤ N/(capacity+1)) falls back to
    * [[ngramTopExact]]: correctness never degrades, only the exchange
    * bound. Raise `capacity` to widen the certified regime.
    */
  def ngramTop(docs: DataFrame, textCol: String, n: Int, k: Int,
      capacity: Int = 4096): DataFrame = {
    require(capacity >= k, s"capacity $capacity < k $k cannot certify a top-$k cut")
    val spark = docs.sparkSession
    import spark.implicits._
    // all corpus-side actions complete inside this call (only the ≤ k
    // collected rows escape), so a private scope pins the tokenized corpus
    // across the passes without leaking a cache entry — a caller's outer
    // scope just nests. Persisting TOKENS (not grams) keeps the cache at
    // corpus token size and makes every gram build read an attribute, which
    // projection collapse cannot inline (see [[ngramOccurrences]]).
    val (top, total) = graft.CacheScope.withScope {
      val toks = graft.CacheScope.persistIfScoped(
        docs.select(TextOps.tokens(col(textCol)).as("toks")))
      val grams = toks.select(ngramOccurrences(col("toks"), n).as("grams"))
      val candidates = grams.as[Seq[String]]
        .select(new MisraGriesAgg(capacity).toColumn)
        .flatMap(_.keys.toSeq).toDF("ngram")
      val t = grams.select(explode(col("grams")).as("ngram"))
        .join(broadcast(candidates), Seq("ngram"), "left_semi")
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram").asc)
        .limit(k)
        .collect() // bounded: ≤ k rows
      // N from token counts alone — no gram strings built for this pass
      val tot = toks
        .select(coalesce(sum(greatest(size(col("toks")) - (n - 1), lit(0))), lit(0L)))
        .as[Long].head()
      (t, tot)
    }
    val certified = total == 0L ||
      (top.length == k && top.last.getLong(1) * (capacity + 1L) > total)
    if (certified)
      spark.createDataFrame(
        spark.sparkContext.parallelize(top.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ngram",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType, nullable = false))))
    else ngramTopExact(docs, textCol, n, k)
  }

  /** Misra–Gries frequency summary: at most `capacity` counters per
    * partition, merged pairwise (Agarwal et al., "Mergeable Summaries",
    * PODS'12: sum counters, subtract the (capacity+1)-th largest, drop
    * non-positive). Each stored count undercounts by at most
    * N/(capacity+1); every token with true frequency above that bound is
    * guaranteed present. When `capacity` ≥ the distinct-token count the
    * decrement branches never fire and the summary is EXACT — the regime
    * the oracle pins (`t_heavy_hitters`); production use on open
    * vocabularies is the approximate regime, where shuffling the full
    * distinct universe (ngramTop's shape) is what this avoids.
    */
  class MisraGriesAgg(capacity: Int)
      extends Aggregator[Seq[String], scala.collection.mutable.HashMap[String, Long],
        Map[String, Long]] {
    require(capacity > 0)
    private type Buf = scala.collection.mutable.HashMap[String, Long]
    override def zero: Buf = new scala.collection.mutable.HashMap[String, Long]

    // The Aggregator contract allows reduce/merge to MUTATE the buffer and
    // return it (object-hash aggregation keeps buffers live per partition) —
    // copying a capacity-sized map per input row was an O(capacity · rows)
    // head that dominated the r6 stress receipt.
    override def reduce(m: Buf, tokens: Seq[String]): Buf = {
      tokens.foreach { t =>
        m.get(t) match {
          case Some(c) => m.update(t, c + 1L)
          case None if m.size < capacity => m.update(t, 1L)
          case None => // decrement-all step: the new token and one unit of
            // every stored counter annihilate; zeros drop out
            m.mapValuesInPlace((_, c) => c - 1L)
            m.filterInPlace((_, c) => c > 0L)
        }
      }
      m
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val (into, from) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
      from.foreach { case (t, c) => into.update(t, into.getOrElse(t, 0L) + c) }
      if (into.size > capacity) {
        // (capacity+1)-th largest count; subtracting it leaves at most
        // `capacity` strictly-positive counters
        val cut = into.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        into.mapValuesInPlace((_, c) => c - cut)
        into.filterInPlace((_, c) => c > 0L)
      }
      into
    }

    override def finish(m: Buf): Map[String, Long] = m.toMap
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** Bounded-buffer per-group top-k: the buffer holds at most k (ord, id)
    * pairs, kept sorted ord-descending with id-ascending tie-break. Because
    * an Aggregator participates in PARTIAL aggregation, the shuffle carries
    * at most k rows per group per map partition — where the window
    * `row_number() <= k` plan shuffles EVERY row so each whole group can be
    * sorted on one reducer. At corpus scale with small k that is the
    * difference between a k-bounded exchange and a full-table one; the
    * window plan remains right when k ~ group size (the buffer insert stops
    * paying for itself).
    */
  class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0)
    private val ord = Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
      if (b.lengthCompare(k) >= 0 && ord.gteq(x, b.last)) b // below the cut
      else {
        val (before, after) = b.span(ord.lt(_, x))
        (before ::: x :: after).take(k)
      }
    override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] = {
      // merge two ≤k sorted lists, keep the k best
      val out = List.newBuilder[(Double, Long)]
      var (x, y, n) = (a, b, 0)
      while (n < k && (x.nonEmpty || y.nonEmpty)) {
        if (y.isEmpty || (x.nonEmpty && ord.lteq(x.head, y.head))) {
          out += x.head; x = x.tail
        } else { out += y.head; y = y.tail }
        n += 1
      }
      out.result()
    }
    override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      Encoders.kryo[List[(Double, Long)]]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top `k` rows per group by `ordCol` (descending; ties break by `idCol`
    * ascending), via [[TopKAgg]]'s k-bounded partial aggregation. Output:
    * `groupCols…, idCol, ordCol (as double), rank` (1-based). Equivalent to
    * the `row_number() <= k` window — oracle-gated as w9_topk_group — with
    * the shuffle bounded at k per (group, map partition) instead of the
    * whole table.
    */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String], ordCol: String, idCol: String,
      k: Int): DataFrame = {
    require(groupCols.nonEmpty)
    val topk = udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    df.groupBy(groupCols.map(col): _*)
      .agg(topk(col(ordCol).cast("double"), col(idCol).cast("long")).as("_top"))
      .select(groupCols.map(col) :+ posexplode(col("_top")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("col._2").as(idCol), col("col._1").as(ordCol),
        (col("pos") + 1L).cast("long").as("rank")): _*)
  }

  /** Top-k tokens by Misra–Gries summary count (see [[MisraGriesAgg]] for
    * the exact-vs-approximate regimes), total-ordered like [[ngramTop]].
    */
  def heavyHitters(docs: DataFrame, textCol: String, capacity: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val summary: org.apache.spark.sql.Dataset[Map[String, Long]] = docs
      .select(TextOps.tokens(col(textCol)).as("toks"))
      .as[Seq[String]]
      .select(new MisraGriesAgg(capacity).toColumn)
    summary
      .flatMap(_.toSeq)
      .toDF("token", "n")
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
  }

  /** Count-min sketch as a DataFrame plan: `depth` hash rows × `width`
    * buckets, estimate = min over rows of the item's bucket count. Estimates
    * are biased HIGH, never low — the classic one-sided guarantee
    * (overcount ≤ 2N/width with probability 1 - 2^-depth).
    *
    * Unlike Spark's built-in `count_min_sketch` (an opaque binary blob the
    * driver must deserialize), the sketch here IS a DataFrame of at most
    * depth×width rows, so building it shuffles bounded keys regardless of
    * corpus size, it joins/unions like any table, and two sketches merge by
    * summing bucket counts — the mergeable-summary shape a 100 TB ingest
    * wants. Returns one (item, est) row per distinct item in `df`.
    */
  def cmsEstimates(df: DataFrame, itemCol: Column, depth: Int, width: Int): DataFrame =
    cmsEstimatesFromCounts(itemExactCounts(df, itemCol), depth, width)
      .select(col("item"), col("est"))

  /** ONE aggregation pass over the raw input; everything downstream (sketch
    * buckets, probes, exact comparisons) derives from this small
    * (item, exact_n) table. Persisted only when a [[graft.CacheScope]] is
    * open (the harness/service shape — freed at scope close): the derived
    * plan references it more than once, so the persist pins one input scan.
    * A scope-less caller gets plan-level re-evaluation instead of an
    * unreclaimable cache entry — never a leak.
    */
  private def itemExactCounts(df: DataFrame, itemCol: Column): DataFrame =
    graft.CacheScope.persistIfScoped(
      df.select(itemCol.cast("string").as("item"))
        .groupBy(col("item")).agg(count(lit(1)).as("exact_n")))

  /** The (d, b) bucket keys of an item — THE wire contract between a
    * persisted sketch and every future probe, so it exists exactly once:
    * a drifted copy (seed, width cast, mod variant) would silently probe
    * wrong buckets of a stored sketch.
    */
  private def cmsBucketKeys(depth: Int, width: Int): Column = {
    require(depth >= 1 && width >= 1)
    explode(array((0 until depth).map(d =>
      struct(lit(d).as("d"),
        pmod(xxhash64(col("item"), lit(d)), lit(width.toLong)).as("b"))): _*))
  }

  private def cmsEstimatesFromCounts(counts: DataFrame, depth: Int, width: Int): DataFrame = {
    val keyed = counts.select(col("item"), col("exact_n"), cmsBucketKeys(depth, width).as("k"))
      .select(col("item"), col("exact_n"), col("k.d").as("d"), col("k.b").as("b"))
    // the sketch: ≤ depth×width rows however large the input — bucket
    // counts are SUMS of the pre-aggregated per-item counts, identical to
    // counting raw occurrences
    val buckets = keyed.groupBy(col("d"), col("b")).agg(sum(col("exact_n")).as("c"))
    keyed
      .join(buckets, Seq("d", "b"))
      .groupBy(col("item"), col("exact_n"))
      .agg(min(col("c")).as("est"))
  }

  /** Zero-violation contract frame for [[cmsEstimates]]: rows where the
    * sketch UNDER-estimates an exact count — by construction there are
    * none, and the correctness gate hash-checks the emptiness (a
    * distributed invariant the DuckDB oracle can state as `WHERE false`).
    */
  def cmsBoundViolations(df: DataFrame, itemCol: Column, depth: Int, width: Int): DataFrame =
    cmsEstimatesFromCounts(itemExactCounts(df, itemCol), depth, width)
      .filter(col("est") < col("exact_n"))
      .select(col("item"), col("est"), col("exact_n"))

  // ------------------------------------------------------- mergeable sketch

  /** The count-min sketch ITSELF as a table: (d, b, c) bucket counts,
    * ≤ depth×width rows however large the input. This is the persisted /
    * shipped face of the sketch for incremental ingest: build one per
    * batch/day/shard, store it like any table, merge with
    * [[cmsMergeSketches]], probe with [[cmsEstimateFromSketch]] — the
    * corpus is never re-read.
    */
  def cmsSketch(df: DataFrame, itemCol: Column, depth: Int, width: Int): DataFrame =
    itemExactCounts(df, itemCol)
      .select(col("item"), col("exact_n"), cmsBucketKeys(depth, width).as("k"))
      .groupBy(col("k.d").as("d"), col("k.b").as("b"))
      .agg(sum(col("exact_n")).as("c"))

  /** Merge sketches built with the SAME (depth, width): bucket counts are
    * linear, so summing them gives EXACTLY the sketch of the concatenated
    * input — the mergeable-summaries property that lets a 100 TB ingest
    * sketch each arriving batch independently and fold.
    */
  def cmsMergeSketches(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty)
    sketches.reduce(_ unionByName _).groupBy(col("d"), col("b")).agg(sum(col("c")).as("c"))
  }

  /** Estimates for the distinct items of `probe` against a prebuilt sketch
    * table (buckets a probed item never touched count 0 — the sketch of an
    * empty stream estimates everything at 0).
    */
  def cmsEstimateFromSketch(
      sketch: DataFrame, probe: DataFrame, itemCol: Column, depth: Int, width: Int): DataFrame =
    estimateForItems(sketch, probe.select(itemCol.cast("string").as("item")).distinct(),
      depth, width)

  /** Probe a sketch for a prepared distinct (item) frame. Buckets the
    * sketch never touched count 0 — note this makes a NEVER-SEEN item
    * estimate 0 only when ALL its buckets are untouched; colliding buckets
    * overestimate, per the usual one-sided CMS guarantee.
    */
  private def estimateForItems(
      sketch: DataFrame, items: DataFrame, depth: Int, width: Int): DataFrame =
    items
      .select(col("item"), cmsBucketKeys(depth, width).as("k"))
      .select(col("item"), col("k.d").as("d"), col("k.b").as("b"))
      .join(sketch, Seq("d", "b"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  /** Zero-violation mergeability contract: estimates probed against the
    * MERGE of per-part sketches must equal estimates against the sketch of
    * the whole — exactly, because bucket counts are linear in the input.
    * Provably empty; the gate hash-checks emptiness (`WHERE false` in the
    * oracle). This is the invariant an incremental ingest leans on when it
    * folds daily sketches instead of resketching history.
    */
  def cmsMergeViolations(
      parts: Seq[DataFrame], itemCol: Column, depth: Int, width: Int): DataFrame = {
    require(parts.nonEmpty)
    val whole = parts.reduce(_ unionByName _)
    val merged = cmsMergeSketches(parts.map(p => cmsSketch(p, itemCol, depth, width)))
    // ONE aggregation of the concatenated input feeds both sides: the
    // direct estimates derive from it, and its item set is the probe set
    val counts = itemExactCounts(whole, itemCol)
    val direct = estimateForItems(merged, counts.select(col("item")), depth, width)
      .withColumnRenamed("est", "est_merged")
      .withColumnRenamed("item", "item_m")
    cmsEstimatesFromCounts(counts, depth, width)
      .select(col("item"), col("est").as("est_full"))
      // null-SAFE join: a NULL item hashes deterministically and estimates
      // on both sides — EqualTo would strand the two null rows unmatched
      // and fabricate a violation out of nothing
      .join(direct, col("item") <=> col("item_m"), "full_outer")
      .filter(col("est_full") =!= col("est_merged") ||
        col("est_full").isNull || col("est_merged").isNull)
      .select(coalesce(col("item"), col("item_m")).as("item"),
        col("est_merged"), col("est_full"))
  }

  /** Zero-violation contract frame for `percentile_approx`: for each
    * requested quantile q, the number of values ≤ the approximate answer
    * must sit within the rank window n·(q ± 1/accuracy) the KLL-style
    * sketch guarantees. Emits one row per violated quantile — none, and the
    * gate checks emptiness.
    */
  def quantileBoundViolations(
      df: DataFrame, valueCol: Column, qs: Seq[Double], accuracy: Int): DataFrame = {
    require(qs.nonEmpty && accuracy >= 1)
    val vals = df.select(valueCol.cast("double").as("v")).filter(col("v").isNotNull)
    val approx = vals.agg(
      percentile_approx(col("v"),
        array(qs.map(lit): _*), lit(accuracy)).as("av"),
      count(lit(1)).as("n"))
      .select(explode(arrays_zip(array(qs.map(lit): _*).as("q"), col("av").as("a"))).as("z"),
        col("n"))
      .select(col("z.q").as("q"), col("z.a").as("a"), col("n"))
    val eps = 1.0 / accuracy
    // rank-window checks with TIES handled asymmetrically: the sketch
    // guarantees SOME rank in [floor((q-eps)n), ceil((q+eps)n)] maps to the
    // answer `a`. count(v <= a) is the LARGEST rank of a; count(v < a) + 1
    // the smallest. With a point mass at a, count(v <= a) legitimately
    // exceeds the window's top (every tie sits at/below a), so the upper
    // check must use the STRICT count: only when even the smallest rank of
    // a (strictly-below count) clears the ceiling is the answer truly out
    // of window. Symmetrically the lower check keeps count(v <= a).
    vals.join(approx)
      .groupBy(col("q"), col("a"), col("n"))
      .agg(sum(when(col("v") <= col("a"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("v") < col("a"), 1L).otherwise(0L)).as("n_strictly_below"))
      // smallest rank of a = n_strictly_below + 1; it clears the ceiling
      // iff n_strictly_below + 1 > ceil(...) ⟺ n_strictly_below >= ceil(...)
      .filter(col("n_below") < floor((col("q") - eps) * col("n")) ||
        col("n_strictly_below") >= ceil((col("q") + eps) * col("n")))
      .select(col("q"), col("n_below"), col("n"))
  }

  /** Equi-join output-cardinality estimate from two CMS sketch tables built
    * with the SAME (depth, width): for each depth row the bucket-wise inner
    * product Σ_b a[d][b]·b[d][b] upper-bounds the true join size
    * Σ_key cnt_a(key)·cnt_b(key) (every colliding pair only ADDS — the
    * one-sided CMS guarantee lifted to inner products, Cormode & Muthu §4.2);
    * the estimate is the MIN over depth rows. The join-planning guardrail:
    * two MB-scale sketch tables answer "would this join explode?" without
    * touching either input — if even the upper bound is small, the join is
    * safe to run as-is; build sides at ingest like any sketch table.
    */
  def cmsJoinCardinality(sketchA: DataFrame, sketchB: DataFrame): DataFrame =
    sketchA.join(sketchB.withColumnRenamed("c", "c2"), Seq("d", "b"))
      .groupBy(col("d")).agg(sum(col("c") * col("c2")).as("ip"))
      .agg(min(col("ip")).as("est_join_rows"))

  /** Zero-violation contract for [[cmsJoinCardinality]]: the estimate must
    * never be BELOW the exact join cardinality. Provably-empty frame; the
    * gate hash-checks emptiness.
    */
  def cmsJoinCardinalityViolations(
      a: DataFrame, b: DataFrame, aKey: Column, bKey: Column,
      depth: Int, width: Int): DataFrame = {
    val est = cmsJoinCardinality(
      cmsSketch(a, aKey, depth, width), cmsSketch(b, bKey, depth, width))
    val exact = a.select(aKey.cast("string").as("item"))
      .join(b.select(bKey.cast("string").as("item")), Seq("item"))
      .agg(count(lit(1)).as("exact_join_rows"))
    est.crossJoin(exact) // two 1-row frames
      .filter(col("est_join_rows") < col("exact_join_rows"))
      .select(col("est_join_rows"), col("exact_join_rows"))
  }

  // ------------------------------------------------------ HLL sketch tables

  /** Per-slice HLL sketch table: one row per slice holding a DataSketches
    * HLL sketch (binary) of the slice's distinct keys — the mergeable
    * pre-aggregation layer for "distinct users over ANY union of slices"
    * questions. Slices (days, sources, shards) sketch once at ingest into an
    * MB-scale table; every later cross-slice distinct-count is then an
    * algebra over sketch rows ([[hllUnionEstimate]]) that never re-scans the
    * corpus — the same persisted-summary pattern as [[cmsSketch]], via
    * Spark's built-in `hll_sketch_agg` (codegen'd, no UDF).
    */
  def hllSliceSketches(
      df: DataFrame, sliceCol: Column, keyCol: Column, lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK $lgK outside DataSketches' [4, 21]")
    df.groupBy(sliceCol.as("slice"))
      .agg(hll_sketch_agg(keyCol, lit(lgK)).as("hll"),
        count(lit(1)).as("n_rows"))
  }

  /** Distinct-count estimate over a UNION of slice sketches (optionally
    * filtered first): merge is exact over sketches — the union sketch is
    * identical to the sketch of the concatenated input — so the only error
    * is HLL's own (rse ≈ 1.04/√2^lgK; ~1.6% at lgK=12).
    */
  def hllUnionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
        .as("approx_distinct"))

  /** Zero-violation mergeability contract: the estimate from the merged
    * per-slice sketches must sit within `boundPctX10`/1000 (default 5%, ≈3σ
    * at lgK=12) of the EXACT global distinct count. Integer-scaled compare;
    * both sides deterministic over a fixed dataset, so a violation is a real
    * regression, not a flake. Emits (approx, exact) rows — provably none.
    */
  def hllSliceBoundViolations(
      df: DataFrame, sliceCol: Column, keyCol: Column,
      lgK: Int = 12, boundPctX10: Int = 50): DataFrame = {
    val merged = hllUnionEstimate(hllSliceSketches(df, sliceCol, keyCol, lgK))
    val exact = df.agg(countDistinct(keyCol).as("exact_distinct"))
    // both sides are 1-row frames — the cross join is a broadcast of one row
    merged.crossJoin(exact)
      .filter(abs(col("approx_distinct") - col("exact_distinct")) * 1000L >
        col("exact_distinct") * boundPctX10)
      .select(col("approx_distinct"), col("exact_distinct"))
  }
}
