package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SketchesSpec extends AnyFunSuite with SparkTestBase {

  test("ngramTop: exact bigram counts, short docs contribute nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"), // bigrams: [a b] [b a] [a b] [b c]
      (2L, "a b"),       // [a b]
      (3L, "x"),         // too short for bigrams
      (4L, "")
    ).toDF("doc_id", "text")
    val got = Sketches.ngramTop(docs, "text", n = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // count-desc, then ngram-asc for the tied 1-counts
    assert(got == List(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("ngramTop bounded path ≡ exact in both regimes (certified and fallback)") {
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toList
    // certified regime: a 3-gram heavy head (a b / b c / c a) over a long
    // unique tail, capacity far below the distinct universe — pass-1 MG
    // decrements fire, yet the k-th count clears N/(capacity+1)
    val skewed = (1 to 400).map(i => (i.toLong, s"a b c a b c a b c u$i v$i"))
      .toDF("doc_id", "text").repartition(7)
    for (k <- Seq(1, 3)) {
      val exact = canon(Sketches.ngramTopExact(skewed, "text", n = 2, k))
      val bounded = canon(Sketches.ngramTop(skewed, "text", n = 2, k, capacity = 16))
      assert(bounded == exact, s"certified regime diverged at k=$k")
    }
    // flat regime: every bigram unique → the k-th count (1) can never beat
    // N/(capacity+1); the bounded path must fall back and still agree
    val flat = (1 to 300).map(i => (i.toLong, s"a$i b$i")).toDF("doc_id", "text")
    assert(canon(Sketches.ngramTop(flat, "text", n = 2, k = 5, capacity = 8)) ==
      canon(Sketches.ngramTopExact(flat, "text", n = 2, k = 5)))
  }

  test("inverted index: postings sorted by doc, tf exact, cap keeps prefix") {
    import spark.implicits._
    val docs = Seq(
      (3L, "b a b"),
      (1L, "a b a"),
      (2L, "a x")
    ).toDF("doc_id", "text")
    val rows = TextOps.invertedIndex(docs, "text", "doc_id")
      .collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getSeq[org.apache.spark.sql.Row](3).map(p => (p.getLong(0), p.getLong(1))))
      }.toMap
    assert(rows("a") == ((3L, 4L, Seq((1L, 2L), (2L, 1L), (3L, 1L)))))
    assert(rows("b") == ((2L, 3L, Seq((1L, 1L), (3L, 2L)))))
    assert(rows("x") == ((1L, 1L, Seq((2L, 1L)))))
    val capped = TextOps.invertedIndex(docs, "text", "doc_id", maxPostings = 2)
      .filter(col("term") === "a").collect().head
    assert(capped.getLong(1) == 3L && capped.getLong(2) == 4L) // df/tf exact
    assert(capped.getSeq[org.apache.spark.sql.Row](3).map(_.getLong(0)) == Seq(1L, 2L))
  }

  test("heavy hitters exact regime: capacity >= distinct equals true counts") {
    import spark.implicits._
    val docs = (1 to 50).map(i =>
      (i.toLong, if (i % 5 == 0) "common rare" else "common common other"))
      .toDF("doc_id", "text").repartition(8) // force multi-partition merge
    val got = Sketches.heavyHitters(docs, "text", capacity = 16, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // common: 40 docs x 2 + 10 docs x 1 = 90; other: 40; rare: 10
    assert(got == List(("common", 90L), ("other", 40L), ("rare", 10L)))
  }

  test("heavy hitters approximate regime: undercount bounded by N/(cap+1)") {
    import spark.implicits._
    // 26 distinct tokens, capacity 8: heavy token must survive with a
    // count no lower than true - N/(capacity+1)
    val heavy = Seq.fill(200)("zz")
    val noise = (0 until 26).flatMap(i => Seq.fill(10)(('a' + i).toChar.toString))
    val docs = scala.util.Random.shuffle(heavy ++ noise).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .repartition(4)
    val n = 200 + 26 * 10
    val got = Sketches.heavyHitters(docs, "text", capacity = 8, k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.contains("zz"))
    assert(got("zz") <= 200L && got("zz") >= 200L - n / 9L)
  }

  test("count-min estimates: never below exact, exact when width avoids collisions") {
    import spark.implicits._
    // 100 distinct keys with skewed frequencies (key i appears i+1 times)
    val rows = (0 until 100).flatMap(i => Seq.fill(i + 1)(i.toLong))
      .zipWithIndex.map { case (k, j) => (j.toLong, k) }.toDF("row_id", "key")
    val exact = (0 until 100).map(i => i.toString -> (i + 1L)).toMap
    // tiny width forces collisions: estimates may overcount, never under
    val tight = Sketches.cmsEstimates(rows, col("key"), depth = 3, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight.keySet == exact.keySet)
    exact.foreach { case (k, n) => assert(tight(k) >= n, s"undercount at $k") }
    assert(tight.exists { case (k, n) => n > exact(k) }) // collisions really happened
    // generous width: every estimate lands exact with high probability
    val wide = Sketches.cmsEstimates(rows, col("key"), depth = 5, width = 8192)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == exact)
    // the gate-facing contract frame is empty even under heavy collision
    assert(Sketches.cmsBoundViolations(rows, col("key"), depth = 3, width = 16).isEmpty)
  }

  test("quantile bound violations: empty at honest accuracy") {
    import spark.implicits._
    val vals = (1 to 10000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    assert(Sketches.quantileBoundViolations(vals, col("v"),
      qs = Seq(0.1, 0.5, 0.9, 0.99), accuracy = 50).isEmpty)
  }

  test("quantile bound violations: a point mass at the answer does not false-positive") {
    import spark.implicits._
    // 10k identical values: every quantile answers the mass point and
    // count(v <= a) = n vastly exceeds the window top — only the STRICT
    // count may drive the upper check (the r3 advisor finding)
    val mass = (1 to 10000).map(i => (i.toLong, 42.0)).toDF("id", "v")
    assert(Sketches.quantileBoundViolations(mass, col("v"),
      qs = Seq(0.1, 0.5, 0.9), accuracy = 100).isEmpty)
  }

  test("CMS sketch merge: folded per-part sketches estimate exactly like the whole") {
    import spark.implicits._
    val rows = (1 to 6000).map(i => (i.toLong, s"k${i % 97}")).toDF("id", "key")
    val parts = Seq(
      rows.filter(col("id") % 3 === 0),
      rows.filter(col("id") % 3 === 1),
      rows.filter(col("id") % 3 === 2))
    // tight width so collisions definitely occur — linearity must hold
    // exactly even through colliding buckets
    val merged = Sketches.cmsMergeSketches(
      parts.map(p => Sketches.cmsSketch(p, col("key"), depth = 3, width = 16)))
    val viaMerge = Sketches.cmsEstimateFromSketch(merged, rows, col("key"), depth = 3, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.cmsEstimates(rows, col("key"), depth = 3, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaMerge == direct)
    // the gate-facing contract frame agrees
    assert(Sketches.cmsMergeViolations(parts, col("key"), depth = 3, width = 16).isEmpty)
    // an item whose buckets the sketch provably never touched estimates
    // EXACTLY 0 (missing buckets count 0, not null). Needs a SPARSE sketch
    // — at width 16 the 97-key sketch occupies every bucket — so build one
    // from 3 items at width 8192 and pick a probe whose (d, b) keys are
    // verifiably disjoint from the occupied set
    val sparse = Sketches.cmsSketch(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "key"),
      col("key"), depth = 3, width = 8192)
    val occupied = sparse.select(col("d"), col("b"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val candidates = (0 until 50).map(i => s"unseen-$i")
    val candBuckets = candidates.toDF("item")
      .select(col("item"), explode(array((0 until 3).map(d =>
        struct(lit(d).as("d"), pmod(xxhash64(col("item"), lit(d)), lit(8192L)).as("b"))): _*)).as("k"))
      .select(col("item"), col("k.d"), col("k.b"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSet).toMap
    val item = candidates.find(c => candBuckets(c).intersect(occupied).isEmpty)
      .getOrElse(fail("no bucket-disjoint probe among 50 candidates at width 8192"))
    val est = Sketches.cmsEstimateFromSketch(
      sparse, Seq((1L, item)).toDF("id", "key"), col("key"), depth = 3, width = 8192)
      .collect().head.getLong(1)
    assert(est == 0L, s"untouched-bucket probe '$item' must estimate 0, got $est")
  }

  test("CMS join cardinality: inner-product estimate never below exact, exact at generous width") {
    import spark.implicits._
    // a: key k appears k times (k=1..10); b: each key twice → exact join
    // size = Σ k·2 = 110
    val a = (1 to 10).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val b = (1 to 10).flatMap(k => Seq.fill(2)(k.toLong)).toDF("k")
    val exact = 110L
    def est(width: Int): Long = Sketches.cmsJoinCardinality(
      Sketches.cmsSketch(a, col("k"), depth = 5, width = width),
      Sketches.cmsSketch(b, col("k"), depth = 5, width = width))
      .collect().head.getLong(0)
    // generous width: 10 keys across 4096 buckets × 5 rows — collision-free
    // in at least one row on this fixed hash family → exact
    assert(est(4096) == exact)
    // starved width (2 buckets): collisions only ADD — still an upper bound
    assert(est(2) >= exact)
    // and the contract frame is empty at production parameters
    assert(Sketches.cmsJoinCardinalityViolations(
      a, b, col("k"), col("k"), depth = 5, width = 1024).isEmpty)
  }

  test("HLL slice sketches: union of per-slice sketches estimates exactly like the whole") {
    import spark.implicits._
    // 3 slices, overlapping user sets (the union must NOT double-count
    // cross-slice repeats — the whole point of sketch algebra over rows)
    val events = (0 until 3000).map { i =>
      (s"slice${i % 3}", (i % 500).toLong) // 500 distinct users, all in every slice
    }.toDF("day", "user_id")
    val merged = Sketches.hllUnionEstimate(
      Sketches.hllSliceSketches(events, col("day"), col("user_id")))
      .collect().head.getLong(0)
    val whole = events.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .collect().head.getLong(0)
    // register-max (and coupon-set union) is associative: merging slice
    // sketches IS the sketch of the concatenated input
    assert(merged == whole)
    // and within the ≈3σ error band of the true 500 (measured 491 — the
    // estimator is biased-corrected, not exact, even at small cardinality)
    assert(math.abs(merged - 500L) * 1000 <= 500L * 50)
  }

  test("HLL slice bound contract: empty at the honest bound, trips when the sketch is starved") {
    import spark.implicits._
    val events = (0 until 20000).map(i => (s"s${i % 4}", i.toLong)).toDF("day", "user_id")
    assert(Sketches.hllSliceBoundViolations(events, col("day"), col("user_id")).isEmpty)
    // lgK=4 (16 registers) over 20k distinct: relative error far above 0 —
    // a zero-tolerance bound must trip (deterministic: fixed input)
    assert(!Sketches.hllSliceBoundViolations(
      events, col("day"), col("user_id"), lgK = 4, boundPctX10 = 0).isEmpty)
  }

  test("topKPerGroup equals the window row_number plan: random data, ties, k past group size") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // deterministic pseudo-random values WITH planted ties (v repeats mod 17)
    val rows = (1 to 2000).map { i =>
      (i % 37, i.toLong, ((i * 2654435761L) % 17L).toDouble)
    }.toDF("g", "id", "v")
      // small groups too: group 999 has a single row, exercising k > size
      .union(Seq((999, 100001L, 5.0)).toDF("g", "id", "v"))
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    for (k <- Seq(1, 3, 50)) {
      val want = canon(rows.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k).select("g", "id", "v", "rank"))
      val got = canon(Sketches.topKPerGroup(rows, Seq("g"), "v", "id", k)
        .select("g", "id", "v", "rank"))
      assert(got == want, s"k=$k")
    }
    // repartitioning (different partial-aggregation splits) never changes it
    val k3 = canon(Sketches.topKPerGroup(rows.repartition(17), Seq("g"), "v", "id", 3)
      .select("g", "id", "v", "rank"))
    assert(k3 == canon(rows.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3).select("g", "id", "v", "rank")))
  }
}
