package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel counts users per stage, in order only") {
    // u1 completes all three in order; u2 views then purchases (no click —
    // stops at stage 1); u3 clicks BEFORE viewing (the out-of-order click
    // must not count) then clicks again after; u4 never views
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00"), "view"),
      (2L, ts("2024-01-01 11:30:00"), "purchase"),
      (3L, ts("2024-01-01 09:00:00"), "click"),
      (3L, ts("2024-01-01 09:30:00"), "view"),
      (3L, ts("2024-01-01 09:45:00"), "click"),
      (4L, ts("2024-01-01 12:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("funnelWithin: conversions past the first-entry window do not count") {
    val events = Seq(
      // u1 completes inside the 1 h window
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:20:00"), "click"),
      (1L, ts("2024-01-01 10:59:00"), "purchase"),
      // u2 clicks inside, purchases 1 s past the window
      (2L, ts("2024-01-01 11:00:00"), "view"),
      (2L, ts("2024-01-01 11:10:00"), "click"),
      (2L, ts("2024-01-01 12:00:01"), "purchase"),
      // u3: FIRST view anchors the window; the full chain after the second
      // view is outside it — first-entry anchoring stops u3 at stage 1
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 20:00:00"), "view"),
      (3L, ts("2024-01-01 20:10:00"), "click"),
      (3L, ts("2024-01-01 20:20:00"), "purchase"),
      // u4: boundary-exact purchase (<= window end counts)
      (4L, ts("2024-01-01 09:00:00"), "view"),
      (4L, ts("2024-01-01 09:30:00"), "click"),
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelWithin(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 3600L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 4L, 2 -> 3L, 3 -> 2L))
    // the unconstrained funnel would have counted u2 and u3 through
    val plain = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(plain == Map(1 -> 4L, 2 -> 4L, 3 -> 4L))
  }

  test("funnel stage boundary is strict: same-timestamp events do not advance") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click") // not strictly after the view
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 1L, 2 -> 0L))
  }

  test("retention grids distinct users by cohort day and offset") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // u1 cohort Jan 1
      (1L, ts("2024-01-02 10:00:00")), // active day 1
      (1L, ts("2024-01-02 18:00:00")), // same day — still ONE distinct user
      (2L, ts("2024-01-01 12:00:00")), // u2 cohort Jan 1, never returns
      (3L, ts("2024-01-02 09:00:00")), // u3 cohort Jan 2
      (3L, ts("2024-01-04 09:00:00"))  // active day 2
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retention(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 2) -> 1L))
  }

  test("gap-fill densifies each key's span with zero days") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-04 09:00:00")), // Jan 2, 3 silent
      (2L, ts("2024-02-10 08:00:00"))  // single-day span
    ).toDF("user_id", "ts")
    val got = EventAnalytics.dailyGapFill(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert(got == Map(
      (1L, "2024-01-01") -> 2L, (1L, "2024-01-02") -> 0L,
      (1L, "2024-01-03") -> 0L, (1L, "2024-01-04") -> 1L,
      (2L, "2024-02-10") -> 1L))
  }

  test("daily anomalies: a burst day and a SILENT day both flag; constant volume never does") {
    // user 1: 2/day for 8 days then a 20-event burst — series [2×8, 20]:
    // μ=4, s=6, 2σ=12; |20-4|=16 flags, the 2-days (|2|) do not
    val user1 = (1 to 8).flatMap(day => Seq.fill(2)(
      (1L, ts(f"2024-01-$day%02d 10:00:00")))) ++
      Seq.fill(20)((1L, ts("2024-01-09 10:00:00")))
    // user 2: perfectly constant → σ = 0 → never flags
    val user2 = (1 to 5).map(day => (2L, ts(f"2024-02-$day%02d 09:00:00")))
    // user 3: steady 5/day with ONE silent day inside the span — series
    // [5×9, 0]: μ=4.5, s≈1.58, 2σ≈3.16; the gap-filled 0 (|4.5|) flags,
    // which only works because gap-fill runs FIRST
    val user3 = ((1 to 8) ++ Seq(10)).flatMap(day => Seq.fill(5)(
      (3L, ts(f"2024-03-$day%02d 12:00:00"))))
    val events = (user1 ++ user2 ++ user3).toDF("user_id", "ts")
    val got = EventAnalytics.dailyAnomalies(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2))).toSet
    assert(got == Set((1L, "2024-01-09", 20L), (3L, "2024-03-09", 0L)))
  }

  test("bigram LM self-score matches the hand-computed smoothed probabilities") {
    // corpus: "a b a b", "a c", "solo". vocab = {a,b,c,solo} → V=4
    // bigram counts: (a,b)=2, (b,a)=1, (a,c)=1; contexts: a=3, b=1
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "solo")).toDF("doc_id", "text")
    val got = NgramLm.selfScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 1 bigrams: (a,b),(b,a),(a,b) → ln(3/7), ln(2/5), ln(3/7)
    val d1 = (math.log(3.0 / 7) + math.log(2.0 / 5) + math.log(3.0 / 7)) / 3
    // doc 2: (a,c) → ln(2/7)
    val d2 = math.log(2.0 / 7)
    assert(got.keySet == Set(1L, 2L)) // "solo" has no bigrams → unscorable
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - d1) < 1e-12)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - d2) < 1e-12)
  }

  test("perplexity buckets: exact integer ntile over the LM ranking, head = best-modeled") {
    // ten scorable docs: 6 made of the corpus-dominant pattern (well
    // modeled → head), 4 of one-off token pairs (poorly modeled → tail)
    val docs = ((0 until 6).map(i => (i.toLong, "a b a b a b")) ++
      (6 until 10).map(i => (i.toLong, s"q$i r$i"))).toDF("doc_id", "text")
    val model = NgramLm.train(docs, "text", "doc_id")
    val got = NgramLm.perplexityBuckets(docs, model, "text", "doc_id", nBuckets = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size === 10)
    // driver reference: same scores via selfScore, same total order + bucket math
    val scores = NgramLm.score(docs, model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> math.floor(r.getDouble(2) * 1e6).toLong).toMap
    val ranked = scores.toSeq.sortBy { case (id, sc) => (-sc, id) }
    val want = ranked.zipWithIndex.map { case ((id, sc), r0) =>
      id -> ((sc, r0.toLong * 3 / 10 + 1))
    }.toMap
    assert(got === want)
    // bucket sizes: floor split puts the remainder on the FIRST bucket here
    assert(got.values.groupBy(_._2).view.mapValues(_.size).toMap ===
      Map(1L -> 4, 2L -> 3, 3L -> 3))
    // direction: every dominant-pattern doc outranks every one-off doc
    assert((0 until 6).forall(i => got(i.toLong)._2 === 1L || got(i.toLong)._2 === 2L))
    assert((6 until 10).forall(i => got(i.toLong)._2 === 3L || got(i.toLong)._2 === 2L))
  }

  test("perplexity buckets stay exact on a tie-heavy corpus (one score carries most docs)") {
    // 30 of 40 docs are IDENTICAL → one score owns 75% of the ranking;
    // the two-level within-score rank must still produce the exact
    // (score desc, doc asc) ntile
    val docs = ((0 until 30).map(i => (i.toLong, "a b a b")) ++
      (30 until 40).map(i => (i.toLong, s"q$i r$i"))).toDF("doc_id", "text")
    val model = NgramLm.train(docs, "text", "doc_id")
    val got = NgramLm.perplexityBuckets(docs, model, "text", "doc_id", nBuckets = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val scores = NgramLm.score(docs, model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> math.floor(r.getDouble(2) * 1e6).toLong).toMap
    val ranked = scores.toSeq.sortBy { case (id, sc) => (-sc, id) }
    val want = ranked.zipWithIndex.map { case ((id, sc), r0) =>
      id -> ((sc, r0.toLong * 4 / ranked.size + 1))
    }.toMap
    assert(got === want)
    // the tied docs really straddle bucket boundaries (the hard case)
    assert((0 until 30).map(i => got(i.toLong)._2).toSet.size > 1)
  }

  test("trigram stupid backoff walks the ladder: trigram hit, bigram backoff, unigram floor") {
    // train: "a b c a b c" → trigrams (a,b,c)=2? no — positions: (a,b,c),
    // (b,c,a),(c,a,b),(a,b,c) → (a,b,c)=2,(b,c,a)=1,(c,a,b)=1
    // bigrams: (a,b)=2,(b,c)=2,(c,a)=1; unigrams a=2,b=2,c=2, N=6, V=3
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val model = NgramLm.trainTrigram(train, "text", "doc_id")
    val got = NgramLm.scoreTrigram(
      Seq((1L, "a b c"),   // seen trigram: c(abc)/c(ab) = 2/2
        (2L, "x b c"),     // unseen trigram, seen bigram (b,c): 0.4·2/2
        (3L, "x y z"))     // nothing seen: 0.16·(0+1)/(6+3)
        .toDF("doc_id", "text"),
      model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 === 1L)
    assert(math.abs(got(1L)._2 - math.log(2.0 / 2)) < 1e-12)
    assert(math.abs(got(2L)._2 - math.log(0.4 * 2 / 2)) < 1e-12)
    assert(math.abs(got(3L)._2 - math.log(0.16 * 1.0 / 9)) < 1e-12)
    // a known unigram still floors through add-one: "x y c" → 0.16·(2+1)/9
    val g2 = NgramLm.scoreTrigram(Seq((4L, "x y c")).toDF("doc_id", "text"),
      model, "text", "doc_id").collect().head.getDouble(2)
    assert(math.abs(g2 - math.log(0.16 * 3.0 / 9)) < 1e-12)
    // docs under three tokens are unscorable and omitted
    assert(NgramLm.scoreTrigram(Seq((5L, "a b")).toDF("doc_id", "text"),
      model, "text", "doc_id").count() === 0L)
  }

  test("corpus-trained LM scores unseen documents via smoothing") {
    val train = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = NgramLm.train(train, "text", "doc_id")
    // "x y": both bigram and context unseen → ln((0+1)/(0+3))
    val got = NgramLm.score(Seq((9L, "x y")).toDF("doc_id", "text"),
        model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(got(9L) - math.log(1.0 / 3)) < 1e-12)
  }

  test("leak-free split never separates near-duplicate pairs") {
    // 60 docs, pair graph linking i and i+30 (30 clusters of 2)
    val docs = (0L until 60L).toDF("doc_id")
    val pairs = (0L until 30L).map(i => (i, i + 30)).toDF("doc_a", "doc_b")
    val split = Curation.leakFreeSplit(docs, pairs, "doc_id", numer = 1, denom = 2)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    assert(split.size == 60)
    for (i <- 0L until 30L) assert(split(i) == split(i + 30), s"pair $i split apart")
    // both labels actually occur (it is a split, not a constant)
    assert(split.values.toSet == Set("train", "holdout"))
  }
}
