package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class SparseSimSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def brute(
      docs: Seq[(Long, String)], n: Int, minDf: Long, maxDf: Long, k: Int): Set[(Long, Long, Long, Int)] = {
    // in-JVM replica of the integerized pipeline
    def grams(t: String): Seq[String] = {
      val tk = "\\S+".r.findAllIn(t).map(_.toLowerCase).toVector
      if (tk.length < n) Nil else tk.sliding(n).map(_.mkString(" ")).toSeq
    }
    val tf = docs.map { case (id, t) =>
      id -> grams(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, d) => d >= minDf && d <= maxDf }
    val w = tf.view.mapValues(_.collect {
      case (term, f) if df.contains(term) => term -> f * (1000000L / df(term))
    }.toMap).toMap
    val nrm = w.view.mapValues(m => math.sqrt(m.values.map(x => (x * x).toDouble).sum)).toMap
    val ids = docs.map(_._1)
    val dirs = for {
      a <- ids; b <- ids; if a != b
      shared = w(a).keySet intersect w(b).keySet
      if shared.nonEmpty
      dot = shared.toSeq.map(t => w(a)(t) * w(b)(t)).sum
    } yield (a, b, math.round(dot * 1e6 / (nrm(a) * nrm(b))))
    dirs.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
        .map { case ((a, b, c), i) => (a, b, c, i + 1) }
    }.toSet
  }

  test("tiny corpus: exact integer cosine and ranks") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox leaps"),
      (3L, "a completely different sentence here"),
      (4L, "the quick brown fox jumps high"))
    val got = SparseSim.topKNeighbors(docs.toDF("doc_id", "text"), "text", "doc_id",
        n = 3, minDf = 2L, maxDf = 10L, k = 3)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == brute(docs, 3, 2L, 10L, 3))
    // doc1 and doc4 share all of doc1's trigrams → doc4 is doc1's top hit
    assert(got.exists { case (a, b, c, r) => a == 1L && b == 4L && r == 1 })
  }

  test("random corpus ≡ in-JVM brute force (no pruning)") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = SparseSim.topKNeighbors(docs.toDF("doc_id", "text"), "text", "doc_id",
        n = 2, minDf = 2L, maxDf = 1000L, k = 4)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == brute(docs, 2, 2L, 1000L, 4))
  }

  test("stop-gram cap: a term in every doc generates no pairs on its own") {
    val docs = (1L to 6L).map(id => (id, s"common shared prefix unique$id tail$id"))
    // every trigram containing the unique token is df=1; "common shared
    // prefix" is df=6 — with maxDf=5 nothing survives
    val n = SparseSim.topKNeighbors(docs.toDF("doc_id", "text"), "text", "doc_id",
      n = 3, minDf = 2L, maxDf = 5L, k = 5).count()
    assert(n == 0)
  }

  test("both directions of every pair are present with equal similarity") {
    val docs = Seq(
      (1L, "x y z w"), (2L, "x y z q"), (3L, "x y z q extra"))
    val rows = SparseSim.topKNeighbors(docs.toDF("doc_id", "text"), "text", "doc_id",
        n = 2, minDf = 2L, maxDf = 10L, k = 5)
      .select("a_id", "b_id", "cos_x1e6").as[(Long, Long, Long)].collect().toSet
    rows.foreach { case (a, b, c) => assert(rows.contains((b, a, c))) }
  }

  test("bm25TopK: self top-1, rare terms dominate, length normalization, maxDf cap") {
    val corpus = Seq(
      (1L, "zebra quagga okapi unique beasts"),
      (2L, "zebra zebra zebra common common common common common"),
      (3L, "common words fill this entire document with plain tokens"),
      (4L, "quagga sighting"), // short doc sharing a rare term
      (5L, "common common plain plain words words tokens fill")
    ).toDF("doc_id", "text")
    val q = Seq((100L, "quagga okapi")).toDF("doc_id", "text")
    val hits = SparseSim.bm25TopK(corpus, q, "text", "doc_id", "text", "doc_id", k = 5)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    // both rare-term docs surface; nothing without a query term does
    assert(hits.map(_._1).toSet === Set(1L, 4L))
    // doc 1 matches two rare terms, doc 4 one → doc 1 first
    assert(hits.head._1 === 1L)

    // self-retrieval: each doc queries itself to the top on a distinct corpus
    val self = SparseSim.bm25TopK(corpus, corpus.filter(col("doc_id") <= 3),
      "text", "doc_id", "text", "doc_id", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(self === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))

    // length normalization: identical tf for the query term, shorter doc wins
    val ln = Seq(
      (10L, "needle alpha beta"),
      (11L, "needle " + Seq.tabulate(30)(i => s"pad$i").mkString(" "))
    ).toDF("doc_id", "text")
    val lnHits = SparseSim.bm25TopK(ln, Seq((1L, "needle")).toDF("doc_id", "text"),
      "text", "doc_id", "text", "doc_id", k = 2)
      .orderBy(col("rank")).collect().map(_.getLong(1))
    assert(lnHits.toSeq === Seq(10L, 11L))

    // maxDf: a term in every doc is dropped from candidacy entirely
    val capped = SparseSim.bm25TopK(corpus, Seq((1L, "common")).toDF("doc_id", "text"),
      "text", "doc_id", "text", "doc_id", k = 5, maxDf = 2L)
      .count()
    assert(capped === 0L) // df(common) = 3 > 2 → no candidates at all
  }
}
