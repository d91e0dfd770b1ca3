package graft.operators

import graft.SparkTestBase
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
}
