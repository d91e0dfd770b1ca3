package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** In-JVM replica of the exact integer recurrence. */
  private def brute(edges: Seq[(Long, Long)], iters: Int, scale: Long): Map[Long, Long] = {
    val es = edges.distinct
    val deg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val base = scale / nodes.size
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val inflow = es.groupBy(_._2).view.mapValues(_.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      // dangling mass redistributed uniformly, same integer order as ranks()
      val dmass = nodes.filterNot(deg.contains).map(r).sum
      r = nodes.map(n =>
        n -> (base * 15 + (inflow.getOrElse(n, 0L) + dmass / nodes.size) * 85) / 100).toMap
    }
    r
  }

  test("exact equality with the in-JVM integer recurrence on a random graph") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val got = PageRank.ranks(edges.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == brute(edges, 3, 1000000000000L))
  }

  test("undirected star: the hub outranks every leaf") {
    val star = PageRank.undirected(
      (1L to 10L).map(l => (0L, l)).toDF("a", "b"), "a", "b")
    val r = PageRank.ranks(star, iters = 5).as[(Long, Long)].collect().toMap
    val hub = r(0L)
    (1L to 10L).foreach(l => assert(hub > r(l)))
  }

  test("rank mass is conserved up to integer-floor dust") {
    val rnd = new scala.util.Random(9)
    val pairs = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    // undirected graph → no dangling mass loss; only div-floor dust
    val edges = PageRank.undirected(pairs.toDF("a", "b"), "a", "b")
    val r = PageRank.ranks(edges, iters = 4).as[(Long, Long)].collect()
    val total = r.map(_._2).sum
    val scale = 1000000000000L
    // each floor loses < 1 unit per node per round (base split + inflow
    // divs + final div) — bound generously
    assert(total <= scale)
    assert(scale - total < 100L * (r.length + 400) * 4)
  }

  test("sink graphs conserve rank mass (dangling redistribution, ADVICE r6)") {
    // directed chain 1→2→3: node 3 is a sink — without redistribution its
    // whole rank share leaks every round and Σrank decays geometrically
    val r = PageRank.ranks(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), iters = 8)
      .as[(Long, Long)].collect()
    val scale = 1000000000000L
    val total = r.map(_._2).sum
    assert(total <= scale)
    // floor dust only: a leak would cost ~0.85·scale/3 per round
    assert(scale - total < 10000L)
    // and the sink still outranks its feeder (it receives the chain's mass)
    val m = r.toMap
    assert(m(3L) > m(1L))
  }

  test("unroll factor is result-invisible: 1 ≡ 3 ≡ 7 rounds per materialization") {
    val rnd = new scala.util.Random(77)
    val pairs = Seq.fill(220)((rnd.nextInt(32).toLong, rnd.nextInt(32).toLong))
      .filter { case (a, b) => a != b }
    val edges = PageRank.undirected(pairs.toDF("a", "b"), "a", "b")
    def run(unroll: Int) = graft.CacheScope.withScope {
      PageRank.ranks(edges, iters = 5, unroll = unroll).as[(Long, Long)].collect().toMap
    }
    val u1 = run(1)
    assert(run(3) == u1)
    assert(run(7) == u1) // unroll > iters: single materialization at the end
  }

  test("an empty edge set yields an empty rank frame (no plan-time probe crash)") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.ranks(empty, iters = 3).count() == 0)
  }

  test("ranksUndirected ≡ ranks(undirected(...)) — duplicates, both orientations, self-loops") {
    val rnd = new scala.util.Random(41)
    // duplicate pairs, reversed duplicates and self-loops all present: the
    // pre-double dedup must reproduce exactly what dedup-after-double did
    val pairs = Seq.fill(250)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)) ++
      Seq((3L, 7L), (7L, 3L), (4L, 4L), (4L, 4L))
    def viaRanks = graft.CacheScope.withScope {
      PageRank.ranks(PageRank.undirected(pairs.toDF("a", "b"), "a", "b"), iters = 4)
        .as[(Long, Long)].collect().toMap
    }
    def viaUndirected = graft.CacheScope.withScope {
      PageRank.ranksUndirected(pairs.toDF("a", "b"), "a", "b", iters = 4)
        .as[(Long, Long)].collect().toMap
    }
    assert(viaUndirected == viaRanks)
  }

  test("ranksUndirected on an empty pair set yields an empty frame") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(PageRank.ranksUndirected(empty, "a", "b", iters = 3).count() == 0)
  }

  test("a two-node cycle converges to equal ranks") {
    val r = PageRank.ranks(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) == r(2L))
  }
}
