package graft.operators

import graft.SparkTestBase
import graft.functions.StringSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkageSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // --- Jaro-Winkler semantics, pinned to the DuckDB-probed values --------

  test("jaro-winkler matches the textbook + DuckDB values exactly") {
    // every expected value below was read off DuckDB jaro_winkler_similarity
    // (the oracle engine) — equality must be to the double bit
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("TRATE", "TRACE", 0.9066666666666667),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0), // DuckDB convention: empty → 0, NOT 1
      ("a", "", 0.0),
      ("aaaaaaaaaa", "aaaaaaaaab", 0.96),
      ("hello world", "hello wrold", 0.9818181818181818),
      // boost threshold: jaro ≤ 0.7 gets NO prefix bonus
      ("AAXXXXXX", "AAYYYYYY", 0.5),
      ("aBcDeF", "aXcXeX", 0.6666666666666666),
      ("prefixzzzz", "prefixqqqq", 0.8400000000000001))
    for ((a, b, want) <- cases) {
      val got = StringSim.jaroWinklerSim(a, b)
      assert(got == want, s"jw($a,$b): got $got want $want")
    }
  }

  test("jaro transpositions use integer half-count (odd mismatch case)") {
    // matched sequences that are full rotations give odd raw mismatch
    // counts; DuckDB floors t/2 (probed over 3000 random pairs) — pin one
    assert(StringSim.jaroSim("abcdef", "bcadef") ==
      (6.0 / 6 + 6.0 / 6 + (6.0 - 1) / 6) / 3)
  }

  test("jaro-winkler expression is symmetric and bounded on random strings") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(200)((
      rnd.alphanumeric.take(rnd.nextInt(12)).mkString,
      rnd.alphanumeric.take(rnd.nextInt(12)).mkString)).toDF("a", "b")
    val rows = pairs.select(
      StringSim.jaroWinkler($"a", $"b").as("ab"),
      StringSim.jaroWinkler($"b", $"a").as("ba")).collect()
    rows.foreach { r =>
      val (ab, ba) = (r.getDouble(0), r.getDouble(1))
      assert(ab == ba, "symmetry")
      assert(ab >= 0.0 && ab <= 1.0, "bounds")
    }
  }

  // --- blocking ----------------------------------------------------------

  test("blockedPairs finds fuzzy matches only within blocks") {
    val recs = Seq(
      (1L, "Jonathan Smith", "NY"), (2L, "Jonathon Smith", "NY"),
      (3L, "Jonathan Smith", "CA"), // same name, different block: excluded
      (4L, "Elizabeth Quinn", "NY"), (5L, "Zachary Adams", "NY"))
      .toDF("id", "name", "state")
    val pairs = Linkage.blockedPairs(recs, "id", "name", col("state"), 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("blockedPairs drops oversized blocks under maxBlockSize") {
    val recs = ((1 to 50).map(i => (i.toLong, s"name$i", "BIG")) ++
      Seq((100L, "alpha one", "S"), (101L, "alpha one", "S")))
      .toDF("id", "name", "state")
    val pairs = Linkage.blockedPairs(recs, "id", "name", col("state"), 0.0,
      maxBlockSize = 10)
    assert(pairs.select("block").distinct().as[String].collect().toSeq == Seq("S"))
    // and the audit sees what was dropped
    assert(Linkage.blockSizes(recs, col("state")).filter($"n" > 10).count() == 1)
  }

  // --- sorted neighborhood ----------------------------------------------

  test("sortedNeighborhoodPairs emits exactly the w-predecessor pairs") {
    val recs = Seq(
      (10L, "b1", "aaa"), (11L, "b1", "aab"), (12L, "b1", "aac"), (13L, "b1", "zzz"),
      (20L, "b2", "mmm"), (21L, "b2", "mmn"))
      .toDF("id", "blk", "key")
    val pairs = Linkage.sortedNeighborhoodPairs(recs, "id", col("blk"), col("key"), window = 2)
      .select("a_id", "b_id", "rank_distance").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set(
      (10L, 11L, 1), (10L, 12L, 2), (11L, 12L, 1), (11L, 13L, 2), (12L, 13L, 1),
      (20L, 21L, 1)))
  }

  test("sorted neighborhood ≡ brute-force within rank window (random)") {
    val rnd = new scala.util.Random(5)
    val recs = (1 to 120).map { i =>
      (i.toLong, s"b${rnd.nextInt(3)}", rnd.alphanumeric.take(6).mkString)
    }.toDF("id", "blk", "key")
    val w = 3
    val got = Linkage.sortedNeighborhoodPairs(recs, "id", col("blk"), col("key"), w)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // oracle: rank in-JVM, pair within window
    val byBlock = recs.as[(Long, String, String)].collect()
      .groupBy(_._2).values.flatMap { rs =>
        val sorted = rs.sortBy(r => (r._3, r._1)).map(_._1)
        for {
          i <- sorted.indices; j <- (i + 1) to math.min(i + w, sorted.length - 1)
        } yield (sorted(i), sorted(j))
      }.toSet
    assert(got == byBlock)
    assert(got.size <= 120 * w)
  }

  test("entities: transitive pairs merge, singletons self-label") {
    val recs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (9L, "y")).toDF("id", "v")
    // 1-2 and 2-3 matched, 1-3 never directly compared — must still merge
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val ent = Linkage.entities(recs, "id", pairs)
      .select("id", "entity").as[(Long, Long)].collect().toMap
    assert(ent == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("goldenRecords: survivorship ordering picks one winner per entity") {
    val recs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 30.0), // entity 1: price tie 2 vs 3 → lower id
      (9L, 5.0))
      .toDF("id", "price")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val labeled = Linkage.entities(recs, "id", pairs)
    val golden = Linkage.goldenRecords(labeled, "id",
        Seq(org.apache.spark.sql.functions.col("price").desc))
      .select("entity", "id", "n_members").as[(Long, Long, Long)].collect().toSet
    assert(golden == Set((1L, 2L, 3L), (9L, 9L, 1L)))
  }

  test("pair count is n·w-bounded even under a single mega-block") {
    val recs = (1 to 500).map(i => (i.toLong, "one", s"k$i")).toDF("id", "blk", "key")
    val n = Linkage.sortedNeighborhoodPairs(recs, "id", col("blk"), col("key"), 4).count()
    // exact: n·w − (w·(w+1))/2 boundary trim
    assert(n == 500L * 4 - 4 * 5 / 2)
  }
}
