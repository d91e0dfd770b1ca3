package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // 90% of the big side shares one key — the shape AQE can't always split
    val big = ((1 to 900).map(i => (1L, s"row$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"tail$i")))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 902) // 900 hot + 2 tail matches
  }

  test("salt spreads the hot key across buckets") {
    val big = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "payload")
    val salts = big
      .select(SkewJoin.salt(Seq(big("k"), big("payload")), 8).as("s"))
      .groupBy("s").count().collect()
    assert(salts.length == 8) // all buckets used
    assert(salts.map(_.getLong(1)).max < 1000L * 0.3) // no bucket dominates
  }

  test("salt is deterministic: same row content always lands in the same bucket") {
    // retry-safety contract: the salt feeds the shuffle key, so recomputed
    // map partitions (fetch-failure recovery) must reproduce it exactly
    val big = (1 to 500).map(i => (i.toLong % 7, s"row$i")).toDF("k", "payload")
    val once = big.select(big("k"), big("payload"),
      SkewJoin.salt(Seq(big("k"), big("payload")), 8).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    val again = big.repartition(13) // different physical layout
    val twice = again.select(again("k"), again("payload"),
      SkewJoin.salt(Seq(again("k"), again("payload")), 8).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(once == twice)
  }

  test("uniqueIdCol spreads byte-identical hot-key rows across buckets") {
    // a key-only projection plus a unique id: the id is the deterministic
    // spreader for rows whose other columns are all identical
    val big = (1 to 1000).map(i => (1L, "same", i.toLong)).toDF("k", "payload", "row_id")
    val salts = big
      .select(SkewJoin.salt(Seq(big("k"), big("row_id")), 8).as("s"))
      .groupBy("s").count().collect()
    assert(salts.length == 8)
    assert(salts.map(_.getLong(1)).max < 1000L * 0.3)
    // and the join result is still exactly the plain join
    val small = Seq((1L, "x")).toDF("k", "v")
    assert(SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 8,
      uniqueIdCol = Some("row_id")).count() == 1000)
    // whole-row fallback stays exact too (identical rows just share a bucket)
    val noId = Seq.fill(100)((1L, "same")).toDF("k", "payload")
    assert(SkewJoin.saltedJoin(noId, small, Seq("k"), buckets = 8).count() == 100)
  }

  test("left join keeps unmatched big-side rows exactly once") {
    val big = ((1 to 10).map(i => (1L, i)) ++ Seq((99L, 0))).toDF("k", "i")
    val small = Seq((1L, "x")).toDF("k", "v")
    val out = SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 4, joinType = "left")
    assert(out.count() == 11)
    assert(out.filter(out("k") === 99L && out("v").isNull).count() == 1)
  }
}
