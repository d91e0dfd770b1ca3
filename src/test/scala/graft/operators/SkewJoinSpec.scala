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

  test("byte-identical hot-key rows still spread across salt buckets") {
    // a key-only projection: every row of the hot key is identical, so a
    // content-only hash would park them all in ONE bucket
    val big = Seq.fill(1000)((1L, "same")).toDF("k", "payload")
    val salts = big
      .select(SkewJoin.salt(Seq(big("k"), big("payload")), 8).as("s"))
      .groupBy("s").count().collect()
    assert(salts.length > 1)
    assert(salts.map(_.getLong(1)).max < 1000L * 0.5)
    // and the join result is still exactly the plain join
    val small = Seq((1L, "x")).toDF("k", "v")
    assert(SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 8).count() == 1000)
  }

  test("left join keeps unmatched big-side rows exactly once") {
    val big = ((1 to 10).map(i => (1L, i)) ++ Seq((99L, 0))).toDF("k", "i")
    val small = Seq((1L, "x")).toDF("k", "v")
    val out = SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 4, joinType = "left")
    assert(out.count() == 11)
    assert(out.filter(out("k") === 99L && out("v").isNull).count() == 1)
  }
}
