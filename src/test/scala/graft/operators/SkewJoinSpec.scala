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

  test("detectHeavyKeys finds exactly the planted hot keys, full-scan and sampled") {
    // keys 1 and 2 hold ~45% and ~30%; 500 tail keys hold the rest
    val big = ((1 to 4500).map(i => (1L, i)) ++ (1 to 3000).map(i => (2L, i)) ++
      (1 to 2500).map(i => (i.toLong % 500 + 10, i))).toDF("k", "i")
    val full = SkewJoin.detectHeavyKeys(big, Seq("k"),
      heavyShareDenom = 10L, sampleFraction = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(full == Set(1L, 2L))
    val sampled = SkewJoin.detectHeavyKeys(big, Seq("k"),
      heavyShareDenom = 10L, sampleFraction = 0.2)
      .collect().map(_.getLong(0)).toSet
    // sampling error can admit a borderline key but must find the giants
    assert(sampled.contains(1L) && sampled.contains(2L))
  }

  test("adaptiveSaltedJoin equals the plain join; small side replicates heavy keys only") {
    val big = ((1 to 900).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"tail$i"))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (77L, "unmatched")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val heavy = SkewJoin.detectHeavyKeys(big, Seq("k"),
      heavyShareDenom = 5L, sampleFraction = 1.0)
    val adaptive = SkewJoin.adaptiveSaltedJoin(big, small, Seq("k"), buckets = 8,
      heavyKeys = Some(heavy))
    assert(adaptive.select("k", "payload", "name")
      .collect().map(_.toSeq).toSet == plain)
    // routing: hot-key big rows spread over >1 shuffle key, light keys all salt 0
    import org.apache.spark.sql.functions.{array, col, explode, lit, sequence, when}
    val hk = heavy.withColumn("_hv", lit(1))
    val saltsOfHot = big.join(hk, Seq("k"), "left")
      .withColumn("_salt", when(col("_hv").isNotNull,
        SkewJoin.salt(Seq(col("k"), col("payload")), 8)).otherwise(lit(0)))
      .filter(col("k") === 1L).select("_salt").distinct().count()
    assert(saltsOfHot > 1, "hot key must spread across salt buckets")
    // internal-detection path agrees too
    assert(SkewJoin.adaptiveSaltedJoin(big, small, Seq("k"), buckets = 8,
      heavyShareDenom = 5L, sampleFraction = 1.0)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet == plain)
  }

  test("adaptiveSaltedJoin left join: unmatched rows once, null keys as in the plain join") {
    val big = ((1 to 50).map(i => (java.lang.Long.valueOf(1L), i)) ++
      Seq((java.lang.Long.valueOf(99L), 0), (null.asInstanceOf[java.lang.Long], -1)))
      .toDF("k", "i")
    val small = Seq((1L, "x")).toDF("k", "v")
    val out = SkewJoin.adaptiveSaltedJoin(big, small, Seq("k"), buckets = 4,
      joinType = "left", heavyShareDenom = 3L, sampleFraction = 1.0)
    assert(out.count() == 52)
    assert(out.filter(out("k").isNull && out("v").isNull).count() == 1)
    assert(out.filter(out("k") === 99L && out("v").isNull).count() == 1)
    assert(out.filter(out("v").isNotNull).count() == 50)
  }
}
