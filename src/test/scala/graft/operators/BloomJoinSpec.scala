package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class BloomJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bloomPrunedJoin equals the plain join (inner, selective small side)") {
    import spark.implicits._
    val big = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "payload")
    val small = Seq(7L, 42L, 999L, 4999L).map(k => (k, s"dim$k")).toDF("k", "name")
    val got = BloomJoin.bloomPrunedJoin(big, small, Seq("k"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val want = big.join(small, Seq("k"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.size == 4)
  }

  test("pruning keeps every true match and drops most non-matches") {
    import spark.implicits._
    val big = (1L to 20000L).toDF("k")
    val smallKeys = (1L to 200L).map(_ * 100L) // 100, 200, ... 20000
    val filter = BloomJoin.buildKeyFilter(smallKeys.toDF("k"), Seq("k"),
      expectedItems = 1000L, fpp = 0.01)
    val survivors = BloomJoin.pruneByFilter(big, Seq("k"), filter)
      .collect().map(_.getLong(0)).toSet
    assert(smallKeys.toSet.subsetOf(survivors)) // no false negatives, ever
    // fpp 0.01 over ~19.8k non-members: expect ~200 false positives; 5x slack
    assert(survivors.size <= 200 + 1000)
  }

  test("multi-column keys and null keys behave like the plain inner join") {
    import spark.implicits._
    val big = Seq(
      (Some("a"), Some(1L), "r1"), (Some("a"), Some(2L), "r2"),
      (Some("b"), Some(1L), "r3"), (None: Option[String], Some(1L), "r4"),
      (Some("a"), None: Option[Long], "r5")
    ).toDF("s", "n", "payload")
    val small = Seq(
      (Some("a"), Some(1L), "d1"), (None: Option[String], Some(1L), "d2")
    ).toDF("s", "n", "name")
    val got = BloomJoin.bloomPrunedJoin(big, small, Seq("s", "n"))
      .select("payload", "name").collect().map(_.toSeq).toSet
    val want = big.join(small, Seq("s", "n"))
      .select("payload", "name").collect().map(_.toSeq).toSet
    assert(got == want) // null keys never match in SQL equi-join semantics
    assert(got == Set(Seq("r1", "d1")))
  }

  test("left_semi works; outer/anti types are rejected") {
    import spark.implicits._
    val big = (1L to 100L).map(i => (i, i % 7)).toDF("k", "x")
    val small = Seq(3L, 10L).toDF("k")
    val semi = BloomJoin.bloomPrunedJoin(big, small, Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(semi == Set(3L, 10L))
    intercept[IllegalArgumentException] {
      BloomJoin.bloomPrunedJoin(big, small, Seq("k"), "left_outer")
    }
    intercept[IllegalArgumentException] {
      BloomJoin.bloomPrunedJoin(big, small, Seq("k"), "left_anti")
    }
  }
}
