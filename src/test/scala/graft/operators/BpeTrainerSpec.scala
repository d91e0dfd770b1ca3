package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // Sennrich et al.'s worked example: low×5, lower×2, newest×6, widest×3
  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("learns the textbook merge sequence with deterministic tie-breaks") {
    val merges = BpeTrainer.train(corpus, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // (e,s), (es,t), (est,</w>) all count 9, ordered by pair asc;
    // then (l,o) and (lo,w) at 7
    assert(merges.toList == List(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "est", "</w>", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("training stops early when no pairs remain") {
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    // "ab" → a b </w>: merges (a,b) then (ab,</w>) then nothing mergeable
    val merges = BpeTrainer.train(tiny, "text", numMerges = 10)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.toList == List(("a", "b"), ("ab", "</w>")))
  }

  test("bpeTokenCount applies merges per word occurrence") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    val docs = Seq((1L, "low newest"), (2L, "low low")).toDF("doc_id", "text")
    val got = BpeTrainer.bpeTokenCount(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // low → [low, </w>] = 2; newest → [n, e, w, est</w>] = 4
    assert(got == Map(1L -> 6L, 2L -> 4L))
  }

  test("contraction is left-to-right and non-overlapping") {
    // word "aaa" with merge (a,a): left-to-right gives [aa, a, </w>], not [a, aa]
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = BpeTrainer.bpeTokenCount(docs, "text", "doc_id", Seq(("a", "a")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L))
  }

  test("mergeCountViolations: trained merges replay clean; a corrupted count is caught") {
    val docs = Seq((1L, "low low low lower lower newest newest newest newest widest"))
      .toDF("doc_id", "text")
    val learned = BpeTrainer.train(docs, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(BpeTrainer.mergeCountViolations(docs, "text", learned).isEmpty)
    // corrupt one recorded count → exactly that merge rank is flagged
    val corrupted = learned.updated(2, learned(2).copy(_4 = learned(2)._4 + 1))
    val flagged = BpeTrainer.mergeCountViolations(docs, "text", corrupted).collect()
    assert(flagged.length == 1 && flagged.head.getInt(0) == learned(2)._1)
  }
}
