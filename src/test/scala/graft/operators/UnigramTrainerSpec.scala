package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The unigram-LM (SentencePiece-style) tokenizer: hard-EM training over
  * the collapsed word table, integer-Viterbi encoding, total-coverage
  * round-trip, determinism, and the driver-transfer guard.
  */
class UnigramTrainerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "lowering the lower lowest low low low"),
    (2L, "newer news newest new new anew"),
    (3L, "the the the widest wider wide"),
    (4L, "renewed renewal renewing lowering"))
    .toDF("doc_id", "text")

  test("frequent substrings become pieces; every doc round-trips exactly") {
    val model = UnigramTrainer.train(corpus, "text", vocabSize = 40)
    val pieces = model.select("piece").as[String].collect().toSet
    assert(model.count() <= 40)
    // the dominant substrings of this corpus must survive pruning
    assert(pieces.exists(p => p.length >= 3 && "lowering".contains(p)),
      s"no multi-char 'low*' piece in $pieces")
    val vocab = model.as[(String, Long)].collect().toSeq
    assert(UnigramTrainer.roundTripViolations(
      corpus, "text", "doc_id", vocab).isEmpty)
  }

  test("training is deterministic and encoding ties are pinned") {
    def m(): Seq[(String, Long)] =
      UnigramTrainer.train(corpus.repartition(5), "text", vocabSize = 40)
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(m() === m())
    val vocab = m()
    val enc1 = corpus.select(
      UnigramTrainer.encode(TextOps.tokens(col("text")), vocab).as("p"))
      .as[Seq[String]].collect().toSeq
    val enc2 = corpus.repartition(3).select(
      UnigramTrainer.encode(TextOps.tokens(col("text")), vocab).as("p"))
      .as[Seq[String]].collect().toSeq
    assert(enc1.flatten.sorted === enc2.flatten.sorted)
  }

  test("unseen characters fall back to single-code-point UNK pieces and still round-trip") {
    val model = UnigramTrainer.train(corpus, "text", vocabSize = 40)
    val vocab = model.as[(String, Long)].collect().toSeq
    val exotic = Seq((9L, "low zebraé世 new")).toDF("doc_id", "text")
    assert(UnigramTrainer.roundTripViolations(
      exotic, "text", "doc_id", vocab).isEmpty)
    // and a surrogate-pair code point survives intact
    val emoji = Seq((10L, "low 😀😀 new")).toDF("doc_id", "text")
    assert(UnigramTrainer.roundTripViolations(
      emoji, "text", "doc_id", vocab).isEmpty)
  }

  test("single characters are always retained; vocabSize must exceed the char count") {
    val model = UnigramTrainer.train(corpus, "text", vocabSize = 40)
    val pieces = model.select("piece").as[String].collect().toSet
    val chars = corpus.select(explode(TextOps.tokens(col("text")))).as[String]
      .collect().flatMap(_.toCharArray.map(_.toString)).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars.diff(pieces)}")
    val e = intercept[IllegalArgumentException](
      UnigramTrainer.train(corpus, "text", vocabSize = 5))
    assert(e.getMessage.contains("code"))
  }

  test("maxWords guards the driver transfer") {
    val e = intercept[IllegalArgumentException](
      UnigramTrainer.train(corpus, "text", vocabSize = 40, maxWords = 3L))
    assert(e.getMessage.contains("maxWords"))
  }

  test("distributed trainer is row-identical to the driver trainer and has no word-table bound") {
    // equality on the base corpus (both trainers run)
    assert(UnigramTrainer.distributedTrainViolations(
      corpus, "text", vocabSize = 40).isEmpty,
      "trainDistributed diverged from train on the same corpus")
    // ... and on a partitioning-shuffled copy (distributed sums + top-k
    // must be partitioning-independent)
    assert(UnigramTrainer.distributedTrainViolations(
      corpus.repartition(7), "text", vocabSize = 40).isEmpty)
    // the verdict's Done criterion: a corpus whose DISTINCT-word table
    // exceeds maxWords trains with NO sampling at all — the driver trainer
    // fail-fasts, the distributed one neither bounds nor samples
    val wide = corpus.unionByName(
      (0 until 200).map(i => (100L + i, s"w${i}a w${i}b uniq$i")).toDF("doc_id", "text"))
    intercept[IllegalArgumentException](
      UnigramTrainer.train(wide, "text", vocabSize = 80, maxWords = 150L))
    val model = UnigramTrainer.trainDistributed(wide, "text", vocabSize = 80)
      .as[(String, Long)].collect().toSeq
    assert(model.nonEmpty && model.size <= 80)
    // full-fidelity: the distributed model equals the UNSAMPLED driver
    // model (maxWords raised), not the sampled recourse
    val full = UnigramTrainer.train(wide, "text", vocabSize = 80)
      .as[(String, Long)].collect().toSeq
    assert(model.sortBy(_._1) === full.sortBy(_._1))
    assert(UnigramTrainer.roundTripViolations(
      wide, "text", "doc_id", model).isEmpty)
  }

  test("sampling contract: trains past maxWords on a 1/n word sample, " +
      "bit-identical across partitionings, round-trip intact") {
    // a corpus whose DISTINCT-word table exceeds maxWords: 200 synthetic
    // words + the base corpus. Without sampling the guard fires; with
    // wordSample = 4 the deterministic id-hash sample fits and trains
    val wide = corpus.unionByName(
      (0 until 200).map(i => (100L + i, s"w${i}a w${i}b uniq$i")).toDF("doc_id", "text"))
    intercept[IllegalArgumentException](
      UnigramTrainer.train(wide, "text", vocabSize = 80, maxWords = 150L))
    def modelOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      UnigramTrainer.train(df, "text", vocabSize = 80, maxWords = 150L,
        wordSample = 8)
        .orderBy("piece").as[(String, Long)].collect().toSeq
    val m1 = modelOf(wide)
    val m2 = modelOf(wide.repartition(7))
    assert(m1 === m2, "sampled training is not partitioning-independent")
    assert(m1.nonEmpty)
    // coverage is untouched by sampling: every doc — including ones whose
    // words were sampled OUT — still round-trips exactly
    assert(UnigramTrainer.roundTripViolations(wide, "text", "doc_id", m1).isEmpty)
  }
}
