package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hashed-ngram logistic-regression quality classifier: learning on
  * separable data, bit-identical retrains, holdout generalization via
  * discriminative tokens, and the degenerate-input contracts.
  */
class TextClassifierSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val goodTexts = Seq(
    "the committee published a thorough report on regional water quality today",
    "researchers describe a careful analysis of household survey responses",
    "the ministry announced detailed guidance for vaccination programs",
    "a clear summary of agricultural yields across provinces was released",
    "the census bureau documented methodology for sampling rural districts")
  private val junkTexts = Seq(
    "zzz qqq xxx zzz qqq xxx zzz qqq",
    "buy now click here buy now click here buy now",
    "qqq zzz buy xxx click zzz qqq now",
    "click click buy buy zzz xxx qqq qqq",
    "xxx zzz qqq click buy now zzz xxx")

  private def labeled(goods: Seq[String], junks: Seq[String]): DataFrame =
    (goods.zipWithIndex.map { case (t, i) => (i.toLong, t, 1L) } ++
      junks.zipWithIndex.map { case (t, i) => (100L + i, t, 0L) })
      .toDF("doc_id", "text", "label")

  test("separable corpus: zero misclassified after training, margins sign-correct") {
    val data = labeled(goodTexts, junkTexts)
    val model = TextClassifier.train(data, "text", "doc_id", "label",
      numBuckets = 1 << 12, iterations = 30)
    assert(TextClassifier.misclassified(data, "text", "doc_id", "label",
      model, numBuckets = 1 << 12).isEmpty)
    val scored = TextClassifier.scoreDocs(data, "text", "doc_id", model,
      numBuckets = 1 << 12)
      .select(col("doc"), col("margin_micro")).as[(Long, Long)].collect().toMap
    goodTexts.indices.foreach(i => assert(scored(i.toLong) >= 0L))
    junkTexts.indices.foreach(i => assert(scored(100L + i) < 0L))
  }

  test("training is bit-identical across runs and repartitionings") {
    val data = labeled(goodTexts, junkTexts)
    def modelMap(df: DataFrame): Map[Long, Long] =
      df.select(col("bucket"), col("w_micro")).as[(Long, Long)].collect().toMap
    val m1 = modelMap(TextClassifier.train(data, "text", "doc_id", "label",
      numBuckets = 1 << 12, iterations = 10))
    val m2 = modelMap(TextClassifier.train(data.repartition(7), "text", "doc_id", "label",
      numBuckets = 1 << 12, iterations = 10))
    assert(m1 === m2, "retrain diverged — a float sum leaked into the model")
  }

  test("generalizes to a holdout separated by discriminative tokens under shared filler") {
    // shared filler dominates counts; only two tokens carry signal
    def doc(i: Int, good: Boolean): (Long, String, Long) = {
      val filler = s"common words appear in every document number $i"
      val marker = if (good) "excellent thorough" else "spammy clickbait"
      ((if (good) i else 100 + i).toLong, s"$filler $marker $filler", if (good) 1L else 0L)
    }
    val all = ((0 until 12).map(doc(_, good = true)) ++
      (0 until 12).map(doc(_, good = false))).toDF("doc_id", "text", "label")
    val train = all.filter(col("doc_id") % 3 =!= 0)
    val holdout = all.filter(col("doc_id") % 3 === 0)
    val model = TextClassifier.train(train, "text", "doc_id", "label",
      numBuckets = 1 << 12, iterations = 30)
    assert(TextClassifier.misclassified(holdout, "text", "doc_id", "label",
      model, numBuckets = 1 << 12).isEmpty, "holdout misclassified")
  }

  test("feature-less docs: excluded from training, scored at the bias") {
    val data = labeled(goodTexts, junkTexts)
      .unionByName(Seq((500L, "", 1L)).toDF("doc_id", "text", "label"))
    val model = TextClassifier.train(data, "text", "doc_id", "label",
      numBuckets = 1 << 12, iterations = 5)
    val bias = model.filter(col("bucket") === TextClassifier.BiasBucket)
      .select(col("w_micro")).as[Long].head()
    val empty = TextClassifier.scoreDocs(
      Seq((500L, "")).toDF("doc_id", "text"), "text", "doc_id", model,
      numBuckets = 1 << 12)
      .select(col("n_feats"), col("margin_micro")).as[(Long, Long)].head()
    assert(empty === ((0L, bias)))
  }

  test("a biasless model (hand-filtered frame) fails fast instead of scoring nothing") {
    val data = labeled(goodTexts, junkTexts)
    val model = TextClassifier.train(data, "text", "doc_id", "label",
      numBuckets = 1 << 12, iterations = 3)
    val noBias = model.filter(col("bucket") =!= TextClassifier.BiasBucket)
    val e = intercept[IllegalArgumentException](TextClassifier.scoreDocs(
      data, "text", "doc_id", noBias, numBuckets = 1 << 12))
    assert(e.getMessage.contains("bias"))
  }

  test("all-empty training set fails fast") {
    val e = intercept[IllegalArgumentException](TextClassifier.train(
      Seq((1L, "", 0L)).toDF("doc_id", "text", "label"),
      "text", "doc_id", "label", numBuckets = 16, iterations = 2))
    assert(e.getMessage.contains("trainable"))
  }
}
