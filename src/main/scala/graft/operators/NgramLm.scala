package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the distributable stand-in
  * for perplexity-based quality filtering (the KenLM move in CCNet/RefinedWeb
  * style pipelines): train bigram statistics over a reference corpus, then
  * score each document by its average bigram log-probability. Low scores
  * flag boilerplate, gibberish, and wrong-language text.
  *
  * Design for 100 TB: training is a grouped count over exploded bigrams
  * (shuffle keys are token pairs, never documents); scoring is an equi-join
  * of the document's bigrams against the model — when the model's head
  * vocabulary fits in memory Catalyst/AQE broadcasts it, otherwise it's a
  * plain shuffled hash join. No driver-side model object, so model size is
  * unbounded.
  */
object NgramLm {

  /** Bigram model over a training corpus: per-(w1, w2) counts, per-context
    * totals, and the vocabulary size used for add-one smoothing.
    *
    * `bigrams`: (w1, w2, c); `contexts`: (w1, c1 = Σ_w2 c(w1,w2));
    * `vocab`: one row, (vsz = distinct tokens in the corpus).
    */
  final case class BigramModel(bigrams: DataFrame, contexts: DataFrame, vocab: DataFrame)

  /** Bigram list of a token array: struct(w1, w2) per adjacent pair. */
  private def bigramPairs(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2")))

  private def docBigrams(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col(idCol), explode(bigramPairs(col("tk"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Train bigram counts, context totals, and vocabulary size over `docs`.
    * Tokenization is [[TextOps.tokens]] (lowercased whitespace tokens) so
    * the model composes with the rest of the text stack.
    */
  def train(docs: DataFrame, textCol: String, idCol: String): BigramModel = {
    val bg = docBigrams(docs, textCol, idCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    val vocab = docs.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .agg(count_distinct(col("t")).as("vsz"))
    BigramModel(bg, ctx, vocab)
  }

  /** Score each document by its average add-one-smoothed bigram
    * log-probability under `model`:
    * `avg_logp = mean over bigrams of ln((c(w1,w2)+1) / (c1(w1)+V))`.
    * Documents with fewer than two tokens are not scorable and are omitted.
    * Returns (idCol, n_bigrams: Long, avg_logp: Double).
    *
    * Unseen bigrams score with c=0 (and unseen contexts with c1=0), so a
    * corpus-trained model scores ANY document — the cross-corpus quality
    * filter shape.
    */
  def score(docs: DataFrame, model: BigramModel, textCol: String, idCol: String): DataFrame = {
    val db = docBigrams(docs, textCol, idCol)
    db.join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .crossJoin(model.vocab)
      .select(col(idCol),
        log((coalesce(col("c"), lit(0L)) + 1.0) /
          (coalesce(col("c1"), lit(0L)) + col("vsz"))).as("logp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("logp")) / count(lit(1))).as("avg_logp"))
  }

  /** Train on `docs` and score the same corpus — the self-scoring quality
    * signal (outliers under the corpus's own statistics).
    */
  def selfScore(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    score(docs, train(docs, textCol, idCol), textCol, idCol)

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): rank every
    * scorable document by its LM score and split the ranking into
    * `nBuckets` equal slices — bucket 1 = the best-modeled head (CCNet
    * keeps head, samples middle, drops tail). Deterministic total order:
    * (×10⁶-floored score DESC, doc id ASC); bucket =
    * `rank0 · nBuckets div N + 1` (pure integer math, engine-replayable).
    * Output: (doc, score_x1e6, bucket).
    *
    * The global ranking is computed WITHOUT a single-partition window:
    * a per-distinct-score histogram (map-side combined) carries the
    * cumulative counts — only the histogram (≤ #distinct scores rows,
    * the corpus collapsed to its score distribution) passes through the
    * ordered window — and each doc's within-score rank comes from a
    * window PARTITIONED on the score, so the corpus-sized frame only
    * ever shuffles on a parallel key.
    */
  def perplexityBuckets(
      docs: DataFrame, model: BigramModel, textCol: String, idCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"need at least one bucket, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val s = score(docs, model, textCol, idCol)
      .select(col(idCol).cast("long").as("doc"),
        floor(col("avg_logp") * lit(1000000.0)).cast("long").as("score_x1e6"))
    val hist = s.groupBy(col("score_x1e6")).agg(count(lit(1)).as("c"))
    val wh = Window.orderBy(col("score_x1e6").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.select(col("score_x1e6"),
      coalesce(sum(col("c")).over(wh), lit(0L)).as("before"))
    val total = s.agg(count(lit(1)).as("n"))
    val ws = Window.partitionBy(col("score_x1e6")).orderBy(col("doc"))
    s.withColumn("__r", row_number().over(ws).cast("long"))
      .join(broadcast(cum), Seq("score_x1e6"))
      .crossJoin(broadcast(total))
      .select(col("doc"), col("score_x1e6"),
        // integer DIV, not `/` (which is double division in Spark SQL)
        expr(s"CAST((before + __r - 1) * $nBuckets DIV n + 1 AS BIGINT)")
          .as("bucket"))
  }
}
