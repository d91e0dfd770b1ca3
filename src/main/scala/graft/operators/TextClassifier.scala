package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality classifier: a fastText/CCNet-style LINEAR classifier over
  * hashed bag-of-ngram features, trained by full-batch logistic-regression
  * gradient descent — the standard production "does this document look
  * like the high-quality reference corpus?" filter (Brown et al. 2020
  * §App. A trained one against WebText; Wenzek et al. 2019 (CCNet) used
  * the 5-gram-LM analog; Joulin et al. 2016 is the fastText shape this
  * follows: averaged hashed n-gram features into a linear head).
  *
  * Everything is INTEGER-EXACT by construction, so training replays
  * bit-identically (same data + params → same model, any partitioning):
  *
  *  - features: lowercased unigrams ∪ bigrams ([[Curation.dsirFeatures]],
  *    the DSIR bag), hashed into a FIXED bucket space (model size is
  *    corpus-independent — the fastText hashing trick);
  *  - weights live in micro-units (bigint); a doc's margin is
  *    `⌊Σ_b x_b·w_b / n⌋ + bias` — exact bigint arithmetic, n = the doc's
  *    feature count (the fastText mean);
  *  - the only float is the per-doc sigmoid, immediately floored to ppm;
  *    every cross-row SUM is a bigint sum (associative, order-free),
  *    never a float sum — the same discipline as the integerized sparse
  *    cosine and PageRank;
  *  - updates are integer division: `w += ⌊g / nDocs⌋` (lr = 1 in ppm
  *    space), so the trained model is a pure function of the input.
  *
  * Scale shape: the labeled training set is small by construction (a
  * quality-filter is trained on thousands of reference docs, then SCORES
  * the 100 TB corpus); per iteration the features frame — persisted once —
  * pays one broadcast-weights join + one doc-key agg + one bucket-key agg,
  * and only the (≤ numBuckets)-row gradient ever reaches the driver (the
  * BPE bounded-collect discipline). Scoring is corpus-scale: broadcast
  * model join + one map-side-combined doc agg; the corpus text never
  * shuffles.
  */
object TextClassifier {

  /** Bias pseudo-bucket in the model frame. */
  val BiasBucket: Long = -1L

  /** Hashed bag-of-ngram counts: (doc, b, x) + per-doc totals folded in as
    * (doc, n). One row per (doc, bucket) with multiplicity `x`.
    */
  private def hashedCounts(
      docs: DataFrame, textCol: String, idCol: String, numBuckets: Int): DataFrame =
    Curation.dsirFeatures(docs, textCol, idCol)
      .select(col("doc"), pmod(xxhash64(col("f")), lit(numBuckets.toLong)).as("b"))
      .groupBy(col("doc"), col("b")).agg(count(lit(1)).as("x"))

  /** Counts + per-doc totals, plus one BIAS pseudo-feature row per doc
    * with `x = n`: under the mean-normalized margin `⌊Σ x·w / n⌋` the
    * pseudo-feature contributes exactly `w(bias)`, and its gradient
    * `⌊r·x/n⌋ = r` — so bias training and scoring ride the same joins and
    * the same gradient collect as every real bucket.
    */
  private def withTotals(counts: DataFrame): DataFrame = {
    val n = counts.groupBy(col("doc")).agg(sum(col("x")).as("n"))
    counts.join(n, Seq("doc"))
      .unionByName(n.select(col("doc"), lit(BiasBucket).as("b"),
        col("n").as("x"), col("n")))
  }

  /** ppm sigmoid of a micro-unit margin — the one float step, floored
    * immediately so everything downstream is integer.
    */
  private def sigmoidPpm(marginMicro: Column): Column =
    floor(lit(1000000.0) /
      (lit(1.0) + exp(-marginMicro.cast("double") / lit(1000000.0))))
      .cast("bigint")

  /** Train the classifier. `labeled` carries (idCol, textCol, labelCol)
    * with labels in {0, 1} (1 = high quality / reference class). Docs with
    * zero features are ignored (they have no representation to learn
    * from; [[scoreDocs]] gives them margin = bias). Returns the model
    * frame (bucket, w_micro) with the bias at [[BiasBucket]] — persist it
    * with a plain parquet write.
    */
  def train(
      labeled: DataFrame, textCol: String, idCol: String, labelCol: String,
      numBuckets: Int = 1 << 15, iterations: Int = 30): DataFrame = {
    require(numBuckets > 0 && iterations > 0,
      s"numBuckets and iterations must be positive, got $numBuckets/$iterations")
    val spark = labeled.sparkSession
    import spark.implicits._
    val feats = graft.CacheScope.localCheckpoint(withTotals(
      hashedCounts(labeled, textCol, idCol, numBuckets)))
    try {
      val labels = graft.CacheScope.localCheckpoint(
        labeled.select(col(idCol).cast("long").as("doc"),
          col(labelCol).cast("long").as("y"))
          .join(feats.select(col("doc")).distinct(), Seq("doc")))
      try {
        val nDocs = labels.count()
        require(nDocs > 0, "no trainable docs (all empty after tokenization?)")
        var weights = Map.empty[Long, Long] // bucket -> w_micro; BiasBucket = bias
        (1 to iterations).foreach { _ =>
          val wDF = weights.toSeq.toDF("b", "w")
          val margins = feats.join(broadcast(wDF), Seq("b"), "left")
            .groupBy(col("doc"), col("n"))
            .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("s"))
            // bigint DIV, not float division + floor: exact at any
            // magnitude (truncates toward zero — deterministic either way)
            .select(col("doc"), col("n"), expr("s DIV n").cast("bigint").as("m"))
          val resid = margins.join(labels, Seq("doc"))
            .select(col("doc"),
              (col("y") * lit(1000000L) - sigmoidPpm(col("m"))).as("r"))
          // bucket gradients: Σ_docs ⌊r·x/n⌋ — exact bigint; ≤ numBuckets+1
          // rows (the bias pseudo-bucket included) reach the driver, the
          // ONE action per iteration
          val grads = feats.join(resid, Seq("doc"))
            .groupBy(col("b"))
            .agg(sum(expr("(r * x) DIV n").cast("bigint")).as("g"))
            .collect().map(row => (row.getLong(0), row.getLong(1))).toMap
          weights = (weights.keySet ++ grads.keySet).iterator.map { b =>
            b -> (weights.getOrElse(b, 0L) + grads.getOrElse(b, 0L) / nDocs)
          }.toMap
        }
        weights.toSeq.toDF("bucket", "w_micro")
      } finally graft.CacheScope.unpersistCheckpoint(labels)
    } finally graft.CacheScope.unpersistCheckpoint(feats)
  }

  /** Score documents against a trained model: (doc, n_feats, margin_micro,
    * quality) with quality = 1 iff margin ≥ 0. Feature-less docs score at
    * the bias. `numBuckets` must match the training call (the model frame
    * doesn't pin it because a bucket id alone can't prove the space size —
    * pass the same configuration, as with every hashed-feature model).
    */
  def scoreDocs(
      docs: DataFrame, textCol: String, idCol: String, model: DataFrame,
      numBuckets: Int = 1 << 15): DataFrame = {
    val w = model.filter(col("bucket") =!= lit(BiasBucket))
      .select(col("bucket").as("b"), col("w_micro").as("w"))
    // fail fast on a biasless model (hand-filtered or externally built):
    // the old crossJoin-with-empty-frame shape silently scored ZERO rows
    // for every document instead. One ≤2-row bounded collect
    val biasRows = model.filter(col("bucket") === lit(BiasBucket))
      .select(col("w_micro").cast("long")).limit(2).collect()
    require(biasRows.length == 1,
      s"model must carry exactly one bias row (bucket = $BiasBucket), " +
        s"found ${biasRows.length} — pass the frame [[train]] returned, unfiltered")
    val bias = biasRows.head.getLong(0)
    // corpus-scale path: stay at occurrence granularity — broadcast-join
    // the weights onto the exploded features and reduce ONCE per doc with
    // map-side combine, never materializing (doc, bucket) counts through a
    // shuffle. `(Σ_occ w + n·bias) DIV n` ≡ the training margin
    // `(Σ_b x_b·w_b + x_bias·w_bias) DIV n` exactly (x_bias = n)
    val scored = Curation.dsirFeatures(docs, textCol, idCol)
      .select(col("doc"), pmod(xxhash64(col("f")), lit(numBuckets.toLong)).as("b"))
      .join(broadcast(w), Seq("b"), "left")
      .groupBy(col("doc"))
      .agg(sum(coalesce(col("w"), lit(0L))).as("s"), count(lit(1)).as("n_feats"))
      .select(col("doc"), col("n_feats"),
        expr(s"(s + n_feats * ${bias}L) DIV n_feats").cast("bigint").as("margin_micro"))
    docs.select(col(idCol).cast("long").as("doc"))
      .join(scored, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("margin_micro"), lit(bias)).as("margin_micro"))
      .withColumn("quality", when(col("margin_micro") >= 0L, 1L).otherwise(0L))
  }

  /** Misclassified docs of a labeled frame under a model — the contract
    * face (provably empty on a separable training set after convergence).
    */
  def misclassified(
      labeled: DataFrame, textCol: String, idCol: String, labelCol: String,
      model: DataFrame, numBuckets: Int = 1 << 15): DataFrame =
    scoreDocs(labeled, textCol, idCol, model, numBuckets)
      .join(labeled.select(col(idCol).cast("long").as("doc"),
        col(labelCol).cast("long").as("y")), Seq("doc"))
      .filter(col("quality") =!= col("y"))
      .select(col("doc"), col("y"), col("margin_micro"))
}
