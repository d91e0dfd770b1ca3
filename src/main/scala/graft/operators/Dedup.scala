package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale document corpora.
  *
  * Design for 100 TB:
  *  - exact dedup is a hash-groupBy: one shuffle on a 16-byte digest, never
  *    on the full text;
  *  - near-dup is MinHash + LSH banding: per-document signature computation
  *    is embarrassingly parallel column math; candidate generation shuffles
  *    only (band_hash → doc_id) pairs, never text; the final verify join is
  *    narrow per bucket. No O(n²) stage anywhere;
  *  - SimHash gives a 64-bit sketch whose Hamming distance bounds cosine-ish
  *    similarity; bucketing on rotated prefixes keeps it shuffle-light.
  *
  * Signature math (shingles, MinHash, band keys, SimHash) runs in native
  * Catalyst expressions ([[graft.functions.VectorHash]]) — one row-level
  * eval of primitive Scala, ~10× the interpreted higher-order-function
  * composition it replaced. No Python/Scala UDFs anywhere.
  */
object Dedup {

  // ------------------------------------------------------------------ exact

  /** Exact dedup: keep the lowest-id row per identical `text`. Grouping is
    * on md5(text) so the shuffle key is 32 hex chars regardless of document
    * size; at 100 TB this is the difference between shuffling digests and
    * shuffling the corpus.
    */
  def exactDuplicateGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Survivors of exact dedup (one row per distinct text). */
  def dropExactDuplicates(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // ---------------------------------------------------------------- minhash

  /** MinHash signature (array of `k` 64-bit minima) over a shingle array.
    * Native expression (graft.functions.VectorHash): double hashing
    * h_i = h1 + i·h2, one row-level eval — the composable k×transform form
    * is ~10× slower interpreted.
    */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    graft.functions.VectorHash.minhashSignature(shingleArr, k)

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`
    * values, each group hashed to one 64-bit band key (band index seeds the
    * hash, so keyspaces don't collide across bands). Two docs collide in
    * some band iff their signatures agree on that whole band — the classic
    * (1-(1-s^r)^b) S-curve.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    graft.functions.VectorHash.lshBandKeys(signature, bands, rowsPerBand)

  /** Candidate near-duplicate pairs via MinHash+LSH.
    *
    * Pipeline: tokens → `shingleSize`-gram shingles → k=bands·rowsPerBand
    * MinHash signature → explode band keys → self-join per (band, key)
    * bucket → distinct (a < b) pairs. The self-join is equi-join on the
    * band-bucket key, so Catalyst plans a shuffled hash/sort-merge join keyed
    * by tiny longs; candidate volume is bounded by bucket sizes, not n².
    */
  def minhashCandidatePairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame =
    minhashCandidatePairsFromShingles(
      shingleFrame(docs, textCol, idCol, shingleSize), bands, rowsPerBand)

  /** The (doc, sh) projection every near-dup path starts from — computed
    * once and shared so tokenize+shingle (the dominant narrow-stage cost)
    * doesn't run per consumer.
    */
  def shingleFrame(docs: DataFrame, textCol: String, idCol: String, shingleSize: Int): DataFrame =
    docs.select(
      col(idCol).as("doc"),
      graft.functions.VectorHash.wordShingles(col(textCol), shingleSize).as("sh"))

  /** Candidate pairs from a precomputed [[shingleFrame]]. */
  def minhashCandidatePairsFromShingles(
      shingled: DataFrame,
      bands: Int,
      rowsPerBand: Int
  ): DataFrame = {
    // Materialize each stage as its own projection: the shingle array (a
    // regexp over the full text) is referenced k times by the signature, and
    // the signature 'bands' times by the band keys. Staged projections pin
    // each to one evaluation per row (CollapseProject keeps multi-referenced
    // non-trivial aliases separate); inlining them instead multiplies the
    // regexp work ~k*bands times per row.
    val signed = shingled.select(
      col("doc"), minhashSignature(col("sh"), bands * rowsPerBand).as("sig"))
    val banded = signed
      .select(col("doc"),
        posexplode(lshBandKeys(col("sig"), bands, rowsPerBand)).as(Seq("band", "key")))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
  }

  // ---------------------------------------------------------------- jaccard

  /** Exact Jaccard similarity of two (distinct-element) arrays, as integer-
    * exact predicate building blocks: returns intersection and union sizes.
    */
  def setOverlap(a: Column, b: Column): (Column, Column) = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    (inter, union)
  }

  /** Near-duplicate pairs at Jaccard ≥ numer/denom over word n-gram shingle
    * sets, verified exactly on LSH candidates. The threshold is compared in
    * integer math (denom·I ≥ numer·U) so results are engine-portable.
    */
  def jaccardDuplicatePairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numer: Int = 7,
      denom: Int = 10,
      bands: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = {
    // one shingle pass feeds both the candidate generation and the exact
    // verify joins — tokenize+shingle is the dominant narrow-stage cost
    val withShingles = shingleFrame(docs, textCol, idCol, shingleSize)
    val cands = minhashCandidatePairsFromShingles(withShingles, bands, rowsPerBand)
    val a = withShingles.alias("sa")
    val b = withShingles.alias("sb")
    val (inter, union) = setOverlap(col("sa.sh"), col("sb.sh"))
    cands
      .join(a, col("doc_a") === col("sa.doc"))
      .join(b, col("doc_b") === col("sb.doc"))
      .select(col("doc_a"), col("doc_b"),
        inter.cast("bigint").as("inter_sz"), union.cast("bigint").as("union_sz"))
      .filter(col("inter_sz") * denom >= col("union_sz") * numer)
  }

  /** Brute-force exact-Jaccard pairs (the small-data oracle for the LSH
    * path): all id<id pairs with Jaccard ≥ numer/denom. O(n²) — only for
    * validation at small scale, never the production path.
    */
  def jaccardPairsBruteForce(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      numer: Int,
      denom: Int
  ): DataFrame = {
    val withShingles = docs.select(
      col(idCol).as("doc"),
      graft.functions.VectorHash.wordShingles(col(textCol), shingleSize).as("sh"))
    val a = withShingles.alias("sa")
    val b = withShingles.alias("sb")
    val (inter, union) = setOverlap(col("sa.sh"), col("sb.sh"))
    a.join(b, col("sa.doc") < col("sb.doc"))
      .select(col("sa.doc").as("doc_a"), col("sb.doc").as("doc_b"),
        inter.cast("bigint").as("inter_sz"), union.cast("bigint").as("union_sz"))
      .filter(col("inter_sz") * denom >= col("union_sz") * numer)
  }

  // ---------------------------------------------------------------- simhash

  /** Per-document 64-bit SimHash sketch (native expression). */
  def simhashSketches(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
      graft.functions.VectorHash.simhash64(TextOps.tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, using the
    * pigeonhole trick: split 64 bits into (maxDist+1) blocks; any pair within
    * distance must agree exactly on ≥1 block → equi-join per block, then
    * verify. Shuffle key = (block idx, block bits); no n² stage.
    */
  def simhashDuplicatePairs(docs: DataFrame, textCol: String, idCol: String, maxDist: Int = 3): DataFrame = {
    val blocks = maxDist + 1
    val bits = 64 / blocks
    val sk = simhashSketches(docs, textCol, idCol)
    val keyed = sk.select(col("doc"), col("simhash"),
      explode(array((0 until blocks).map { i =>
        struct(lit(i).as("blk"),
          shiftright(col("simhash"), i * bits)
            .bitwiseAND(if (bits >= 64) -1L else (1L << bits) - 1L).as("key"))
      }: _*)).as("bk"))
      .select(col("doc"), col("simhash"), col("bk.blk"), col("bk.key"))
    val a = keyed.alias("a")
    val b = keyed.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        TextOps.hamming64(col("a.simhash"), col("b.simhash")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  // ------------------------------------------------------------- clustering

  /** Connected components over near-dup pairs: every doc labeled with the
    * minimum doc id reachable through the pair graph — the "which duplicate
    * cluster am I in" step between pair generation and keeper selection.
    *
    * Distributed min-label propagation: each iteration joins labels across
    * edges and keeps the per-node minimum — one shuffle per iteration,
    * converging in O(component diameter) iterations (near-dup clusters are
    * clique-like, so 2-3 in practice). The driver loop early-exits on a
    * fixpoint; `maxIter` bounds adversarial chains.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("doc")).distinct()
      .withColumn("label", col("doc"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbors = edges
        .join(labels, edges("dst") === labels("doc"))
        .select(edges("src").as("doc"), col("label"))
      val next = labels.select(col("doc"), col("label")).union(viaNeighbors)
        .groupBy("doc").agg(min(col("label")).as("label"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "doc")
        .filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("doc"), col("label").as("cluster"))
  }

  /** Survivors after near-dup clustering: docs that are either outside any
    * cluster or their cluster's minimum id.
    */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val losers = duplicateClusters(pairs)
      .filter(col("doc") =!= col("cluster"))
      .select(col("doc"))
    docs.join(losers, docs(idCol) === losers("doc"), "left_anti")
  }

  // -------------------------------------------------------------- embedding

  /** Embedding near-dup pairs: cosine ≥ threshold, candidates from random-
    * hyperplane LSH buckets (see [[Similarity.hyperplaneBucket]]), verified
    * with exact cosine. At scale the bucket join replaces the n² cross join.
    */
  def embeddingDuplicatePairs(
      embs: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      planes: Int = 12
  ): DataFrame = {
    val keyed = embs.select(col(idCol).as("doc"), col(vecCol).as("v"),
      Similarity.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val a = keyed.alias("a")
    val b = keyed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
