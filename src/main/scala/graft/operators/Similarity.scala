package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`).
  *
  * Two paths, per the standard scale playbook:
  *  - brute-force top-k: broadcast the (small) query set against the corpus,
  *    exact cosine, per-query top-k window. Correctness baseline; linear in
  *    corpus size, embarrassingly parallel, no corpus shuffle.
  *  - LSH-bucketed: deterministic random-hyperplane signs bucket the corpus
  *    once; queries probe only their own bucket (optionally neighbors). The
  *    join key is a small int, so at 100 TB the probe is a shuffle of bucket
  *    ids, not an n·m cross product.
  *
  * Vector math is `zip_with` + `aggregate` (codegen'd) — upgrade path is a
  * fused Catalyst Expression if the fold shows up in profiles.
  */
object Similarity {

  /** Dot product of two float-array columns, as a composable column
    * expression (higher-order functions; double accumulate in array order).
    * Kept as the reference implementation — the hot paths below use the
    * native [[graft.functions.VectorHash]] expressions instead.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (NaN-safe: 0 when either vector is all-zero).
    * Native expression; same accumulation order as [[dot]], so results are
    * bit-identical to the composable form.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorHash.cosine(a, b)

  /** Random-hyperplane LSH bucket id: `planes` Rademacher-projection sign
    * bits packed into an int (native expression; deterministic seeded
    * component hashes). Cosine-similar vectors collide with probability
    * (1 - θ/π)^planes.
    */
  def hyperplaneBucket(vec: Column, planes: Int): Column =
    graft.functions.VectorHash.hyperplaneBucket(vec, planes)

  /** Exact brute-force cosine top-k. `queries` is expected to be small
    * (broadcast); the corpus is scanned once, the per-query top-k is a
    * window over (query, sim). Self-matches excluded by id.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** LSH-bucketed ANN top-k: probe only same-bucket candidates. Trades
    * recall for a bucket-key equi-join; `planes` tunes bucket granularity.
    * Returns the same shape as [[bruteForceTopK]] (possibly fewer than k
    * when a bucket is sparse).
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      planes: Int = 8
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
