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

  /** Dot product of two float-array columns (accumulated in double, in array
    * order — deterministic and engine-portable).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (NaN-safe: 0 when either vector is all-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed hash mapped to ±1. Using sign components only (a Rademacher
    * hyperplane) keeps everything integer-exact until the final dot.
    */
  private def planeComponent(p: Int, i: Column): Column =
    when(xxhash64(lit(p), i).bitwiseAND(1L) === 1L, lit(1.0)).otherwise(lit(-1.0))

  /** Sign of the projection of `vec` onto hyperplane `p`. */
  private def planeSign(vec: Column, p: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") * planeComponent(p, i)),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** Random-hyperplane LSH bucket id: `planes` projection sign bits packed
    * into an int. Cosine-similar vectors collide with probability
    * (1 - θ/π)^planes.
    */
  def hyperplaneBucket(vec: Column, planes: Int): Column =
    (0 until planes).foldLeft(lit(0)) { (acc, p) =>
      shiftleft(acc, 1).bitwiseOR(planeSign(vec, p))
    }

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
