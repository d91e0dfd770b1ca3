package graft.operators

import org.apache.spark.sql.SparkSession

/** Driver-side metadata shortcuts for the persisted-index gate paths.
  *
  * A streaming gate pays its fixed costs PER MICRO-BATCH, so metadata that
  * is immutable for the life of a generation must not cost a Spark job per
  * batch:
  *
  *  - [[cachedParams]] memoizes tiny params/centroid reads per GENERATION
  *    DIRECTORY. A generation dir (`root/_generations/<N>`) is immutable
  *    once its commit marker exists — every mutation publishes a NEW
  *    generation — so the key can never serve stale values. This is
  *    metadata caching (the params row, the frozen centroids), never
  *    result caching: all data-bearing reads still hit the store.
  *  - [[dirRowCount]] answers "did this write produce any rows?" from the
  *    parquet FOOTERS of the written part-files — a driver-side metadata
  *    read (the row count is in the file footer), replacing a
  *    `read.parquet(dir).limit(1).isEmpty` Spark job per gate batch.
  */
private[graft] object IndexMeta {

  private val paramsCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Memoize `load` under `(kind, generationDir)`. Only call with a
    * COMMITTED generation dir (or an immutable fixture dir): the cache
    * never invalidates, by the generation-immutability argument above.
    */
  def cachedParams[T <: AnyRef](kind: String, genDir: String)(load: => T): T =
    paramsCache.computeIfAbsent(s"$kind@$genDir", _ => load).asInstanceOf[T]

  /** Total row count across the parquet part-files directly under `dir`,
    * from file footers only (no Spark job; the files a gate batch writes
    * are few). Returns 0 for a missing dir or one with no part-files —
    * same answer the listStatus + limit(1).isEmpty probe gave, including
    * the zero-task-write case (no part files at all).
    */
  def dirRowCount(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0L
    fs.listStatus(p).iterator
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-") &&
        f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }

  def dirHasRows(spark: SparkSession, dir: String): Boolean =
    dirRowCount(spark, dir) > 0L
}
