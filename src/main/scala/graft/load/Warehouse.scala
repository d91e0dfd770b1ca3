package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed warehouse tables: pre-shuffled storage for co-located joins.
  *
  * The reference's warehouse is Postgres tables indexed on the join keys
  * (ref lib04_Update_Table_Data.py:203-271); the Spark-native analog of
  * "pay the sort once at load, never at query" is bucketing: rows are
  * hash-distributed into a fixed number of buckets by the join key at write
  * time, so a join between two tables bucketed the same way needs NO
  * shuffle at read time — the single highest-leverage layout decision for
  * repeated cross-survey joins at warehouse scale (CASEID/HHID joins happen
  * per-query; the bucket shuffle happens once per load).
  *
  * Verified in WarehouseSpec: a join between two co-bucketed tables plans
  * zero `Exchange hashpartitioning` operators.
  */
object Warehouse {

  /** Write `df` as a bucketed (and optionally sort-within-bucket) managed
    * table. Bucket count is a layout constant per table pair — both sides
    * of a co-located join must agree on it.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty && buckets > 0)
    val spark = df.sparkSession
    // an in-memory catalog forgets tables across JVMs while their files
    // persist; under overwrite semantics a stale orphaned location is
    // replaced, not an error
    if (mode == "overwrite" && !spark.catalog.tableExists(table)) {
      val dbLoc = new org.apache.hadoop.fs.Path(
        spark.catalog.getDatabase(spark.catalog.currentDatabase).locationUri)
      val loc = new org.apache.hadoop.fs.Path(dbLoc, table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val w = df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Read a warehouse table back (bucket metadata rides the catalog). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Range-layout parquet write: `repartitionByRange` on the sort key, then
    * sort within each partition, so every output file covers a DISJOINT key
    * range and parquet min/max statistics prune whole files and row groups
    * for range predicates. The scan-layout complement of [[writeBucketed]]
    * (which co-locates equi-joins): at warehouse scale this turns
    * `WHERE ts BETWEEN …` from a full scan into touching only the files
    * whose stats overlap the predicate. Range boundaries come from a sampled
    * sketch of the key distribution (Spark's range partitioner), which
    * balances BETWEEN distinct keys; a single hot key still lands wholly in
    * one partition — cap oversized output with
    * `spark.sql.files.maxRecordsPerFile` if one key dominates.
    */
  def writeRangeLayout(
      df: DataFrame, path: String, sortCols: Seq[String], partitions: Int,
      mode: String = "overwrite"): Unit = {
    require(sortCols.nonEmpty && partitions > 0)
    val cols = sortCols.map(df.col)
    df.repartitionByRange(partitions, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(mode).parquet(path)
  }
}
