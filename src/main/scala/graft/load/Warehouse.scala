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

  /** Latest-wins upsert (MERGE compaction): `base` ∪ `updates`, keep ONE
    * row per key — the highest `versionCol`, with `updates` winning a
    * version tie. The batch face of CDC ingestion: the reference reloads a
    * whole survey slice to apply a new file version (ref
    * lib04_Update_Table_Data.py:509-541); at warehouse scale the same
    * convergence is one union + one hash shuffle on the key and a per-key
    * top-1 window — no delete pass, no read-modify-write of the base table,
    * and the shuffle is FREE when base and updates are co-bucketed on the
    * key ([[writeBucketed]]).
    */
  def upsertLatest(
      base: DataFrame, updates: DataFrame,
      keyCols: Seq[String], versionCol: String): DataFrame =
    upsertLatest(base, updates, keyCols, Seq(versionCol))

  /** [[upsertLatest]] with a lexicographic version tie-break chain: rows
    * order by (versionCols(0) desc, versionCols(1) desc, …), updates winning
    * a full tie. Needed whenever one column cannot totally order versions —
    * e.g. a CDC stream versioned by (event time, event id): two changes in
    * the same microsecond still merge deterministically, which is what makes
    * the merge result independent of how a stream was split into
    * micro-batches.
    */
  def upsertLatest(
      base: DataFrame, updates: DataFrame,
      keyCols: Seq[String], versionCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lit, row_number, desc}
    require(keyCols.nonEmpty && versionCols.nonEmpty)
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(desc) :+ desc("__src"): _*)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** CDC MERGE with tombstones: apply a change log of upserts AND deletes
    * to a base table. `changes.opCol` is `"D"` for a delete of the key,
    * anything else upserts the row. Semantics: the highest-version row per
    * key wins (the [[upsertLatest]] chain — changes beat base on full
    * ties); if the winner is a delete, the key is ABSENT from the result. A
    * change with a version older than a delete stays dead; a NEWER upsert
    * resurrects the key — exactly Debezium-style log compaction, as one
    * union + one key shuffle + per-key top-1 (no read-modify-write).
    *
    * For incremental/streaming application, carry `opCol` THROUGH the state
    * table (merge with [[upsertLatest]], filter `op != "D"` only at read
    * time): a dropped tombstone could be resurrected by a later-arriving
    * OLDER update, a retained one cannot. [[graft.streaming.EventStream
    * .streamUpsertLatest]] composes this way (spec-pinned).
    */
  def applyCdc(
      base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], versionCols: Seq[String], opCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(!base.columns.contains(opCol),
      s"base already has a '$opCol' column — pass the op column on changes only")
    upsertLatest(base.withColumn(opCol, lit("U")), changes, keyCols, versionCols)
      .filter(col(opCol) =!= "D")
      .drop(opCol)
  }

  /** Change feed reconstructed from two table STATES (the writer kept no
    * log): keys full-outer-joined, each key emitting at most one change row
    * — absent-in-new `D`, absent-in-old `I`, both-present-but-different `U`
    * (null-safe struct compare over the non-key columns), identical rows
    * emitting nothing. Output carries the new side's values (`D` rows carry
    * the old values — the tombstone's last-known state) plus the `op`
    * column, so `applyCdc(old, diff withColumn version)` reconstructs `new`
    * EXACTLY (spec-pinned law). One key shuffle, answer-sized output —
    * diffing two 100 TB snapshots costs the join, the feed itself is only
    * the changed keys.
    */
  def snapshotDiff(
      old: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.functions.{col, struct, when, lit, coalesce}
    require(old.columns.sorted.sameElements(newDf.columns.sorted),
      s"schemas differ: ${old.columns.toSeq} vs ${newDf.columns.toSeq}")
    require(!old.columns.contains(opCol), s"'$opCol' collides with a data column")
    val valCols = old.columns.toSeq.filterNot(keyCols.contains)
    val o = old.select(struct(keyCols.map(col): _*).as("_k"),
      struct(valCols.map(col): _*).as("_vo"))
    val n = newDf.select(struct(keyCols.map(col): _*).as("_k"),
      struct(valCols.map(col): _*).as("_vn"))
    o.join(n, Seq("_k"), "full_outer")
      .withColumn(opCol,
        when(col("_vn").isNull, "D")
          .when(col("_vo").isNull, "I")
          .when(!(col("_vo") <=> col("_vn")), "U"))
      .filter(col(opCol).isNotNull)
      // branch on the SIDE (whole struct), not per column — a U row whose
      // new value is legitimately NULL must not resurrect the old value
      .select(keyCols.map(c => col(s"_k.$c").as(c)) ++
        valCols.map(c => when(col("_vn").isNull, col(s"_vo.$c"))
          .otherwise(col(s"_vn.$c")).as(c)) :+
        col(opCol): _*)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(totalBytes / targetFileBytes)` files. The lakehouse maintenance
    * op that keeps scan planning healthy — streaming ingest and per-batch
    * upserts leave thousands of KB-scale files whose per-file open/footer
    * cost eventually dominates scans (and whose manifest rows crowd
    * [[statsManifest]]).
    *
    * Without `sortCols` the rewrite is a `coalesce` — NO shuffle: each
    * output task just reads and concatenates several input files, which is
    * the right plan for pure bin-packing at 100 TB. With `sortCols` the
    * rewrite is a range layout ([[writeRangeLayout]] — one shuffle) so a
    * compaction can simultaneously restore the disjoint per-file ranges
    * that file-skipping needs. Returns (files before, files after).
    */
  def compactSmallFiles(
      spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long, sortCols: Seq[String] = Nil): (Int, Int) = {
    require(targetFileBytes > 0)
    def dataFiles(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(path, true)
      val out = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) out += f
      }
      out.toSeq
    }
    val before = dataFiles(inPath)
    val nOut = math.max(1, math.ceil(before.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val packed =
      if (sortCols.isEmpty) df.coalesce(nOut)
      else df.repartitionByRange(nOut, sortCols.map(df.col): _*)
        .sortWithinPartitions(sortCols.map(df.col): _*)
    packed.write.mode("overwrite").parquet(outPath)
    (before.size, dataFiles(outPath).size)
  }

  /** Per-file min/max statistics manifest: ONE scan of the table computes
    * (file, n_rows, min/max per stat column) — the scan-planning metadata
    * layer of a lakehouse table format (Delta/Iceberg file skipping),
    * queryable as a tiny DataFrame. Built once per layout write; at 100 TB
    * the manifest is MB-scale (one row per file) while the data is not.
    * Output columns: `file`, `n_rows`, and `<c>_min`/`<c>_max` per stat
    * column.
    */
  def statsManifest(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    require(cols.nonEmpty)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)
  }

  /** [[statsManifest]] over an explicit file list — the INCREMENTAL
    * maintenance face: after appending files to a layout, scan only the new
    * files and union the rows into the standing manifest (the manifest is
    * one independent row per file, so `old ∪ manifest(new files)` is
    * exactly `manifest(all)` — asserted in WarehouseSpec). At 100 TB this
    * turns manifest upkeep from a full-table scan per append into a scan of
    * the appended data only.
    */
  def statsManifestFor(
      spark: SparkSession, files: Seq[String], cols: Seq[String]): DataFrame = {
    require(files.nonEmpty && cols.nonEmpty)
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)
  }

  /** Manifest-driven pruned scan for `lo ≤ c ≤ hi`: files whose [min, max]
    * range cannot overlap the predicate are never OPENED — the manifest
    * (driver-small: one row per file) plans the scan, parquet row-group
    * stats then prune within the surviving files, and the residual filter
    * keeps exactness. Complements [[writeRangeLayout]]/[[writeZOrderLayout]]:
    * those make per-file ranges disjoint so this prunes to ~predicate/domain
    * of the files. Returns (pruned DataFrame, files kept, files total).
    */
  def prunedRead(
      spark: SparkSession, manifest: DataFrame, c: String,
      lo: Any, hi: Any): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col, lit}
    val total = manifest.count().toInt
    // a file with a NULL min/max (all-null chunk) cannot be ruled out
    val keep = manifest.filter(
      col(s"${c}_max").isNull || col(s"${c}_min").isNull ||
        !(col(s"${c}_max") < lit(lo) || col(s"${c}_min") > lit(hi)))
      .select("file").collect().map(_.getString(0))
    val df =
      if (keep.nonEmpty) spark.read.parquet(keep: _*)
      else {
        // every file pruned: keep the schema (from any one file) but scan none
        val any = manifest.select("file").limit(1).collect().map(_.getString(0))
        require(any.nonEmpty, "prunedRead over an empty manifest")
        spark.read.parquet(any: _*).filter(lit(false))
      }
    (df.filter(col(c).between(lit(lo), lit(hi))), keep.length, total)
  }

  // ------------------------------------------------------------- snapshots

  private def snapshotFs(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Commit a new immutable snapshot version of a table: data lands in
    * `root/v<version>`, never touching earlier versions — the minimal
    * time-travel layer (Delta/Iceberg's core idea without the format): a
    * reader resolved to v(N) keeps reading exactly that data while later
    * commits land, and an upsert pipeline commits each merge as v(N+1)
    * ([[upsertLatest]] output in, both inputs still readable). Single-writer
    * by design (the reference's loads are too); version dirs are only
    * visible to [[snapshotVersions]] once their `_SUCCESS` marker exists, so
    * a crashed half-written commit is never resolved as latest. Returns the
    * version path.
    */
  def commitSnapshot(df: DataFrame, root: String, version: Int): String = {
    require(version >= 0)
    val path = s"$root/v$version"
    val (fs, _) = snapshotFs(df.sparkSession, root)
    require(!fs.exists(new org.apache.hadoop.fs.Path(path)),
      s"snapshot v$version already committed (snapshots are immutable)")
    df.write.parquet(path) // errorifexists + _SUCCESS marker = the commit
    path
  }

  /** Committed snapshot versions (ascending): `v<N>` dirs whose `_SUCCESS`
    * marker exists. A listing over version COUNT, not data size.
    */
  def snapshotVersions(spark: SparkSession, root: String): Seq[Int] = {
    val (fs, p) = snapshotFs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.drop(1).toInt).sorted
  }

  /** Read a snapshot: a specific version, or latest when `version` is None.
    */
  def readSnapshot(
      spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val versions = snapshotVersions(spark, root)
    require(versions.nonEmpty, s"no committed snapshots under $root")
    val v = version.getOrElse(versions.max)
    require(versions.contains(v),
      s"snapshot v$v not committed (have ${versions.mkString(",")})")
    spark.read.parquet(s"$root/v$v")
  }

  /** Drop all but the newest `keepLatest` snapshot versions (vacuum).
    * Returns the versions deleted. Readers pinned to a vacuumed version
    * lose it — the same contract as Delta's VACUUM; size `keepLatest` to
    * the longest reader you run.
    */
  def vacuumSnapshots(spark: SparkSession, root: String, keepLatest: Int): Seq[Int] = {
    require(keepLatest >= 1)
    val (fs, _) = snapshotFs(spark, root)
    val drop = snapshotVersions(spark, root).dropRight(keepLatest)
    drop.foreach(v => fs.delete(new org.apache.hadoop.fs.Path(s"$root/v$v"), true))
    drop
  }

  /** Z-order (Morton-curve) layout over 2+ numeric columns: every output
    * file covers a SMALL min/max box on EVERY z-dimension, so parquet file
    * stats prune scans filtered on any of them — [[writeRangeLayout]]
    * concentrates one column's range per file but leaves the others spread
    * across the full domain, which prunes nothing for queries on a
    * secondary column.
    *
    * Mechanics: each column is rank-normalized into `2^bitsPerDim` cells
    * using approx-quantile boundaries (rank, not min/max scaling — a skewed
    * or heavy-tailed column still spreads across all cells); cell indices
    * are bit-interleaved into one long z-value; the write is a range layout
    * on that z-value. Cost at corpus scale: one quantile-sketch pass per
    * column (driver holds 2^bitsPerDim doubles per dim), then a per-row
    * O(2^bitsPerDim) boundary scan — keep `bitsPerDim` modest (the default
    * 6 → 64 cells/dim resolves 4096 distinct files for 2 dims, plenty,
    * since the z-value only needs to out-resolve the file count).
    */
  def writeZOrderLayout(
      df: DataFrame, path: String, zCols: Seq[String], partitions: Int,
      bitsPerDim: Int = 6, mode: String = "overwrite"): Unit = {
    // named imports: functions.mode would shadow the `mode` parameter
    import org.apache.spark.sql.functions.{bitwise_not => _, mode => _, _}
    require(zCols.size >= 2, "z-order needs >= 2 columns (use writeRangeLayout for 1)")
    require(bitsPerDim >= 1 && bitsPerDim * zCols.size <= 63,
      s"bitsPerDim * dims must fit a long (got $bitsPerDim x ${zCols.size})")
    require(partitions > 0)
    val cells = 1 << bitsPerDim
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    val nDims = zCols.size
    // one quantile-sketch job per column, up front; rank cell of a value =
    // how many boundaries it exceeds (nulls sort to cell 0)
    val cellCols = zCols.map { c =>
      val bounds = typedlit(df.stat.approxQuantile(c, probs, 0.001).toSeq)
      size(filter(bounds, b => col(c).cast("double") > b))
    }
    val zval = (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, bit) =>
      cellCols.zipWithIndex.foldLeft(acc) { case (a, (cell, d)) =>
        a.bitwiseOR(shiftleft(
          shiftright(cell, bit).bitwiseAND(lit(1)).cast("long"),
          bit * nDims + (nDims - 1 - d)))
      }
    }
    df.withColumn("__z", zval)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** SCD Type-2 dimension history from a change log: each change row becomes
    * a version with `effective_from` = its change time, `effective_to` = the
    * key's next change time (null = still open), `is_current` for the open
    * row. The intervals tile `[first change, ∞)` per key with no gaps or
    * overlaps — the property point-in-time joins rely on.
    *
    * Several changes at the SAME instant collapse to the `tieBreakCols`-last
    * one: the losers' `lead` is that same instant, giving a zero-width
    * interval that is dropped — so dedup and interval construction are ONE
    * window over ONE key shuffle, not a per-(key, ts) pre-aggregation plus a
    * second per-key pass. NULL-keyed or NULL-timed changes are dropped up
    * front (they can never be in effect at any instant).
    *
    * The reference's analog is version-stamped survey reloads (ref
    * lib04_Update_Table_Data.py:509-541 replaces a slice wholesale);
    * retaining every version with validity intervals is what a warehouse
    * needs to answer "what did this dimension say when the fact happened".
    */
  def scd2History(
      changes: DataFrame, keyCols: Seq[String], tsCol: String,
      tieBreakCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lead}
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    val reserved = Seq("effective_from", "effective_to", "is_current")
    require(reserved.intersect(changes.columns.toSeq).isEmpty,
      s"column names $reserved are reserved by scd2History")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieBreakCols).map(col): _*)
    changes
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .filter(col("effective_to").isNull || col("effective_to") > col("effective_from"))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Incremental SCD2 maintenance: apply a batch of new changes to an
    * existing [[scd2History]] table without rebuilding it. Only the keys
    * PRESENT in the batch replay (their stored rows ARE the original change
    * records — the interval columns just drop off and re-derive), every
    * other key's rows pass through untouched — so a daily batch touching
    * 0.1% of keys costs one semi/anti join plus a window over that 0.1%,
    * not a full-history rebuild. Late (out-of-order) changes are exact for
    * the same reason: the affected key's whole history re-tiles.
    *
    * Idempotent: re-applying a batch collapses the duplicate same-instant
    * rows via the zero-width drop, leaving the history unchanged —
    * the replayable-load property the reference's skip-if-done re-runs
    * guarantee procedurally (ref lib04_Update_Table_Data.py:509-541).
    */
  def scd2Apply(
      existing: DataFrame, changes: DataFrame,
      keyCols: Seq[String], tsCol: String, tieBreakCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val affected = changes.select(keyCols.map(col): _*).distinct()
    val untouched = existing.join(affected, keyCols, "left_anti")
    val replayed = existing.join(affected, keyCols, "left_semi")
      .drop("effective_from", "effective_to", "is_current")
      .unionByName(changes)
    untouched.unionByName(scd2History(replayed, keyCols, tsCol, tieBreakCols))
  }

  /** Point-in-time join: each fact row enriched with the dimension version
    * in effect at its timestamp (`effective_from <= factTs < effective_to`,
    * open interval = no upper bound). Left-outer: facts before the key's
    * first version carry nulls.
    *
    * Because [[scd2History]] intervals tile, containment is equivalent to
    * "latest version with `effective_from <= factTs`" — so this reuses
    * [[graft.operators.AsOfJoin]]'s union + last-over-window plan: ONE
    * shuffle on the key and linear per-key state, where the literal
    * containment theta-join degenerates to per-key history × versions
    * candidate pairs on dense keys. The carried `effective_to` is
    * re-checked post-join (free, and keeps the operator honest if handed a
    * non-tiling interval table — a truncated history then yields nulls
    * rather than a wrong version).
    */
  def pointInTimeJoin(
      facts: DataFrame, scd2: DataFrame,
      keyCol: String, factTsCol: String,
      carryCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    val carried = (carryCols ++ Seq("effective_from", "effective_to")).distinct
    val joined = graft.operators.AsOfJoin.asOf(
      facts, scd2.select((keyCol +: carried).distinct.map(col): _*),
      keyCol, factTsCol, "effective_from", carried)
    val inWindow = col("effective_to").isNull || col(factTsCol) < col("effective_to")
    joined.select(
      facts.columns.map(col) ++
        carryCols.map(c => when(inWindow, col(c)).as(c)): _*)
  }

  /** Dynamic partition overwrite: replace ONLY the hive partitions present
    * in `df`, leaving sibling partitions' files untouched (Spark's static
    * default drops the whole table first — the classic
    * restated-one-day-reloads-everything incident). This is the idempotent
    * daily re-load primitive: re-running a day's pipeline rewrites that
    * day's directory and nothing else, so concurrent readers of other days
    * never see a hole.
    *
    * The mode is set per-WRITER (not on the session), so concurrent queries
    * sharing the SparkSession keep their own semantics.
    */
  def overwritePartitionsDynamic(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "dynamic overwrite needs partition columns")
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }
}
