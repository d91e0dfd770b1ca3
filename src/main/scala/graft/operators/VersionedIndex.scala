package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation log: the OBJECT-STORE-SAFE commit spine for the versioned
  * index families. The rename-swap protocols (`deleteFromIndexTable`,
  * `retrainIvfIndex`, `compactNearDupIndex`) publish by atomic directory
  * rename — correct on HDFS/POSIX, non-atomic (copy + delete) on S3-like
  * object stores. This log publishes by POINTER instead, the
  * [[graft.load.Warehouse.commitSnapshot]] / BM25-segment-log pattern
  * generalized to a whole index:
  *
  * {{{
  *   root/_generations/<N>/...   one complete, immutable index incarnation
  *   root/_commits/<N>           marker file: its CREATION commits gen N
  * }}}
  *
  * A mutator stages the next generation as a full directory tree, then
  * commits it with ONE marker-file create — a single atomic PUT on any
  * store. Readers resolve max(committed N) and never look inside an
  * uncommitted staging tree, so a crash anywhere before the marker is
  * invisible (old generation keeps serving) and a crash after it is
  * already durable. Superseded generations stay readable for in-flight
  * queries until [[vacuumGenerations]] — snapshot isolation, where the
  * in-place swap gives readers a brief fail-loudly window instead.
  *
  * The price of rename-freedom is write amplification: a generation swap
  * rewrites the full payload rather than renaming the affected partitions
  * in. That is the right trade exactly where this mode is for — object
  * stores, where the "cheap" rename was a copy anyway — and maintenance
  * verbs (consolidate/retrain) rewrite the full payload in either mode.
  */
object GenerationLog {

  private def fsOf(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def generationDir(root: String, gen: Long): String = s"$root/_generations/$gen"

  private def numericChildren(
      fs: org.apache.hadoop.fs.FileSystem, dir: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)

  /** Generations with a commit marker, ascending. */
  def committedGenerations(spark: SparkSession, root: String): Seq[Long] =
    numericChildren(fsOf(spark, root),
      new org.apache.hadoop.fs.Path(s"$root/_commits")).sorted

  def currentGeneration(spark: SparkSession, root: String): Option[Long] =
    committedGenerations(spark, root).lastOption

  def currentDir(spark: SparkSession, root: String): Option[String] =
    currentGeneration(spark, root).map(generationDir(root, _))

  def requireCurrentDir(spark: SparkSession, root: String): String =
    currentDir(spark, root).getOrElse(throw new IllegalStateException(
      s"no committed generation at $root — build the index first"))

  /** Reserve the next generation id: past max over committed markers AND
    * staged directories, so a crashed stager's debris is never reused (it
    * ages out via [[vacuumGenerations]]). Mutators run under the index's
    * [[MaintenanceLock]], which serializes reservation.
    */
  private[operators] def stageNext(spark: SparkSession, root: String): (Long, String) = {
    val fs = fsOf(spark, root)
    val staged = numericChildren(fs, new org.apache.hadoop.fs.Path(s"$root/_generations"))
    val gen = (committedGenerations(spark, root) ++ staged ++ Seq(0L)).max + 1
    val dir = generationDir(root, gen)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    (gen, dir)
  }

  /** The commit point: one marker-file create, no rename anywhere. */
  private[operators] def commit(spark: SparkSession, root: String, gen: Long): Unit = {
    val fs = fsOf(spark, root)
    val marker = new org.apache.hadoop.fs.Path(s"$root/_commits/$gen")
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, false)
    try out.write(s"generation $gen".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[operators] def newestMtime(
      fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path, depth: Int): Long = {
    val st = fs.getFileStatus(p)
    if (!st.isDirectory || depth <= 0) st.getModificationTime
    else (Seq(st.getModificationTime) ++
      fs.listStatus(p).map(c => newestMtime(fs, c.getPath, depth - 1))).max
  }

  /** Health audit of a generation-log index root — the r11 verdict-#5
    * symmetry face: the lifecycle telemetry [[SparseSim]]'s BM25 segment
    * health pioneered, for every family on this spine. ONE row of
    * all-integer, hash-replayable lifecycle state, priced at directory
    * listings plus one bounded tombstone count:
    *
    *  - `n_generations` committed (1 on a healthy vacuumed index; growth
    *    means vacuum isn't running),
    *  - `current_generation` (the pointer readers resolve),
    *  - `n_staged_debris` staged-but-uncommitted generation trees (crashed
    *    stagers awaiting TTL vacuum; persistent growth = a crash loop),
    *  - `n_segments` committed segments in the current generation and
    *    `n_stream_segments` of them carrying stream batch ids (probe-side
    *    read fan-out — the "time to consolidate" trigger),
    *  - `n_tombstones` distinct tombstoned ids (every probe pays this
    *    anti-join until a consolidate/retrain purges them).
    */
  def indexHealth(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, root)
    val committed = committedGenerations(spark, root)
    val staged = numericChildren(fs,
      new org.apache.hadoop.fs.Path(s"$root/_generations"))
      .filterNot(committed.contains)
    val (nSegs, nStreamSegs, nTombs) = committed.lastOption.map { g =>
      val dir = generationDir(root, g)
      // present-filtered, same screen committedDirs applies: marker-only
      // commits (all-screened batches whose data dir was dropped) are NOT
      // probe-side read fan-out, and counting them would let the
      // "time to consolidate" trigger fire on segments that don't exist
      val segs = SegmentLog.committedPresent(spark, dir)
      val tombDir = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
      val tombs =
        if (fs.exists(tombDir))
          spark.read.parquet(tombDir.toString).distinct().count()
        else 0L
      (segs.map(_._1).distinct.size.toLong,
        segs.filter(_._2.isDefined).map(_._1).distinct.size.toLong, tombs)
    }.getOrElse((0L, 0L, 0L))
    Seq((committed.size.toLong, committed.lastOption.getOrElse(-1L),
      staged.size.toLong, nSegs, nStreamSegs, nTombs))
      .toDF("n_generations", "current_generation", "n_staged_debris",
        "n_segments", "n_stream_segments", "n_tombstones")
  }

  /** GC: drop superseded committed generations (current stays) and staged
    * generation trees that have been quiet past `ttlMs` (a LIVE stager
    * refreshes mtimes as it writes; only a dead one ages out — the
    * [[MaintenanceLock]] TTL discipline). Deletes only — safe everywhere.
    * Returns the ids removed.
    *
    * Superseded generations get the SAME `ttlMs` quiescence grace as
    * staged debris, measured from the moment they were superseded (the
    * mtime of the earliest commit marker ABOVE them): the snapshot
    * isolation the log promises means an in-flight probe may have resolved
    * the previous current dir just before a consolidate/retrain swapped
    * generations — vacuuming it immediately would turn that probe into
    * FileNotFound. Pass `ttlMs = 0` only where single-writer/no-reader
    * quiescence is known (tests, sequential fixtures).
    */
  def vacuumGenerations(
      spark: SparkSession, root: String,
      ttlMs: Long = MaintenanceLock.DefaultTtlMs): Seq[Long] = {
    val fs = fsOf(spark, root)
    val committed = committedGenerations(spark, root)
    val current = committed.lastOption
    val now = System.currentTimeMillis()
    def markerMtime(g: Long): Long =
      try fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$root/_commits/$g"))
        .getModificationTime
      catch { case _: java.io.IOException => now }
    val superseded = committed.dropRight(1).filter { g =>
      // superseded at the instant its successor committed
      val supersededAt = committed.filter(_ > g).map(markerMtime).min
      now - supersededAt > ttlMs
    }
    superseded.foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(generationDir(root, g)), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/_commits/$g"), false)
    }
    val gensDir = new org.apache.hadoop.fs.Path(s"$root/_generations")
    val deadStaged = numericChildren(fs, gensDir)
      .filterNot(g => current.contains(g))
      .filterNot(committed.contains)
      .filter { g =>
        val p = new org.apache.hadoop.fs.Path(generationDir(root, g))
        now - newestMtime(fs, p, 4) > ttlMs
      }
    deadStaged.foreach(g =>
      fs.delete(new org.apache.hadoop.fs.Path(generationDir(root, g)), true))
    superseded ++ deadStaged
  }
}

/** Marker-committed SEGMENTS inside a committed generation: the rename-free
  * ingest protocol shared by the versioned index families. A segment is a
  * directory `segments/<prefix>=<segId>/` staged fully, then published by
  * ONE `_batch_commits/<segId>[.s<streamBatchId>]` file create. Readers
  * list the marker dir and read exactly the committed segment dirs — an
  * uncommitted (crashed) segment is invisible and ages out via vacuum. A
  * stream batch's checkpoint id rides in the marker NAME, so replay
  * detection is a listing, not a read.
  */
private[operators] object SegmentLog {

  private def fsOf(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def segmentsDir(genDir: String) = s"$genDir/segments"
  def markersDir(genDir: String) = s"$genDir/_batch_commits"
  def segmentDir(genDir: String, segId: Long) =
    s"${segmentsDir(genDir)}/ingest_batch=$segId"

  /** (segId, streamBatchId?) per committed marker. */
  def committed(spark: SparkSession, genDir: String): Seq[(Long, Option[Long])] = {
    val fs = fsOf(spark, genDir)
    val dir = new org.apache.hadoop.fs.Path(markersDir(genDir))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName).flatMap { n =>
      n.split("\\.s", 2) match {
        case Array(seg) => scala.util.Try(seg.toLong).toOption.map((_, None: Option[Long]))
        case Array(seg, b) => for {
          s <- scala.util.Try(seg.toLong).toOption
          bid <- scala.util.Try(b.toLong).toOption
        } yield (s, Some(bid))
        case _ => None
      }
    }
  }

  def streamBatchCommitted(spark: SparkSession, genDir: String, batchId: Long): Boolean =
    committed(spark, genDir).exists(_._2.contains(batchId))

  /** Was any tombstone written AT or AFTER this batch's earliest marker?
    * The replay-heal trigger: a replayed batch can only diverge from its
    * frozen committed segment if a delete landed BETWEEN the first attempt
    * and the replay — when every tombstone file predates the marker (or
    * none exist), the replay is provably consistent and the heal's
    * verification job is skipped. `>=` on millisecond mtimes: an
    * equal-timestamp tombstone triggers a (harmless, idempotent) heal
    * rather than ever skipping a needed one.
    */
  def tombstonesSinceMarker(
      spark: SparkSession, genDir: String, batchId: Long): Boolean = {
    val fs = fsOf(spark, genDir)
    val tombDir = new org.apache.hadoop.fs.Path(s"$genDir/tombstones")
    if (!fs.exists(tombDir)) return false
    val tombNewest = fs.listStatus(tombDir).map(_.getModificationTime)
      .foldLeft(0L)(math.max)
    val markerOldest = {
      val md = new org.apache.hadoop.fs.Path(markersDir(genDir))
      if (!fs.exists(md)) Long.MaxValue
      else {
        val mine = fs.listStatus(md)
          .filter(_.getPath.getName.endsWith(s".s$batchId"))
          .map(_.getModificationTime)
        if (mine.isEmpty) Long.MaxValue else mine.min
      }
    }
    tombNewest >= markerOldest
  }

  /** Committed segment dirs that exist, optionally restricted to stream
    * segments STRICTLY BEFORE `beforeBatch` (non-stream segments — batch
    * appends and the build base — always qualify, mirroring the in-place
    * `ingest_batch < b` read where `-1` always qualifies).
    */
  /** Committed (segId, streamBatchId?) pairs whose data dir exists — the
    * marker-only commits (all-screened/all-suppressed batches) filtered
    * out with ONE listing of the segments dir instead of one exists() per
    * marker. Markers are listed FIRST, data dirs second: the commit
    * protocol writes the dir before its marker, so a listed marker implies
    * the dir exists — the reverse order could observe a marker whose dir
    * was absent from an EARLIER listing and silently drop a
    * freshly committed segment from the live view for that read.
    */
  def committedPresent(spark: SparkSession, genDir: String): Seq[(Long, Option[Long])] = {
    val fs = fsOf(spark, genDir)
    val marked = committed(spark, genDir)
    val sd = new org.apache.hadoop.fs.Path(segmentsDir(genDir))
    val present: Set[Long] =
      if (!fs.exists(sd)) Set.empty
      else fs.listStatus(sd).iterator.map(_.getPath.getName)
        .filter(_.startsWith("ingest_batch="))
        .flatMap(n => scala.util.Try(n.stripPrefix("ingest_batch=").toLong).toOption)
        .toSet
    marked.filter(s => present.contains(s._1))
  }

  def committedDirs(
      spark: SparkSession, genDir: String,
      beforeBatch: Option[Long] = None): Seq[String] =
    committedPresent(spark, genDir)
      .filter { case (_, sbid) =>
        beforeBatch.forall(b => sbid.forall(_ < b)) }
      .map(_._1).distinct.sorted
      .map(segmentDir(genDir, _))

  /** Next segment id: past max over markers AND staged dirs (crash debris
    * is never reused; it ages out via vacuum).
    */
  def nextSegId(spark: SparkSession, genDir: String): Long = {
    val fs = fsOf(spark, genDir)
    val sd = new org.apache.hadoop.fs.Path(segmentsDir(genDir))
    val staged =
      if (!fs.exists(sd)) Seq.empty
      else fs.listStatus(sd).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("ingest_batch="))
        .flatMap(n => scala.util.Try(n.stripPrefix("ingest_batch=").toLong).toOption)
    (committed(spark, genDir).map(_._1) ++ staged ++ Seq(-1L)).max + 1
  }

  /** Publish a staged segment: one marker-file create. */
  def commitMarker(spark: SparkSession, genDir: String, markerName: String): Unit = {
    val fs = fsOf(spark, genDir)
    val marker = new org.apache.hadoop.fs.Path(markersDir(genDir), markerName)
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, false)
    try out.write(s"segment $markerName".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Drop uncommitted segment dirs quiet past `ttlMs`. */
  def vacuumSegments(spark: SparkSession, genDir: String, ttlMs: Long): Unit = {
    val fs = fsOf(spark, genDir)
    val sd = new org.apache.hadoop.fs.Path(segmentsDir(genDir))
    if (!fs.exists(sd)) return
    val committedIds = committed(spark, genDir).map(_._1).toSet
    val now = System.currentTimeMillis()
    fs.listStatus(sd).toSeq
      .filter(_.getPath.getName.startsWith("ingest_batch="))
      .filterNot(s => scala.util.Try(
        s.getPath.getName.stripPrefix("ingest_batch=").toLong).toOption
        .exists(committedIds.contains))
      .filter(s => now - GenerationLog.newestMtime(fs, s.getPath, 3) > ttlMs)
      .foreach(s => fs.delete(s.getPath, true))
  }
}

/** The IVF ANN index on the generation-log commit model — every verb of
  * the in-place lifecycle ([[Similarity.writeIvfIndex]] family: build →
  * append/stream-ingest → delete → consolidate → retrain → probe), with
  * ZERO index-protocol directory renames, so the whole lifecycle runs on
  * S3-like object stores where the in-place family's staged-swap renames
  * are non-atomic ([[VersionedIndexSpec]] drives it end-to-end on a
  * filesystem that refuses directory renames). Semantics differences from
  * the in-place family, all consequences of immutable generations:
  *
  *  - deletes are tombstone-only (the BM25/near-dup model): the id stops
  *    retrieving immediately via the probe-side anti-join; the physical
  *    purge happens at the next [[consolidate]]/[[retrain]], which write
  *    a tombstone-free generation. Re-adding a deleted id requires a
  *    consolidation first (in-place: a tombstone purge);
  *  - appends and stream batches land as marker-committed SEGMENTS
  *    ([[SegmentLog]]: `segments/ingest_batch=<segId>` +
  *    `_batch_commits/<segId>`) inside
  *    the current generation — pure dir-create + file-create, atomic
  *    everywhere, and snapshot-isolated (a probe never sees a torn
  *    batch, which the in-place append cannot promise mid-job). A stream
  *    batch's marker records its checkpoint batch id (`<seg>.s<batch>`),
  *    so a replay after a crash-before-checkpoint-commit is detected by
  *    LISTING alone and skipped — exactly-once without dynamic partition
  *    overwrite, whose job commit renames staging directories and is
  *    therefore banned here;
  *  - consolidate/retrain produce the NEXT generation (batches folded to
  *    the `-1` base, tombstones applied and dropped) and commit it with
  *    one marker create. Pass the ingest stream's `checkpointDir` to both
  *    (the [[graft.streaming.CommitLog]] guard): a written-but-uncommitted
  *    batch must not replay across a generation boundary.
  *
  * Probe correctness is the standing argument: exhaustive probe ≡ brute
  * force for ANY centroid set, over live membership = base ∪ committed
  * segments − tombstones (hash-gated at `s_knn_versioned` /
  * `e_versioned_stream_ingest`).
  */
object VersionedIvf {

  private def fsOf(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeSegment(
      spark: SparkSession, genDir: String, segId: Long,
      rows: DataFrame, markerName: String): Unit = {
    // overwrite clears a crashed earlier attempt's debris at this id;
    // visibility comes from the marker, not the write
    val segDir = SegmentLog.segmentDir(genDir, segId)
    rows.select(col("vec_id"), col("embedding"), col("cluster"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("cluster")
      .parquet(segDir)
    // an ALL-SCREENED batch (every row tombstoned) stages zero partitions —
    // a dir with no parquet footers, which schema inference on the segment
    // union cannot read. Drop it and commit marker-only: the marker must
    // still land so a stream replay is recognized as such (the
    // VersionedNearDup.gateBatch all-suppressed contract)
    val fs = fsOf(spark, genDir)
    val hasData = fs.listStatus(new org.apache.hadoop.fs.Path(segDir))
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("cluster="))
    if (!hasData) fs.delete(new org.apache.hadoop.fs.Path(segDir), true)
    SegmentLog.commitMarker(spark, genDir, markerName)
  }

  /** Live membership of a generation: the base corpus ∪ committed batch
    * segments, minus tombstones. Cluster partition pruning flows through
    * both legs (`cluster=` dirs in base and inside every segment);
    * uncommitted segment dirs are excluded by construction (explicit
    * committed-dir list under a basePath), not by filtering. Stream
    * segments can be restricted to STRICTLY BEFORE `beforeBatch` (base and
    * batch appends always qualify) — the gates' replay-safe read.
    */
  private[operators] def liveCorpus(
      spark: SparkSession, genDir: String,
      beforeBatch: Option[Long] = None): DataFrame = {
    val fs = fsOf(spark, genDir)
    val base = spark.read.parquet(s"$genDir/corpus")
      .select(col("vec_id"), col("embedding"),
        col("cluster").cast("int").as("cluster"),
        col("ingest_batch").cast("long").as("ingest_batch"))
    val segDirs = SegmentLog.committedDirs(spark, genDir, beforeBatch)
    val all =
      if (segDirs.isEmpty) base
      else base.unionByName(
        spark.read.option("basePath", SegmentLog.segmentsDir(genDir)).parquet(segDirs: _*)
          .select(col("vec_id"), col("embedding"),
            col("cluster").cast("int").as("cluster"),
            col("ingest_batch").cast("long").as("ingest_batch")))
    val tombDir = new org.apache.hadoop.fs.Path(s"$genDir/tombstones")
    if (fs.exists(tombDir))
      all.join(
        broadcast(spark.read.parquet(tombDir.toString)
          .select(col("vec_id").as("__tomb_id")).distinct()),
        col("vec_id") === col("__tomb_id"), "left_anti")
    else all
  }

  /** The live corpus of the CURRENT generation, as a reader view —
    * (vec_id, embedding, cluster, ingest_batch), where `ingest_batch` is
    * the segment id (-1 = base build/consolidated). The audit/receipt
    * face the in-place family's raw `$path/corpus` read used to serve.
    */
  def corpusView(spark: SparkSession, root: String): DataFrame =
    liveCorpus(spark, GenerationLog.requireCurrentDir(spark, root))

  private def writeGeneration(
      spark: SparkSession, genDir: String,
      centroids: Seq[Seq[Float]], assigned: DataFrame): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$genDir/centroids")
    assigned.select(col("vec_id"), col("embedding"), col("cluster"), col("ingest_batch"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("cluster", "ingest_batch")
      .parquet(s"$genDir/corpus")
  }

  /** Build (or rebuild) the index: stage generation N+1, commit by marker.
    * A rebuild over a live index is automatically a fresh start — the new
    * generation carries no tombstones or segments, and the old one keeps
    * serving concurrent probes until the marker lands.
    */
  def write(
      corpus: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[Seq[Float]], root: String): Unit = {
    val spark = corpus.sparkSession
    MaintenanceLock.withLock(spark, root) {
      val (gen, dir) = GenerationLog.stageNext(spark, root)
      writeGeneration(spark, dir, centroids,
        Similarity.assignToIndex(corpus, vecCol, idCol, centroids)
          .withColumn("ingest_batch", lit(-1L)))
      GenerationLog.commit(spark, root, gen)
    }
  }

  /** Probe the current generation — [[Similarity.ivfTopKFromIndex]] shape
    * over live membership. Read-only: never repairs, never writes.
    */
  def topKFromIndex(
      spark: SparkSession, root: String, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nprobe: Int,
      broadcastQueries: Boolean = true): DataFrame = {
    val dir = GenerationLog.requireCurrentDir(spark, root)
    val centroids = Similarity.readIvfCentroids(spark, dir)
    val live = liveCorpus(spark, dir)
    // static partition filter on the probed clusters: DPP cannot reach
    // through the base ∪ segments Union, so without it an nprobe-pruned
    // probe reads EVERY cluster of every leg (see Similarity.probedClusters).
    // Applied only when segments EXIST — a consolidated index is a single
    // scan where DPP already prunes, and the filter's one small query-side
    // job would be pure overhead. Corpus-scale query sides
    // (broadcastQueries = false) probe everything anyway — skipped there
    val pruned =
      if (broadcastQueries && SegmentLog.committedDirs(spark, dir).nonEmpty)
        live.filter(col("cluster").isin(
          Similarity.probedClusters(queries, vecCol, centroids, nprobe): _*))
      else live
    Similarity.probeAssignedCorpus(
      pruned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"), col("cluster")),
      queries, vecCol, idCol, k, centroids, nprobe, broadcastQueries)
  }

  /** Retention delete: tombstone append only (one small file). The ids
    * stop retrieving immediately (probe anti-join) and are physically
    * purged by the next [[consolidate]]/[[retrain]]. Idempotent. Returns
    * the number of LIVE rows the tombstones newly suppress (the in-place
    * family's "rows actually deleted" face); the id set is pinned once so
    * the count and the tombstone write cannot diverge under a
    * non-deterministic `ids` plan.
    *
    * `checkpointDir`: pass the ingest/gate stream's checkpoint dir when
    * deleting from an index a stream is actively gating against — the
    * [[graft.streaming.CommitLog]] guard refuses to tombstone while a
    * written-but-uncommitted batch is in flight, whose replay would
    * otherwise recompute its kept set against a shrunken suppression view
    * (the replay-heal in [[ingestBatch]] bounds the damage, but bitwise
    * replay determinism needs quiescence, same as [[consolidate]]).
    */
  def delete(
      spark: SparkSession, root: String, ids: DataFrame, idCol: String,
      checkpointDir: Option[String] = None): Long = {
    checkpointDir.foreach(graft.streaming.CommitLog.requireAllCommitted(
      spark, _, s"VersionedIvf.delete($root)"))
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val pinned = graft.CacheScope.localCheckpoint(
        ids.select(col(idCol).cast("long").as("vec_id")).distinct())
      try {
        val n = liveCorpus(spark, dir)
          .join(broadcast(pinned), Seq("vec_id"), "left_semi").count()
        pinned.coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
        n
      } finally graft.CacheScope.unpersistCheckpoint(pinned)
    }
  }

  /** Batch append against the current generation's FROZEN centroids — a
    * marker-committed segment, so concurrent probes see it atomically.
    */
  def append(batch: DataFrame, vecCol: String, idCol: String, root: String): Unit = {
    val spark = batch.sparkSession
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val segId = SegmentLog.nextSegId(spark, dir)
      writeSegment(spark, dir, segId,
        Similarity.assignToIndex(batch, vecCol, idCol,
          Similarity.readIvfCentroids(spark, dir)),
        segId.toString)
    }
  }

  /** One stream micro-batch: skip if a committed segment already records
    * this checkpoint batch id (replay), else screen tombstones, assign
    * against the CURRENT generation's centroids (re-resolved per batch, so
    * ingest follows a mid-stream consolidation/retrain onto the new
    * generation instead of mis-assigning against stale centroids), write
    * the segment, commit its marker.
    *
    * Runs under the index [[MaintenanceLock]], like every other mutator:
    * segment-id reservation is only race-free when reservation + write +
    * marker commit are serialized against concurrent batch appends (same
    * segId reserved twice → the later overwrite clobbers the earlier
    * segment silently), and a consolidate/retrain committing a new
    * generation mid-batch would strand this batch's segment in the
    * superseded generation. The lock makes generation resolution and
    * segment publish one atomic unit — acquired with RETRY
    * ([[MaintenanceLock.withLockRetry]]): a gate batch racing a routine
    * delete/consolidate waits it out instead of killing the stream.
    *
    * `frozenCentroids` is GENERATION-TAGGED `(gen, centroids)`: callers
    * that hold the stream's frozen centroids (the semantic gate probes
    * with them) pass them through to save one centroid read + collect per
    * micro-batch, but they are used only while the index is still on the
    * generation they came from — after a mid-stream consolidate/retrain
    * commits a new generation, the batch re-reads the current centroids
    * (validated here, UNDER the lock, so the check and the segment publish
    * are one atomic unit) instead of assigning stale clusters into the new
    * generation and violating the misassigned==0 drift invariant.
    */
  private[operators] def ingestBatch(
      batch: DataFrame, vecCol: String, idCol: String,
      root: String, batchId: Long,
      frozenCentroids: Option[(Long, Seq[Seq[Float]])] = None): Unit =
   MaintenanceLock.withLockRetry(batch.sparkSession, root) {
    val spark = batch.sparkSession
    val gen = GenerationLog.currentGeneration(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed generation at $root — build the index first"))
    val dir = GenerationLog.generationDir(root, gen)
    val centroids = frozenCentroids match {
      case Some((g, c)) if g == gen => c
      case _ => Similarity.readIvfCentroids(spark, dir)
    }
    val fs = fsOf(spark, dir)
    val tombDir = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    def screen(df: DataFrame): DataFrame =
      if (fs.exists(tombDir))
        df.join(
          broadcast(spark.read.parquet(tombDir.toString)
            .select(col("vec_id").as("__tomb_id")).distinct()),
          col("vec_id") === col("__tomb_id"), "left_anti")
      else df
    if (SegmentLog.streamBatchCommitted(spark, dir, batchId)) {
      // REPLAY HEAL: the batch content a gate hands in can legitimately
      // differ from the first attempt's (a tombstone delete between the
      // attempts shrinks the gate's suppression set, so the replayed kept
      // set grows). The committed segment is frozen — so verify coverage
      // and stage a SUPPLEMENTAL segment (new segId, same .s<batchId>
      // marker suffix, which future batches read and this batch's own
      // replays exclude) for any live batch row missing from this batch's
      // committed segments. Idempotent: once covered, the diff is empty
      // and nothing is written. Triggered ONLY when a tombstone landed at
      // or after this batch's marker (one mtime listing) — the no-delete
      // replay, the overwhelmingly common case, stays a pure no-op.
      if (!SegmentLog.tombstonesSinceMarker(spark, dir, batchId)) return
      val segDirs = SegmentLog.committedPresent(spark, dir)
        .filter(_._2.contains(batchId))
        .map(s => SegmentLog.segmentDir(dir, s._1))
      val assigned = screen(
        Similarity.assignToIndex(batch, vecCol, idCol, centroids))
      val missing =
        if (segDirs.isEmpty) assigned
        else assigned.join(
          spark.read.option("basePath", SegmentLog.segmentsDir(dir))
            .parquet(segDirs: _*).select(col("vec_id")),
          Seq("vec_id"), "left_anti")
      if (!missing.limit(1).isEmpty) {
        val segId = SegmentLog.nextSegId(spark, dir)
        writeSegment(spark, dir, segId, missing, s"$segId.s$batchId")
      }
      return
    }
    val screened = screen(
      Similarity.assignToIndex(batch, vecCol, idCol, centroids))
    val segId = SegmentLog.nextSegId(spark, dir)
    writeSegment(spark, dir, segId, screened, s"$segId.s$batchId")
  }

  /** Continuous ingest: one marker-committed segment per micro-batch. */
  def streamAppend(
      stream: DataFrame, vecCol: String, idCol: String,
      root: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestBatch(batch.toDF(), vecCol, idCol, root, batchId))
      .start()

  /** Fold segments into the base and apply tombstones — as the NEXT
    * generation (assignments and centroids unchanged). The versioned
    * analog of [[Similarity.consolidateIvfIndex]] + [[Similarity.purgeIvfTombstones]]
    * in one verb. Refuses to write an empty generation (an all-tombstoned
    * index is a rebuild, not a consolidation).
    */
  def consolidate(
      spark: SparkSession, root: String,
      checkpointDir: Option[String] = None): Unit = {
    checkpointDir.foreach(graft.streaming.CommitLog.requireAllCommitted(
      spark, _, s"VersionedIvf.consolidate($root)"))
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val live = liveCorpus(spark, dir)
        .select(col("vec_id"), col("embedding"), col("cluster"))
        .withColumn("ingest_batch", lit(-1L))
      if (live.isEmpty) throw new IllegalStateException(
        s"consolidating $root would write an empty generation (every doc " +
          "tombstoned) — rebuild with VersionedIvf.write instead")
      val (gen, next) = GenerationLog.stageNext(spark, root)
      writeGeneration(spark, next, Similarity.readIvfCentroids(spark, dir), live)
      GenerationLog.commit(spark, root, gen)
    }
  }

  /** Retrain the coarse quantizer over live membership and publish the
    * re-assigned index as the next generation — the versioned
    * [[Similarity.retrainIvfIndex]]. Tombstones are applied (the new
    * generation starts clean); segments fold into the base.
    */
  def retrain(
      spark: SparkSession, root: String,
      k: Option[Int] = None, iterations: Int = 3, trainSample: Int = 1,
      checkpointDir: Option[String] = None): Unit = {
    checkpointDir.foreach(graft.streaming.CommitLog.requireAllCommitted(
      spark, _, s"VersionedIvf.retrain($root)"))
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val live = graft.CacheScope.localCheckpoint(
        liveCorpus(spark, dir).select(col("vec_id"), col("embedding")))
      try {
        if (live.isEmpty) throw new IllegalStateException(
          s"retraining $root over an all-tombstoned corpus — rebuild with " +
            "VersionedIvf.write instead")
        val kk = k.getOrElse(Similarity.readIvfCentroids(spark, dir).size)
        val cents = Similarity.trainIvfCentroids(
          live, "embedding", "vec_id", kk, iterations, trainSample)
        val (gen, next) = GenerationLog.stageNext(spark, root)
        writeGeneration(spark, next, cents,
          live.select(col("vec_id"), col("embedding"),
            Similarity.nearestCentroid(col("embedding"), cents).as("cluster"))
            .withColumn("ingest_batch", lit(-1L)))
        GenerationLog.commit(spark, root, gen)
      } finally graft.CacheScope.unpersistCheckpoint(live)
    }
  }

  /** GC superseded generations plus aged uncommitted segment debris inside
    * the current one. Deletes only.
    */
  def vacuum(
      spark: SparkSession, root: String,
      ttlMs: Long = MaintenanceLock.DefaultTtlMs): Unit = {
    GenerationLog.vacuumGenerations(spark, root, ttlMs)
    GenerationLog.currentDir(spark, root)
      .foreach(SegmentLog.vacuumSegments(spark, _, ttlMs))
  }

  /** RECEIPT/STRESS hook: publish already-staged fabricated segment dirs
    * (written directly under `segments/ingest_batch=<id>` of the current
    * generation) by creating their commit markers — reproducing the
    * read-side state of a gate that ran N batches between consolidations
    * without paying N sequential micro-batch writes. The per-batch WRITE
    * cost is receipted elsewhere; this exists to measure probe wall vs
    * committed-segment count. Production writers go through
    * [[append]]/[[ingestBatch]].
    */
  private[graft] def commitFabricatedSegments(
      spark: SparkSession, root: String, segIds: Seq[Long]): Unit = {
    val dir = GenerationLog.requireCurrentDir(spark, root)
    segIds.foreach(id => SegmentLog.commitMarker(spark, dir, id.toString))
  }

  /** Retrain trigger + integrity scan over live membership — the
    * [[Similarity.ivfAssignmentDrift]] metric on the versioned index
    * (same shared computation): per-`ingest_batch` mean alignment to the
    * assigned centroid and the misassigned count, which is zero by
    * construction on any healthy index (every write path assigns the
    * argmax; retrain reassigns atomically with its generation commit).
    */
  def assignmentDrift(spark: SparkSession, root: String): DataFrame = {
    val dir = GenerationLog.requireCurrentDir(spark, root)
    Similarity.assignmentDriftOf(
      liveCorpus(spark, dir), Similarity.readIvfCentroids(spark, dir))
  }
}

/** The near-dup (MinHash-LSH signature) index on the generation-log commit
  * model — the rename-free twin of the [[Dedup.writeNearDupIndex]] family,
  * completing the object-store story for both persisted index families.
  * The in-place family's delete is already tombstone-only (rename-free);
  * what this adds is a rename-free COMPACT/CONSOLIDATE (next generation
  * instead of a staged `_COMMIT` swap) and a rename-free GATE (the
  * in-place gate appends signatures via dynamic partition overwrite, whose
  * job commit renames staging directories — here each gate batch lands as
  * a [[SegmentLog]] marker-committed segment, and its replay is detected
  * by the `.s<batchId>` marker name).
  *
  * Gate semantics are IDENTICAL to [[Dedup.gateBatchAgainstNearDupIndex]]
  * (same params table, same dropSeen → self-dedup pipeline, same
  * strictly-earlier manifest view, same kept-partition read-back for the
  * appended signatures) — `d_gate_versioned_contract` pins the streamed
  * kept-set to the same sequential reference pipeline the in-place gate
  * is pinned to.
  */
object VersionedNearDup {

  private def fsOf(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Build (or rebuild) the index: params + base manifest as generation
    * N+1, committed by one marker create.
    */
  def write(
      docs: DataFrame, textCol: String, idCol: String, root: String,
      shingleSize: Int = 3, numer: Int = 7, denom: Int = 10,
      bands: Int = 16, rowsPerBand: Int = 4): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    MaintenanceLock.withLock(spark, root) {
      val (gen, dir) = GenerationLog.stageNext(spark, root)
      Seq((shingleSize, bands, rowsPerBand, numer, denom))
        .toDF("shingle_size", "bands", "rows_per_band", "numer", "denom")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
      Dedup.nearDupManifest(docs, textCol, idCol, shingleSize, bands, rowsPerBand)
        .write.mode("overwrite").parquet(s"$dir/manifest")
      GenerationLog.commit(spark, root, gen)
    }
  }

  /** The live manifest view: base ∪ committed gate segments − tombstones,
    * optionally restricted (for gate replay safety) to segments from
    * stream batches STRICTLY BEFORE `beforeBatch` (the base and batch
    * appends always qualify — the in-place `ingest_batch < b` contract).
    */
  def liveManifest(
      spark: SparkSession, root: String,
      beforeBatch: Option[Long] = None): DataFrame = {
    val dir = GenerationLog.requireCurrentDir(spark, root)
    val base = spark.read.parquet(s"$dir/manifest")
      .select(col("doc"), col("keys"), col("shh"))
    val segDirs = SegmentLog.committedDirs(spark, dir, beforeBatch)
    val all =
      if (segDirs.isEmpty) base
      else base.unionByName(
        spark.read.option("basePath", SegmentLog.segmentsDir(dir)).parquet(segDirs: _*)
          .select(col("doc"), col("keys"), col("shh")))
    val tombDir = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (fsOf(spark, dir).exists(tombDir))
      all.join(
        broadcast(spark.read.parquet(tombDir.toString)
          .select(col("doc").as("__tomb")).distinct()),
        col("doc") === col("__tomb"), "left_anti")
    else all
  }

  /** Retention delete: tombstone-only, same semantics as
    * [[Dedup.deleteFromNearDupIndex]] — screens immediately, purged
    * physically by the next [[consolidate]]. Pass the gate stream's
    * `checkpointDir` when a stream is actively gating against this index:
    * the guard refuses to tombstone while a written-but-uncommitted batch
    * is in flight (its replay would recompute the kept set against a
    * shrunken suppression view — [[gateBatch]]'s replay-heal bounds the
    * damage; quiescence removes it).
    */
  def delete(
      ids: DataFrame, idCol: String, root: String,
      checkpointDir: Option[String] = None): Unit = {
    val spark = ids.sparkSession
    checkpointDir.foreach(graft.streaming.CommitLog.requireAllCommitted(
      spark, _, s"VersionedNearDup.delete($root)"))
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      ids.select(col(idCol).cast("long").as("doc")).distinct()
        .coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
    }
  }

  /** One gate batch — [[Dedup.gateBatchAgainstNearDupIndex]] semantics,
    * rename-free mechanics: kept rows land by static overwrite of the
    * batch's own `$keptDir/ingest_batch=<id>` dir (replay rewrites the
    * same dir — idempotent without dynamic overwrite), and the appended
    * signatures land as a marker-committed segment derived from the
    * WRITTEN kept partition (replay-identical by construction).
    *
    * Replay consistency: a replayed batch recomputes its kept set against
    * the same strictly-earlier manifest view, so absent concurrent
    * mutation it rewrites the identical kept partition and skips the
    * signature append via the marker. If a tombstone [[delete]] landed
    * BETWEEN the first attempt and the replay, the replayed kept set can
    * grow (fewer suppressors) — so on replay the written kept partition's
    * signatures are VERIFIED against this batch's committed segments and
    * any missing docs' signatures are staged as a supplemental segment
    * (idempotent: covered ⇒ empty diff ⇒ no write). The reverse
    * divergence — a first-attempt keeper displaced by a replay keeper,
    * leaving its frozen signatures in the index — is conservative
    * (over-suppression of future near-dups of a dropped doc) and
    * deliberately tolerated; full bitwise replay determinism under
    * concurrent deletes requires stream quiescence (pass the stream's
    * `checkpointDir` to [[delete]], the consolidate guard).
    */
  def gateBatch(
      batch: DataFrame, textCol: String, idCol: String,
      root: String, keptDir: String, batchId: Long): Unit =
   MaintenanceLock.withLockRetry(batch.sparkSession, root) { graft.CacheScope.withScope {
    // locked like every other mutator (with gate-mode RETRY: transient
    // maintenance contention degrades to batch latency, not stream
    // failure): segId reservation + segment write + marker commit must not
    // interleave with a concurrent append's reservation (same id → silent
    // clobber) or a consolidate publishing a new generation mid-batch
    // (segment stranded in the superseded one)
    val spark = batch.sparkSession
    val dir = GenerationLog.requireCurrentDir(spark, root)
    val (ss, bands, rpb, numer, denom) =
      graft.Trace.t("neardup.params")(Dedup.readNearDupIndexParams(spark, dir))
    val manifest = liveManifest(spark, root, beforeBatch = Some(batchId))
    // ONE tokenize+shingle+minhash pass over the batch (the dominant
    // narrow-stage cost): the batch manifest feeds the seen-screen AND the
    // in-batch self-dedup pair generation (nearDupPairsFromManifest over
    // the unseen docs' manifest rows — identical pair set to re-deriving
    // jaccardDuplicatePairs from text: same band keys, same hashed-shingle
    // verify, same integer threshold). All intermediates are batch-bounded
    // and scope-persisted: seen/unseen each have two consumers.
    val bm = graft.CacheScope.persistIfScoped(
      Dedup.nearDupManifest(batch, textCol, idCol, ss, bands, rpb))
    val seen = Dedup.seenDocsAgainstManifest(bm, manifest, numer, denom)
    val unseen = graft.CacheScope.persistIfScoped(
      batch.join(seen, batch(idCol) === seen("b_doc"), "left_anti"))
    // unseen docs' manifest rows from the persisted frames (bm semi
    // unseen-ids) — `seen` stays single-consumer, so the corpus-manifest
    // verify runs exactly once per batch
    val unseenMan = bm.join(
      unseen.select(col(idCol).as("__u")),
      bm("doc") === col("__u"), "left_semi")
    val kept = graft.Trace.t("neardup.gate-plan")(Dedup.dropNearDuplicates(
      unseen,
      Dedup.nearDupPairsFromManifest(unseenMan, numer, denom)
        .select(col("doc_a"), col("doc_b")),
      idCol))
    val batchKeptDir = s"$keptDir/ingest_batch=$batchId"
    graft.Trace.t("neardup.kept-write")(
      kept.write.mode("overwrite").option("partitionOverwriteMode", "static")
        .parquet(batchKeptDir))
    // emptiness from the written part-files' FOOTERS — driver-side metadata,
    // no Spark job; also covers the zero-task write (no part files at all)
    val hasData = graft.Trace.t("neardup.empty-probe")(
      IndexMeta.dirHasRows(spark, batchKeptDir))
    if (!SegmentLog.streamBatchCommitted(spark, dir, batchId)) {
      // an all-suppressed batch has no signatures to append, but the
      // marker must still land so a replay is recognized as such
      val segId = SegmentLog.nextSegId(spark, dir)
      if (hasData) {
        // derive the appended signatures from the WRITTEN kept partition —
        // replay-identical by construction (the in-place gate's contract)
        graft.Trace.t("neardup.sig-append")(
          Dedup.nearDupManifest(spark.read.parquet(batchKeptDir), textCol, idCol, ss, bands, rpb)
            .write.mode("overwrite").option("partitionOverwriteMode", "static")
            .parquet(SegmentLog.segmentDir(dir, segId)))
      }
      SegmentLog.commitMarker(spark, dir, s"$segId.s$batchId")
    } else if (hasData && SegmentLog.tombstonesSinceMarker(spark, dir, batchId)) {
      // REPLAY HEAL (see scaladoc): kept docs whose signatures are absent
      // from this batch's committed segments get a supplemental segment —
      // same .s<batchId> marker suffix, so future batches read it and this
      // batch's own replays exclude it. Gated on a tombstone having landed
      // at/after this batch's marker (one mtime listing) — a no-delete
      // replay skips the verification job entirely
      val segDirs = SegmentLog.committedPresent(spark, dir)
        .filter(_._2.contains(batchId))
        .map(s => SegmentLog.segmentDir(dir, s._1))
      val sigs = Dedup.nearDupManifest(
        spark.read.parquet(batchKeptDir), textCol, idCol, ss, bands, rpb)
      val missing =
        if (segDirs.isEmpty) sigs
        else sigs.join(
          spark.read.option("basePath", SegmentLog.segmentsDir(dir))
            .parquet(segDirs: _*).select(col("doc")).distinct(),
          Seq("doc"), "left_anti")
      if (!missing.limit(1).isEmpty) {
        val segId = SegmentLog.nextSegId(spark, dir)
        missing.write.mode("overwrite").option("partitionOverwriteMode", "static")
          .parquet(SegmentLog.segmentDir(dir, segId))
        SegmentLog.commitMarker(spark, dir, s"$segId.s$batchId")
      }
    }
   } }

  /** Continuous dedup-at-ingest over the versioned index. */
  def streamGate(
      stream: DataFrame, textCol: String, idCol: String,
      root: String, keptDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        gateBatch(batch.toDF(), textCol, idCol, root, keptDir, batchId))
      .start()

  /** Fold gate segments into the base manifest and apply tombstones — as
    * the next generation (the versioned [[Dedup.compactNearDupIndex]] with
    * `consolidate = true` semantics). The live view is invariant; only the
    * layout and the tombstone set change. Guarded by the stream's
    * checkpoint commit log when given.
    */
  def consolidate(
      spark: SparkSession, root: String,
      checkpointDir: Option[String] = None): Unit = {
    checkpointDir.foreach(graft.streaming.CommitLog.requireAllCommitted(
      spark, _, s"VersionedNearDup.consolidate($root)"))
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val live = liveManifest(spark, root)
      if (live.limit(1).isEmpty) throw new IllegalStateException(
        s"consolidating $root would write an empty generation (every doc " +
          "tombstoned) — rebuild with VersionedNearDup.write instead")
      val (gen, next) = GenerationLog.stageNext(spark, root)
      spark.read.parquet(s"$dir/params")
        .coalesce(1).write.mode("overwrite").parquet(s"$next/params")
      live.write.mode("overwrite").parquet(s"$next/manifest")
      GenerationLog.commit(spark, root, gen)
    }
  }

  /** GC superseded generations + aged uncommitted segment debris. */
  def vacuum(
      spark: SparkSession, root: String,
      ttlMs: Long = MaintenanceLock.DefaultTtlMs): Unit = {
    GenerationLog.vacuumGenerations(spark, root, ttlMs)
    GenerationLog.currentDir(spark, root)
      .foreach(SegmentLog.vacuumSegments(spark, _, ttlMs))
  }
}

/** The IVF-PQ index on the generation-log commit model — completing the
  * object-store symmetry across all four persisted index families (BM25
  * segments, IVF, near-dup, and now IVF-PQ). Same [[GenerationLog]] +
  * [[SegmentLog]] spine as [[VersionedIvf]]; the payload per generation is
  * the in-place family's three sub-tables (coarse centroids, residual
  * codebooks, cluster-partitioned CODES — (1+m) small ints per vector, no
  * floats), so delete is tombstone-only, appends are marker-committed code
  * segments, and retrain — which needs the float base table the probe
  * already re-ranks against, exactly like [[Similarity.retrainIvfPqIndex]]
  * — publishes new quantizers + a full re-encode as the next generation
  * with ONE marker create instead of a three-table rename swap.
  */
object VersionedIvfPq {

  private def fsOf(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeGeneration(
      spark: SparkSession, genDir: String,
      centroids: Seq[Seq[Float]], books: Seq[Seq[Seq[Float]]],
      codes: DataFrame): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$genDir/centroids")
    books.zipWithIndex.flatMap { case (book, sI) =>
      book.zipWithIndex.map { case (c, code) => (sI, code, c) } }
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$genDir/books")
    codes.select(col("vec_id"), col("codes"), col("cluster"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("cluster").parquet(s"$genDir/codes")
  }

  /** Live code rows: base ∪ committed segments − tombstones. */
  private def liveCodes(spark: SparkSession, genDir: String): DataFrame = {
    val fs = fsOf(spark, genDir)
    val base = spark.read.parquet(s"$genDir/codes")
      .select(col("vec_id"), col("codes"), col("cluster").cast("int").as("cluster"))
    val segDirs = SegmentLog.committedDirs(spark, genDir)
    val all =
      if (segDirs.isEmpty) base
      else base.unionByName(
        spark.read.option("basePath", SegmentLog.segmentsDir(genDir)).parquet(segDirs: _*)
          .select(col("vec_id"), col("codes"), col("cluster").cast("int").as("cluster")))
    val tombDir = new org.apache.hadoop.fs.Path(s"$genDir/tombstones")
    if (fs.exists(tombDir))
      all.join(
        broadcast(spark.read.parquet(tombDir.toString)
          .select(col("vec_id").as("__tomb_id")).distinct()),
        col("vec_id") === col("__tomb_id"), "left_anti")
    else all
  }

  /** The live codes of the CURRENT generation, as a reader view —
    * (vec_id, codes, cluster). The audit face of the stored membership.
    */
  def codesView(spark: SparkSession, root: String): DataFrame =
    liveCodes(spark, GenerationLog.requireCurrentDir(spark, root))

  def write(
      corpus: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[Seq[Float]], books: Seq[Seq[Seq[Float]]],
      root: String): Unit = {
    val spark = corpus.sparkSession
    MaintenanceLock.withLock(spark, root) {
      val (gen, dir) = GenerationLog.stageNext(spark, root)
      writeGeneration(spark, dir, centroids, books,
        Similarity.ivfPqEncode(corpus, vecCol, idCol, centroids, books))
      GenerationLog.commit(spark, root, gen)
    }
  }

  /** Probe: gated ADC over live codes + exact re-rank against the float
    * base table ([[Similarity.ivfPqTopKFromIndex]] semantics).
    */
  def topKFromIndex(
      spark: SparkSession, root: String, queries: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nprobe: Int = 2, rerank: Int = 4): DataFrame = {
    val dir = GenerationLog.requireCurrentDir(spark, root)
    val centroids = Similarity.readIvfCentroids(spark, dir)
    // same conditional static probed-cluster filter as
    // VersionedIvf.topKFromIndex: the codes Union blocks dynamic partition
    // pruning; a consolidated (single-scan) index needs no help
    val live = liveCodes(spark, dir)
    val codes =
      if (SegmentLog.committedDirs(spark, dir).nonEmpty)
        live.filter(col("cluster").isin(
          Similarity.probedClusters(queries, vecCol, centroids, nprobe): _*))
      else live
    Similarity.ivfPqProbe(
      codes, queries, corpus, vecCol, idCol, k,
      centroids, Similarity.readIvfPqBooks(spark, dir), nprobe, rerank)
  }

  /** Marker-committed code segment against the FROZEN stored quantizers. */
  def append(batch: DataFrame, vecCol: String, idCol: String, root: String): Unit = {
    val spark = batch.sparkSession
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val segId = SegmentLog.nextSegId(spark, dir)
      val segDir = SegmentLog.segmentDir(dir, segId)
      Similarity.ivfPqEncode(batch, vecCol, idCol,
        Similarity.readIvfCentroids(spark, dir),
        Similarity.readIvfPqBooks(spark, dir))
        .select(col("vec_id"), col("codes"), col("cluster"))
        .write.mode("overwrite").option("partitionOverwriteMode", "static")
        .partitionBy("cluster")
        .parquet(segDir)
      // empty append: drop the footerless dir, marker-only (see VersionedIvf)
      val fs = fsOf(spark, dir)
      val hasData = fs.listStatus(new org.apache.hadoop.fs.Path(segDir))
        .exists(st => st.isDirectory && st.getPath.getName.startsWith("cluster="))
      if (!hasData) fs.delete(new org.apache.hadoop.fs.Path(segDir), true)
      SegmentLog.commitMarker(spark, dir, segId.toString)
    }
  }

  /** Tombstone-only retention delete (probe anti-join; physical purge at
    * the next [[consolidate]]/[[retrain]]). Returns the live rows newly
    * suppressed — the [[VersionedIvf.delete]] contract, including its
    * optional `checkpointDir` stream-quiescence guard.
    */
  def delete(
      spark: SparkSession, root: String, ids: DataFrame, idCol: String,
      checkpointDir: Option[String] = None): Long = {
    checkpointDir.foreach(graft.streaming.CommitLog.requireAllCommitted(
      spark, _, s"VersionedIvfPq.delete($root)"))
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val pinned = graft.CacheScope.localCheckpoint(
        ids.select(col(idCol).cast("long").as("vec_id")).distinct())
      try {
        val n = liveCodes(spark, dir)
          .join(broadcast(pinned), Seq("vec_id"), "left_semi").count()
        pinned.coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
        n
      } finally graft.CacheScope.unpersistCheckpoint(pinned)
    }
  }

  /** Fold segments + apply tombstones → next generation; quantizers and
    * codes unchanged (no re-encode — the codes ARE the membership).
    */
  def consolidate(
      spark: SparkSession, root: String,
      checkpointDir: Option[String] = None): Unit = {
    checkpointDir.foreach(graft.streaming.CommitLog.requireAllCommitted(
      spark, _, s"VersionedIvfPq.consolidate($root)"))
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val live = liveCodes(spark, dir)
      if (live.isEmpty) throw new IllegalStateException(
        s"consolidating $root would write an empty generation (every vector " +
          "tombstoned) — rebuild with VersionedIvfPq.write instead")
      val (gen, next) = GenerationLog.stageNext(spark, root)
      writeGeneration(spark, next,
        Similarity.readIvfCentroids(spark, dir),
        Similarity.readIvfPqBooks(spark, dir), live)
      GenerationLog.commit(spark, root, gen)
    }
  }

  /** Retrain BOTH quantizer levels over live membership and publish the
    * re-encoded index as the next generation. Needs the float base table
    * (the codes store no vectors — [[Similarity.retrainIvfPqIndex]]'s
    * contract): corpus rows outside the index are ignored, a live stored
    * id missing from the corpus fails fast.
    */
  def retrain(
      spark: SparkSession, root: String, corpus: DataFrame,
      vecCol: String, idCol: String,
      k: Option[Int] = None, m: Option[Int] = None, ksub: Option[Int] = None,
      iterations: Int = 3, trainSample: Int = 1,
      checkpointDir: Option[String] = None): Unit = {
    checkpointDir.foreach(graft.streaming.CommitLog.requireAllCommitted(
      spark, _, s"VersionedIvfPq.retrain($root)"))
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val storedIds = liveCodes(spark, dir).select(col("vec_id"))
      val member = graft.CacheScope.localCheckpoint(
        corpus.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
          .join(storedIds, Seq("vec_id"), "left_semi"))
      try {
        val missing = storedIds
          .join(member.select(col("vec_id")), Seq("vec_id"), "left_anti").count()
        require(missing == 0L,
          s"VersionedIvfPq.retrain($root): $missing live stored vector ids " +
            "are absent from the supplied corpus — re-encoding would " +
            "silently drop them; pass the same base table the probe path " +
            "re-ranks against")
        val oldBooks = Similarity.readIvfPqBooks(spark, dir)
        val kk = k.getOrElse(Similarity.readIvfCentroids(spark, dir).size)
        val mm = m.getOrElse(oldBooks.size)
        val ks = ksub.getOrElse(oldBooks.head.size)
        val cents = Similarity.trainIvfCentroids(member, "embedding", "vec_id",
          kk, iterations, trainSample)
        val books = Similarity.trainIvfPqBooks(member, "embedding", "vec_id",
          cents, mm, ks, iterations, trainSample)
        val (gen, next) = GenerationLog.stageNext(spark, root)
        writeGeneration(spark, next, cents, books,
          Similarity.ivfPqEncode(member, "embedding", "vec_id", cents, books))
        GenerationLog.commit(spark, root, gen)
      } finally graft.CacheScope.unpersistCheckpoint(member)
    }
  }

  def vacuum(
      spark: SparkSession, root: String,
      ttlMs: Long = MaintenanceLock.DefaultTtlMs): Unit = {
    GenerationLog.vacuumGenerations(spark, root, ttlMs)
    GenerationLog.currentDir(spark, root)
      .foreach(SegmentLog.vacuumSegments(spark, _, ttlMs))
  }
}

/** The substring-window (ExactSubstr) index on the generation-log commit
  * model — the last of the persisted index families re-expressed
  * rename-free. Same [[SegmentLog]] gate mechanics as [[VersionedNearDup]]
  * (the in-place gate's two dynamic-overwrite writes become a static
  * overwrite of the batch's own clean dir plus one marker-committed window
  * segment); no tombstone face, deliberately matching
  * [[Dedup.writeSubstringIndex]] — manifest rows are CONTENT keys, not doc
  * rows, so retention means rebuilding from the retained corpus.
  */
object VersionedSubstring {

  private def fsOf(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def write(
      docs: DataFrame, textCol: String, idCol: String, root: String,
      n: Int = 8): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    MaintenanceLock.withLock(spark, root) {
      val (gen, dir) = GenerationLog.stageNext(spark, root)
      Seq(n).toDF("n").coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
      Dedup.substringWindowManifest(docs, textCol, idCol, n)
        .write.mode("overwrite").parquet(s"$dir/manifest")
      GenerationLog.commit(spark, root, gen)
    }
  }

  /** Manifest view (h1, h2): base ∪ committed segments, stream segments
    * restricted to strictly before `beforeBatch`.
    */
  def manifest(
      spark: SparkSession, root: String,
      beforeBatch: Option[Long] = None): DataFrame = {
    val dir = GenerationLog.requireCurrentDir(spark, root)
    val base = spark.read.parquet(s"$dir/manifest").select(col("h1"), col("h2"))
    val segDirs = SegmentLog.committedDirs(spark, dir, beforeBatch)
    if (segDirs.isEmpty) base
    else base.unionByName(
      spark.read.option("basePath", SegmentLog.segmentsDir(dir)).parquet(segDirs: _*)
        .select(col("h1"), col("h2")))
  }

  /** One gate batch — [[Dedup.gateBatchAgainstSubstringIndex]] semantics,
    * rename-free mechanics. Cleaned text lands by static overwrite of
    * `$cleanDir/ingest_batch=<id>`; the batch's NEW window keys (from its
    * original text, keep-first-globally) land as a marker-committed
    * segment, skipped on replay.
    */
  def gateBatch(
      batch: DataFrame, textCol: String, idCol: String,
      root: String, cleanDir: String, batchId: Long): Unit =
   MaintenanceLock.withLockRetry(batch.sparkSession, root) { graft.CacheScope.withScope {
    // locked with gate-mode RETRY: see VersionedNearDup.gateBatch — segId
    // reservation and the generation resolution must be atomic vs
    // concurrent appends/retrains, and transient maintenance contention
    // must degrade to batch latency, not stream failure. No replay-heal
    // needed here: this family has no tombstone face (manifest rows are
    // content keys), so the strictly-earlier manifest view a replay
    // recomputes against cannot have shrunk — the replayed clean output
    // and new-window set are identical to the first attempt's
    val spark = batch.sparkSession
    val dir = GenerationLog.requireCurrentDir(spark, root)
    // immutable per committed generation — memoized (one-row read must not
    // cost a Spark job per micro-batch)
    val n = graft.Trace.t("substr.params")(
      IndexMeta.cachedParamsIfGeneration(spark, "substr-n", dir)(
        Integer.valueOf(spark.read.parquet(s"$dir/params").head.getAs[Int]("n"))).intValue)
    val man = manifest(spark, root, beforeBatch = Some(batchId))
    // ONE tokenize+shingle pass over the batch text, shared (persisted for
    // the scope) by the span computation AND the new-window-key append —
    // previously each re-derived its own occurrence frame
    val occ = graft.CacheScope.persistIfScoped(
      Dedup.cutOccurrenceKeys(batch, textCol, idCol, n))
    val spans = Dedup.substringSpansFromOccurrences(occ, man, n)
    graft.Trace.t("substr.clean-write")(
      Dedup.applyRemovedSpans(batch, spans, textCol, idCol)
        .write.mode("overwrite").option("partitionOverwriteMode", "static")
        .parquet(s"$cleanDir/ingest_batch=$batchId"))
    if (!SegmentLog.streamBatchCommitted(spark, dir, batchId)) {
      val newKeys = occ.select(col("h1"), col("h2")).distinct()
        .join(man, Seq("h1", "h2"), "left_anti")
      val segId = SegmentLog.nextSegId(spark, dir)
      graft.Trace.t("substr.keys-write")(
        newKeys.write.mode("overwrite").option("partitionOverwriteMode", "static")
          .parquet(SegmentLog.segmentDir(dir, segId)))
      // a batch with no new windows still writes its (empty-but-readable)
      // segment? No: zero-task writes may leave no parquet footers — treat
      // like VersionedNearDup's all-suppressed case and commit marker-only
      val hasData = graft.Trace.t("substr.empty-probe")(
        IndexMeta.dirHasRows(spark, SegmentLog.segmentDir(dir, segId)))
      if (!hasData) {
        val fs = fsOf(spark, dir)
        fs.delete(new org.apache.hadoop.fs.Path(SegmentLog.segmentDir(dir, segId)), true)
        val parent = new org.apache.hadoop.fs.Path(SegmentLog.segmentsDir(dir))
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
          fs.delete(parent, false)
      }
      SegmentLog.commitMarker(spark, dir, s"$segId.s$batchId")
    }
   } }

  /** Continuous ExactSubstr-at-ingest over the versioned index. */
  def streamGate(
      stream: DataFrame, textCol: String, idCol: String,
      root: String, cleanDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        gateBatch(batch.toDF(), textCol, idCol, root, cleanDir, batchId))
      .start()

  /** Fold segments into the base manifest as the next generation (the
    * partition-count maintenance for a long-running gate). The manifest is
    * one row per distinct window by construction (gates anti-join before
    * appending), so the fold is a plain union.
    */
  def consolidate(
      spark: SparkSession, root: String,
      checkpointDir: Option[String] = None): Unit = {
    checkpointDir.foreach(graft.streaming.CommitLog.requireAllCommitted(
      spark, _, s"VersionedSubstring.consolidate($root)"))
    MaintenanceLock.withLock(spark, root) {
      val dir = GenerationLog.requireCurrentDir(spark, root)
      val live = manifest(spark, root)
      val (gen, next) = GenerationLog.stageNext(spark, root)
      spark.read.parquet(s"$dir/params")
        .coalesce(1).write.mode("overwrite").parquet(s"$next/params")
      live.write.mode("overwrite").parquet(s"$next/manifest")
      GenerationLog.commit(spark, root, gen)
    }
  }

  def vacuum(
      spark: SparkSession, root: String,
      ttlMs: Long = MaintenanceLock.DefaultTtlMs): Unit = {
    GenerationLog.vacuumGenerations(spark, root, ttlMs)
    GenerationLog.currentDir(spark, root)
      .foreach(SegmentLog.vacuumSegments(spark, _, ttlMs))
  }
}
