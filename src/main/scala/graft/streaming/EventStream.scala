package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Event-stream ingest and analytics over the harness `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only — its "incremental" mode is idempotent
  * re-runs with skip-if-done checks (ref lib03_Update_Metadata.py:316-337,
  * lib04_Update_Table_Data.py:509-541). This module is the Structured
  * Streaming face of the same operators: every transform here is identical
  * for `read` and `readStream` inputs, and [[foreachBatchIngest]] reuses the
  * batch load path per micro-batch, which is exactly how the reference's
  * per-survey re-runnable loads generalize to a stream.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark;
  * sessionization state is per-key and dropped on timeout; both shuffle on
  * (key) only — no per-event driver involvement anywhere.
  */
object EventStream {

  /** The events schema as Spark reads the LEGACY harness layout with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (ts stored as
    * TIMESTAMP(NANOS) → arrives as a raw nanos long). Kept for fixtures that
    * exercise that layout; [[readEvents]] no longer assumes it — the harness
    * has regenerated the parquet with a different physical type between
    * rounds (nanos in r4, TIMESTAMP_NTZ micros in r5), so the file's actual
    * footer schema is the only trustworthy source.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize an events frame's `ts` to the engine's canonical TimestampType
    * (µs precision, session-UTC instants), branching on the type the reader
    * actually produced rather than assuming a physical layout:
    *  - LongType: the legacy TIMESTAMP(NANOS)+nanosAsLong layout — raw nanos,
    *    integer `div 1000` to µs (nanos overflow double's mantissa);
    *  - TimestampNTZType: wall-clock micros (the current harness layout) —
    *    cast reinterprets in the session timezone, exact under the engine's
    *    required UTC session;
    *  - TimestampType: already canonical.
    */
  def normalize(raw: DataFrame): DataFrame =
    raw.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }

  /** Open the events parquet as a stream (file source; at scale this is the
    * landing directory new files arrive in). The file-source basePath must be
    * a directory, so a path to a single file is split into
    * (parent, pathGlobFilter). The stream's schema is taken from the file's
    * own parquet footer (a metadata-only batch read) — declaring a schema the
    * file doesn't have makes the reader reinterpret raw INT64 values, which
    * is exactly the silent 1000× time-compression failure mode; the footer
    * schema + [[normalize]] handles every layout the harness has shipped.
    */
  def readEvents(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.io.File(path)
    val fileSchema = spark.read.parquet(path).schema
    val base = spark.readStream.schema(fileSchema).options(options)
    val reader =
      if (p.isFile) base.option("pathGlobFilter", p.getName).parquet(p.getParent)
      else base.parquet(path)
    normalize(reader)
  }

  // ----------------------------------------------------------------- joins

  /** Stream-static enrichment join: each event matched to a STATIC dimension
    * frame. Spark re-resolves the static side every micro-batch, so a
    * dimension refreshed between batches is picked up without restarting the
    * query; `broadcast` keeps the stream side un-shuffled (the dim ships to
    * the executors, events never move). No state, no watermark — the
    * stateless enrichment shape every event pipeline starts with.
    */
  def enrichWithDim(
      events: DataFrame,
      dim: DataFrame,
      eventKey: String,
      dimKey: String,
      joinType: String = "inner"): DataFrame =
    // side-qualified keys: bare col() would be AMBIGUOUS_REFERENCE whenever
    // the two key names match (the most common enrichment shape) or either
    // name exists on both sides
    events.join(broadcast(dim), events.col(eventKey) === dim.col(dimKey), joinType)

  /** Stream-stream event-time interval join: right-side events matched to
    * left-side events of the same key within `[leftTs, leftTs + maxLag]`
    * (attribution: purchases to the clicks they follow). Both sides are
    * streams — unlike [[enrichWithDim]] neither fits in a broadcast, so
    * each side is shuffled ONCE on its key and matching happens in the
    * join's keyed state store.
    *
    * The watermark + time-range condition are what make this bounded at
    * scale: Spark derives each side's state retention from them (a left row
    * is evictable once the right watermark passes `leftTs + maxLag`), so
    * state holds only the lag window per key, not the stream's history.
    * Inner join emits exactly the pairs the equivalent batch join would —
    * late data beyond the watermark is dropped, the standard trade
    * (`e_stream_join` oracle-matches the batch interval join).
    *
    * Callers project both sides to disjoint column names first (the join
    * condition references columns by bare name).
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      maxLagSeconds: Long,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxLagSeconds SECONDS"))
  }

  /** Batch face of [[intervalJoin]] in BANDED equi-join form — the plan that
    * survives dense per-key histories at corpus scale. Catalyst plans
    * `l.key = r.key AND r.ts BETWEEN l.ts AND l.ts + lag` as a sort-merge
    * join on the key alone with the range as a post-join filter, so each
    * key's full history cross-pairs before filtering: with k events per key
    * per side that is O(k²) per key (measured: the 100× stress stream pays
    * ~11B probes this way). Banding restores a composite equi-join — both
    * sides key on (join key, ts div lag), the left additionally explodes to
    * the adjacent band its lag window overlaps (exactly 2 bands when
    * bandWidth = lag), and the exact range predicate filters within band —
    * so candidates shrink from per-key history² to per-(key, lag-window)
    * neighborhoods, the same trade [[graft.operators.RangeJoin.banded]]
    * makes for point-in-interval joins.
    *
    * Same output contract as [[intervalJoin]] on a finite input (callers
    * project to disjoint column names; both ts columns any layout
    * [[normalize]] accepts).
    */
  def intervalJoinBatch(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      maxLagSeconds: Long): DataFrame = {
    require(maxLagSeconds > 0, "maxLagSeconds must be positive")
    val lagUs = maxLagSeconds * 1000000L
    val l = left
      .withColumn("_lus", unix_micros(col(leftTs).cast(TimestampType)))
      .withColumn("_band", explode(sequence(
        expr(s"_lus div ${lagUs}L"), expr(s"(_lus + ${lagUs}L) div ${lagUs}L"))))
    val r = right
      .withColumn("_rus", unix_micros(col(rightTs).cast(TimestampType)))
      .withColumn("_band", expr(s"_rus div ${lagUs}L"))
    l.join(r,
      l("_band") === r("_band") && col(leftKey) === col(rightKey) &&
        col("_rus") >= col("_lus") && col("_rus") <= col("_lus") + lagUs)
      .drop("_band", "_lus", "_rus")
  }

  // ----------------------------------------------------------------- windows

  /** Tumbling-window counts per event type. On a stream, `watermark` bounds
    * state (late data beyond it is dropped); on a batch frame the same plan
    * is an ordinary group-by. One shuffle on (window, event_type).
    */
  def windowedStats(events: DataFrame, windowDur: String, watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(events)(w => events.withWatermark("ts", w))
    in.groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("min_v"), col("max_v"))
  }

  // ------------------------------------------------------------ sessionization

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Batch sessionization: split each user's ordered events where the gap
    * exceeds `gapSeconds` (classic lag/cumsum), then aggregate per session.
    * SQL-expressible, so it doubles as the oracle for the stateful streaming
    * path. Two shuffles (window partition + group-by), both on user_id.
    */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    // microsecond-exact gap math (the harness events have µs resolution;
    // truncating to seconds would move boundary events across engines).
    // unix_micros rejects TIMESTAMP_NTZ — the explicit TimestampType cast is
    // a no-op on canonical input and session-UTC-exact on an NTZ frame that
    // bypassed normalize.
    val micros = unix_micros(col("ts").cast(TimestampType))
    val newSession = when(
      lag(micros, 1).over(byUser).isNull ||
        micros - lag(micros, 1).over(byUser) > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("_new", newSession)
      .withColumn("_sess", sum(col("_new")).over(byUser))
      .groupBy(col("user_id"), col("_sess"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("_sess")
  }

  /** Streaming sessionization: per-user state via flatMapGroupsWithState.
    * State is one (start,last,n) triple per active user — O(active users),
    * not O(events).
    *
    * Two modes:
    *  - `emitOpenAtEnd = true` (finite/batch semantics): every session is
    *    flushed at the end of the pass — on a batch Dataset this is exactly
    *    [[sessionizeBatch]] (asserted in the spec). Do NOT use on a real
    *    stream: each micro-batch would force-close in-flight sessions.
    *  - `emitOpenAtEnd = false` (streaming semantics): only sessions closed
    *    by an observed > gap are emitted; the open session survives trigger
    *    boundaries in state and closes via an EVENT-TIME timeout once the
    *    watermark passes `last event + gapSeconds`. Event-time (not
    *    processing-time) because it is deterministic w.r.t. the data, it
    *    matches [[sessionizeBatch]]'s definition of a gap, and a
    *    processing-time timeout forces the micro-batch engine to re-batch
    *    continuously (a finite query never quiesces). A watermark is set
    *    here (`watermarkDelay` lateness).
    */
  def sessionizeStateful(
      events: Dataset[Event],
      gapSeconds: Long,
      emitOpenAtEnd: Boolean = true,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._

    // state tracks epoch-µs so boundaries agree exactly with sessionizeBatch
    def microsOf(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def flush(userId: Long, st: SessionState): Session =
      Session(userId, tsOf(st.start), tsOf(st.last), st.n)

    // Timeout conf only in streaming mode; finite/batch mode declares
    // NoTimeout (and a timeout would force extra micro-batches that keep a
    // Trigger.AvailableNow query from ever quiescing).
    val timeoutConf =
      if (emitOpenAtEnd) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.EventTimeTimeout()
    val in = if (emitOpenAtEnd) events else events.withWatermark("ts", watermarkDelay)
    in
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // the watermark passed last + gap → the stored session is over
            val out = state.getOption.map(flush(userId, _))
            state.remove()
            out.iterator
          } else {
            // Iterator order within a group is not guaranteed → sort the
            // group's events; groups are single-user so this is bounded.
            val sorted = rows.toSeq.sortBy(e => microsOf(e.ts))
            var out = List.empty[Session]
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val us = microsOf(e.ts)
              st match {
                case null => st = SessionState(us, us, 1)
                case s if us - s.last > gapSeconds * 1000000L =>
                  out ::= flush(userId, s)
                  st = SessionState(us, us, 1)
                case s =>
                  // a LATE-but-within-watermark event from a previous batch
                  // can precede the stored bounds: extend with min/max, never
                  // overwrite — otherwise session_end regresses below a
                  // contained event and the timeout fires early. (With
                  // watermarkDelay ≤ gap a late event can never be a separate
                  // EARLIER session, so merging is exact.)
                  st = SessionState(math.min(s.start, us), math.max(s.last, us), s.n + 1)
              }
            }
            if (emitOpenAtEnd) {
              if (st != null) out ::= flush(userId, st)
              state.remove()
            } else if (st != null) {
              state.update(st)
              // close when the watermark passes last + gap. The µs→ms
              // conversion rounds UP so the timeout can never precede the
              // exact microsecond gap boundary (a sub-millisecond-later
              // event must still extend this session, as in sessionizeBatch).
              // Clamp above the current watermark (Spark rejects deadlines
              // at/behind it).
              val deadlineMs =
                Math.floorDiv(st.last + gapSeconds * 1000000L + 999L, 1000L)
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.reverseIterator
          }
      }
  }

  // ------------------------------------------------------------------ dedup

  /** Streaming exact dedup with bounded state: duplicates of `cols` arriving
    * within the watermark window are dropped; state for keys older than the
    * watermark is evicted (the streaming face of Dedup.exactDuplicateGroups
    * — at-least-once sources made effectively-once without unbounded
    * key memory).
    */
  def dedupWithinWatermark(
      events: DataFrame, cols: Seq[String], delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(cols)

  // ------------------------------------------------------------------ ingest

  /** Micro-batch ingest: reuse any batch writer per micro-batch. `batchId` is
    * Structured Streaming's replay-dedup handle — writers that record it get
    * exactly-once across restarts (the streaming analog of the reference's
    * skip-if-done idempotence, ref DCF_Parser.py:44-51, lib04:509-541).
    */
  def foreachBatchIngest(
      events: DataFrame,
      checkpointDir: String,
      write: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        write(batch.toDF(), batchId))
      .start()

  /** Exactly-once per-batch table append: the batch's rows land in their
    * own `batch_id=<id>` partition via DYNAMIC partition overwrite, so a
    * replayed batch (failure between the write and the checkpoint commit)
    * REPLACES its own partition instead of double-appending — a blind
    * `mode("append")` inside foreachBatch breaks the batch-split-
    * independent convergence the stream gates rely on, exactly under retry
    * (ADVICE r6). Only partitions present in the written data are touched,
    * so earlier batches' partitions survive.
    */
  private def writeBatchPartition(df: DataFrame, batchId: Long, dir: String): Unit =
    df.withColumn("batch_id", lit(batchId))
      .coalesce(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)

  /** Streaming constraint audit: run the one-pass
    * [[graft.operators.Quality.constraintReport]] per micro-batch, append
    * each batch's counts to a report table, and return the stream-lifetime
    * report. Counts are ADDITIVE across batches (each check row carries its
    * batch's row count), so the converged report equals the batch audit of
    * the whole stream — micro-batch-split-independent, which is what makes
    * it an oracle-checkable streaming face (e_stream_constraints). The ppm
    * share is recomputed over the summed counts, never averaged.
    *
    * Per-batch reports are answer-sized (#constraints rows), so the report
    * table stays KB-scale over any stream lifetime; `batch_id` rides along
    * for replay-dedup on restart, standard [[foreachBatchIngest]] contract.
    */
  def streamConstraintAudit(
      events: DataFrame,
      constraints: Seq[(String, org.apache.spark.sql.Column)],
      reportDir: String, checkpointDir: String): DataFrame = {
    val spark = events.sparkSession
    val q = foreachBatchIngest(events, checkpointDir, (batch, batchId) =>
      writeBatchPartition(
        graft.operators.Quality.constraintReport(batch, constraints),
        batchId, reportDir))
    q.awaitTermination()
    spark.read.parquet(reportDir)
      .groupBy(col("check_name"))
      .agg(sum(col("n_violations")).as("n_violations"), sum(col("n_rows")).as("n_rows"))
      .withColumn("violation_ppm",
        when(col("n_rows") === 0L, 0L)
          .otherwise(floor(col("n_violations") * 1000000L / col("n_rows")).cast("long")))
  }

  /** Streaming point-in-time enrichment: each micro-batch of facts is
    * enriched against a STATIC SCD2 dimension via
    * [[graft.load.Warehouse.pointInTimeJoin]] (the as-of union-window
    * plan) and appended to the output table. The PIT join is per-fact-row,
    * so the converged output is independent of how the stream was split
    * into batches — the e_stream_asof gate pins the whole enriched table
    * against the batch join. This is the feature-store read path in
    * streaming form: facts arrive continuously, the dimension is the
    * slowly-changing history table, and each fact leaves with the version
    * in effect at its own event time.
    */
  def streamPointInTimeEnrich(
      facts: DataFrame, dim: DataFrame,
      keyCol: String, tsCol: String, carryCols: Seq[String],
      outDir: String, checkpointDir: String): DataFrame = {
    val spark = facts.sparkSession
    val q = foreachBatchIngest(facts, checkpointDir, (batch, batchId) =>
      writeBatchPartition(
        graft.load.Warehouse.pointInTimeJoin(batch, dim, keyCol, tsCol, carryCols),
        batchId, outDir))
    q.awaitTermination()
    spark.read.parquet(outDir).drop("batch_id")
  }

  /** Streaming theta-sketch slice table: each micro-batch contributes one
    * sketch row per slice; the converged per-slice sketch is the
    * union-fold of the batch rows ([[graft.operators.ThetaSketches.thetaUnionAgg]]
    * — theta unions are mergeable summaries, so the fold is the sketch of
    * the whole stream regardless of batch split). State is one sketch row
    * per (slice, batch) at rest, KB-scale for any stream volume; below
    * the sketch's nominal capacity estimates are EXACT, which is what the
    * e_stream_theta gate pins against exact SQL distinct counts.
    */
  def streamThetaSlices(
      events: DataFrame, sliceCol: org.apache.spark.sql.Column,
      itemCol: org.apache.spark.sql.Column, lgK: Int,
      sketchDir: String, checkpointDir: String): DataFrame = {
    val spark = events.sparkSession
    val q = foreachBatchIngest(events, checkpointDir, (batch, batchId) =>
      writeBatchPartition(
        graft.operators.ThetaSketches.thetaSliceSketches(batch, sliceCol, itemCol, lgK),
        batchId, sketchDir))
    q.awaitTermination()
    spark.read.parquet(sketchDir)
      .groupBy(col("slice"))
      .agg(graft.operators.ThetaSketches.thetaUnionAgg(col("sketch"), lgK).as("sketch"))
  }

  /** Streaming count-min sketch: sketch each micro-batch independently
    * ([[graft.operators.Sketches.cmsSketch]]), append the per-batch bucket
    * tables, and return the converged stream-lifetime sketch as their
    * bucket-sum rollup. CMS bucket counts are LINEAR in the input, so the
    * converged sketch is exactly — not approximately — the sketch of the
    * concatenated stream, independent of micro-batch split (the mergeable
    * -summaries property; `Sketches.cmsMergeSketches` is the batch face of
    * the same fold). State per batch is ≤ depth×width rows regardless of
    * stream volume — the KB-scale frequency summary a 100 TB ingest keeps
    * where an exact per-item count table would grow with the key space.
    */
  def streamCmsSketch(
      events: DataFrame, itemCol: org.apache.spark.sql.Column,
      depth: Int, width: Int,
      sketchDir: String, checkpointDir: String): DataFrame = {
    val spark = events.sparkSession
    val q = foreachBatchIngest(events, checkpointDir, (batch, batchId) =>
      writeBatchPartition(
        graft.operators.Sketches.cmsSketch(batch, itemCol, depth, width),
        batchId, sketchDir))
    q.awaitTermination()
    spark.read.parquet(sketchDir)
      .groupBy(col("d"), col("b")).agg(sum(col("c")).as("c"))
  }

  /** Streaming CDC materialization: maintain a latest-row-per-key state
    * table across micro-batches. Each batch is first reduced to its own
    * latest row per key, then merged into the persisted state via
    * [[graft.load.Warehouse.upsertLatest]] with the (versionCols, source)
    * tie-break chain — which is exactly what makes the converged state
    * independent of how the stream was split into batches (asserted in
    * EventStreamSpec against the plain batch window).
    *
    * State versions are written to `stateRoot/v<batchId>` — never
    * read-and-overwrite the same path (Spark plans lazily; overwriting the
    * input of the frame being written is a correctness hazard). Superseded
    * versions are garbage a production deployment vacuums; `batchId` in the
    * path doubles as the replay-dedup handle on restart. At scale the merge
    * is one key shuffle of (state ∪ batch) per trigger; co-bucketing state
    * on the key removes even that.
    *
    * Returns the final state path (None if the stream delivered no batch).
    */
  def streamUpsertLatest(
      events: DataFrame, keyCols: Seq[String], versionCols: Seq[String],
      stateRoot: String, checkpointDir: String,
      keepStateVersions: Int = 2): Option[String] = {
    require(keepStateVersions >= 1)
    val current = new java.util.concurrent.atomic.AtomicReference[String](null)
    // superseded state versions this run has produced, oldest first —
    // retired past the retention window so a long-running stream's temp
    // footprint is bounded at keepStateVersions × state size, not
    // batches × state size. The retention window (≥ 2: current + previous)
    // exists because the current batch's plan READS the previous version;
    // never delete a path a running plan may still have open.
    val produced = new java.util.ArrayDeque[String]()
    val q = foreachBatchIngest(events, checkpointDir, (batch, batchId) => {
      val batchLatest = graft.load.Warehouse.upsertLatest(
        batch.limit(0), batch, keyCols, versionCols)
      val merged = Option(current.get()) match {
        case Some(prev) => graft.load.Warehouse.upsertLatest(
          batch.sparkSession.read.parquet(prev), batchLatest, keyCols, versionCols)
        case None => batchLatest
      }
      val out = s"$stateRoot/v$batchId"
      merged.write.mode("overwrite").parquet(out)
      current.set(out)
      produced.addLast(out)
      while (produced.size > keepStateVersions) {
        val retire = new org.apache.hadoop.fs.Path(produced.removeFirst())
        retire.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
          .delete(retire, true)
      }
    })
    q.awaitTermination()
    Option(current.get())
  }

  /** Session clone with stream-sized shuffle parallelism. A stateful
    * operator materializes one state STORE per shuffle partition, and every
    * micro-batch writes each store's checkpoint delta + crc files — so at
    * batch-y parallelism (32 here) a small stream pays 32× the store
    * init/flush fixed cost per stateful op while each store holds a few
    * thousand rows. Result CONTENT never depends on partition count; only
    * the fixed cost does. Production deployments size this to sustained
    * stream volume instead.
    */
  def streamSession(spark: SparkSession, partitions: Int = 8,
      rocksDb: Boolean = false): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    // production state-store scale switch: the default HDFS-backed provider
    // keeps every store's working set ON HEAP, so long-running sessionize/
    // dedup state at 100× competes with execution memory and eventually
    // OOMs or GC-thrashes; RocksDB keeps state off-heap with bounded block
    // cache + spill-to-disk, and ships changelogs instead of full
    // snapshots. Content is provider-independent (EventStreamSpec pins
    // sessionize equality across providers); only the memory/footprint
    // story changes
    if (rocksDb)
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2
  }

  /** Skip the trailing NO-DATA micro-batch on this stream session — opt-in,
    * and ONLY for queries whose stateful operators emit on ARRIVAL (inner
    * stream-stream joins, dropDuplicates*): for those the no-data batch
    * exists solely to advance the watermark for state EVICTION, so skipping
    * it cannot change output — it only skips one full plan+WAL+commit cycle
    * per query (measured 0.3–0.9 s of the query's fixed cost at any scale,
    * since the cost is per-BATCH, not per-row). NEVER set this on
    * watermark-EMITTING shapes (append-mode windowed aggregations,
    * timeout-firing mapGroupsWithState sessionization): their final rows
    * only exist because that batch runs.
    */
  def skipNoDataBatch(ss: SparkSession): SparkSession = {
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    ss
  }

  /** Run a streaming aggregation over a (finite) file-source stream to
    * completion and return the final result as a batch DataFrame: memory
    * sink + AvailableNow. This is the harness adapter — production callers
    * keep the query running instead.
    */
  def runToCompletion(spark: SparkSession, agg: DataFrame, name: String): DataFrame = {
    val q = graft.Trace.t("stream.start")(agg.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start())
    graft.Trace.t("stream.await")(q.awaitTermination())
    spark.table(name)
  }

  /** [[runToCompletion]] for append-mode plans (stream-stream joins, which
    * reject Complete mode). The memory sink accumulates appended rows across
    * micro-batches; AvailableNow drains the finite source.
    */
  def runAppendToCompletion(spark: SparkSession, plan: DataFrame, name: String): DataFrame = {
    val q = graft.Trace.t("stream.start")(plan.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start())
    graft.Trace.t("stream.await")(q.awaitTermination())
    spark.table(name)
  }
}
