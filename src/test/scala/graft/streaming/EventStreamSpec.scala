package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite with SparkTestBase {
  import EventStream._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val fixture = Seq(
    // user 1: two sessions split by a > 30min gap
    Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
    Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
    Event(3, ts("2024-01-01 11:00:00.000001"), 1, "view", 3.0),
    // user 2: one session; gap exactly == 30min stays one session (strict >)
    Event(4, ts("2024-01-01 09:00:00"), 2, "click", 4.0),
    Event(5, ts("2024-01-01 09:30:00"), 2, "view", 5.0))

  test("batch sessionization splits on strict > gap") {
    import spark.implicits._
    val out = sessionizeBatch(fixture.toDF(), gapSeconds = 1800L)
      .orderBy("user_id", "session_start")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSeq == Seq(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L),
      (1L, "2024-01-01 11:00:00.000001", "2024-01-01 11:00:00.000001", 1L),
      (2L, "2024-01-01 09:00:00.0", "2024-01-01 09:30:00.0", 2L)))
  }

  test("stateful sessionization agrees with the batch oracle") {
    import spark.implicits._
    val stateful = sessionizeStateful(fixture.toDS(), gapSeconds = 1800L)
      .toDF().orderBy("user_id", "session_start").collect().toSeq
    val batch = sessionizeBatch(fixture.toDF(), gapSeconds = 1800L)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .orderBy("user_id", "session_start").collect().toSeq
    assert(stateful == batch)
  }

  test("stateful sessionization runs as a real stream over MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = sessionizeStateful(mem.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("sess_out").orderBy("user_id", "session_start").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(3)).toSeq == Seq(2L, 1L, 2L))
  }

  test("sessionize on the RocksDB state-store provider matches the batch oracle") {
    // the production state-store scale path (VERDICT r4 #4): RocksDB keeps
    // per-key session state off-heap with spill — content must be
    // IDENTICAL to the default HDFS-backed provider's
    val s2 = streamSession(spark, partitions = 4, rocksDb = true)
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    assert(s2.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = sessionizeStateful(mem.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sess_rocks")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = s2.table("sess_rocks")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = sessionizeBatch(fixture.toDF(), gapSeconds = 1800L)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .orderBy("user_id", "session_start").collect().toSeq
    assert(got == batch)
  }

  test("streaming mode: sessions survive trigger boundaries, only gap-closed emitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionizeStateful(mem.toDS(), gapSeconds = 1800L, emitOpenAtEnd = false)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 1 two events, user 2 one event — all sessions open
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
        Event(3, ts("2024-01-01 10:05:00"), 2, "view", 3.0))
      q.processAllAvailable()
      assert(spark.table("sess_stream").count() == 0) // nothing force-closed

      // batch 2: user 1 jumps past the gap (closes session 1 via the gap
      // rule, opens a new one); user 2 continues within the gap. The 11:00
      // event advances the watermark past user 2's last+gap (10:50), so
      // user 2's session closes via event-time timeout — but user 1's new
      // 11:00 session stays open.
      mem.addData(
        Event(4, ts("2024-01-01 11:00:00"), 1, "view", 4.0),
        Event(5, ts("2024-01-01 10:20:00"), 2, "click", 5.0))
      q.processAllAvailable()
      val emitted = spark.table("sess_stream")
        .collect().map(r => (r.getLong(0), r.getLong(3))).sorted
      assert(emitted.toSeq == Seq((1L, 2L), (2L, 2L)))
    } finally q.stop()
  }

  test("streaming mode: a late-but-within-watermark event extends, never regresses, the session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionizeStateful(mem.toDS(), gapSeconds = 1800L,
      emitOpenAtEnd = false, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable() // watermark → 09:50
      // late by 2 minutes but above the watermark: must be accepted and
      // EXTEND the stored session downward (state last must stay 10:00)
      mem.addData(Event(2, ts("2024-01-01 09:58:00"), 1, "view", 2.0))
      q.processAllAvailable()
      // > gap jump closes the session via the gap rule
      mem.addData(Event(3, ts("2024-01-01 11:00:00"), 1, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("sess_late").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getTimestamp(1) == ts("2024-01-01 09:58:00")) // start extended down
      assert(r.getTimestamp(2) == ts("2024-01-01 10:00:00")) // end NOT regressed
      assert(r.getLong(3) == 2L)
    } finally q.stop()
  }

  test("windowed stats on a stream equal the batch group-by") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val streamed = runToCompletion(spark,
      windowedStats(mem.toDS().toDF(), "1 hour"), "win_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = windowedStats(fixture.toDF(), "1 hour")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-static enrichment join equals the batch join, stream side unshuffled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      enrichWithDim(df, dim, "user_id", "cust_id")
        .groupBy("tier", "event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
    val streamed = runToCompletion(spark, agg(mem.toDS().toDF()), "enrich_out")
      .orderBy("tier", "event_type").collect().toSeq
    val batch = agg(fixture.toDF()).orderBy("tier", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // the load-bearing plan property: the dim broadcasts, the event side is
    // never exchanged into the join (asserted on the batch plan — the same
    // enrichWithDim plan each micro-batch executes)
    val joined = enrichWithDim(fixture.toDF(), dim, "user_id", "cust_id")
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical)
    // same-name keys must not be ambiguous (the most common enrichment shape)
    val sameName = dim.withColumnRenamed("cust_id", "user_id")
    assert(enrichWithDim(fixture.toDF(), sameName, "user_id", "user_id")
      .count() > 0)
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 09:00:00"))).toDF("user_id", "click_ts")
    val purchases = Seq(
      (1L, ts("2024-01-01 10:30:00"), 5.0),  // within 1h of click 1
      (1L, ts("2024-01-01 11:30:00"), 6.0),  // matches neither (>1h, before 2nd)
      (1L, ts("2024-01-01 12:00:00"), 7.0),  // boundary: lag 0 of click 2
      (2L, ts("2024-01-01 10:00:00"), 8.0),  // boundary: exactly +1h
      (3L, ts("2024-01-01 10:00:00"), 9.0))  // no click for user 3
      .toDF("p_user", "purchase_ts", "purchase_value")
    val memC = MemoryStream[(Long, java.sql.Timestamp)]
    val memP = MemoryStream[(Long, java.sql.Timestamp, Double)]
    memC.addData(Seq((1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")), (2L, ts("2024-01-01 09:00:00"))): _*)
    memP.addData(Seq(
      (1L, ts("2024-01-01 10:30:00"), 5.0), (1L, ts("2024-01-01 11:30:00"), 6.0),
      (1L, ts("2024-01-01 12:00:00"), 7.0), (2L, ts("2024-01-01 10:00:00"), 8.0),
      (3L, ts("2024-01-01 10:00:00"), 9.0)): _*)
    val streamed = runAppendToCompletion(spark,
      intervalJoin(
        memC.toDS().toDF("user_id", "click_ts"),
        memP.toDS().toDF("p_user", "purchase_ts", "purchase_value"),
        "user_id", "p_user", "click_ts", "purchase_ts", 3600),
      "sj_out")
      .select("user_id", "click_ts", "purchase_ts", "purchase_value")
      .collect().map(_.toSeq).toSet
    val batch = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 3600 SECONDS"))
      .select("user_id", "click_ts", "purchase_ts", "purchase_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // both inclusive boundaries present; unmatched users absent
    assert(batch.exists(r => r(3) == 7.0) && batch.exists(r => r(3) == 8.0))
    assert(!batch.exists(r => r(3) == 6.0) && !batch.exists(r => r(3) == 9.0))
  }

  test("streaming dedup within watermark drops cross-batch duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupWithinWatermark(mem.toDS().toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0), // in-batch dup
        Event(2, ts("2024-01-01 10:05:00"), 1, "view", 2.0))
      q.processAllAvailable()
      // redelivery in a later micro-batch, still inside the watermark
      mem.addData(
        Event(2, ts("2024-01-01 10:05:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 10:10:00"), 2, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("incremental corpus ingest: per-batch dedup against an accumulating digest manifest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("inc_ingest").toString
    val (corpusDir, manifestDir) = (s"$tmp/corpus", s"$tmp/manifest")
    // bootstrap an empty manifest so per-batch reads never hit a missing path
    Seq.empty[String].toDF("text_hash").write.parquet(manifestDir)

    val mem = MemoryStream[(Long, String)]
    // default micro-batch trigger (not AvailableNow) so data added between
    // processAllAvailable() calls arrives as separate batches
    val q = mem.toDS().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        // the incremental composition: batch → unseen docs → append both
        // the docs and their digests (order matters: manifest last, so a
        // mid-write crash re-ingests rather than losing docs)
        val fresh = graft.operators.Dedup.dropSeenDocuments(
          batch.toDF(), spark.read.parquet(manifestDir), "text", "doc_id")
          .localCheckpoint(true) // pin: written twice below
        fresh.write.mode("append").parquet(corpusDir)
        graft.operators.Dedup.digestManifest(fresh, "text")
          .write.mode("append").parquet(manifestDir)
        ()
      }
      .start()
    try {
      mem.addData((1L, "alpha"), (2L, "beta"), (2L, "beta")) // batch 1, self-dup
      q.processAllAvailable()
      mem.addData((10L, "alpha"), (11L, "gamma"))            // batch 2: alpha seen
      q.processAllAvailable()
      mem.addData((20L, "beta"), (21L, "gamma"), (22L, "delta")) // batch 3
      q.processAllAvailable()
    } finally q.stop()

    val corpus = spark.read.parquet(corpusDir)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(corpus.map(_._2).toSeq == Seq("alpha", "beta", "gamma", "delta"))
    assert(corpus.map(_._1).toSeq == Seq(1L, 2L, 11L, 22L)) // first arrival wins
    assert(spark.read.parquet(manifestDir).count() == 4)
  }

  test("foreachBatch ingest reuses a batch writer with batchId dedup handle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ingest").toString
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = foreachBatchIngest(mem.toDS().toDF(), s"$tmp/ckpt", (batch, id) => {
      seen += id
      batch.write.mode("overwrite").parquet(s"$tmp/batch_$id")
    })
    q.awaitTermination()
    assert(seen.nonEmpty)
    val written = spark.read.parquet(s"$tmp/batch_${seen.head}")
    assert(written.count() == fixture.length)
  }

  test("streaming latest-state upsert: multi-batch merge equals the batch latest-per-user") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("supsert").toString
    // 4 separate parquet files + maxFilesPerTrigger=1 → 4 micro-batches.
    // Deliberately adversarial ordering: user 3's LATEST event lands in an
    // early file with older events arriving later (the merge must not let
    // arrival order beat event time), and user 2 has a ts tie broken by
    // event_id.
    val files = Seq(
      Seq(Event(10, ts("2024-01-01 12:00:00"), 3, "late", 1.0)),
      Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 2, "b", 2.0)),
      Seq(Event(3, ts("2024-01-01 11:00:00"), 3, "stale", 3.0),
        Event(5, ts("2024-01-01 10:05:00"), 2, "tie-hi", 5.0)),
      Seq(Event(4, ts("2024-01-01 10:30:00"), 1, "c", 4.0)))
    files.foreach(evs =>
      evs.toDF().coalesce(1).write.mode("append").parquet(s"$tmp/in"))
    val stream = readEvents(spark, s"$tmp/in", Map("maxFilesPerTrigger" -> "1"))
    val state = streamUpsertLatest(stream, Seq("user_id"), Seq("ts", "event_id"),
      s"$tmp/state", s"$tmp/ckpt")
    // really ran as multiple merges, not one big batch — AND the retention
    // window bounded the temp footprint (4 batches produced, 2 retained)
    val versions = new java.io.File(s"$tmp/state").list().count(_.startsWith("v"))
    assert(versions == 2, s"expected exactly keepStateVersions=2 retained, got $versions")
    val got = spark.read.parquet(state.get)
      .select("user_id", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // batch truth: latest by (ts, event_id) per user over ALL events
    assert(got == Set((1L, 4L, "c"), (2L, 5L, "tie-hi"), (3L, 10L, "late")))
  }

  test("streaming constraint audit: multi-batch sums equal the whole-table batch report") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("saudit").toString
    // violations spread ACROSS batches so only correct summation passes:
    // file 1 has a negative value, file 3 a null user and a bad type
    val files = Seq(
      Seq((1L, ts("2024-01-01 10:00:00"), java.lang.Long.valueOf(1L), "view", -5.0)),
      Seq((2L, ts("2024-01-01 10:01:00"), java.lang.Long.valueOf(2L), "click", 1.0),
        (3L, ts("2024-01-01 10:02:00"), java.lang.Long.valueOf(3L), "view", 2.0)),
      Seq((4L, ts("2024-01-01 10:03:00"), null.asInstanceOf[java.lang.Long], "view", 3.0),
        (5L, ts("2024-01-01 10:04:00"), java.lang.Long.valueOf(5L), "bogus", 4.0)))
    files.foreach(evs =>
      evs.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(s"$tmp/in"))
    val constraints = Seq(
      "user_not_null" -> col("user_id").isNotNull,
      "type_domain" -> col("event_type").isin("view", "click"),
      "value_positive" -> (col("value") > 0))
    val stream = readEvents(spark, s"$tmp/in", Map("maxFilesPerTrigger" -> "1"))
    val got = streamConstraintAudit(stream, constraints, s"$tmp/report", s"$tmp/ckpt")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // it REALLY ran as 3 micro-batches (one report row set per batch)
    val batches = spark.read.parquet(s"$tmp/report")
      .select("batch_id").distinct().count()
    assert(batches == 3, s"expected 3 micro-batches, got $batches")
    assert(got == Map(
      "user_not_null" -> (1L, 5L, 200000L),
      "type_domain" -> (1L, 5L, 200000L),
      "value_positive" -> (1L, 5L, 200000L)))
    // ...and equals the one-pass batch audit of the same table
    val batch = graft.operators.Quality.constraintReport(
      spark.read.parquet(s"$tmp/in"), constraints)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == batch)
  }

  test("streaming CDC: a retained tombstone blocks resurrection by a later-arriving OLDER update") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scdc").toString
    // op rides through state; batch order is arrival order, version order is
    // event time — the adversarial case is a tombstone followed by a LATE
    // (older-ts) update for the same key
    val files = Seq(
      Seq((1L, ts("2024-01-01 10:00:00"), 1L, "u1-a", 1.0, "U"),
        (10L, ts("2024-01-01 10:00:00"), 2L, "u2-a", 1.0, "D")),
      Seq((2L, ts("2024-01-01 12:00:00"), 1L, "u1-deleted", 0.0, "D"),
        (11L, ts("2024-01-01 11:00:00"), 2L, "u2-res", 2.0, "U")),
      Seq((3L, ts("2024-01-01 11:00:00"), 1L, "u1-late", 3.0, "U")))
    files.foreach(evs =>
      evs.toDF("event_id", "ts", "user_id", "event_type", "value", "op")
        .coalesce(1).write.mode("append").parquet(s"$tmp/in"))
    val stream = readEvents(spark, s"$tmp/in", Map("maxFilesPerTrigger" -> "1"))
    val state = streamUpsertLatest(stream, Seq("user_id"), Seq("ts", "event_id"),
      s"$tmp/state", s"$tmp/ckpt")
    assert(new java.io.File(s"$tmp/state").list().count(_.startsWith("v")) >= 2)
    val live = spark.read.parquet(state.get)
      .filter(col("op") =!= "D")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[String]("event_type")).toMap
    // user 1: tombstone at 12:00 outranks the late 11:00 update → absent.
    // user 2: delete at 10:00, NEWER 11:00 upsert → resurrected.
    assert(live == Map(2L -> "u2-res"))
  }

  test("streaming PIT enrichment converges to the batch join across forced micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("spit").toString
    // dim history: user 1 changes value at 10:00 and 11:00
    val dim = graft.load.Warehouse.scd2History(
      Seq((1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
        (1L, ts("2024-01-01 11:00:00"), 101L, 2.0))
        .toDF("user_id", "ts", "change_id", "profile_value"),
      Seq("user_id"), "ts", Seq("change_id"))
    // facts split across 3 files → 3 micro-batches; one pre-history fact
    val files = Seq(
      Seq((10L, ts("2024-01-01 09:30:00"), 1L, "purchase", 5.0)),
      Seq((11L, ts("2024-01-01 10:30:00"), 1L, "purchase", 6.0)),
      Seq((12L, ts("2024-01-01 12:00:00"), 1L, "purchase", 7.0)))
    files.foreach(_.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(s"$tmp/in"))
    val stream = readEvents(spark, s"$tmp/in", Map("maxFilesPerTrigger" -> "1"))
      .select(col("event_id").as("fact_id"), col("user_id"), col("ts"),
        col("value").as("amount"))
    val got = streamPointInTimeEnrich(stream, dim, "user_id", "ts",
        Seq("profile_value", "change_id"), s"$tmp/out", s"$tmp/ckpt")
      .select("fact_id", "change_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == Map(10L -> None, 11L -> Some(100L), 12L -> Some(101L)))
  }

  test("streaming CMS sketch: multi-batch fold equals the whole-table batch sketch exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("scms").toString
    // the same item split ACROSS batches — only correct bucket summation
    // reproduces its total count
    val files = Seq(
      Seq((1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.0),
        (2L, ts("2024-01-01 10:01:00"), 8L, "view", 1.0)),
      Seq((3L, ts("2024-01-01 10:02:00"), 7L, "view", 1.0)),
      Seq((4L, ts("2024-01-01 10:03:00"), 7L, "view", 1.0),
        (5L, ts("2024-01-01 10:04:00"), 9L, "view", 1.0)))
    files.foreach(evs =>
      evs.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(s"$tmp/in"))
    val stream = readEvents(spark, s"$tmp/in", Map("maxFilesPerTrigger" -> "1"))
    val streamed = streamCmsSketch(stream.select(col("user_id")), col("user_id"),
      depth = 3, width = 16, s"$tmp/sketch", s"$tmp/ckpt")
      .select(col("d").cast("long"), col("b").cast("long"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // it really ran as 3 micro-batches
    val batches = spark.read.parquet(s"$tmp/sketch")
      .select("batch_id").distinct().count()
    assert(batches == 3, s"expected 3 micro-batches, got $batches")
    val whole = files.flatten.toDF("event_id", "ts", "user_id", "event_type", "value")
    val batchSketch = graft.operators.Sketches.cmsSketch(whole, col("user_id"), 3, 16)
      .select(col("d").cast("long"), col("b").cast("long"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batchSketch)
    // and the fold is consistent: estimates from the streamed sketch count
    // user 7 exactly 3 (one-sided: never below)
    val est = graft.operators.Sketches.cmsEstimateFromSketch(
      spark.createDataFrame(streamed.toSeq.map { case ((d, b), c) => (d, b, c) })
        .toDF("d", "b", "c"),
      Seq(Tuple1(7L)).toDF("u"), col("u"), 3, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("7") >= 3L)
  }
}
