package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: every entry point (Verify, Bench, Plans,
  * tests, user code) builds its SparkSession here so the engine's required
  * and recommended configs live in exactly one place.
  *
  * Required:
  *  - nanosAsLong: the harness events parquet stores TIMESTAMP(NANOS),
  *    unreadable otherwise (Tables/EventStream re-derive the timestamp);
  *  - UTC session timezone: oracle comparisons are timezone-sensitive;
  *  - GraftExtensions: the SQL surface for the native expressions.
  *
  * Recommended (scale posture):
  *  - AQE + skew-join splitting + partition coalescing: runtime re-planning
  *    is the first line of defense against skew and tiny partitions;
  *  - shuffle partitions sized to the core count locally (the 200 default
  *    is a cluster setting; local[n] wants n).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the reference's cp1252 CSV fallback needs the full Java charset set;
      // Spark 4's default CSV whitelist rejects windows-1252 outright
      .config("spark.sql.legacy.javaCharsets", "true")
      // ObjectHashAggregate (typed Aggregators, collect_*) falls back to
      // SORT-based aggregation after this many in-memory group buffers —
      // the default 128 forces a full map-side sort for any real group
      // cardinality, which erased TopKAgg's k-bounded-exchange advantage
      // (11.0 → 4.5 s at the 100× stress point when raised). 64k buffers:
      // k-bounded buffers (top-k, sketches) stay resident for realistic
      // group counts; collect_list-style unbounded buffers hold a
      // partition's rows either way (the shuffle already carries them all).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
    // managed-table root for bucketed warehouse tables (Warehouse.scala).
    // Default only — a spark-submit --conf / spark-defaults setting (visible
    // as a system property) must win, so never override one that exists.
    if (sys.props.contains("spark.sql.warehouse.dir")) b
    else b.config("spark.sql.warehouse.dir",
      sys.props("java.io.tmpdir") + "/graft-warehouse")
  }

  /** Local session with `cpus` cores (the harness shape). */
  def local(cpus: Int): SparkSession = {
    // ad-hoc conf overrides for experiments: SPARK_GRAFT_CONF="k=v;k2=v2"
    // (diagnostics only — the engine's supported settings live in builder()).
    // Every applied override is announced on stderr so a verified/benched
    // run that used the escape hatch is visibly tainted — a silent override
    // of e.g. ANSI mode or the session timezone could change verified
    // semantics with no trace in the output.
    val b = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foldLeft(builder(s"local[$cpus]", cpus)) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2)
        System.err.println(s"[graft] WARN: SPARK_GRAFT_CONF override applied: $k=$v")
        acc.config(k, v)
      }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG_LEVEL", "WARN"))
    s
  }

  def localFromEnv(): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
}
