package graft

/** Full-query-set smoke gate (VERDICT r3 #3): every SparkEntry query —
  * including the validation-only brutes Bench excludes — runs ONCE at a
  * small scale factor in one shared JVM, and the run FAILS (exit 1) if any
  * query exceeds its bound or errors. This is the guard that a late query
  * landing can never again ship un-full-set-benched: cross-query resource
  * accumulation (the round-3 collapse mode) shows up here as a bound
  * violation long before the driver's sf0.1 bench.
  *
  * Two bounds apply (VERDICT r4 #1 — closing claims must be machine-checked):
  *  - a generous global absolute bound (structural failures: accumulation,
  *    a plan regression, a new O(n²) stage);
  *  - a PER-QUERY ceiling from `scripts/smoke_ceilings.json` (committed
  *    isolated times): each query must finish within
  *    max(2 s, 3 × its recorded time). Queries absent from the file use the
  *    global bound only. The observed times are written to
  *    `smoke_times.json`, so refreshing the ceilings file after an
  *    intentional query change is one copy.
  *
  * Run at every round close: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01
  * sbt "runMain graft.BenchSmoke".
  */
object BenchSmoke {
  /** name → seconds, parsed from a flat one-level JSON object (no deps). */
  def readFlatJson(path: java.nio.file.Path): Map[String, Double] =
    if (!java.nio.file.Files.exists(path)) Map.empty
    else {
      val text = new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
      """"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val boundSec = sys.env.getOrElse("SPARK_GRAFT_SMOKE_BOUND_SEC", "20").toDouble
    val ceilings = readFlatJson(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SMOKE_CEILINGS", "scripts/smoke_ceilings.json")))
    // floor 2 s: sub-second queries see 2-3× pure scheduler jitter on this
    // box; the ceiling gate is for structural regressions, not jitter
    def perQueryBound(name: String): Double =
      ceilings.get(name).map(c => math.max(2.0, 3.0 * c)).getOrElse(boundSec)
    val spark = GraftSession.localFromEnv()
    val failures =
      try {
        spark.range(1000000).selectExpr("sum(id)").collect()
        // same table warmup as Bench: parquet footers + scan codegen paths,
        // so the alphabetically-first query (a1) doesn't absorb the session's
        // one-time cold cost and trip its own ceiling
        Seq("lineitem", "orders", "customer", "documents", "embeddings", "events")
          .foreach(t => try Tables(spark, sfDir, t).limit(1).count()
            catch { case _: Throwable => () })
        val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val t0 = System.nanoTime()
          // same per-query scope shape as Bench: cache lifecycle is part of
          // what the smoke gates
          val outcome = try { CacheScope.withScope(fn(spark, sfDir).count()); None }
          catch { case e: Throwable => Some(e.toString.linesIterator.next()) }
          val sec = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[smoke] $name%-24s ${sec}%7.2f s ${outcome.getOrElse("")}")
          (name, sec, outcome)
        }
        // per-query ceilings take precedence (as documented above): a query
        // with a committed time is gated at 3× it, even past the global
        // bound — the heaviest legitimate fixtures (the composed gates
        // bill their whole multi-index build to one query) have outgrown
        // 20 s on slower container instances without any structural
        // regression. The global bound still catches ceiling-LESS queries
        val fails = results.collect {
          case (n, s, None) if ceilings.contains(n) && s > perQueryBound(n) =>
            f"$n exceeded its ceiling: $s%.1f s > ${perQueryBound(n)}%.1f s (isolated ${ceilings(n)}%.2f s × 3)"
          case (n, s, None) if !ceilings.contains(n) && s > boundSec =>
            f"$n exceeded global bound: $s%.1f s > $boundSec s"
          case (n, _, Some(err)) => s"$n errored: $err"
        }
        val times = results.map { case (k, v, _) =>
          "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
        }.mkString("{", ",", "}")
        try java.nio.file.Files.write(java.nio.file.Paths.get("smoke_times.json"),
          (times + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        catch { case e: Throwable => System.err.println(s"[smoke] write smoke_times.json failed: $e") }
        val total = results.map(_._2).sum
        println(f"""{"metric":"smoke_total","value":$total%.3f,"unit":"sec","nqueries":${results.size},"failures":${fails.size},"bound_sec":$boundSec,"ceilings":${ceilings.size}}""")
        fails
      } finally {
        // a stop-time failure must not flip a passing gate (and the failure
        // path must not leave teardown to JVM shutdown hooks)
        try spark.stop() catch { case e: Throwable =>
          System.err.println(s"[smoke] spark.stop failed: $e") }
      }
    if (failures.nonEmpty) {
      failures.foreach(f => System.err.println(s"[smoke] FAIL: $f"))
      sys.exit(1)
    }
  }
}
