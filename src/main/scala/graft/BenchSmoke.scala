package graft

/** Full-query-set smoke gate (VERDICT r3 #3): every SparkEntry query —
  * including the validation-only brutes Bench excludes — runs ONCE at a
  * small scale factor in one shared JVM, and the run FAILS (exit 1) if any
  * query exceeds a generous absolute bound or errors. This is the guard
  * that a late query landing can never again ship un-full-set-benched:
  * cross-query resource accumulation (the round-3 collapse mode) shows up
  * here as a bound violation long before the driver's sf0.1 bench.
  *
  * Run at every round close: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01
  * sbt "runMain graft.BenchSmoke".
  */
object BenchSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // generous: isolated singletons at sf0.01 run well under 5 s; a query
    // only crosses this when something structural is wrong (accumulation,
    // a plan regression, a new O(n²) stage)
    val boundSec = sys.env.getOrElse("SPARK_GRAFT_SMOKE_BOUND_SEC", "20").toDouble
    val spark = GraftSession.localFromEnv()
    spark.range(1000000).selectExpr("sum(id)").collect()
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
    val failures = results.collect {
      case (n, s, None) if s > boundSec => f"$n exceeded bound: $s%.1f s > $boundSec s"
      case (n, _, Some(err))            => s"$n errored: $err"
    }
    val total = results.map(_._2).sum
    println(f"""{"metric":"smoke_total","value":$total%.3f,"unit":"sec","nqueries":${results.size},"failures":${failures.size},"bound_sec":$boundSec}""")
    if (failures.nonEmpty) {
      failures.foreach(f => System.err.println(s"[smoke] FAIL: $f"))
      sys.exit(1)
    }
    spark.stop()
  }
}
