package graft

/** Dev triage main: run named SparkEntry queries (args) against a sf dir
  * (SPARK_GRAFT_SF_DIR) and print row counts / errors — the fast inner loop
  * between full Verify rounds. Unlike Verify this prints failures loudly and
  * runs only what you name.
  */
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.localFromEnv()
    Trace.installJobTrace(spark)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val t0 = System.nanoTime()
      val out = try CacheScope.withScope {
        SparkEntry.queries(n)(spark, sfDir).count().toString
      } catch { case e: Throwable =>
        "ERR " + e.getClass.getSimpleName + ": " + Option(e.getMessage).getOrElse("").take(300)
      }
      println(f"[qc] $n%-24s ${(System.nanoTime() - t0) / 1e9}%7.1f s  rows=$out")
    }
    spark.stop()
  }
}
