package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for suites (one JVM-wide session; Spark reuses
  * the active session across suites via getOrCreate).
  */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession = GraftSession.local(4)
}
