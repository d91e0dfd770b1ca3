package graft.load

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class WarehouseSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // each test provisions what it reads — no cross-test table dependencies
  private lazy val tablesReady: Unit = {
    val hh = (1 to 500).map(i => (f"$i%12d", s"hh$i")).toDF("hhid", "hv000")
    val rec = (1 to 500).flatMap(i => Seq((f"$i%12d", 1), (f"$i%12d", 2)))
      .toDF("hhid", "idx")
    spark.sql("DROP TABLE IF EXISTS wh_hh")
    spark.sql("DROP TABLE IF EXISTS wh_rec")
    spark.sql("DROP TABLE IF EXISTS wh_rec4")
    Warehouse.writeBucketed(hh, "wh_hh", Seq("hhid"), 8, sortCols = Seq("hhid"))
    Warehouse.writeBucketed(rec, "wh_rec", Seq("hhid"), 8, sortCols = Seq("hhid"))
    Warehouse.writeBucketed(rec, "wh_rec4", Seq("hhid"), 4)
  }

  test("co-bucketed tables join without a shuffle; mismatched bucketing shuffles") {
    tablesReady
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // co-bucketed: the join reads bucketed scans directly — no exchange
      val j = Warehouse.table(spark, "wh_hh")
        .join(Warehouse.table(spark, "wh_rec"), "hhid")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join still shuffles:\n$plan")

      // bucket-count mismatch: at least one side must re-shuffle
      val jm = Warehouse.table(spark, "wh_hh")
        .join(Warehouse.table(spark, "wh_rec4"), "hhid")
      assert(jm.count() == 1000)
      assert(jm.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle too") {
    tablesReady
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = Warehouse.table(spark, "wh_rec").groupBy("hhid")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      assert(agg.count() == 500)
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
