package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for harness testdata drift — the generalization of the r5 events
  * lesson (TESTDATA.md "Events ts physical-type contract"): the driver
  * regenerates `/root/testdata` between rounds and may change a column's
  * physical/logical type without notice. Every engine-visible table schema is
  * pinned here AS `Tables` loads it (post-normalize canonical form), so any
  * regeneration drift fails this suite with a diff instead of silently
  * skewing operators the way the r5 TIMESTAMP_NTZ switch did.
  *
  * On an intentional harness change: update the pinned schema AND audit every
  * operator that computes on the drifted column (see the r5 postmortem in
  * VERDICT.md for why "it still passes somewhere" is not enough).
  */
class TestdataShapeSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def loadedSchema(name: String): String =
    Tables(spark, sfDir, name).schema
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")

  // engine-visible schemas: what operators actually compute on. events.ts is
  // TimestampType BY CONTRACT regardless of the file's physical layout
  // (EventStream.normalize canonicalizes); everything else is as-read.
  // NOTE o_orderdate / l_shipdate are timestamp_ntz on disk today — date
  // semantics hold because engine and oracle both treat them as wall-clock;
  // if they drift to DATE or adjusted-UTC TIMESTAMP this spec trips first.
  private val pinned = Map(
    "region" -> "r_regionkey:int, r_name:string",
    "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer" -> "c_custkey:bigint, c_name:string, c_nationkey:int, c_acctbal:double, c_mktsegment:string",
    "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part" -> "p_partkey:bigint, p_name:string, p_brand:string, p_type:string, p_size:int, p_retailprice:double",
    "orders" -> "o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string",
    "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, l_linenumber:int, " +
      "l_quantity:double, l_extendedprice:double, l_discount:double, l_tax:double, " +
      "l_returnflag:string, l_linestatus:string, l_shipdate:timestamp_ntz"),
    "events" -> "event_id:bigint, ts:timestamp, user_id:bigint, event_type:string, value:double, props:string",
    "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")

  pinned.foreach { case (table, expect) =>
    test(s"$table loads with the pinned engine-visible schema") {
      assume(new java.io.File(s"$sfDir/$table.parquet").exists(), "harness testdata not present")
      assert(loadedSchema(table) == expect,
        s"\nHARNESS TESTDATA DRIFT on '$table' — audit operators before re-pinning (see Scaladoc)")
    }
  }

  test("primary keys are non-null and distinct at sf0.001") {
    val keys = Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "part" -> "p_partkey", "events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    keys.foreach { case (table, pk) =>
      assume(new java.io.File(s"$sfDir/$table.parquet").exists())
      val r = Tables(spark, sfDir, table)
        .agg(count(lit(1)).as("n"), countDistinct(col(pk)).as("d"),
          count(col(pk)).as("nn")).collect().head
      assert(r.getLong(0) > 0, s"$table is empty")
      assert(r.getLong(0) == r.getLong(1) && r.getLong(0) == r.getLong(2),
        s"$table.$pk is not a non-null primary key (n=${r.getLong(0)}, distinct=${r.getLong(1)}, nonnull=${r.getLong(2)})")
    }
  }

  test("embeddings are fixed-dimension float vectors") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val dims = Tables(spark, sfDir, "embeddings")
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.length == 1 && dims.head > 0,
      s"embedding dimension not constant: ${dims.toSeq}")
  }
}
