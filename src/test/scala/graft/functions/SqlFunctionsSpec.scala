package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface registered by GraftExtensions (SparkSessionExtensions). */
class SqlFunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("graft functions callable from pure SQL") {
    Seq((1L, "the quick brown fox the quick brown dog"))
      .toDF("id", "text").createOrReplaceTempView("sql_docs")
    val row = spark.sql(
      """SELECT
        |  size(graft_word_shingles(text, 3)) AS n_shingles,
        |  size(graft_minhash(graft_word_shingles(text, 3), 16)) AS sig_len,
        |  size(graft_lsh_bands(graft_minhash(graft_word_shingles(text, 3), 16), 4, 4)) AS n_bands,
        |  graft_simhash64(graft_word_shingles(text, 1)) AS sh
        |FROM sql_docs""".stripMargin).collect().head
    assert(row.getInt(0) == 5) // 6 3-gram positions, one duplicate → 5 distinct
    assert(row.getInt(1) == 16 && row.getInt(2) == 4)
    assert(row.getLong(3) != 0L)
  }

  test("graft_cosine in SQL matches the DSL expression") {
    val df = Seq((Array(1f, 2f, 3f), Array(3f, 2f, 1f))).toDF("a", "b")
    df.createOrReplaceTempView("sql_vecs")
    val sql = spark.sql("SELECT graft_cosine(a, b) FROM sql_vecs").collect().head.getDouble(0)
    val dsl = df.select(VectorHash.cosine(org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))).collect().head.getDouble(0)
    assert(sql == dsl && math.abs(sql - 10.0 / 14.0) < 1e-12)
  }

  test("non-literal k is rejected with a clear error") {
    Seq((1L, "x")).toDF("id", "text").createOrReplaceTempView("sql_docs2")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(graft_word_shingles(text, 3), id + 1) FROM sql_docs2").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("k must be"))
  }
}
