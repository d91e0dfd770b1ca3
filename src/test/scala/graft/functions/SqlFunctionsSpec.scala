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

  test("graft_jaro_winkler in SQL matches the pinned comparator values") {
    val v = spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA')")
      .collect().head.getDouble(0)
    assert(v == 0.9611111111111111)
    assert(spark.sql("SELECT graft_jaro('MARTHA', 'MARHTA')")
      .collect().head.getDouble(0) == 0.9444444444444445)
  }

  test("theta sketch family composes in pure SQL") {
    import spark.implicits._
    ((1L to 300L).map(("A", _)) ++ (200L to 500L).map(("B", _)))
      .toDF("slice", "item").createOrReplaceTempView("sql_theta")
    val est = spark.sql(
      """WITH sk AS (SELECT slice, graft_theta_sketch(item, 12) AS s FROM sql_theta GROUP BY slice)
        |SELECT graft_theta_estimate(graft_theta_intersect(a.s, b.s))
        |FROM sk a JOIN sk b ON a.slice = 'A' AND b.slice = 'B'""".stripMargin)
      .collect().head.getDouble(0)
    assert(est == 101.0)
  }

  test("non-literal k is rejected with a clear error") {
    Seq((1L, "x")).toDF("id", "text").createOrReplaceTempView("sql_docs2")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(graft_word_shingles(text, 3), id + 1) FROM sql_docs2").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("k must be"))
  }
}
