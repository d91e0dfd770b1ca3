package graft.load

import java.util.Properties

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** JDBC sink/source round-trip against embedded Derby (in Spark's jars) —
  * exercises S10/S12 and the drop-and-reload idempotence unit for real, not
  * as SQL strings.
  */
class JdbcSinkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  // Derby folds unquoted idents to upper case; Spark's writer quotes them,
  // so raw SQL in the sink helpers must quote too.
  private val col = "\"surveyid\""

  test("append + read back + slice count + reload idempotence") {
    val t = "graft_load_test"
    val df1 = Seq(("511", "a", 1L), ("511", "b", 2L), ("522", "c", 3L))
      .toDF("surveyid", "name", "v")
    val widths = JdbcSink.columnTypesClause(Seq(
      DdlManager.ColumnDef("surveyid", 8), DdlManager.ColumnDef("name", 32)))
    JdbcSink.append(df1, url, t, props, columnTypes = Some(widths))
    assert(JdbcSink.sliceRowCount(url, t, "511", props, col) == 2L)

    // read back through the jdbc source (S10)
    val back = spark.read.jdbc(url, t, props)
    assert(back.count() == 3)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("name", "surveyid", "v"))

    // drop-and-reload survey 511 with different rows: no duplication
    val df2 = Seq(("511", "a2", 10L)).toDF("surveyid", "name", "v")
    JdbcSink.reloadSurveySlice(df2, url, t, "511", props, col)
    val after = spark.read.jdbc(url, t, props)
    assert(after.count() == 2) // 1 × 511 + 1 × 522
    assert(JdbcSink.sliceRowCount(url, t, "511", props, col) == 1L)
  }

  test("overwrite replaces the table (survey-listing cache semantics)") {
    val t = "graft_cache_test"
    JdbcSink.append(Seq(("1", "x")).toDF("surveyid", "name"), url, t, props)
    JdbcSink.overwrite(Seq(("2", "y"), ("3", "z")).toDF("surveyid", "name"), url, t, props)
    assert(spark.read.jdbc(url, t, props).count() == 2)
  }
}
