package graft.api

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SurveyUpdatesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val surveys = Seq((100, "Benin 2017", "BJ"), (200, "Chad 2015", "TD"), (300, "Peru 2020", "PE"))
    .toDF("SurveyId", "SurveyName", "CC")
  private val updates = Seq((100, "2021-01-05"), (300, "2021-01-07"))
    .toDF("SurveyId", "UpdateDate")
  private val roots = Seq(
    Seq("100", "200").toDF("surveyid"),
    Seq("200").toDF("surveyid"))

  test("updates join to survey metadata (broadcast inner)") {
    val out = SurveyUpdates.updatesWithMetadata(updates, surveys).collect()
    assert(out.length == 2)
    assert(out.forall(_.schema.fieldNames.contains("SurveyName")))
  }

  test("loaded ids union-distinct across root tables") {
    val ids = SurveyUpdates.loadedSurveyIds(roots).as[String].collect().toSet
    assert(ids == Set("100", "200"))
  }

  test("missing surveys = listed minus loaded (anti-join)") {
    val missing = SurveyUpdates.missingSurveys(
      surveys.withColumnRenamed("SurveyId", "SurveyNum"),
      SurveyUpdates.loadedSurveyIds(roots))
      .select("SurveyNum").as[Int].collect().toSet
    assert(missing == Set(300))
  }

  test("update report: only updates touching loaded surveys") {
    val report = SurveyUpdates.updateReport(updates, surveys, roots)
      .select("SurveyId").as[Int].collect().toSet
    assert(report == Set(100)) // 300 updated but never loaded → not a reload concern
  }
}
