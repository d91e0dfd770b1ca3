package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-01 survey-update detection: given the DHS API listings (read from
  * file/cache — no network inside the engine) and the warehouse's loaded
  * state, compute what needs downloading.
  *
  * Reference dataflow (ref 01_Check_For_Survey_Updates.ipynb):
  *  - recent data updates ⋈ survey listing on SurveyId (inner, :1225);
  *  - surveys not yet in the warehouse: anti-join against the distinct
  *    surveyids present across loaded tables (:1340);
  *  - the loaded-survey set is a UNION DISTINCT across the three root
  *    tables (:1244-1250);
  *  - GPS/known-issue datasets use the same anti-join shape (:1856-2128).
  *
  * All spec-sized inputs → mark broadcastable; the loaded-ids side comes
  * from warehouse tables, so the anti-joins put the big side on the left
  * and the API listing (small) on the right, broadcast.
  */
object SurveyUpdates {

  /** Updates joined to their survey metadata (J1). */
  def updatesWithMetadata(
      updates: DataFrame, surveys: DataFrame, key: String = "SurveyId"): DataFrame =
    updates.join(broadcast(surveys), Seq(key), "inner")

  /** Distinct survey ids present in the warehouse: UNION over the root
    * tables' surveyid columns (U1).
    */
  def loadedSurveyIds(roots: Seq[DataFrame], idCol: String = "surveyid"): DataFrame =
    roots.map(_.select(col(idCol).cast("string").as(idCol)))
      .reduce(_ union _)
      .distinct()

  /** Listed-but-not-loaded surveys (J2 anti-join). `listing` is API-sized
    * (hundreds of rows) and `loadedIds` warehouse-derived; the anti-join
    * keys on the small frame's column so the loaded set can stay partitioned.
    */
  def missingSurveys(
      listing: DataFrame, loadedIds: DataFrame,
      listingKey: String = "SurveyNum", loadedKey: String = "surveyid"): DataFrame =
    listing.join(loadedIds,
      listing(listingKey).cast("string") === loadedIds(loadedKey), "left_anti")

  /** Updates that touch surveys the warehouse has ALREADY loaded — i.e. the
    * reload candidates: inner join to metadata, then left_semi against the
    * loaded ids. (Updates to never-loaded surveys are covered by
    * [[missingSurveys]] instead; the two together are the stage-01 report.)
    */
  def updateReport(
      updates: DataFrame, surveys: DataFrame, roots: Seq[DataFrame]): DataFrame = {
    val enriched = updatesWithMetadata(updates, surveys)
    val loaded = loadedSurveyIds(roots)
    enriched.join(loaded,
      enriched("SurveyId").cast("string") === loaded("surveyid"), "left_semi")
  }
}
