package graft.query

import graft.model.RelationshipSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relationship-driven join builder: turns the DCF `[Relation]` metadata
  * into executable Spark joins, making the warehouse's documented links
  * (ref DCF_Parser.py:537-645, README.md:90-94) first-class query API.
  *
  * Link semantics:
  *  - named link columns → padded-string equality (no trimming — key padding
  *    is load-bearing, SURVEY.md §1.4-1);
  *  - `*ROWID*` → the implicit one-row-per-occurrence identity: joining on
  *    the occurrence index column the caller materialized (CSPro "records
  *    repeat" semantics); callers pass the column that plays rowid;
  *  - the household↔individual bridge HHID = substring(CASEID, 1, 12) is
  *    exposed as [[caseidToHhid]] for joins between levels keyed differently.
  */
object RelationJoins {

  val RowIdSentinel = "*ROWID*"

  /** The join condition for one relationship, given the two frames and the
    * column that stands in for `*ROWID*` on each side (usually a
    * `row_number` or occurrence-index column).
    */
  def condition(
      rel: RelationshipSpec,
      primary: DataFrame, secondary: DataFrame,
      primaryRowId: String = "rowid", secondaryRowId: String = "rowid"): Column = {
    val pCol = if (rel.primaryLink == RowIdSentinel) primary(primaryRowId)
      else primary(rel.primaryLink.toLowerCase)
    val sCol = if (rel.secondaryLink == RowIdSentinel) secondary(secondaryRowId)
      else secondary(rel.secondaryLink.toLowerCase)
    pCol === sCol
  }

  /** Execute one relationship as an inner join. */
  def join(
      rel: RelationshipSpec,
      primary: DataFrame, secondary: DataFrame,
      joinType: String = "inner",
      primaryRowId: String = "rowid", secondaryRowId: String = "rowid"): DataFrame =
    primary.join(secondary,
      condition(rel, primary, secondary, primaryRowId, secondaryRowId), joinType)

  /** The DHS household key of an individual-level CASEID: the padded 12-char
    * prefix (substring, never trim — ref doc/Data_Format.md:151-157).
    */
  def caseidToHhid(caseid: Column, hhidLen: Int = 12): Column =
    substring(caseid, 1, hhidLen)

  /** Join an individual-level frame to a household-level frame through the
    * CASEID→HHID prefix bridge.
    */
  def joinHousehold(
      individuals: DataFrame, households: DataFrame,
      caseidCol: String = "caseid", hhidCol: String = "hhid",
      joinType: String = "inner"): DataFrame =
    individuals.join(households,
      households(hhidCol) === caseidToHhid(individuals(caseidCol)), joinType)

  /** Plan all of a file's relationships against a map of loaded record-type
    * frames; unknown tables are skipped with a note (mirror of the
    * reference's warn-don't-fail posture).
    */
  def joinAll(
      rels: Seq[RelationshipSpec],
      tables: Map[String, DataFrame]): (Seq[(RelationshipSpec, DataFrame)], Seq[String]) = {
    val (ok, missing) = rels.partition(r =>
      tables.contains(r.primaryTable) && tables.contains(r.secondaryTable))
    val joined = ok.map(r => r -> join(r, tables(r.primaryTable), tables(r.secondaryTable)))
    val notes = missing.map(r =>
      s"relation ${r.relName}: missing table(s) ${Seq(r.primaryTable, r.secondaryTable).filterNot(tables.contains).mkString(", ")}")
    (joined, notes)
  }
}
