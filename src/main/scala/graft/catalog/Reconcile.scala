package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-03 metadata reconciliation: decide, per (survey, filetype), whether
  * the warehouse's spec rows are current — and therefore whether to load,
  * reload, or skip (ref 03_DHS_Update_Metadata.ipynb:764-1000,
  * lib03_Update_Metadata.py:316-337).
  *
  * Decision ladder (evaluated in order, ref 03.ipynb:801-861):
  *  1. nothing in the DB            → Load
  *  2. multiple versions in the DB  → Reload (inconsistent state)
  *  3. file version > DB version    → Reload (LEXICAL compare — "version is
  *     alphanumeric but lexical comparison works", :814)
  *  4. any one-sided row in the full-outer diff of the spec columns → Reload
  *  5. otherwise                    → Skip
  *
  * The ladder is a pure function of two small driver-collected summaries, so
  * the expensive part (the diff) only runs when steps 1-3 say "same
  * version"; at fleet scale the diffs for many surveys run as one unioned
  * plan, not a per-survey loop.
  */
object Reconcile {

  sealed trait Decision { def reason: String }
  case class Load(reason: String) extends Decision
  case class Reload(reason: String) extends Decision
  case class Skip(reason: String) extends Decision

  /** Steps 1-3: version-level decision from the DB's distinct versions for
    * this (survey, filetype) and the latest file version on disk.
    */
  def versionDecision(dbVersions: Seq[String], fileVersion: String): Either[Decision, Unit] =
    if (dbVersions.isEmpty) Left(Load("nothing in DB"))
    else if (dbVersions.distinct.size > 1)
      Left(Reload(s"multiple versions in DB: ${dbVersions.distinct.sorted.mkString(",")}"))
    else if (fileVersion > dbVersions.head) // lexical
      Left(Reload(s"file version $fileVersion > db ${dbVersions.head}"))
    else Right(())

  /** Step 4: spec-diff decision — any one-sided row forces a reload. The
    * diff is the full-outer indicator join (SpecCatalog.diffIndicator) over
    * the identifying columns.
    */
  def diffDecision(fileSpecs: DataFrame, dbSpecs: DataFrame, on: Seq[String]): Decision = {
    val oneSided = SpecCatalog.diffIndicator(fileSpecs, dbSpecs, on)
      .filter(col("merge_status") =!= "both")
    val n = oneSided.limit(1).count() // existence probe, not a full count
    if (n > 0) Reload("spec rows differ between file and DB") else Skip("up to date")
  }

  /** The full ladder. */
  def decide(
      dbVersions: Seq[String],
      fileVersion: String,
      fileSpecs: => DataFrame,
      dbSpecs: => DataFrame,
      diffCols: Seq[String]): Decision =
    versionDecision(dbVersions, fileVersion) match {
      case Left(d) => d
      case Right(()) => diffDecision(fileSpecs, dbSpecs, diffCols)
    }

  /** Spec-column identity sets the reference diffs on (ref 03.ipynb:824-838,
    * 944-958).
    */
  val ColumnSpecDiffCols: Seq[String] = Seq("name", "recordname", "label", "len")
  val ValueSpecDiffCols: Seq[String] = Seq("name", "value", "valuedesc", "valuetype")
}
