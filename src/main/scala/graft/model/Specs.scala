package graft.model

/** Typed metadata model for the CSPro dictionary catalog.
  *
  * Field inventory follows the reference's flat-spec outputs
  * (ref: DHS_To_Database/cspro_parser/DCF_Parser.py:20-25) but is modeled as
  * case classes so spec tables become typed `Dataset[ColumnSpec]` etc. with
  * compile-time field checks; the *data* tables stay `DataFrame` (all-string
  * schemas only known at runtime, SURVEY.md §1.2).
  */

/** One column ("Item") of one record type of one survey file.
  *
  * `itemType` ∈ {RecordDesciption, IdItem, Item, JoinableItem} — the
  * misspelling "RecordDesciption" is part of the reference's on-disk contract
  * (ref: DCF_Parser.py:200) and is preserved for spec-file parity.
  */
final case class ColumnSpec(
    itemType: String,
    fileCode: String,
    recordName: String,
    recordTypeValue: String,
    recordLabel: String,
    name: String,
    label: String,
    start: Int,
    len: Int,
    occurrences: Int,
    zeroFill: Boolean,
    decimalChar: Boolean,
    decimal: Int,
    levelName: String,
    levelLabel: String
)

/** One legal value (or range endpoint) of one item's ValueSet.
  * valueType ∈ {ExplicitValue, ExpandedRange, RangeMin, RangeMax,
  * MultiRangeMin, MultiRangeMax} (ref: DCF_Parser.py:315-335,472).
  */
final case class ValueSpec(
    fileCode: String,
    name: String,
    value: String,
    valueDesc: String,
    valueType: String
)

/** A documented join between two record types (ref: DCF_Parser.py:537-645).
  * `*ROWID*` is the sentinel link for implicit row-identity joins.
  */
final case class RelationshipSpec(
    fileCode: String,
    relName: String,
    primaryTable: String,
    primaryLink: String,
    secondaryTable: String,
    secondaryLink: String
)

/** Survey-file identity parsed from filenames like `511.CMIR71` —
  * grammar `<surveyid>.<CC><FT><ver>` (ref: lib03_Update_Metadata.py:18-28,
  * lib04_Update_Table_Data.py:14-23).
  */
final case class SurveyFileId(
    surveyId: String,
    countryCode: String,
    fileType: String,
    version: String
) {
  def fileCode: String = s"$countryCode$fileType$version"
}

object SurveyFileId {
  /** Parse `<surveyid>.<filecode>` where filecode = 2-char country code +
    * 2-char file type + version suffix (lexically ordered, ref 03.ipynb:814).
    */
  def parse(stem: String): Option[SurveyFileId] = {
    val parts = stem.split("\\.")
    if (parts.length < 2 || parts(1).length < 5) None
    else {
      val fc = parts(1)
      Some(SurveyFileId(parts(0), fc.substring(0, 2), fc.substring(2, 4), fc.substring(4)))
    }
  }
}
