package graft.cspro

import graft.cspro.DcfParser.{DcfParseException, RangeExpansion}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the DCF state-machine parser. The base fixture is the
  * reference's in-repo sample (ref: doc/Data_Format.md:36-117) — the only
  * concrete DCF content the reference ships — extended with the edge cases
  * catalogued in FIXTURES.md F1.
  */
class DcfParserSpec extends AnyFunSuite {

  val baseDcf: String =
    """[Dictionary]
      |Version=CSPro 6.3
      |Label=Standard Recode DHS-VII   1.1.1 - Benin, 2017
      |Name=RECODE7
      |RecordTypeStart=16
      |RecordTypeLen=3
      |Positions=Absolute
      |ZeroFill=No
      |DecimalChar=No
      |
      |[Level]
      |Label=HOUSEHOLD
      |Name=HOUSEHOLD
      |
      |[IdItems]
      |
      |[Item]
      |Label=Case Identification
      |Name=HHID
      |Start=1
      |Len=12
      |DataType=Alpha
      |
      |[Record]
      |Label=Household's basic data
      |Name=RECH0
      |RecordTypeValue='H00'
      |RecordLen=172
      |
      |[Item]
      |Label=Country code and phase
      |Name=HV000
      |Start=19
      |Len=3
      |DataType=Alpha
      |
      |[Item]
      |Label=Cluster number
      |Name=HV001
      |Start=22
      |Len=6
      |
      |[Item]
      |Label=Month of interview
      |Name=HV006
      |Start=49
      |Len=2
      |
      |[ValueSet]
      |Label=Month of interview
      |Name=HV006_VS1
      |Value=1:12
      |
      |[Item]
      |Label=Result of household interview
      |Name=HV015
      |Start=76
      |Len=1
      |
      |[ValueSet]
      |Label=Result of household interview
      |Name=HV015_VS1
      |Value=1;Completed
      |Value=9;Other
      |""".stripMargin

  test("base fixture: items in order with RecordDesciption first and IdItems leading") {
    val r = DcfParser.parse(baseDcf, "BJHR71")
    val kinds = r.items.map(i => (i.itemType, i.name))
    assert(kinds == Vector(
      ("RecordDesciption", "RECODE7"),
      ("IdItem", "HHID"),
      ("Item", "HV000"),
      ("Item", "HV001"),
      ("Item", "HV006"),
      ("Item", "HV015")))
    val rd = r.items.head
    assert(rd.start == 16 && rd.len == 3 && rd.recordName == "*")
    val hhid = r.items(1)
    assert(hhid.recordName == "RECH0" && hhid.recordTypeValue == "H00" &&
      hhid.start == 1 && hhid.len == 12 && hhid.levelName == "HOUSEHOLD")
    val hv001 = r.items(3)
    assert(hv001.start == 22 && hv001.len == 6 && hv001.recordLabel == "Household's basic data")
  }

  test("base fixture: range expansion All expands 1:12; explicit values kept raw") {
    val r = DcfParser.parse(baseDcf, "BJHR71")
    val hv006 = r.values.filter(_.name == "HV006")
    assert(hv006.map(_.value) == (1 to 12).map(_.toString).toVector)
    assert(hv006.forall(_.valueType == "ExpandedRange"))
    val hv015 = r.values.filter(_.name == "HV015")
    assert(hv015.map(v => (v.value, v.valueDesc, v.valueType)) == Vector(
      ("1", "Completed", "ExplicitValue"), ("9", "Other", "ExplicitValue")))
  }

  test("range strategy None emits RangeMin/RangeMax with float rendering") {
    val r = DcfParser.parse(baseDcf, "BJHR71", expandRanges = RangeExpansion.None)
    val hv006 = r.values.filter(_.name == "HV006")
    assert(hv006.map(v => (v.value, v.valueType)) == Vector(
      ("1.0", "RangeMin"), ("12.0", "RangeMax")))
  }

  test("oversize range degrades to RangeMin/RangeMax despite strategy All") {
    val dcf = baseDcf.replace("Value=1:12", "Value=10:9999998")
    val r = DcfParser.parse(dcf, "BJHR71")
    val hv006 = r.values.filter(_.name == "HV006")
    assert(hv006.map(v => (v.value, v.valueType)) == Vector(
      ("10.0", "RangeMin"), ("9999998.0", "RangeMax")))
  }

  test("multiple ranges on one line expand per-range (ref COIR53.DCF line 35629 shape)") {
    val dcf = baseDcf.replace("Value=1:12", "Value=100:101 102:104;Days")
    val r = DcfParser.parse(dcf, "BJHR71")
    val hv006 = r.values.filter(_.name == "HV006")
    assert(hv006.map(_.value) == Vector("100", "101", "102", "103", "104"))
    assert(hv006.forall(v => v.valueType == "ExpandedRange" && v.valueDesc == "Days"))
    // strategy Multiple also expands (more than one range)
    val rMulti = DcfParser.parse(dcf, "BJHR71", expandRanges = RangeExpansion.Multiple)
    assert(rMulti.values.count(_.name == "HV006") == 5)
    // strategy None → MultiRangeMin/Max per range
    val rNone = DcfParser.parse(dcf, "BJHR71", expandRanges = RangeExpansion.None)
    assert(rNone.values.filter(_.name == "HV006").map(v => (v.value, v.valueType)) == Vector(
      ("100.0", "MultiRangeMin"), ("101.0", "MultiRangeMax"),
      ("102.0", "MultiRangeMin"), ("104.0", "MultiRangeMax")))
  }

  test("description containing a colon after the semicolon is not a range") {
    val dcf = baseDcf.replace("Value=1;Completed", "Value=1;Yes: between 2:00 and 6:00 pm")
    val r = DcfParser.parse(dcf, "BJHR71")
    val v = r.values.filter(_.name == "HV015").head
    assert(v.value == "1" && v.valueDesc == "Yes: between 2:00 and 6:00 pm" &&
      v.valueType == "ExplicitValue")
  }

  test("a second ValueSet for the same item extends the first") {
    val dcf = baseDcf +
      """
        |[ValueSet]
        |Label=Result of household interview
        |Name=HV015_VS2
        |Value=96;Other special
        |""".stripMargin
    val r = DcfParser.parse(dcf, "BJHR71")
    val hv015 = r.values.filter(_.name == "HV015")
    assert(hv015.map(_.value) == Vector("1", "9", "96"))
  }

  test("valueset label mismatch warns but does not fail") {
    val dcf = baseDcf.replace(
      "[ValueSet]\nLabel=Month of interview",
      "[ValueSet]\nLabel=Something entirely unrelated zzz")
    val r = DcfParser.parse(dcf, "BJHR71")
    assert(r.warnings.exists(_.contains("did not seem to match")))
  }

  test("unknown chunk types are skipped, not fatal") {
    val dcf = baseDcf +
      """
        |[Languages]
        |EN=English
        |""".stripMargin
    val r = DcfParser.parse(dcf, "BJHR71")
    assert(r.skippedChunks == Vector("[Languages]"))
    assert(r.items.size == 6)
  }

  test("duplicate record name: same label warns, different label is fatal") {
    val dupSame = baseDcf +
      """
        |[Record]
        |Label=Household's basic data
        |Name=RECH0
        |RecordTypeValue='H0X'
        |""".stripMargin
    val r = DcfParser.parse(dupSame, "BJHR71")
    assert(r.warnings.exists(_.contains("duplicate record")))

    val dupDiff = baseDcf +
      """
        |[Record]
        |Label=Some other label
        |Name=RECH0
        |RecordTypeValue='H0X'
        |""".stripMargin
    assertThrows[DcfParseException](DcfParser.parse(dupDiff, "BJHR71"))
  }

  test("multiple IdItems each become a leading IdItem row (HIV-style)") {
    val dcf = baseDcf.replace(
      """[Record]
        |Label=Household's basic data""".stripMargin,
      """[Item]
        |Label=Bar code
        |Name=HIVNUMB
        |Start=13
        |Len=3
        |
        |[Record]
        |Label=Household's basic data""".stripMargin)
    val r = DcfParser.parse(dcf, "BJHR71")
    assert(r.items.count(_.itemType == "IdItem") == 2)
    assert(r.items.map(_.name).slice(1, 3) == Vector("HHID", "HIVNUMB"))
  }

  test("relation block state machine emits all joins incl. *ROWID* defaults") {
    val dcf = baseDcf +
      """
        |[Record]
        |Label=Household schedule
        |Name=RECH1
        |RecordTypeValue='H01'
        |
        |[Item]
        |Label=Line number
        |Name=HVIDX
        |Start=19
        |Len=2
        |
        |[Relation]
        |Name=TestRelation
        |Primary=RECH1
        |Secondary=RECH4
        |SecondaryLink=IDXH4
        |PrimaryLink=HVIDX
        |Secondary=RECML
        |Secondary=RECHMA
        |""".stripMargin
    val r = DcfParser.parse(dcf, "BJHR71")
    val rels = r.relations.map(x =>
      (x.relName, x.primaryTable, x.primaryLink, x.secondaryTable, x.secondaryLink))
    assert(rels == Vector(
      ("TestRelation", "RECH1", "*ROWID*", "RECH4", "IDXH4"),
      ("TestRelation", "RECH1", "HVIDX", "RECML", "*ROWID*"),
      ("TestRelation", "RECH1", "*ROWID*", "RECHMA", "*ROWID*")))
    // HVIDX is referenced by a relation link → retagged JoinableItem
    assert(r.items.find(_.name == "HVIDX").get.itemType == "JoinableItem")
  }

  test("an [Item] after a [Relation] block parses into the record, not the relation") {
    val dcf = baseDcf +
      """
        |[Record]
        |Label=Household schedule
        |Name=RECH1
        |RecordTypeValue='H01'
        |
        |[Item]
        |Label=Line number
        |Name=HVIDX
        |Start=19
        |Len=2
        |
        |[Relation]
        |Name=TestRelation
        |Primary=RECH1
        |Secondary=RECH4
        |SecondaryLink=IDXH4
        |
        |[Item]
        |Label=After relations
        |Name=HV901
        |Start=21
        |Len=2
        |
        |[ValueSet]
        |Label=After relations
        |Name=HV901_VS1
        |Value=1;Yes
        |""".stripMargin
    val r = DcfParser.parse(dcf, "BJHR71")
    val late = r.items.find(_.name == "HV901")
    assert(late.isDefined && late.get.recordName == "RECH1")
    assert(r.values.exists(v => v.name == "HV901" && v.value == "1"))
    assert(r.relations.map(_.secondaryTable) == Vector("RECH4")) // relation intact
  }

  test("kv lines split at the first '=' only") {
    val dcf = baseDcf.replace("Label=Cluster number", "Label=Cluster = number")
    val r = DcfParser.parse(dcf, "BJHR71")
    assert(r.items.find(_.name == "HV001").get.label == "Cluster = number")
  }
}
