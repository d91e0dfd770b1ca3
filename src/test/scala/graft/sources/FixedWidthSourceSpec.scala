package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class FixedWidthSourceSpec extends AnyFunSuite with SparkTestBase {

  private val dcf =
    """[Dictionary]
      |Name=R
      |RecordTypeStart=16
      |RecordTypeLen=3
      |
      |[Level]
      |Label=HH
      |Name=HH
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
      |Label=Rec
      |Name=RECH0
      |RecordTypeValue='H00'
      |
      |[Item]
      |Label=Country
      |Name=HV000
      |Start=19
      |Len=3
      |DataType=Alpha
      |
      |[Item]
      |Label=Cluster
      |Name=HV001
      |Start=22
      |Len=3
      |""".stripMargin

  private def writeFixture(): (String, String) = {
    val dir = Files.createTempDirectory("fw")
    val dcfPath = dir.resolve("511.BJHR71.DCF")
    Files.writeString(dcfPath, dcf)
    val datPath = dir.resolve("511.BJHR71.DAT")
    Files.writeString(datPath,
      """     100   7   H00BJ7 42
        |     100   8   H00BJ7  7
        |     100   8   X99junkjunk
        |""".stripMargin)
    (dcfPath.toString, datPath.toString)
  }

  test("format(fixedwidth): schema from DCF, tag dispatch, conditional trim, surveyid") {
    val (dcfPath, datPath) = writeFixture()
    val df = spark.read.format("fixedwidth")
      .option("dcf", dcfPath).option("record", "RECH0").option("surveyid", "511")
      .load(datPath)
    assert(df.columns.toSeq == Seq("hhid", "hv000", "hv001", "surveyid"))
    val rows = df.orderBy("hv001").collect()
    assert(rows.length == 2) // X99 skipped
    assert(rows.map(_.getString(0)).toSet == Set("     100   7", "     100   8")) // padded
    assert(rows.map(_.getString(2)).toSeq == Seq("42", "7")) // trimmed
    assert(rows.forall(_.getString(3) == "511"))
  }

  test("column pruning is pushed into the source scan") {
    val (dcfPath, datPath) = writeFixture()
    val df = spark.read.format("fixedwidth")
      .option("dcf", dcfPath).option("record", "RECH0")
      .load(datPath)
      .select("hv001")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("reading 1"), s"scan did not prune: $scan")
    assert(df.collect().map(_.getString(0)).toSet == Set("42", "7"))
  }

  test("results agree with the composable DatReader plan") {
    val (dcfPath, datPath) = writeFixture()
    import graft.cspro.{DatReader, DcfParser}
    val v2 = spark.read.format("fixedwidth")
      .option("dcf", dcfPath).option("record", "RECH0").load(datPath)
      .collect().map(_.toSeq).toSet
    val specs = DcfParser.parse(Files.readString(java.nio.file.Paths.get(dcfPath)), "BJHR71").items
    val composable = DatReader.projectLines(
      spark.read.text(datPath), specs)("RECH0").collect().map(_.toSeq).toSet
    assert(v2 == composable)
  }

  test("missing record type is a clear error") {
    val (dcfPath, datPath) = writeFixture()
    val e = intercept[Exception] {
      spark.read.format("fixedwidth")
        .option("dcf", dcfPath).option("record", "NOPE").load(datPath).collect()
    }
    assert(e.getMessage.contains("NOPE"))
  }
}
