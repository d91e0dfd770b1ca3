package graft.cspro

import graft.cspro.DcfParser.ParseResult
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spec-file emission: the three flat spec tables the reference writes per
  * DCF (ref DCF_Parser.py:496-534), as DataFrames with the exact on-disk
  * column layout — including the `FMETYPE` convenience column
  * (`fme_char(len)`) and the reference's `RecordDesciption` spelling.
  *
  * These are the interchange contract between the parse stage and the
  * metadata/load stages, so column names and order are part of parity, not
  * style.
  */
object SpecWriter {

  val RecordSpecCols: Seq[String] = Seq(
    "ItemType", "FileCode", "RecordName", "RecordTypeValue", "RecordLabel",
    "Name", "Label", "Start", "Len", "Occurrences", "ZeroFill", "DecimalChar",
    "Decimal", "LevelName", "LevelLabel", "FMETYPE")
  val ValueSpecCols: Seq[String] = Seq("FileCode", "Name", "Value", "ValueDesc", "ValueType")
  val RelationSpecCols: Seq[String] = Seq(
    "FileCode", "RelName", "PrimaryTable", "PrimaryLink", "SecondaryTable", "SecondaryLink")

  def recordSpecs(spark: SparkSession, r: ParseResult): DataFrame = {
    import spark.implicits._
    r.items.map { c =>
      (c.itemType, c.fileCode, c.recordName, c.recordTypeValue, c.recordLabel,
        c.name, c.label, c.start, c.len, c.occurrences,
        if (c.zeroFill) "Yes" else "No", if (c.decimalChar) "Yes" else "No",
        c.decimal, c.levelName, c.levelLabel, s"fme_char(${c.len})")
    }.toDF(RecordSpecCols: _*)
  }

  def valueSpecs(spark: SparkSession, r: ParseResult): DataFrame = {
    import spark.implicits._
    r.values.map(v => (v.fileCode, v.name, v.value, v.valueDesc, v.valueType))
      .toDF(ValueSpecCols: _*)
  }

  def relationSpecs(spark: SparkSession, r: ParseResult): DataFrame = {
    import spark.implicits._
    r.relations.map(x =>
      (x.fileCode, x.relName, x.primaryTable, x.primaryLink, x.secondaryTable, x.secondaryLink))
      .toDF(RelationSpecCols: _*)
  }

  /** Write the three spec CSVs under `outDir` with the reference's file
    * naming: `<fileCode>.FlatRecordSpec` / `.FlatValuesSpec` /
    * `.RelationshipsSpec` (ref DCF_Parser.py:496-534).
    */
  def writeAll(spark: SparkSession, r: ParseResult, fileCode: String, outDir: String): Unit = {
    graft.load.CsvIO.writeTable(recordSpecs(spark, r).coalesce(1), s"$outDir/$fileCode.FlatRecordSpec")
    graft.load.CsvIO.writeTable(valueSpecs(spark, r).coalesce(1), s"$outDir/$fileCode.FlatValuesSpec")
    graft.load.CsvIO.writeTable(relationSpecs(spark, r).coalesce(1), s"$outDir/$fileCode.RelationshipsSpec")
  }
}
