package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV source/sink with the reference's typing discipline.
  *
  * The reference reads every CSV with `dtype=str` — type sniffing is
  * deliberately suppressed because fixed-width survey values are codes, not
  * numbers, and padding/leading zeros are load-bearing (ref
  * lib04_Update_Table_Data.py:409, lib03_Update_Metadata.py:212,240;
  * doc/Data_Format.md:222). Spark's csv reader is all-string by default
  * (`inferSchema=false`), which this wrapper pins down, plus the reference's
  * cp1252 fallback encoding path (ref 04_DHS_Load_New_Tables.ipynb:440-444).
  *
  * Sink: one CSV dataset per record table with header row, the shape stage-02
  * emits per (filecode, RecordName) (ref DAT_Parser.py:114-128). At scale a
  * single `partitionBy(recordname)` write replaces N separate writes — one
  * pass over the data, one directory per table.
  */
object CsvIO {

  /** Read a header CSV with every column StringType; no inference ever. */
  def readAllString(
      spark: SparkSession,
      path: String,
      encoding: String = "UTF-8",
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", "false")
      .option("encoding", encoding)
      .csv(path)

  /** The reference's fallback chain: try utf-8, re-read as cp1252 on failure
    * (Spark won't throw on bad bytes at plan time, so the caller decides via
    * a probe read of a few rows).
    */
  def readWithFallback(spark: SparkSession, path: String): DataFrame =
    try {
      val df = readAllString(spark, path, "UTF-8")
      df.limit(1).collect() // force a decode probe
      df
    } catch {
      case _: Throwable => readAllString(spark, path, "cp1252")
    }

  /** Read a headerless CSV against an explicit column list (all string). */
  def readWithColumns(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    spark.read
      .schema(StructType(columns.map(c => StructField(c, StringType))))
      .option("header", "false")
      .csv(path)

  /** Write one table as a header CSV dataset. Spark's csv WRITER trims
    * leading/trailing whitespace by default — fatal here, because
    * CASEID/HHID padding is what keeps the household↔individual join sound
    * (SURVEY.md §1.4-1) — so both trims are pinned off.
    */
  def writeTable(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Write every record-type table under `outDir/<recordName>` (the per-table
    * CSV layout of stage-02, parallel per table and per partition).
    */
  def writeRecordTables(tables: Map[String, DataFrame], outDir: String): Unit =
    tables.foreach { case (name, df) => writeTable(df, s"$outDir/$name") }
}
