package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide-table mitigation: JSON packing of non-key columns.
  *
  * The reference stores tables that would exceed 500 columns (or are
  * country-specific) as key columns + one JSONB `data` column whose values
  * are all quoted strings (ref: lib04_Update_Table_Data.py:12,140-200,
  * 446-506; doc/Data_Format.md:218-220). Here the same policy is a column
  * transform: `to_json(struct(non-key columns cast to string))`, which
  * reproduces the reference's quoted-string JSON exactly and keeps the row
  * narrow for the JDBC sink. The inverse (`unpack`) uses `from_json` into a
  * string→string map, so packed tables stay queryable in Spark.
  */
object JsonPack {

  /** Columns that should stay first-class (join keys), per the reference's
    * heuristic: contains "idx", starts with "ix", or is one of the known key
    * names (ref: lib04_Update_Table_Data.py:124-137).
    */
  def isKeyColumn(name: String): Boolean = {
    val n = name.toLowerCase
    n.contains("idx") || n.startsWith("ix") ||
      Set("surveyid", "caseid", "mcaseid", "hhid").contains(n)
  }

  /** The wide-table threshold (ref: lib04_Update_Table_Data.py:12). */
  val MaxColumnThreshold: Int = 500

  /** Should this table be JSON-packed? >threshold columns, or flagged
    * country-specific (label starting "cs:", ref lib04:140-152).
    */
  def shouldPack(columnCount: Int, countrySpecific: Boolean): Boolean =
    columnCount > MaxColumnThreshold || countrySpecific

  /** Pack all non-key columns into a single JSON string column `data`,
    * values quoted strings for cross-table consistency (ref lib04:448-455).
    * Column order inside the JSON = the DataFrame's column order.
    */
  def pack(df: DataFrame, keyCols: Seq[String], dataCol: String = "data"): DataFrame = {
    val keySet = keyCols.toSet
    val packCols = df.columns.filterNot(keySet.contains)
    val fields: Seq[Column] = packCols.map(c => col(c).cast("string").as(c))
    df.select(keyCols.map(col) :+ to_json(struct(fields: _*)).as(dataCol): _*)
  }

  /** Pack using the reference's key heuristic over the DataFrame's columns. */
  def packAuto(df: DataFrame, dataCol: String = "data"): DataFrame =
    pack(df, df.columns.filter(isKeyColumn).toSeq, dataCol)

  /** Unpack a JSON `data` column into a string→string map (richer than the
    * reference's opaque JSONB: map access is a Spark-native expression).
    */
  def unpack(df: DataFrame, dataCol: String = "data", mapCol: String = "data_map"): DataFrame =
    df.withColumn(mapCol,
      from_json(col(dataCol), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
}
