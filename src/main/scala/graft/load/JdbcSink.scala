package graft.load

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC data sink: the reference's load path (COPY/INSERT append, survey-
  * slice idempotence) on Spark's jdbc writer (SURVEY.md §2.1 S10-S13).
  *
  * - Postgres appends stream per-partition `COPY ... FROM STDIN` through
  *   [[CopySink]] (the reference's "WAY faster" load, lib04:417-434,
  *   distributed); table creation still goes through Spark's jdbc writer
  *   first so the auto-create + `createTableColumnTypes` contract holds.
  * - Other databases append via `df.write.jdbc` with a tuned `batchsize`:
  *   each partition writes concurrently over its own connection.
  * - `maxWriters` caps writer concurrency: a thousand executors opening a
  *   thousand connections is a DB outage, not a fast load.
  * - Idempotent per-survey reload = driver-side DELETE of the slice, then
  *   append (ref lib04:509-541) — DDL/DML on the driver strictly before
  *   executor writes (same serialization rule as DdlManager).
  */
object JdbcSink {

  /** Append a frame, bounding writer-side connection fan-out.
    *
    * Postgres URLs route to [[CopySink.append]] — per-partition
    * `COPY ... FROM STDIN` streams, the reference's "WAY faster" load path
    * (lib04:417-434) distributed. Requires the table to exist (the
    * reference's own sequencing: DDL strictly before data). Everything else
    * goes through `df.write.jdbc` with a tuned `batchsize`.
    *
    * `columnTypes` feeds Spark's `createTableColumnTypes`: pass the
    * DdlManager-planned VARCHAR widths so a table created by the writer gets
    * real VARCHAR(n) columns, not the dialect's unbounded default (Derby
    * maps StringType to CLOB, which is not even comparable in a WHERE).
    */
  def append(
      df: DataFrame, url: String, table: String, props: Properties,
      batchSize: Int = 10000, maxWriters: Int = 8,
      columnTypes: Option[String] = None): Unit =
    if (url.startsWith("jdbc:postgresql")) {
      // keep the jdbc writer's auto-create + createTableColumnTypes contract
      // (a zero-row append creates the table when missing, no-ops otherwise),
      // then stream the data through COPY
      val create = df.limit(0).write.mode(SaveMode.Append)
      columnTypes.fold(create)(ct => create.option("createTableColumnTypes", ct))
        .jdbc(url, table, props)
      CopySink.append(df, url, table, props, batchSize, maxWriters)
    } else {
      // repartition, not coalesce — see CopySink.append: coalesce would
      // throttle the upstream compute to maxWriters tasks as well
      val bounded =
        if (df.rdd.getNumPartitions > maxWriters) df.repartition(maxWriters) else df
      val w = bounded.write.mode(SaveMode.Append)
        .option("batchsize", batchSize.toString)
      columnTypes.fold(w)(ct => w.option("createTableColumnTypes", ct))
        .jdbc(url, table, props)
    }

  /** Render DdlManager column defs as a `createTableColumnTypes` clause. */
  def columnTypesClause(defs: Seq[DdlManager.ColumnDef]): String =
    defs.map(c => s"${c.name} VARCHAR(${c.width})").mkString(", ")

  /** Replace the whole table (survey-listing cache semantics, S13). */
  def overwrite(df: DataFrame, url: String, table: String, props: Properties): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  /** Read back (S10): pushdown-capable jdbc source. Filters/pruning applied
    * on the returned frame reach the database as WHERE/SELECT via Spark's
    * JDBC relation (`PushedFilters` in explain).
    */
  def read(spark: org.apache.spark.sql.SparkSession, url: String, table: String,
      props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Reject identifiers that cannot be safely interpolated into SQL text.
    * Table/column names here come from external survey files, so anything
    * beyond word characters and dots (schema qualification) is refused
    * rather than quoted — quoting would silently change case resolution for
    * every existing unquoted table.
    */
  private def safeIdent(ident: String): String = {
    val ok = ident.matches("[A-Za-z0-9_.]+") || // plain, optionally qualified
      ident.matches("\"([^\"]|\"\")*\"")        // pre-quoted, quotes doubled
    require(ok, s"unsafe SQL identifier: $ident")
    ident
  }

  /** Delete one survey's slice on the driver, then append its fresh rows —
    * the reference's drop-and-reload idempotence unit.
    */
  def reloadSurveySlice(
      df: DataFrame, url: String, table: String, surveyId: String,
      props: Properties, surveyCol: String = "surveyid"): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(
        s"DELETE FROM ${safeIdent(table)} WHERE ${safeIdent(surveyCol)} = ?")
      try { st.setString(1, surveyId); st.executeUpdate() } finally st.close()
    } finally conn.close()
    append(df, url, table, props)
  }

  /** Row count of a survey slice (the reference's load/skip probe,
    * ref lib04:517-524).
    */
  def sliceRowCount(
      url: String, table: String, surveyId: String, props: Properties,
      surveyCol: String = "surveyid"): Long = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(
        s"SELECT COUNT(*) FROM ${safeIdent(table)} WHERE ${safeIdent(surveyCol)} = ?")
      try {
        st.setString(1, surveyId)
        val rs = st.executeQuery()
        rs.next(); rs.getLong(1)
      } finally st.close()
    } finally conn.close()
  }
}
