package graft.sinks

import java.sql.DriverManager
import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** JDBC table sink — the Spark-native equivalent of the reference's
  * binary `COPY FROM STDIN` loader (reference: src/db.rs):
  *
  *  - connect-time validation of the parquet→db column mapping against
  *    the live table schema: every dataframe column must land on an
  *    existing db column, via the optional alias map (`parquet_to_db`)
  *    or by bearing the same name; a missing column or unknown alias is
  *    an error BEFORE any data moves (mirrors db.rs Db::connect).
  *  - the write itself is Spark's batched-insert JDBC relation: one
  *    connection per partition writing `batchsize` rows per round trip —
  *    the distributed analogue of COPY (N executors stream in parallel
  *    instead of one socket).
  */
object JdbcSink {

  /** Columns of `table` as reported by JDBC metadata (lower-cased).
    * The table name is a SEARCH PATTERN to getColumns — `_` matches
    * any character, so an unescaped "stage_t" would merge STAGEXT's
    * columns into the validation set and defeat the fail-fast mapping
    * check (review r11); escape with the driver's escape string. */
  def tableColumns(url: String, table: String): Seq[String] = {
    val conn = DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData
      val esc = Option(md.getSearchStringEscape).getOrElse("\\")
      def pat(t: String): String =
        t.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      def fetch(t: String): Seq[String] = {
        val rs = md.getColumns(null, null, pat(t), null)
        val cols = mutable.ArrayBuffer.empty[String]
        while (rs.next()) cols += rs.getString("COLUMN_NAME").toLowerCase
        cols.toSeq
      }
      val up = fetch(table.toUpperCase)
      // lowercase / exact-case table identifiers
      if (up.nonEmpty) up else fetch(table)
    } finally conn.close()
  }

  /** Resolve the dataframe→db column names through the alias map and
    * fail fast on anything that doesn't land on a real column. */
  def resolveColumns(dfCols: Seq[String], dbCols: Seq[String],
      aliases: Map[String, Option[String]]): Seq[(String, String)] = {
    val dbSet = dbCols.toSet
    dfCols.map { c =>
      val target = aliases.get(c).flatten.getOrElse(c)
      if (aliases.get(c).flatten.isDefined && !dbSet.contains(target.toLowerCase))
        throw new IllegalArgumentException(
          s"alias '$target' for parquet field '$c' is not a column of the target table")
      if (!dbSet.contains(target.toLowerCase))
        throw new IllegalArgumentException(
          s"parquet field '$c' has no alias and no same-named column in the target table")
      c -> target
    }
  }

  /** @param sourceFields the ORIGINAL parquet field names, positional
    *   with df's columns — pass when upstream projection renamed
    *   duplicates (desired_fields with repeats), so aliases resolve on
    *   the user's names, not synthesized ones. Duplicate TARGETS are an
    *   error either way (one insert cannot set a column twice). */
  def write(df: DataFrame, url: String, table: String,
      aliases: Map[String, Option[String]] = Map.empty,
      batchSize: Int = 10000,
      sourceFields: Option[Seq[String]] = None): Long = {
    val dbCols = tableColumns(url, table)
    if (dbCols.isEmpty)
      throw new IllegalArgumentException(s"table '$table' does not exist in connected db")
    val originals = sourceFields.getOrElse(df.columns.toSeq)
    require(originals.length == df.columns.length,
      s"sourceFields size ${originals.length} != dataframe width ${df.columns.length}")
    val mapping = resolveColumns(originals, dbCols, aliases)
    val targets = mapping.map(_._2)
    require(targets.distinct.length == targets.length,
      s"duplicate target column(s): ${targets.diff(targets.distinct).distinct.mkString(", ")}")
    val renamed = df.select(df.columns.toSeq.zip(targets)
      .map { case (c, t) => col(c).as(t) }: _*)
    // persist across write+count: without it the count re-executes the
    // whole upstream (a second scan of every source file per batch).
    // Batch size is bounded by the caller (work-list batch /
    // maxFilesPerTrigger), and MEMORY_AND_DISK spills if it isn't.
    renamed.persist()
    try {
      renamed.write
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchSize.toString)
        .mode("append")
        .save()
      renamed.count()
    } finally renamed.unpersist()
  }
}
