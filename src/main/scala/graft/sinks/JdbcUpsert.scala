package graft.sinks

import java.sql.DriverManager
import org.apache.spark.sql.DataFrame

/** Set-based JDBC upsert: stage the batch with the parallel batched-
  * insert sink, then ONE `MERGE` from staging into the target — the
  * production CDC-apply pattern (idempotent per batch, no per-row
  * round trips; executors never hold write locks on the target, only
  * the single MERGE statement does).
  *
  * The reference loads append-only (db.rs COPY); this is the upsert
  * counterpart a change-feed consumer needs on the same warehouse.
  */
object JdbcUpsert {

  /** Apply `batch` (one row per key — pre-reduce upstream) to `target`
    * via `staging`. Both tables must exist with identical schemas; the
    * first column sequence given in `cols` must start with `key`.
    * When `orderCol` is set, a matched row is updated only if the
    * incoming `orderCol` is >= the stored one — a late-replayed batch
    * of OLDER changes then cannot clobber newer state (order-tolerant,
    * idempotent apply). */
  def upsertBatch(batch: DataFrame, url: String, target: String,
      staging: String, key: String, cols: Seq[String],
      orderCol: Option[String] = None): Unit = {
    require(cols.headOption.contains(key),
      s"cols must lead with the merge key '$key', got $cols")
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(s"DELETE FROM $staging")
    } finally conn.close()
    JdbcSink.write(batch, url, staging, Map.empty[String, Option[String]])
    val sets = cols.filterNot(_ == key)
      .map(c => s"t.$c = s.$c").mkString(", ")
    val guard = orderCol.map(c => s" AND s.$c >= t.$c").getOrElse("")
    val insertCols = cols.mkString(", ")
    val insertVals = cols.map(c => s"s.$c").mkString(", ")
    val conn2 = DriverManager.getConnection(url)
    try {
      conn2.createStatement().execute(
        s"""MERGE INTO $target t USING $staging s ON t.$key = s.$key
           |WHEN MATCHED$guard THEN UPDATE SET $sets
           |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
    } finally conn2.close()
  }
}
