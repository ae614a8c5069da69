package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingPipeline

/** Continuous-ingest ETL: FileStreamSource → project/cast →
  * foreachBatch JDBC append, with checkpointed source offsets standing
  * in for the reference's todo/wip/completed work lists. */
class StreamingPipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  private def derby(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def exec(url: String, sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try { c.createStatement().execute(sql) } finally c.close()
  }

  private def queryLong(url: String, sql: String): Long = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  /** Land `df` as ONE plain parquet file named `name` — the shape of an
    * object-store delivery (the reference's unit of work is a single
    * .parquet object, not a Spark part-file directory). */
  private def land(df: org.apache.spark.sql.DataFrame, landing: String,
      name: String): Unit = {
    val stage = Files.createTempDirectory("stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$stage/d")
    val part = new java.io.File(s"$stage/d").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, java.nio.file.Paths.get(landing, name))
  }

  test("streaming pipeline ingests files incrementally, exactly once per file") {
    val landing = Files.createTempDirectory("landing").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val url = derby("streampipe")
    exec(url, "CREATE TABLE stream_t (order_id BIGINT, qty DOUBLE)")

    val li = Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_quantity"))
    val first = li.filter(col("l_orderkey") <= 100)
    land(first, landing, "batch1.parquet")

    val schema = first.schema
    val q = StreamingPipeline.run(spark, s"$landing/*.parquet", schema,
      desiredFields = Seq("l_orderkey", "l_quantity"),
      url = url, table = "stream_t",
      aliases = Map("l_orderkey" -> Some("order_id"),
        "l_quantity" -> Some("qty")),
      checkpointDir = ckpt)
    try {
      q.processAllAvailable()
      assert(queryLong(url, "SELECT COUNT(*) FROM stream_t") == first.count())

      // a new file lands: ONLY its rows are appended (offsets committed)
      val second = li.filter(col("l_orderkey").between(101, 200))
      land(second, landing, "batch2.parquet")
      q.processAllAvailable()
      assert(queryLong(url, "SELECT COUNT(*) FROM stream_t") ==
        first.count() + second.count())
      // no order from batch1's key range was re-ingested
      assert(queryLong(url,
        "SELECT COUNT(*) FROM stream_t WHERE order_id <= 100") ==
        first.count())
    } finally q.stop()

    // restart from the same checkpoint: nothing is re-ingested
    val q2 = StreamingPipeline.run(spark, s"$landing/*.parquet", schema,
      desiredFields = Seq("l_orderkey", "l_quantity"),
      url = url, table = "stream_t",
      aliases = Map("l_orderkey" -> Some("order_id"),
        "l_quantity" -> Some("qty")),
      checkpointDir = ckpt)
    try {
      q2.processAllAvailable()
      assert(queryLong(url, "SELECT COUNT(*) FROM stream_t") ==
        first.count() + li.filter(col("l_orderkey").between(101, 200)).count())
    } finally q2.stop()
  }
}
