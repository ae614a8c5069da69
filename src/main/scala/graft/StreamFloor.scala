package graft

import org.apache.spark.sql.SparkSession

/** Measures the stream-replay machinery FLOOR (r7 verdict item 4):
  * `stream_interval_left` is the worst residual perf ratio (6.4× the
  * batch-SQL DuckDB oracle), and the open question is how much of its
  * ~4.6 s is the two-watermark stream-stream join TOPOLOGY — query
  * start/stop, two state-store sets across 4 partitions × ~3
  * micro-batches, heartbeat landing, memory-sink materialization —
  * versus the actual data. This main runs the IDENTICAL operator
  * ([[streaming.Streams.intervalJoinLeft]], same code path end to
  * end) over a near-EMPTY events replay (2 rows: one purchase, one
  * error), then over the real sf dir, both min-of-3, and prints one
  * JSON line with the floor, the full time, and the floor share.
  *
  * If floor/full ≥ ~0.75 the ratio is machinery, not plan — recorded
  * in BASELINE.md as the streaming analog of the 0.83 s batch action
  * floor (both amortize at real scale: a production stream pays query
  * setup once per DEPLOYMENT, not per bounded replay).
  *
  * Usage: `sbt "runMain graft.StreamFloor [sfDir]"`.
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect(): Unit

    val tmp = java.nio.file.Files.createTempDirectory("graft_sfloor").toString
    writeTinyEvents(spark, tmp)

    def timed(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)(d: String): Double = {
      val t0 = System.nanoTime()
      Checkpoints.sweeping(spark) {
        fn(spark, d).write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    val time = timed(streaming.Streams.intervalJoinLeft(_, _)) _
    // one unmeasured warmup of each shape (codegen + state-store class
    // loading), then min-of-3 — the Bench discipline
    time(tmp); time(sfDir)
    val floor = (1 to 3).map(_ => time(tmp)).min
    val full = (1 to 3).map(_ => time(sfDir)).min
    val share = floor / full
    // Amortization decomposition (r11 verdict item 5): the SAME
    // topology over the ×R-amplified events (args(1), built by
    // ScaleUp) — the FileStreamSource drains all available files per
    // trigger, so the batch count (and with it the per-batch
    // machinery the floor measures) is UNCHANGED while the data term
    // grows ×R. Floor flat + data term ~linear is the measured proof
    // that the 8.8× bounded-replay ratio is per-deployment machinery,
    // not a scaling defect: at ×10 the floor share collapses.
    // Every decade of amplified events present gets its own row. The
    // data terms are reported as ABSOLUTE seconds only: the x1 term
    // (full − floor) is measurement noise under a ~99.8% floor, so a
    // ratio against it is meaningless (the r12 verdict's "misleading
    // stat" — dropped). Linearity is read across the xR rows
    // themselves: data_term_x10 vs data_term_x100 ≈ ×10.
    val ampDirs =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("target/scale_sweep/x10", "target/scale_sweep/x100")
    val ampFields = ampDirs.filter(dd =>
        new java.io.File(s"$dd/events.parquet").exists)
      .map { dd =>
        val label = dd.split('/').last
        time(dd)
        val a = (1 to 3).map(_ => time(dd)).min
        f""""full_${label}_s":$a%.3f,"data_term_${label}_s":${a - floor}%.3f,""" +
          f""""floor_share_$label":${floor / a}%.3f,"""
      }.mkString
    // same measurement for the flatMapGroupsWithState session-timeout
    // topology (stream_session_timeout) — the other stateful shape on
    // the weak list, adjudicated by the same floor evidence
    val timeSt = timed(streaming.Streams.sessionTimeoutTable(_, _)) _
    timeSt(tmp); timeSt(sfDir)
    val stFloor = (1 to 3).map(_ => timeSt(tmp)).min
    val stFull = (1 to 3).map(_ => timeSt(sfDir)).min
    val line = f"""{"metric":"stream_floor","empty_replay_s":$floor%.3f,"full_sf01_s":$full%.3f,"floor_share":$share%.3f,""" +
      ampFields +
      f""""session_timeout_empty_s":$stFloor%.3f,"session_timeout_full_s":$stFull%.3f,"session_timeout_floor_share":${stFloor / stFull}%.3f,"sf":"$sfDir"}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/stream_floor.json"), line): Unit

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(tmp))
    spark.stop()
  }

  /** Two-row events table (one purchase, one error, same user, 2 min
    * apart — so the join emits one matched row) in the gated schema. */
  private def writeTinyEvents(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:02:00")
    Seq((1L, t0, 7L, "error", 1.0, "{}"),
        (2L, t1, 7L, "purchase", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }
}
