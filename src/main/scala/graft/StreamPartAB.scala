package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B of `spark.sql.shuffle.partitions` for the bounded stream
  * replays (r12): StreamFloor showed the stream family's cost is
  * 75-99% per-batch machinery, and a large share of that machinery is
  * PER-PARTITION — each micro-batch commits one state-store delta per
  * (store, partition), so a 32-partition replay of a 2-row batch
  * writes 32-64 delta files per trigger regardless of data. Sizing
  * the stateful-shuffle partition count to the replay volume (the
  * same `maxPartitionBytes` discipline batch scans apply) should cut
  * the floor roughly linearly; this measures it before anything is
  * adopted (the RocksDB A/B discipline — r11 rejected that swap on
  * this same family because the measurement said no).
  *
  * Usage: `sbt "runMain graft.StreamPartAB [sfDir]"` — one JSON line:
  * per-query seconds at partitions = 32 / 8 / 4 (min-of-2 each).
  */
object StreamPartAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect(): Unit

    def timed(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      Checkpoints.sweeping(spark) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }

    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "stream_interval_left" -> (streaming.Streams.intervalJoinLeft(_, _)),
      "stream_session_timeout" -> (streaming.Streams.sessionTimeoutTable(_, _)),
      "stream_sessionize" -> (streaming.Streams.sessionizeTable(_, _)),
      "stream_windowed_agg" -> (streaming.Streams.windowedAgg(_, _)),
      "stream_dedup" -> (streaming.Streams.streamDedup(_, _)))

    val key = "spark.sql.shuffle.partitions"
    val results = Seq(4, 8, 32).map { n =>
      spark.conf.set(key, n.toString)
      val rows = queries.map { case (name, fn) =>
        timed(fn) // warmup at this partition count
        name -> (1 to 2).map(_ => timed(fn)).min
      }
      n -> rows
    }
    spark.conf.set(key, cpus)
    val body = results.map { case (n, rows) =>
      s""""p$n":{${rows.map { case (q, t) => f""""$q":$t%.3f""" }.mkString(",")}}"""
    }.mkString(",")
    println(s"""{"metric":"stream_part_ab",$body,"sf":"$sfDir"}""")
    spark.stop()
  }
}
