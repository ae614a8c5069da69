package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B of the streaming state-store provider (r10 verdict item 5):
  * the HDFS-backed default vs RocksDB, measured on the two stream
  * replays with the highest floors (stream_interval_left — a
  * two-watermark stream-stream join, two state-store sets — and
  * stream_corpus). StreamFloor established that 95-99% of these
  * replays is per-batch machinery (offset/commit logs, state deltas);
  * the open question is whether RocksDB cuts that floor. At the gated
  * state sizes (thousands of rows) the likely answer is no — RocksDB
  * earns its keep when state EXCEEDS executor memory (the 100 TB
  * posture: millions of open sessions), trading JVM heap for native
  * memory + SST files — but the judge asked for the measurement, not
  * the prediction. One JSON line either way; the verdict lands in
  * BASELINE.md next to the StreamFloor numbers.
  *
  * Usage: `sbt "runMain graft.StateStoreAB [sfDir]"`.
  */
object StateStoreAB {
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

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
      "stream_corpus" -> (streaming.Streams.streamCorpus(_, _)))

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val results = Seq("hdfs" -> None, "rocksdb" -> Some(RocksDB)).map {
      case (label, prov) =>
        prov match {
          case Some(p) => spark.conf.set(providerKey, p)
          case None => spark.conf.unset(providerKey)
        }
        val rows = queries.map { case (name, fn) =>
          timed(fn) // warmup (codegen + provider class loading)
          val best = (1 to 3).map(_ => timed(fn)).min
          name -> best
        }
        label -> rows
    }
    val body = results.map { case (label, rows) =>
      rows.map { case (n, t) => f""""${n}_$label":$t%.3f""" }.mkString(",")
    }.mkString(",")
    println(s"""{"metric":"state_store_ab",$body,"sf":"$sfDir"}""")
    spark.stop()
  }
}
