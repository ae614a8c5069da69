package graft

import org.apache.spark.sql.functions._

/** Measures the Delta-checkpoint claim (`etl_delta_checkpoint`): a
  * mount's metadata cost is O(history) when every JSON log version
  * must replay, O(live files + tail) when it seeds from a checkpoint.
  *
  * Builds a deep append-only history CHEAPLY: one real parquet file
  * (an orders slice) hardlinked into N commit dirs — the store build
  * is pure metadata (links + manifests), which is the point: the
  * profile isolates LOG replay cost from data size. Then exports the
  * Delta log (one add per version), times [[graft.etl.DeltaImport
  * .readLog]] min-of-5 without any checkpoint, writes a checkpoint at
  * N-1 (leaving one JSON tail), and times the mount again.
  *
  * Usage: `sbt "runMain graft.CheckpointProfile [nCommits]"` (default
  * 1000). One JSON line + target/checkpoint_profile.json.
  */
object CheckpointProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_ckprof").toString
    // one real data file, linked everywhere
    Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderkey"), col("o_totalprice"))
      .filter(col("o_orderkey") % 100 === 0)
      .coalesce(1).write.parquet(s"$base/seed")
    val seed = new java.io.File(s"$base/seed").listFiles
      .filter(_.getName.endsWith(".parquet")).head
    (0 until n).foreach { i =>
      val dir = new java.io.File(s"$base/files/b$i"); dir.mkdirs()
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(dir.getPath, seed.getName), seed.toPath)
      val mp = graft.etl.ManifestCommit.manifestPath(base, i + 1L)
      new java.io.File(mp).getParentFile.mkdirs()
      graft.etl.ManifestCommit.casFile(mp,
        (0 to i).map(j => s"files/b$j").mkString("\n")): Unit
    }
    val schemaJson = spark.read.parquet(s"$base/seed").schema.json

    def secs[A](reps: Int)(body: => A): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    val exportS = secs(1)(graft.etl.DeltaExport.exportUnpartitioned(base, schemaJson))
    // full-replay mount: every JSON version parses
    val replayS = secs(5)(graft.etl.DeltaImport.readLog(base))
    val cpWriteS = secs(1)(graft.etl.DeltaCheckpoint.write(base, n - 1L))
    // checkpointed mount: one parquet + one JSON tail
    val cpMountS = secs(5)(graft.etl.DeltaImport.readLog(base))
    val files = graft.etl.DeltaImport.readLog(base).files.size

    val line =
      f"""{"metric":"checkpoint_profile","n_versions":$n,"live_files":$files,""" +
      f""""export_s":$exportS%.3f,"replay_mount_s":$replayS%.4f,""" +
      f""""cp_write_s":$cpWriteS%.3f,"cp_mount_s":$cpMountS%.4f,""" +
      f""""speedup":${replayS / math.max(cpMountS, 1e-9)}%.1f}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/checkpoint_profile.json"), line): Unit
    graft.operators.AnnIndex.deleteRecursively(new java.io.File(base))
    spark.stop()
  }
}
