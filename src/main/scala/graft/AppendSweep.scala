package graft

import org.apache.spark.sql.functions._

/** Measures the incremental-ANN-maintenance claim behind
  * `ann_index_append_build` (r12 verdict item 3): appending a batch to
  * a built index must cost ∝ BATCH (encode-only against frozen
  * artifacts), not ∝ corpus (the full retraining build). On an
  * amplified corpus (ScaleUp's x10 by default) it times:
  *
  *   1. the FULL build (train + encode everything) — the by-contract
  *      linear entry in the ×100 sweep;
  *   2. a base build on ~90%, then [[graft.operators.AnnIndex.appendAt]]
  *      of the remaining ~10% batch;
  *   3. the same with a ~5% batch — two batch sizes, so ∝ batch is a
  *      measured slope, not a single point.
  *
  * Usage: `sbt "runMain graft.AppendSweep [ampDir]"` (after ScaleUp
  * has materialized the amplified corpus). One JSON line out.
  */
object AppendSweep {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/scale_sweep/x10")
    require(new java.io.File(s"$d/embeddings.parquet").exists,
      s"no amplified corpus at $d — run ScaleUp first")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect(): Unit
    import graft.operators.AnnIndex

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = Tables.footerRowCount(spark, d, "embeddings")

    // 1. full retraining build (the ann_index_build contract)
    val (_, fullS) = timed(AnnIndex.build(spark, d))

    // 2./3. base build once, then append batches of two sizes into
    // fresh copies of the base artifacts (hardlink copy = O(files))
    val tenPct = AnnIndex.appendSplitPred // ~10%, training-disjoint
    val fivePct = tenPct && col("vec_id") % 20 < 10 // ~half of it
    val baseDir = java.nio.file.Files.createTempDirectory("graft_asweep_base").toString
    val (_, baseS) = timed(
      AnnIndex.buildSubset(spark, d, baseDir, !tenPct))
    def freshCopy(): String = {
      val c = java.nio.file.Files.createTempDirectory("graft_asweep_c").toString
      // shared tree-linker (review r13) + the counter marker files, so
      // appendAt sees the true base count instead of warning base=0
      Seq("coarse", "codebook", "codes").foreach(rel =>
        AnnIndex.linkTree(new java.io.File(s"$baseDir/$rel"),
          new java.io.File(s"$c/$rel")))
      Seq("_GRAFT_INDEX_BASE", "_GRAFT_INDEX_APPENDED").foreach { m =>
        val f = new java.io.File(baseDir, m)
        if (f.isFile) java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(c, m)): Unit
      }
      c
    }
    def batch(pred: org.apache.spark.sql.Column) =
      Tables.embeddings(spark, d).filter(pred)
        .select(col("vec_id"), col("embedding"))
    val c10 = freshCopy()
    val (n10, app10S) = timed(AnnIndex.appendAt(spark, c10, batch(tenPct)))
    val c5 = freshCopy()
    val (n5, app5S) = timed(AnnIndex.appendAt(spark, c5, batch(fivePct)))

    val line =
      f"""{"metric":"ann_append_sweep","dir":"$d","n_vecs":$n,""" +
      f""""full_build_s":$fullS%.3f,"base_build_s":$baseS%.3f,""" +
      f""""append_10pct_rows":$n10,"append_10pct_s":$app10S%.3f,""" +
      f""""append_5pct_rows":$n5,"append_5pct_s":$app5S%.3f,""" +
      f""""full_per_row_us":${fullS * 1e6 / n}%.2f,""" +
      f""""append_per_row_us":${app10S * 1e6 / math.max(n10, 1)}%.2f}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/ann_append_sweep.json"), line): Unit
    Seq(baseDir, c10, c5).foreach(p =>
      AnnIndex.deleteRecursively(new java.io.File(p)))
    spark.stop()
  }
}
