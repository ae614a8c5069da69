package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Per-stage decomposition of `dedup_semantic_banded` (r10 session
  * tool, the TriProfile discipline): amp-table build, kmeans
  * assignment, banded signatures, candidate join, full query. */
object SemProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect(): Unit

    def ms(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }
    def minOf(n: Int)(body: => Double): Double = (1 to n).map(_ => body).min
    def noop(df: => DataFrame): Double =
      minOf(3)(ms(df.write.format("noop").mode("overwrite").save()))

    import graft.operators.{Similarity, Dedup}
    val r = Similarity.ampFactor(
      graft.Tables.footerRowCount(spark, sfDir, "embeddings"))
    val amp = Similarity.ampEmbeddings(spark, sfDir, r)

    // (the r10 probe that located the under-parallel scan — a 32-way
    // fanned single assignment pass at 0.64 s vs 4.5 s for the 1-2
    // partition kmeansAssign — is now encoded in kmeansAssign itself)
    val tAssign = noop(Similarity.kmeansAssign(spark, amp, 32, 2))
    val a = Similarity.kmeansAssign(spark, amp, 32, 2)
      .select(col("vec_id"), col("embedding"), col("c"))
    val tSigs = noop(Dedup.hyperplaneBanded(a, 9, 64, 64))
    def sigs = Dedup.hyperplaneBanded(a, 9, 64, 64)
    val tCands = noop {
      val sg = sigs
      sg.as("x").join(sg.as("y"),
        col("x.c") === col("y.c") && col("x.band") === col("y.band") &&
          col("x.sig") === col("y.sig") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("mate"), col("y.vec_id").as("vid"))
        .distinct()
    }
    val tFull = minOf(3)(ms(
      Similarity.semanticDedupBandedAudit(spark, sfDir)
        .write.format("noop").mode("overwrite").save()))

    println(f"""{"assign_ms":$tAssign%.0f,"sigs_ms":$tSigs%.0f,"cands_ms":$tCands%.0f,"full_ms":$tFull%.0f}""")
    spark.stop()
  }
}
