package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words

/** Per-stage decomposition of `dedup_substring` (r9, VERDICT r8 #4 —
  * the one weak-list entry with real non-floor margin: 1.54 s vs
  * DuckDB 0.41 s at sf0.1). Mirrors the stages of
  * [[graft.operators.Dedup.substringCoverage]] exactly (same
  * expressions, cumulative prefixes), each materialized through the
  * noop sink min-of-3, so the gap decomposes into:
  *
  *   - scan_explode: documents scan + k-gram posexplode + xxhash64
  *     (the narrow map pass — DuckDB pays this too)
  *   - plus_h_window: + the corpus-wide shuffle on h and the
  *     min/max-over-h window + ≥2-docs filter (the big exchange)
  *   - plus_islands (= full query): + the per-doc gaps-and-islands
  *     windows, two groupBys and the left join back to doc stats
  *
  * `sbt "runMain graft.SubstringProfile [sfDir]"` → one JSON line +
  * target/substring_profile.json.
  */
object SubstringProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect(): Unit

    val k = 8
    val gramKey = (0 until k).map(j => s"element_at(whs, i + $j)").mkString(", ")
    def grams = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"), expr("transform(ws, w -> xxhash64(w))").as("whs"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(whs) - ${k - 1}), " +
          s"i -> xxhash64($gramKey))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("start"),
        col("col").as("h"))
    val wH = Window.partitionBy(col("h"))
    def dupPos = grams
      .withColumn("dmin", min(col("doc_id")).over(wH))
      .withColumn("dmax", max(col("doc_id")).over(wH))
      .filter(col("dmin") =!= col("dmax"))
      .select(col("doc_id"), col("start"), (col("start") + (k - 1)).as("e"))

    def ms(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }
    def minOf(n: Int)(body: => Double): Double = (1 to n).map(_ => body).min
    def noop(df: => org.apache.spark.sql.DataFrame): Double =
      minOf(3)(ms(df.write.format("noop").mode("overwrite").save()))

    // warm the full plan once (codegen + file-status caches)
    graft.operators.Dedup.substringCoverage(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val scanExplodeMs = noop(grams)
    val hWindowMs = noop(dupPos)
    val fullMs = noop(graft.operators.Dedup.substringCoverage(spark, sfDir))
    val nGrams = grams.count()
    val nDup = dupPos.count()

    val line =
      f"""{"metric":"substring_profile","scan_explode_ms":$scanExplodeMs%.1f,"plus_h_window_ms":$hWindowMs%.1f,"full_ms":$fullMs%.1f,"n_grams":$nGrams,"n_dup_positions":$nDup,"sf":"$sfDir"}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/substring_profile.json"), line): Unit
    spark.stop()
  }
}
