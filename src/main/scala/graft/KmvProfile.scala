package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Decomposes `etl_stats_approx` (r10, verdict item 7 adjudication):
  * the query is ONE scan + ONE global ObjectHashAggregate whose only
  * non-codegen work is the 7 kmv_sketch typed aggregates. Stages:
  *
  *   - count_only: same scan + repartition(16) + count(*) — the
  *     query's action floor (scan, exchange, scheduling);
  *   - codegen_aggs: + the 7 null-count sums over the same canonical
  *     repr expressions (everything codegen can take);
  *   - full: the gated query (adds the 7 typed kmv sketches + the
  *     result explode).
  *
  * full − codegen_aggs is therefore the irreducible typed-aggregate
  * tail: per-row interpreted child eval + seen-set lookup, and an md5
  * per DISTINCT value — the price of a DuckDB-replayable
  * `md5(CAST(v AS STRING))` sketch. The r10 digest-skip cache already
  * removed the duplicate-value digests (1.56 → 1.23 s best-of).
  *
  * `sbt "runMain graft.KmvProfile [sfDir]"` → one JSON line.
  */
object KmvProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect(): Unit
    queries.EtlQueries.statsApprox(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    def ms(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }
    def minOf(n: Int)(body: => Double): Double = (1 to n).map(_ => body).min
    def noop(df: => DataFrame): Double =
      minOf(5)(ms(df.write.format("noop").mode("overwrite").save()))

    val reprs: Seq[Column] = Seq(
      col("l_orderkey").cast("bigint").cast("string"),
      col("l_linenumber").cast("bigint").cast("string"),
      col("l_quantity").cast("bigint").cast("string"),
      floor(col("l_extendedprice") * 100).cast("bigint").cast("string"),
      col("l_returnflag"),
      col("l_linestatus"),
      date_format(col("l_shipdate").cast("timestamp").cast("date"),
        "yyyy-MM-dd"))
    def li = {
      val li0 = Tables.lineitem(spark, sfDir)
      if (li0.rdd.getNumPartitions < 16) li0.repartition(16) else li0
    }

    val tCount = noop(li.agg(count(lit(1)).as("n")))
    val tCodegen = noop(li.agg(count(lit(1)).as("n"),
      reprs.zipWithIndex.map { case (c, i) =>
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nn_$i") }: _*))
    val raws = Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_linestatus", "l_shipdate")
    val tCodegenRaw = noop(li.agg(count(lit(1)).as("n"),
      raws.zipWithIndex.map { case (c, i) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$i") }: _*))
    val tFull = noop(queries.EtlQueries.statsApprox(spark, sfDir))

    println(f"""{"count_only_ms":$tCount%.0f,"codegen_aggs_ms":$tCodegen%.0f,"codegen_raw_ms":$tCodegenRaw%.0f,"full_ms":$tFull%.0f}""")
    spark.stop()
  }
}
