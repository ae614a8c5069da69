package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Per-stage decomposition of `graph_triangles` (r9 session tool,
  * same discipline as [[SubstringProfile]]). NOTE: pairs_raw /
  * pair_distinct time the SUPERSEDED r8 stages on purpose — this is
  * the measurement that located the pair-distinct margin and
  * motivated the r9 rewrite (commit "Shave graph_triangles"), kept
  * for the record; `full_ms` times whatever
  * [[graft.operators.GraphOps.triangles]] currently is, so the two
  * no longer sum to the same plan. */
object TriProfile {
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

    // warm full query once
    graft.operators.GraphOps.triangles(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    def pairsRaw = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "a")), col("ps"))
      .select(col("a"), explode(expr("slice(ps, i + 2, size(ps))")).as("c"))
    def e = pairsRaw.distinct()

    val tPairsRaw = noop(pairsRaw)
    val tDistinct = noop(e)
    val tFull = minOf(3)(ms(
      graft.operators.GraphOps.triangles(spark, sfDir)
        .write.format("noop").mode("overwrite").save()))

    println(f"""{"pairs_raw_ms":$tPairsRaw%.0f,"pair_distinct_ms":$tDistinct%.0f,"full_ms":$tFull%.0f}""")
    spark.stop()
  }
}
