package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Per-stage decomposition of `graph_triangles` (r9 session tool,
  * same discipline as [[SubstringProfile]]; rebuilt r10 for the
  * pinned-oriented-adjacency plan). Each stage is timed as a noop
  * action on the UNPINNED prefix plan, so deltas between rows are the
  * marginal cost of the added stage; `full_ms` times whatever
  * [[graft.operators.GraphOps.triangles]] currently is (pins
  * included). */
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

    def pairs = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "a")), col("ps"))
      .select(col("a"), explode(expr("slice(ps, i + 2, size(ps))")).as("c"))
    def deg = pairs.select(col("a").as("node"))
      .union(pairs.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    def withDeg = pairs
      .join(broadcast(deg.withColumnRenamed("node", "a")
        .withColumnRenamed("dg", "da")), "a")
      .join(broadcast(deg.withColumnRenamed("node", "c")
        .withColumnRenamed("dg", "dc")), "c")
    def aFirst = col("da") < col("dc") ||
      (col("da") === col("dc") && col("a") < col("c"))
    def o = withDeg.select(
      when(aFirst, col("a")).otherwise(col("c")).as("src"),
      when(aFirst, col("c")).otherwise(col("a")).as("dst"))
    def adjP = o.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("np"))
    def closed = adjP.select(col("src").as("u"), explode(col("np")).as("v"),
        col("np").as("nu"))
      .join(broadcast(adjP.select(col("src").as("v"), col("np").as("nv"))),
        Seq("v"), "left")
      .select(col("u"), col("v"),
        array_intersect(col("nu"),
          coalesce(col("nv"), array().cast("array<bigint>"))).as("ws"))
      .filter(size(col("ws")) > 0)

    val tPairs = noop(pairs)
    val tDeg = noop(deg)
    val tAdj = noop(adjP)
    val tClosed = noop(closed)
    val tFull = minOf(3)(ms(
      graft.operators.GraphOps.triangles(spark, sfDir)
        .write.format("noop").mode("overwrite").save()))

    println(f"""{"pairs_ms":$tPairs%.0f,"deg_ms":$tDeg%.0f,"adj_ms":$tAdj%.0f,"closed_ms":$tClosed%.0f,"full_ms":$tFull%.0f}""")
    spark.stop()
  }
}
