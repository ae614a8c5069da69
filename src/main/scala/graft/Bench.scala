package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round): times every SparkEntry query
  * on `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Each query is forced through a full materialization of every output
  * column (noop datasource sink) — a bare `count()` would let Catalyst
  * prune the computed columns and time a different, cheaper plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM / codegen / filesystem once so the first timed query
    // isn't charged for session setup.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // Dev knobs: SPARK_GRAFT_ONLY=q1_agg,q3_join_agg to time a subset,
    // SPARK_GRAFT_REPEAT=3 to repeat each (min time reported).
    val only = SparkEntry.parseOnly()
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    // Warm re-runs for the expensive tail: every query whose cold run
    // took >= this many seconds gets a second, warm-plan run, so
    // cold-codegen variance can't mask (or fake) a regression there.
    // 0 disables; the cold number remains the headline `value`.
    val warmFloor = sys.env.getOrElse("SPARK_GRAFT_WARM_FLOOR", "1.0").toDouble
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // a fast failure must not report as a fast run
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .map { case (name, fn) =>
        val times = (1 to repeat).map(_ => run(name, fn))
        name -> (if (times.contains(-1.0)) -1.0 else times.min)
      }
    // warm failures stay in the map as -1 (same contract as cold: a
    // fast failure must not read as a fast run — or vanish entirely)
    val warm = results
      .filter { case (_, cold) => warmFloor > 0 && cold >= warmFloor }
      .map { case (name, _) => name -> run(name, SparkEntry.queries(name)) }
    // warm ≥ cold is the recompute signature (cold includes codegen +
    // first-touch IO, so a warm plan should be faster): flag it loudly —
    // this is exactly how the corpus_mix O(words²) regression surfaced
    val coldByName = results.toMap
    warm.foreach { case (name, w) =>
      val cold = coldByName(name)
      if (w > cold * 1.2)
        System.err.println(f"[bench] WARN $name warm ${w}%.2fs > 1.2x cold " +
          f"${cold}%.2fs — plan recomputes work per run (see SURVEY filter-trap note)")
    }
    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed queries report -1 in `queries` and are excluded from total
    val total = results.map(_._2).filter(_ >= 0).sum
    val warmTotal = warm.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${toJson(results)},""" +
      s""""warm_queries":${toJson(warm)},"warm_total":$warmTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
