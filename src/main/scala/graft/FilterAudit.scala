package graft

/** Whole-surface audit for the inlined-lambda filter trap: a `filter`
  * directly over a projection that materializes a token array gets
  * pushed INTO the projection by predicate pushdown, re-inlining the
  * split per array element — O(words²) per doc (measured 4.5 s vs
  * 0.4 s at sf0.1 when it hit corpus_mix/stream_corpus). This main
  * scans every query's physical plan for a Filter whose condition
  * contains a per-element lambda over a split and prints offenders.
  * `runMain graft.FilterAudit [sfDir]` — clean run prints nothing.
  */
object FilterAudit {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        // the quadratic trap: a per-element lambda (transform/filter/
        // exists/aggregate — all render as lambdafunction(...) in the
        // plan) over an aliased split, inlined into a Filter condition
        val hits = plan.linesIterator.filter { l =>
          (l.contains("Filter ") || l.contains("+- Filter")) &&
          l.contains("lambdafunction(") && l.contains("split(")
        }.toSeq
        if (hits.nonEmpty) println(s"[audit] $name: ${hits.size} suspect filter(s)")
      } catch { case e: Throwable => println(s"[audit] $name failed: ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
