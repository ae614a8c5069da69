package graft

import org.apache.spark.sql.SparkSession

/** Whole-surface audit for the inlined-lambda filter trap: a `filter`
  * directly over a projection that materializes a token array gets
  * pushed INTO the projection by predicate pushdown, re-inlining the
  * split per array element — O(words²) per doc (measured 4.5 s vs
  * 0.4 s at sf0.1 when it hit corpus_mix/stream_corpus).
  *
  * `audit` scans every query's physical plan for a Filter whose
  * condition contains a per-element lambda over a split; it is run from
  * BOTH the dev main (`runMain graft.FilterAudit [sfDir]` — clean run
  * prints nothing) and PlanAuditSpec, so the trap is structurally
  * unable to re-enter the surface without failing CI.
  */
object FilterAudit {

  /** (suspect Filter lines, construction failure) per query name;
    * an all-empty result = clean surface. */
  def audit(spark: SparkSession, d: String,
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
        SparkEntry.queries): Map[String, Either[String, Seq[String]]] =
    queries.map { case (name, fn) =>
      name -> (try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        // the quadratic trap: a per-element lambda (transform/filter/
        // exists/aggregate — all render as lambdafunction(...) in the
        // plan) over an aliased split, inlined into a Filter condition
        Right(plan.linesIterator.filter { l =>
          (l.contains("Filter ") || l.contains("+- Filter")) &&
          l.contains("lambdafunction(") && l.contains("split(")
        }.toSeq)
      } catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      })
    }

  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    audit(spark, d).toSeq.sortBy(_._1).foreach {
      case (name, Left(err)) => println(s"[audit] $name failed: $err")
      case (name, Right(hits)) if hits.nonEmpty =>
        println(s"[audit] $name: ${hits.size} suspect filter(s)")
      case _ => ()
    }
    spark.stop()
  }
}
