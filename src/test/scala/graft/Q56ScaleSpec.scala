package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Analytics4

/** Forces q56's past-footer-gate path (two-phase exact-rank NTILE) and
  * pins bit-parity against the ntile twin — per-customer assignments,
  * not just the census — plus closed-form correctness of
  * [[Analytics4.ntileTwoPhase]] on synthetic corpora that exercise
  * ties, n % q != 0, and n < q. */
class Q56ScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q56 census: two-phase path is row-identical to the ntile path at sf0.001") {
    val rfm = Analytics4.rfmFrame(spark, sf)
    val viaNtile = Analytics4.q56Census(
      Analytics4.q56Quartiles(spark, rfm, distributed = false)).collect()
    val viaTwoPhase = Analytics4.q56Census(
      Analytics4.q56Quartiles(spark, rfm, distributed = true)).collect()
    assert(viaNtile.toSeq == viaTwoPhase.toSeq)
    assert(viaNtile.length > 1, "census must be non-degenerate")
  }

  test("q56 per-customer quartile assignments agree exactly between paths") {
    val rfm = Analytics4.rfmFrame(spark, sf)
    def keyed(distributed: Boolean) =
      Analytics4.q56Quartiles(spark, rfm, distributed)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .sortBy(_._1).toSeq
    assert(keyed(false) == keyed(true))
  }

  test("ntileTwoPhase matches ntile on tie-heavy synthetic corpora for several q") {
    import spark.implicits._
    // 1003 rows (odd remainder), metric with heavy ties (mod 17), key unique
    val df = (1L to 1003L).map(i => (i, i % 17)).toDF("key", "metric")
    val sortCols = Seq(col("metric"), col("key"))
    for (q <- Seq(2, 3, 4, 7)) {
      val expect = df.withColumn("b", ntile(q).over(Window.orderBy(sortCols: _*)))
        .select("key", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Analytics4.ntileTwoPhase(spark, df, q, sortCols, "b")
        .select("key", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expect, s"q=$q mismatch")
    }
  }

  test("ntileTwoPhase handles n < q (each row its own bucket)") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (3L, 1L)).toDF("key", "metric")
    val got = Analytics4
      .ntileTwoPhase(spark, df, 4, Seq(col("metric"), col("key")), "b")
      .select("key", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(3L -> 1, 1L -> 2, 2L -> 3))
  }

  test("ntileTwoPhase executes ONE physical range exchange, reused by the second pass") {
    // The two-phase construction is only correct if the offsets pass
    // and the rank pass physically share the range exchange —
    // RangePartitioner's sampling seed is rdd-id-dependent, so two
    // separate executions could draw different boundaries and silently
    // mis-bucket (review r12). The code fails fast if exchange reuse
    // is configured off; this pins that the reuse actually HAPPENS in
    // the executed plan: exactly one materialized range exchange, and
    // at least one reused reference to it.
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    def all(p: SparkPlan): Seq[SparkPlan] =
      p +: ((p.children ++ p.subqueries).flatMap(all) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          all(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          all(q.plan)
        case _ => Seq.empty
      }))
    val df = (1L to 5000L).map(i => (i, i % 13)).toDF("key", "metric")
    val res = Analytics4
      .ntileTwoPhase(spark, df, 4, Seq(col("metric"), col("key")), "b")
    res.collect()
    val nodes = all(res.queryExecution.executedPlan)
    val ranges = nodes.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    val reusedRanges = nodes.collect {
      case r: ReusedExchangeExec
          if r.outputPartitioning.isInstanceOf[RangePartitioning] => r
    }
    assert(ranges.map(_.id).distinct.size == 1,
      s"expected exactly one materialized range exchange, got ${ranges.map(_.id).distinct}:\n" +
        res.queryExecution.executedPlan)
    assert(reusedRanges.nonEmpty,
      "expected the second pass to reference the range exchange via " +
        s"ReusedExchange:\n${res.queryExecution.executedPlan}")
  }

  test("two-phase plan: data-scale windows partitioned; SinglePartition only over aggregates") {
    val rfm = Analytics4.rfmFrame(spark, sf)
    val plan = Analytics4.q56Quartiles(spark, rfm, distributed = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ntile("),
      "scale path must not fall back to ntile:\n" + plan)
    // the rank window must be pid-partitioned (pid as PARTITION key,
    // i.e. followed by the sort spec, not an ASC ordering itself)
    assert("""row_number\(\) windowspecdefinition\(pid#\d+,""".r
      .findFirstIn(plan).isDefined,
      "global-rank window must be partitioned by pid:\n" + plan)
    // every SinglePartition exchange must sit DIRECTLY over an
    // aggregate (the <=nPart offsets counts / scalar partials —
    // metadata-sized), never over the data frame (the ntile shape)
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val child = lines.drop(i + 1).take(1).mkString
        assert(child.contains("HashAggregate"),
          s"SinglePartition over non-aggregate data at line $i:\n$plan")
      }
  }
}
