package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every declared query has an oracle or is rows-only by design") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("SURVEY.md §2 inventory and SparkEntry.queries agree exactly") {
    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val declared = """\*\*`([a-z0-9_]+)`\*\*""".r
      .findAllMatchIn(survey).map(_.group(1)).toSet
    val implemented = SparkEntry.queries.keySet
    assert(declared -- implemented == Set.empty,
      s"SURVEY declares but queries lacks: ${declared -- implemented}")
    assert(implemented -- declared == Set.empty,
      s"queries implements but SURVEY omits: ${implemented -- declared}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("q1 group count and exact quantity sum") {
    val rows = queries.Analytics.q1(spark, sf).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    val total = rows.map(_.getAs[Double]("sum_qty")).sum
    assert(total > 0 && total == math.rint(total), "quantities are integer-valued")
  }

  test("q9 topk is sorted descending") {
    val prices = queries.Analytics.q9(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q19 full outer covers all 25 nations") {
    assert(queries.Analytics.q19(spark, sf).count() == 25)
  }

  test("q22 approx distinct is within 5% of exact") {
    val approx = queries.Analytics2.q22(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05,
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("q49 KMV distinct is within 10% of exact (both estimate columns)") {
    import org.apache.spark.sql.functions._
    val kmv = queries.Analytics4.q49(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("no"),
        countDistinct(col("l_partkey")).as("np"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (no, np)) =>
      val (eo, ep) = kmv(k)
      assert(math.abs(eo - no).toDouble / no < 0.10, s"$k orders: kmv=$eo exact=$no")
      assert(math.abs(ep - np).toDouble / np < 0.10, s"$k parts: kmv=$ep exact=$np")
    }
  }

  test("q24 as-of join: clicked_at is never after the purchase") {
    import org.apache.spark.sql.functions._
    val bad = queries.Analytics2.q24(spark, sf)
      .filter(col("clicked_at") > col("ts")).count()
    assert(bad == 0)
  }
}
