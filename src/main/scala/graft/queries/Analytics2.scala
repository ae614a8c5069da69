package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Second wave of warehouse queries (SURVEY.md §2.2 continued):
  * distinct-count, sketches, percentiles, as-of join. */
object Analytics2 {

  // ---- q21: exact COUNT(DISTINCT) --------------------------------------
  def q21(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val q21Sql: String =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---- q22: HLL approximate distinct (rows-only: sketch values are
  // engine-specific; accuracy asserted in AnalyticsSpec) ----------------
  def q22(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  // ---- q23: interpolated percentiles -----------------------------------
  def q23(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy(col("o_orderstatus"))

  val q23Sql: String =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.9) AS p90,
      |  MIN(o_totalprice) AS lo,
      |  MAX(o_totalprice) AS hi
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---- q24: as-of join (latest prior click for each purchase) ----------
  // Composed as ONE window pass over the event stream instead of a
  // range self-join: last_value(click ts IGNORE NULLS) over the
  // user's event history — no join, no candidate explosion, scales
  // linearly in events.
  def q24(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .withColumn("clicked_at",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("clicked_at"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val q24Sql: String =
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |  CAST(clicked_at AS TIMESTAMP) AS clicked_at
      |FROM (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS clicked_at
      |  FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, ts, event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_count_distinct" -> (q21 _),
    "q22_approx_distinct" -> (q22 _),
    "q23_percentile" -> (q23 _),
    "q24_asof_join" -> (q24 _))

  val oracles: Map[String, String] = Map(
    "q21_count_distinct" -> q21Sql,
    "q23_percentile" -> q23Sql,
    "q24_asof_join" -> q24Sql)
}
