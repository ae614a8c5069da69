package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import Frags._

/** The warehouse/analytics query layer (SURVEY.md §2.2).
  *
  * The reference tool (reference: src/runner.rs:48-113) only lands rows
  * into a Postgres warehouse; these are the analytical queries its users
  * run on those tables, re-expressed as declarative Spark plans so
  * Catalyst handles pushdown, pruning and join strategy. Every query
  * reads the driver testdata layout (`<dir>/<table>.parquet`).
  *
  * Scale notes (100 TB posture): each query is a single declarative
  * plan — no driver-side loops; dimension tables (region, nation,
  * supplier) carry explicit `broadcast` hints; fact-fact joins shuffle
  * on their natural keys and pre-aggregate before joining where the
  * grouping key allows.
  */
object Analytics {

  /** Timestamp literal cast to the column's actual type — the driver
    * parquet may surface TIMESTAMP or TIMESTAMP_NTZ depending on writer
    * metadata, and a mismatched literal type would fail analysis. */
  private def tsLit(df: DataFrame, c: String, v: String): Column =
    lit(v).cast(df.schema(c).dataType)

  // ---- q1: TPC-H Q1-style pricing summary ------------------------------
  def q1(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li
      .filter(col("l_shipdate") <= tsLit(li, "l_shipdate", "1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("SUM(l_quantity)").as("sum_qty"),
        expr(dsum2("l_extendedprice")).as("sum_base_price"),
        expr(revenue()).as("sum_disc_price"),
        expr(charge()).as("sum_charge"),
        expr("AVG(l_quantity)").as("avg_qty"),
        expr(davg2("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  SUM(l_quantity) AS sum_qty,
       |  ${dsum2("l_extendedprice")} AS sum_base_price,
       |  ${revenue()} AS sum_disc_price,
       |  ${charge()} AS sum_charge,
       |  AVG(l_quantity) AS avg_qty,
       |  ${davg2("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- q2: filter + projection pushdown --------------------------------
  def q2(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li
      .filter(col("l_shipdate") >= tsLit(li, "l_shipdate", "1996-01-01") &&
        col("l_shipdate") < tsLit(li, "l_shipdate", "1997-01-01") &&
        col("l_quantity") > lit(45))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- q3: customer ⋈ orders ⋈ lineitem revenue top-N ------------------
  def q3(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
    // Pre-aggregate the fact side BEFORE the join (map-side combine →
    // the join carries one row per orderkey, not one per lineitem).
    // Partials stay DECIMAL so re-aggregation is exact; only the final
    // result is cast to double — same value as a single global sum.
    val lpre = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(expr(
        "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))")
        .as("rev_part"))
    lpre.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(expr("CAST(SUM(rev_part) AS DOUBLE)").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT o_orderkey, o_orderdate, ${revenue()} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY o_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin

  // ---- q4: EXISTS via left-semi join -----------------------------------
  def q4(s: SparkSession, d: String): DataFrame = {
    val hot = lineitem(s, d).filter(col("l_quantity") > lit(45))
      .select(col("l_orderkey"))
    orders(s, d)
      .join(hot, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---- q5: 5-way snowflake join ----------------------------------------
  def q5(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d).filter(col("r_name") === "ASIA").select("r_regionkey")
    val n = nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val c = customer(s, d).select("c_custkey", "c_nationkey")
    val o = orders(s, d).select("o_orderkey", "o_custkey")
    val l = lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(expr(revenue()).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name, ${revenue()} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // ---- q6: single-pass conditional aggregation -------------------------
  def q6(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li
      .filter(col("l_shipdate") >= tsLit(li, "l_shipdate", "1996-01-01") &&
        col("l_shipdate") < tsLit(li, "l_shipdate", "1997-01-01") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < lit(24))
      .agg(expr(
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)")
        .as("revenue"))
  }

  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---- q7: NOT EXISTS via left-anti join -------------------------------
  def q7(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).filter(col("o_orderstatus") === "P")
      .select("o_custkey")
    customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("c_mktsegment"))
  }

  val q7Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_cust
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---- q8: multi-column distinct ---------------------------------------
  def q8(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val q8Sql: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority
      |FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ---- q9: top-K (TakeOrderedAndProject) -------------------------------
  def q9(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val q9Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---- q10: ranking window ---------------------------------------------
  def q10(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  val q10Sql: String =
    """SELECT * FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer)
      |WHERE rnk <= 3
      |ORDER BY c_mktsegment, rnk""".stripMargin

  // ---- q11: running-sum window frame -----------------------------------
  def q11(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .filter(col("o_custkey") <= lit(20))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q11Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |       AS DOUBLE) AS running_spend
      |FROM orders
      |WHERE o_custkey <= 20
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---- q12: ROLLUP hierarchical totals ---------------------------------
  def q12(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("SUM(l_quantity)").as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q12Sql: String =
    """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---- q13: CUBE -------------------------------------------------------
  def q13(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), expr(dsum2("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q13Sql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${dsum2("o_totalprice")} AS total
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---- q14: UNION ALL + aggregate --------------------------------------
  def q14(s: SparkSession, d: String): DataFrame = {
    val a = orders(s, d).select(lit("ord").as("src"),
      col("o_totalprice").as("amt"))
    val b = lineitem(s, d).select(lit("li").as("src"),
      col("l_extendedprice").as("amt"))
    a.unionAll(b)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), expr(dsum2("amt")).as("total"))
      .orderBy(col("src"))
  }

  val q14Sql: String =
    s"""SELECT src, COUNT(*) AS n, ${dsum2("amt")} AS total
       |FROM (SELECT 'ord' AS src, o_totalprice AS amt FROM orders
       |      UNION ALL
       |      SELECT 'li' AS src, l_extendedprice AS amt FROM lineitem)
       |GROUP BY src
       |ORDER BY src""".stripMargin

  // ---- q15: HAVING -----------------------------------------------------
  def q15(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(expr("SUM(l_quantity)").as("sum_qty"), count(lit(1)).as("n"))
      .filter(col("sum_qty") > lit(10000))
      .orderBy(col("l_suppkey"))

  val q15Sql: String =
    """SELECT l_suppkey, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING SUM(l_quantity) > 10000
      |ORDER BY l_suppkey""".stripMargin

  // ---- q16: CASE WHEN conditional sums ---------------------------------
  def q16(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        expr("SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)")
          .as("qty_returned"),
        expr("SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END)")
          .as("qty_ack"),
        expr("SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END)")
          .as("qty_none"))
      .orderBy(col("l_linestatus"))

  val q16Sql: String =
    """SELECT l_linestatus,
      |  SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS qty_returned,
      |  SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END) AS qty_ack,
      |  SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END) AS qty_none
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // ---- q17: above-average filter (aggregate join-back) -----------------
  def q17(s: SparkSession, d: String): DataFrame = {
    val avgQ = lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    val l = lineitem(s, d)
    val p = part(s, d).select("p_partkey", "p_brand")
    l.join(avgQ, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small"), expr(dsum2("l_extendedprice")).as("value"))
      .orderBy(col("p_brand"))
  }

  val q17Sql: String =
    s"""SELECT p_brand, COUNT(*) AS n_small, ${dsum2("l_extendedprice")} AS value
       |FROM lineitem
       |JOIN (SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty
       |      FROM lineitem GROUP BY l_partkey) sub
       |  ON l_partkey = pk
       |JOIN part ON l_partkey = p_partkey
       |WHERE l_quantity < 0.5 * avg_qty
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin

  // ---- q18: event sessionization (gap > 30 min) ------------------------
  def q18(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("new_s",
        when(unix_micros(col("ts").cast("timestamp")) -
          lag(unix_micros(col("ts").cast("timestamp")), 1).over(w)
          > lit(1800000000L), 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg((sum(col("new_s")) + lit(1)).cast("long").as("n_sessions"),
        count(lit(1)).cast("long").as("n_events"))
      .orderBy(col("user_id"))
  }

  val q18Sql: String =
    """SELECT user_id,
      |  CAST(SUM(new_s) + 1 AS BIGINT) AS n_sessions,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events)
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---- q19: full outer join with coalesced keys ------------------------
  def q19(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).groupBy(col("c_nationkey").as("cnk"))
      .agg(count(lit(1)).as("n_cust"))
    val sp = supplier(s, d).groupBy(col("s_nationkey").as("snk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sp, col("cnk") === col("snk"), "full_outer")
      .select(
        coalesce(col("cnk"), col("snk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val q19Sql: String =
    """SELECT COALESCE(cnk, snk) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust,
      |  COALESCE(n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS cnk, CAST(COUNT(*) AS BIGINT) AS n_cust
      |      FROM customer GROUP BY c_nationkey) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS snk, CAST(COUNT(*) AS BIGINT) AS n_supp
      |      FROM supplier GROUP BY s_nationkey) s
      |  ON cnk = snk
      |ORDER BY nationkey""".stripMargin

  // ---- q20: pivot on event_type ----------------------------------------
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def q20(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("day", col("ts").cast("date"))
      .groupBy(col("day"))
      .pivot("event_type", eventTypes)
      .agg(expr(dsum6("value")))
      .orderBy(col("day"))

  val q20Sql: String = {
    val arms = eventTypes.map(t =>
      s"  CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS $t")
      .mkString(",\n")
    s"""SELECT CAST(ts AS DATE) AS day,
       |$arms
       |FROM events
       |GROUP BY CAST(ts AS DATE)
       |ORDER BY day""".stripMargin
  }

  /** queries-map wiring for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1 _),
    "q2_filter_project" -> (q2 _),
    "q3_join_agg" -> (q3 _),
    "q4_semi_join" -> (q4 _),
    "q5_multi_join" -> (q5 _),
    "q6_conditional_agg" -> (q6 _),
    "q7_anti_join" -> (q7 _),
    "q8_distinct" -> (q8 _),
    "q9_topk" -> (q9 _),
    "q10_window" -> (q10 _),
    "q11_running_sum" -> (q11 _),
    "q12_rollup" -> (q12 _),
    "q13_cube" -> (q13 _),
    "q14_union" -> (q14 _),
    "q15_having" -> (q15 _),
    "q16_case_agg" -> (q16 _),
    "q17_subquery_agg" -> (q17 _),
    "q18_events_sessionize" -> (q18 _),
    "q19_full_outer" -> (q19 _),
    "q20_pivot" -> (q20 _))

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_join_agg" -> q3Sql,
    "q4_semi_join" -> q4Sql,
    "q5_multi_join" -> q5Sql,
    "q6_conditional_agg" -> q6Sql,
    "q7_anti_join" -> q7Sql,
    "q8_distinct" -> q8Sql,
    "q9_topk" -> q9Sql,
    "q10_window" -> q10Sql,
    "q11_running_sum" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q13_cube" -> q13Sql,
    "q14_union" -> q14Sql,
    "q15_having" -> q15Sql,
    "q16_case_agg" -> q16Sql,
    "q17_subquery_agg" -> q17Sql,
    "q18_events_sessionize" -> q18Sql,
    "q19_full_outer" -> q19Sql,
    "q20_pivot" -> q20Sql)
}
