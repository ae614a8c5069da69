package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import Frags._

/** Third wave of warehouse queries (SURVEY.md §2.2 continued): set
  * operations, lead/lag windows, ntile bucketing, histograms, GROUPING
  * SETS, and JSON extraction from the event `props` payload.
  *
  * Scale notes: the set ops and histogram are single-shuffle
  * hash-aggregate shapes; lead/lag shuffles once on the (high-
  * cardinality) user key; GROUPING SETS is one shuffle with Expand —
  * all shapes that survive a 100× scale-up unchanged.
  */
object Analytics3 {

  // ---- q28: INTERSECT (customers active in both years) -----------------
  // Spark plans INTERSECT as a distinct left-semi join; both sides are
  // pre-filtered at the scan (pushed predicates) and pre-distinct, so
  // the shuffle carries only unique keys.
  def q28(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val a = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val b = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    a.intersect(b).orderBy("o_custkey")
  }

  val q28Sql: String =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      |ORDER BY o_custkey""".stripMargin

  // ---- q29: EXCEPT (customers who churned between the years) -----------
  def q29(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val a = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val b = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    a.except(b).orderBy("o_custkey")
  }

  val q29Sql: String =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      |ORDER BY o_custkey""".stripMargin

  // ---- q30: lead/lag — inter-event gap statistics per user -------------
  // Gaps are exact integer microseconds, so SUM/MAX are bit-exact in
  // any aggregation order; the mean is one final double division.
  def q30(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("gap_us", unix_micros(col("ts")) - col("prev_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("total_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .withColumn("avg_gap_us",
        col("total_gap_us").cast("double") / col("n_gaps"))
      .orderBy(col("user_id"))
  }

  val q30Sql: String =
    """SELECT user_id, COUNT(*) AS n_gaps,
      |  CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
      |  MAX(gap_us) AS max_gap_us,
      |  CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
      |FROM (
      |  SELECT user_id,
      |    epoch_us(ts) - LAG(epoch_us(ts), 1)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |WHERE gap_us IS NOT NULL
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---- q31: NTILE quartiles of customers by account balance ------------
  // Exact NTILE without a global single-partition window over raw rows:
  // global rank = per-VALUE offset + intra-value row_number.
  //  * offsets come from a histogram groupBy(c_acctbal) — c_acctbal has
  //    a fixed 2-decimal domain ([-999.99, 9999.99] → ≤ 1.1M distinct
  //    values at ANY corpus size), so the one ordered window here runs
  //    over a BOUNDED aggregate, never over raw customers;
  //  * the intra-value row_number window partitions BY VALUE — fully
  //    distributed;
  //  * quartile boundaries are NTILE's exact sizes (first n%4 buckets
  //    get ⌈n/4⌉), derived from the row count in-plan.
  // Reproduces NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) exactly,
  // ties included — the oracle below is still the plain NTILE SQL.
  def q31(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_custkey"), col("c_acctbal"))
    val offs = c.groupBy(col("c_acctbal")).agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(Window.orderBy(col("c_acctbal"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("c_acctbal"), col("off"))
    val tot = c.agg(count(lit(1)).as("n"))
    val wIn = Window.partitionBy(col("c_acctbal")).orderBy(col("c_custkey"))
    val base = floor(col("n") / 4).cast("long")
    val rem = pmod(col("n"), lit(4L))
    c.join(offs, "c_acctbal")
      .withColumn("rnk", col("off") + row_number().over(wIn))
      .crossJoin(broadcast(tot))
      .withColumn("quartile",
        when(col("rnk") <= base + least(rem, lit(1L)), 1)
          .when(col("rnk") <= base * 2 + least(rem, lit(2L)), 2)
          .when(col("rnk") <= base * 3 + least(rem, lit(3L)), 3)
          .otherwise(4))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_cust"),
        min(col("c_acctbal")).as("lo"),
        max(col("c_acctbal")).as("hi"))
      .orderBy(col("quartile"))
  }

  val q31Sql: String =
    """SELECT quartile, COUNT(*) AS n_cust,
      |  MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
      |FROM (
      |  SELECT c_acctbal,
      |    NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      |  FROM customer)
      |GROUP BY quartile
      |ORDER BY quartile""".stripMargin

  // ---- q32: fixed-width histogram of order totals ----------------------
  // bucket = floor(price/50000): both engines evaluate the same IEEE
  // double division then floor, so bucket assignment is identical.
  def q32(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(floor(col("o_totalprice") / 50000).cast("long").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        expr(dsum2("o_totalprice")).as("sum_price"))
      .orderBy(col("bucket"))

  val q32Sql: String =
    s"""SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
       |  COUNT(*) AS n, ${dsum2("o_totalprice")} AS sum_price
       |FROM orders
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin

  // ---- q33: GROUPING SETS (detail + per-status + grand total) ----------
  // One shuffle over an Expand (3 grouping sets → 3× map-side rows,
  // partially aggregated before the exchange).
  def q33(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_q33_orders")
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${dsum2("o_totalprice")} AS sum_price
         |FROM graft_q33_orders
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
         |                        (o_orderstatus), ())
         |ORDER BY o_orderstatus ASC NULLS FIRST,
         |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val q33Sql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${dsum2("o_totalprice")} AS sum_price
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
       |                        (o_orderstatus), ())
       |ORDER BY o_orderstatus ASC NULLS FIRST,
       |  o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---- q34: JSON extraction from the event props payload ---------------
  // get_json_object is a codegen'd path expression over the string —
  // no UDF; the reference's BYTE_ARRAY(JSON)→text mapping
  // (reference: src/converters.rs:55-70) lands the same payloads as
  // text, and this is the query its users run on them.
  def q34(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      // FLOOR(k / 10), not `k DIV 10`: DIV truncates toward zero while
      // DuckDB's // floors, so negative keys would bucket differently.
      .withColumn("k_decade", expr("CAST(FLOOR(k / 10) AS BIGINT)"))
      .groupBy(col("k_decade"))
      .agg(count(lit(1)).as("n"),
        expr(dsum6("value")).as("sum_value"))
      .orderBy(col("k_decade"))

  val q34Sql: String =
    s"""SELECT CAST(FLOOR(CAST(json_extract_string(props, '$$.k') AS BIGINT) / 10) AS BIGINT) AS k_decade,
       |  COUNT(*) AS n, ${dsum6("value")} AS sum_value
       |FROM events
       |GROUP BY 1
       |ORDER BY k_decade""".stripMargin

  // ---- q35: quantile bucketing WITHOUT a global window -----------------
  // The scale-correct alternative to q31's NTILE: three interpolated
  // breakpoints (one distributed percentile agg, exactly DuckDB's
  // quantile_cont), broadcast to every row, bucket by comparison. No
  // total sort, no single-partition window — survives any corpus size.
  def q35(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val b = o.agg(
      expr("percentile(o_totalprice, 0.25)").as("b1"),
      expr("percentile(o_totalprice, 0.5)").as("b2"),
      expr("percentile(o_totalprice, 0.75)").as("b3"))
    o.crossJoin(broadcast(b))
      .select(
        when(col("o_totalprice") <= col("b1"), 1)
          .when(col("o_totalprice") <= col("b2"), 2)
          .when(col("o_totalprice") <= col("b3"), 3)
          .otherwise(4).as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy(col("bucket"))
  }

  val q35Sql: String =
    """SELECT CASE WHEN o_totalprice <= b1 THEN 1
      |            WHEN o_totalprice <= b2 THEN 2
      |            WHEN o_totalprice <= b3 THEN 3 ELSE 4 END AS bucket,
      |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      |FROM orders
      |CROSS JOIN (SELECT quantile_cont(o_totalprice, 0.25) AS b1,
      |                   quantile_cont(o_totalprice, 0.5) AS b2,
      |                   quantile_cont(o_totalprice, 0.75) AS b3
      |            FROM orders)
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  // ---- q36: skew-salted fact⋈dim join ----------------------------------
  // The explicit-salting primitive in the oracle-gated surface: the
  // fact side gets a deterministic content-derived salt, the dim side
  // is replicated saltFactor× and the join key becomes (key, salt) —
  // one hot part key spreads over 8 reducers instead of stalling one.
  // Result is provably identical to the plain join (the oracle IS the
  // plain join).
  def q36(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val p = part(s, d)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    graft.operators.ScaleJoins.saltedJoin(li, p, "l_partkey", saltFactor = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), expr(revenue()).as("revenue"))
      .orderBy(col("p_brand"))
  }

  val q36Sql: String =
    s"""SELECT p_brand, COUNT(*) AS n_items, ${revenue()} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin

  // ---- q37: time-series gap fill ---------------------------------------
  // Dense daily series: per-day aggregate left-joined onto a generated
  // calendar spine (sequence over the observed min..max), missing days
  // coalesced to zero — the standard reporting shape. The spine is one
  // tiny generated relation; the heavy side stays a single hash-agg.
  def q37(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(to_date(col("ts")).as("day"), col("value"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), expr(dsum6("value")).as("sum_value"))
    val days = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    days.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("day"))
  }

  val q37Sql: String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
       |    ${dsum6("value")} AS sum_value
       |  FROM events GROUP BY 1),
       |days AS (
       |  SELECT CAST(UNNEST(generate_series(
       |    (SELECT MIN(day) FROM daily), (SELECT MAX(day) FROM daily),
       |    INTERVAL 1 DAY)) AS DATE) AS day)
       |SELECT d.day AS day, COALESCE(n, 0) AS n,
       |  COALESCE(sum_value, 0.0) AS sum_value
       |FROM days d LEFT JOIN daily USING (day)
       |ORDER BY day""".stripMargin

  // ---- q38: bucketed co-located join -----------------------------------
  // Both sides written bucketed+sorted on the join key, then joined
  // shuffle-free (SortMergeJoin over co-located buckets — the plan
  // property is asserted in ScaleJoinsSpec; here the RESULT parity is
  // oracle-gated). At 100 TB this is the repeated-fact-join shape:
  // pay the bucketing write once, skip the shuffle every join after.
  def q38(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val c = customer(s, d)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val (bo, bc) = graft.operators.ScaleJoins.bucketize(
      s, o, c, "custkey", buckets = 16, "graft_q38_orders", "graft_q38_cust")
    bo.join(bc, "custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        expr(dsum2("o_totalprice")).as("total"))
      .orderBy(col("c_mktsegment"))
  }

  val q38Sql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
       |  ${dsum2("o_totalprice")} AS total
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // ---- q39: ordered conversion funnel ----------------------------------
  // view → click-after-view → purchase-after-that-click, per user, then
  // global stage counts. ONE shuffle: all three stages are windows over
  // the same user partitioning (Spark reuses the exchange+sort), where
  // the join formulation (the oracle's CTE shape) would shuffle thrice.
  def q39(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("v_ts",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" && col("ts") > col("v_ts"),
          col("ts"))).over(w))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" && col("ts") > col("c_ts"),
          col("ts"))).over(w))
      // collapse to one row per user FIRST (the stage timestamps are
      // per-user constants), then plain non-null counts — avoids the
      // 3× Expand that multiple countDistinct aggregates would plan
      .groupBy(col("user_id"))
      .agg(max(col("v_ts")).as("v_ts"), max(col("c_ts")).as("c_ts"),
        max(col("p_ts")).as("p_ts"))
      .agg(count(col("v_ts")).as("n_view"),
        count(col("c_ts")).as("n_click_after_view"),
        count(col("p_ts")).as("n_purchase_after_click"))
  }

  val q39Sql: String =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id AS user_id, MIN(e.ts) AS c_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
      |  WHERE e.event_type = 'click' GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id AS user_id, MIN(e.ts) AS p_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click_after_view,
      |  (SELECT COUNT(*) FROM p) AS n_purchase_after_click""".stripMargin

  // ---- q40: weekly cohort retention ------------------------------------
  // Users bucketed by first-seen week; per (cohort, week-offset) count
  // of still-active users — the classic retention triangle. Two hash
  // aggs + one user-keyed join; every stage shuffles on the
  // high-cardinality user key.
  def q40(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
    val firsts = ev.groupBy(col("user_id")).agg(min(col("w")).as("cohort"))
    ev.distinct().join(firsts, "user_id")
      .select(col("cohort").as("cohort_week"),
        expr("CAST(datediff(w, cohort) / 7 AS BIGINT)").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q40Sql: String =
    """WITH firsts AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      |  FROM events GROUP BY user_id),
      |activity AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
      |SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_week,
      |  CAST(date_diff('day', f.cohort, a.w) / 7 AS BIGINT) AS week_offset,
      |  COUNT(*) AS n_users
      |FROM activity a JOIN firsts f ON a.user_id = f.user_id
      |GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin

  // ---- pipeline_corpus: end-to-end training-data curation --------------
  // The flagship composition: exact-dedup survivors → minimum-length
  // quality gate → per-(lang, source) corpus statistics. One dedup
  // shuffle (16-byte keys) + one survivor join + one agg — the whole
  // curation pass is three declarative stages over one scan each.
  def pipelineCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val survivors = docs
      .groupBy(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(survivors, "doc_id")
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .filter(col("n_tokens") >= 30)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"), col("source"))
  }

  val pipelineCorpusSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM (
      |  SELECT lang, source, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |  WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text)))
      |WHERE n_tokens >= 30
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_intersect" -> (q28 _),
    "q29_except" -> (q29 _),
    "q30_lead_lag" -> (q30 _),
    "q31_ntile" -> (q31 _),
    "q32_histogram" -> (q32 _),
    "q33_grouping_sets" -> (q33 _),
    "q34_json_extract" -> (q34 _),
    "q35_quantile_bucket" -> (q35 _),
    "q36_skew_join" -> (q36 _),
    "q37_gap_fill" -> (q37 _),
    "q38_bucketed_join" -> (q38 _),
    "q39_funnel" -> (q39 _),
    "q40_retention" -> (q40 _),
    "pipeline_corpus" -> (pipelineCorpus _))

  val oracles: Map[String, String] = Map(
    "q28_intersect" -> q28Sql,
    "q29_except" -> q29Sql,
    "q30_lead_lag" -> q30Sql,
    "q31_ntile" -> q31Sql,
    "q32_histogram" -> q32Sql,
    "q33_grouping_sets" -> q33Sql,
    "q34_json_extract" -> q34Sql,
    "q35_quantile_bucket" -> q35Sql,
    "q36_skew_join" -> q36Sql,
    "q37_gap_fill" -> q37Sql,
    "q38_bucketed_join" -> q38Sql,
    "q39_funnel" -> q39Sql,
    "q40_retention" -> q40Sql,
    "pipeline_corpus" -> pipelineCorpusSql)
}
