package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Fourth wave of warehouse queries (SURVEY.md §2.2 continued): sliding
  * window frames, per-group mode, and event-time RANGE frames.
  *
  * Scale notes: q41's global window runs over the *daily* series (the
  * aggregation shrinks cardinality to O(days) before the single-
  * partition window — never over raw facts); q42 is two hash
  * aggregations; q43's RANGE frame runs inside user partitions (high-
  * cardinality key, one shuffle) and its output is collapsed to a
  * histogram before leaving the executors.
  */
object Analytics4 {

  // ---- q41: 7-day moving revenue (sliding ROWS frame) ------------------
  // Both the daily totals and the window sums accumulate in DECIMAL, so
  // the series is bit-identical regardless of partitioning or engine.
  def q41(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))")
        .as("day_rev_d"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    daily
      .select(col("day"), col("day_rev_d").cast("double").as("day_rev"),
        sum(col("day_rev_d")).over(w).cast("double").as("mov7_rev"))
      .orderBy(col("day"))
  }

  val q41Sql: String =
    """SELECT day, CAST(day_rev_d AS DOUBLE) AS day_rev,
      |  CAST(SUM(day_rev_d) OVER (ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov7_rev
      |FROM (SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
      |        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS day_rev_d
      |      FROM orders GROUP BY 1)
      |ORDER BY day""".stripMargin

  // ---- q42: per-group mode (most frequent value, deterministic) --------
  def q42(s: SparkSession, d: String): DataFrame = {
    val counts = lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("l_suppkey"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_suppkey").as("mode_suppkey"), col("n"))
      .orderBy(col("l_returnflag"))
  }

  val q42Sql: String =
    """SELECT l_returnflag, l_suppkey AS mode_suppkey, CAST(n AS BIGINT) AS n
      |FROM (SELECT l_returnflag, l_suppkey, COUNT(*) AS n,
      |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |          ORDER BY COUNT(*) DESC, l_suppkey) AS rk
      |      FROM lineitem GROUP BY l_returnflag, l_suppkey)
      |WHERE rk = 1
      |ORDER BY l_returnflag""".stripMargin

  // ---- q43: events in the preceding hour (event-time RANGE frame) ------
  // Per event: how many same-user events fell in [t-1h, t]. The frame is
  // a RANGE over epoch-µs inside the user partition; the per-event rows
  // are collapsed to a burstiness histogram before any data leaves the
  // aggregation, so the output is O(distinct counts), not O(events).
  def q43(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0)
    events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("n_hr", count(lit(1)).over(w) - 1)
      .groupBy(col("n_hr"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_hr"))
  }

  val q43Sql: String =
    """SELECT n_hr, CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM (
      |  SELECT COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) - 1 AS n_hr
      |  FROM events)
      |GROUP BY n_hr
      |ORDER BY n_hr""".stripMargin

  // ---- q44: 7-day rolling active users (EXACT sliding distinct) --------
  // Exact distinct-over-sliding-window without a giant state: each
  // (user, active-day) pair is exploded into the ≤7 window-end days it
  // covers, then a plain distinct count per day. The blow-up factor is
  // the window length — bounded, documented, and embarrassingly
  // parallel — vs an unbounded per-day distinct-user state. Days with
  // no events anchor no window (join back to observed days).
  def q44(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    val days = ud.select(col("d").as("day")).distinct()
    val cover = ud.select(col("user_id"), col("d"),
        explode(sequence(lit(0), lit(6))).as("i"))
      .select(col("user_id"), expr("timestampadd(DAY, i, d)").as("day"))
    cover.join(days, "day")
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("active_7d"))
      .orderBy(col("day"))
  }

  val q44Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
      |  FROM events),
      |days AS (SELECT DISTINCT d AS day FROM ud),
      |cover AS (
      |  SELECT user_id, d + i * INTERVAL 1 DAY AS day
      |  FROM ud, LATERAL (SELECT unnest(generate_series(0, 6)) AS i) g)
      |SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_7d
      |FROM cover JOIN days USING (day)
      |GROUP BY day
      |ORDER BY day""".stripMargin

  // ---- q45: bloom-filter join pre-pruning ------------------------------
  // The 100 TB trick for a selective dim⋈fact join: build a Bloom
  // filter over the (filtered) dim keys, drop non-matching fact rows
  // BEFORE the shuffle, then let the real join remove the false
  // positives — result is exactly the plain join. At scale the bloom
  // bits ship with the broadcast instead of a second scan of the dim.
  def q45(s: SparkSession, d: String): DataFrame = {
    val dim = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // Distributed build: stat.bloomFilter is a treeAggregate over the
    // executors — the driver receives only the bloom bits, never a key
    // array. Exact capacity from a pushed-down dim count (the dim is
    // scanned for bits and again as the broadcast build side — both
    // scans are the cheap, filtered side).
    val bf = dim.stat.bloomFilter("c_custkey",
      math.max(dim.count(), 1000L), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // Native predicate (codegen'd, stays inside the scan's
    // WholeStageCodegen — a Scala UDF here would break the stage):
    // BloomFilterMightContain deserializes the same
    // spark.util.sketch.BloomFilter format stat.bloomFilter emits.
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graft.shim
    val mightContain = shim.toColumn(BloomFilterMightContain(
      shim.toExpression(lit(bos.toByteArray)),
      shim.toExpression(col("o_custkey"))))
    orders(s, d)
      .filter(mightContain) // pre-shuffle prune (~99%)
      .join(broadcast(dim), col("o_custkey") === col("c_custkey")) // exact: kills FPs
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frags.dsum2("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val q45Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  ${Frags.dsum2("o_totalprice")} AS total
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ---- q46: year-over-year growth per market segment -------------------
  // Yearly revenue is an exact DECIMAL sum; growth is ONE double
  // division per row — engine-portable. First year's growth is NULL.
  def q46(s: SparkSession, d: String): DataFrame = {
    val seg = customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val yearly = orders(s, d)
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), year(col("o_orderdate")).as("yr"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))")
        .as("rev_d"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("yr"))
    yearly
      .withColumn("prev_d", lag(col("rev_d"), 1).over(w))
      .select(col("c_mktsegment"), col("yr"),
        col("rev_d").cast("double").as("revenue"),
        ((col("rev_d") - col("prev_d")).cast("double") /
          col("prev_d").cast("double")).as("yoy_growth"))
      .orderBy(col("c_mktsegment"), col("yr"))
  }

  val q46Sql: String =
    """SELECT c_mktsegment, CAST(yr AS INT) AS yr, CAST(rev_d AS DOUBLE) AS revenue,
      |  CAST(rev_d - prev_d AS DOUBLE) / CAST(prev_d AS DOUBLE) AS yoy_growth
      |FROM (
      |  SELECT c_mktsegment, yr, rev_d,
      |    LAG(rev_d) OVER (PARTITION BY c_mktsegment ORDER BY yr) AS prev_d
      |  FROM (
      |    SELECT c_mktsegment, year(o_orderdate) AS yr,
      |      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev_d
      |    FROM orders JOIN customer ON o_custkey = c_custkey
      |    GROUP BY 1, 2))
      |ORDER BY c_mktsegment, yr""".stripMargin

  // ---- q47: share of total (two-level aggregation) ---------------------
  // Per-nation revenue share: group decimal sums + ONE unpartitioned
  // window over the 25-row aggregate (never over raw facts), then one
  // double division.
  def q47(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val byNation = orders(s, d)
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))")
        .as("rev_d"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byNation
      .withColumn("total_d", sum(col("rev_d")).over(wAll))
      .select(col("nationkey"), col("rev_d").cast("double").as("revenue"),
        (col("rev_d").cast("double") / col("total_d").cast("double"))
          .as("share"))
      .orderBy(col("nationkey"))
  }

  val q47Sql: String =
    """SELECT nationkey, CAST(rev_d AS DOUBLE) AS revenue,
      |  CAST(rev_d AS DOUBLE) / CAST(SUM(rev_d) OVER () AS DOUBLE) AS share
      |FROM (
      |  SELECT c_nationkey AS nationkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev_d
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1)
      |ORDER BY nationkey""".stripMargin

  // ---- q48: correlated multi-condition order profile -------------------
  // Orders spanning ≥2 suppliers with ≥1 returned item (the TPC-H
  // Q21-ish shape): ONE aggregation over lineitem computes both
  // conditions, then a broadcast-joined rollup by priority — no
  // correlated subquery re-scans. "≥2 distinct suppliers" is exactly
  // min(l_suppkey) != max(l_suppkey): a COUNT(DISTINCT) here would
  // plan as a two-level aggregate with NO map-side partial reduction
  // (every (orderkey, suppkey) pair shuffles); min/max keep the
  // single two-phase hash agg where partials collapse each order's
  // lines before the exchange. The oracle keeps COUNT(DISTINCT) — the
  // predicates are equivalent, so the result is identical.
  def q48(s: SparkSession, d: String): DataFrame = {
    val profile = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"),
        max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_ret"))
      .filter(col("s_min") =!= col("s_max") && col("has_ret") === 1)
      .select(col("l_orderkey"))
    orders(s, d)
      .join(profile, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frags.dsum2("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val q48Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  ${Frags.dsum2("o_totalprice")} AS total
       |FROM orders
       |JOIN (SELECT l_orderkey
       |      FROM lineitem
       |      GROUP BY l_orderkey
       |      HAVING COUNT(DISTINCT l_suppkey) >= 2
       |         AND MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1) p
       |  ON o_orderkey = l_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ---- q49: KMV approximate distinct (the engine-portable sketch) ------
  // q22's HLL sketch is inherently engine-specific; the k-minimum-values
  // estimator is not: the k smallest md5 hashes of the distinct values
  // are deterministic, so estimate = (k-1) / (kth smallest hash as a
  // fraction of the hash space) is bit-identical on every engine.
  // Both sketches come from ONE aggregation pass over lineitem via the
  // bounded KmvSketch aggregate (graft.functions.KmvSketchAgg): each
  // partial buffer is a ≤ k-element sorted digest set, so map-side
  // partials collapse the raw stream before the only exchange — the
  // prior shape (distinct shuffle + two ranking windows PER COLUMN,
  // six exchanges total) shipped the full value stream three times.
  // Groups with < k distinct values short-circuit to the exact count
  // (the sketch's capped cnt is exact below k).
  // shared with EtlQueries.statsApprox (one definition of the estimate
  // math, the ShPairsCte anti-drift discipline)
  private[queries] def kmvCol(sketch: Column, alias: String, k: Int): Column = {
    val cnt = sketch.getField("cnt")
    val kth = sketch.getField("kth")
    when(cnt < k, cnt)
      .otherwise(floor(lit((k - 1).toDouble) /
        (conv(substring(kth, 1, 15), 16, 10).cast("bigint") /
          lit(1152921504606846976.0))).cast("bigint")).as(alias)
  }

  def q49(s: SparkSession, d: String): DataFrame = {
    import graft.functions.KmvSketch.kmvSketch
    val k = 256
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(kmvSketch(col("l_orderkey"), k).as("so"),
        kmvSketch(col("l_partkey"), k).as("sp"))
      .select(col("l_returnflag"),
        kmvCol(col("so"), "kmv_orders", k),
        kmvCol(col("sp"), "kmv_parts", k))
      .orderBy(col("l_returnflag"))
  }

  val q49Sql: String = {
    val k = 256
    val hexval =
      """list_reduce(list_transform(string_split(substr(kth,1,15), ''),
        |    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, d) -> a*16 + d)""".stripMargin
    def kmv(valCol: String, alias: String): String =
      s"""(SELECT l_returnflag,
         |  CASE WHEN cnt < $k THEN cnt
         |       ELSE CAST(FLOOR((${k - 1}.0) / ($hexval / 1152921504606846976.0)) AS BIGINT)
         |  END AS $alias
         | FROM (
         |   SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt,
         |     MAX(CASE WHEN rk = $k THEN h END) AS kth
         |   FROM (
         |     SELECT l_returnflag, h,
         |       ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
         |     FROM (SELECT DISTINCT l_returnflag, md5(CAST($valCol AS VARCHAR)) AS h
         |           FROM (SELECT DISTINCT l_returnflag, $valCol FROM lineitem)))
         |   WHERE rk <= $k
         |   GROUP BY l_returnflag))""".stripMargin
    s"""SELECT o.l_returnflag, o.kmv_orders, p.kmv_parts
       |FROM ${kmv("l_orderkey", "kmv_orders")} o
       |JOIN ${kmv("l_partkey", "kmv_parts")} p USING (l_returnflag)
       |ORDER BY l_returnflag""".stripMargin
  }

  // ---- q50: CUBE / grouping-sets pricing rollup ------------------------
  /** Multi-level rollup in ONE pass: the full
    * (returnflag × linestatus × ship-year) CUBE — all 8 grouping sets,
    * subtotals and the grand total — with GROUPING flags identifying
    * each level. Spark plans this as a single Expand + hash aggregate
    * (one shuffle for every level, vs 8 separate scans if each subtotal
    * were its own query); at 100 TB the Expand factor (8×) is traded
    * against 8 full input scans — the aggregation keys are tiny, so
    * partial map-side aggregation collapses the blowup before the
    * shuffle. Money sums run through the exact DECIMAL patterns
    * ([[Frags.revenue]]) so every level is bit-identical to the oracle;
    * l_quantity is integer-valued and exact in IEEE summation. */
  def q50(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    // the revenue DECIMAL product is computed ONCE per source row,
    // BEFORE the cube: Expand duplicates every input row 8× (one per
    // grouping set), and an aggregate-input expression is evaluated on
    // the expanded stream — inlining the two decimal multiplies there
    // ran them 8× per row (measured 5.1 s → 1.9 s at sf0.1). The
    // oracle needs no change: same per-row product, same exact sum.
    // PRE-AGGREGATE to the finest grouping BEFORE the cube (r8):
    // Expand duplicates its input once per grouping set, so cubing
    // the fact stream pushes 8× the corpus through the aggregate.
    // Every aggregate here is decomposable (SUM / COUNT→SUM of
    // partial counts; quantities are integer-valued doubles and the
    // revenue term is exact DECIMAL, so re-aggregation is
    // order-independent and bit-identical), which makes cube-over-
    // pre-agg algebraically equal to cube-over-facts: the fact
    // stream is read ONCE by a plain two-phase hash agg (~40 finest
    // groups out), and Expand multiplies dozens of rows, not
    // millions. At 100 TB this is the difference between 8× the
    // corpus through Expand and 8× a few hundred rows.
    li.select(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).cast("int").as("ship_year"),
        col("l_quantity"),
        expr("CAST(l_extendedprice AS DECIMAL(12,2)) * " +
          "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))")
          .as("rev_term"))
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(expr("SUM(l_quantity)").as("p_qty"),
        expr("SUM(rev_term)").as("p_rev"),
        count(lit(1)).as("p_n"))
      .cube(col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        grouping(col("ship_year")).cast("int").as("g_yr"),
        expr("SUM(p_qty)").as("sum_qty"),
        expr("CAST(SUM(p_rev) AS DOUBLE)").as("revenue"),
        expr("CAST(SUM(p_n) AS BIGINT)").as("n_rows"))
      .orderBy(col("g_rf"), col("g_ls"), col("g_yr"),
        col("l_returnflag"), col("l_linestatus"), col("ship_year"))
  }

  val q50Sql: String =
    s"""WITH src AS (
       |  SELECT l_returnflag, l_linestatus,
       |    CAST(year(l_shipdate) AS INT) AS ship_year,
       |    l_quantity, l_extendedprice, l_discount
       |  FROM lineitem)
       |SELECT l_returnflag, l_linestatus, ship_year,
       |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       |  CAST(GROUPING(ship_year) AS INT) AS g_yr,
       |  SUM(l_quantity) AS sum_qty,
       |  ${Frags.revenue()} AS revenue,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows
       |FROM src
       |GROUP BY CUBE(l_returnflag, l_linestatus, ship_year)
       |ORDER BY g_rf, g_ls, g_yr, l_returnflag, l_linestatus, ship_year""".stripMargin

  // ---- q51: ordered event funnel (view → click → purchase) -------------
  /** Per-user staged funnel with STRICT event-time ordering AND
    * conversion windows (first-touch attribution): the first view, the
    * first click AFTER that view — counting only if within 1 day —
    * and the first purchase AFTER that click, counting only if within 2
    * days. A click preceding any view does not count, and a
    * too-late next step breaks the funnel (without the windows every
    * user at this event density trivially completes all 3 stages —
    * measured before the windows were added). Output: users per
    * reached depth (0-3) + the exact summed view→purchase conversion
    * time for full-funnel users.
    *
    * 100 TB: three conditional-min aggregations and two joins, ALL
    * keyed on user_id — one co-partitioned shuffle family (AQE reuses
    * the exchange); no windows over raw events, no event-list
    * collection. Conversion times are exact epoch-µs integer sums. */
  def q51(s: SparkSession, d: String): DataFrame = {
    val clickWinUs = 1L * 86400 * 1000000   // view → click
    val buyWinUs = 2L * 86400 * 1000000     // click → purchase
    val e = events(s, d)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
    val c = e.join(v, "user_id")
      .filter(col("event_type") === "click" && col("ts") > col("tv"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
    val p = e.join(c, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("tc"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
    val u = e.select(col("user_id")).distinct()
    u.join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("ok2", col("tc").isNotNull &&
        unix_micros(col("tc")) - unix_micros(col("tv")) <= clickWinUs)
      .withColumn("ok3", col("ok2") && col("tp").isNotNull &&
        unix_micros(col("tp")) - unix_micros(col("tc")) <= buyWinUs)
      .select(
        when(col("ok3"), 3).when(col("ok2"), 2)
          .when(col("tv").isNotNull, 1).otherwise(0).as("depth"),
        when(col("ok3"),
          unix_micros(col("tp")) - unix_micros(col("tv"))).as("conv_us"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("conv_us")).cast("bigint").as("sum_conv_us"))
      .orderBy(col("depth"))
  }

  val q51Sql: String = {
    val clickWinUs = 1L * 86400 * 1000000
    val buyWinUs = 2L * 86400 * 1000000
    s"""WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
       |           WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, MIN(ts) AS tc FROM events e JOIN v USING (user_id)
       |      WHERE event_type = 'click' AND ts > tv GROUP BY 1),
       |p AS (SELECT e.user_id, MIN(ts) AS tp FROM events e JOIN c USING (user_id)
       |      WHERE event_type = 'purchase' AND ts > tc GROUP BY 1),
       |u AS (SELECT DISTINCT user_id FROM events),
       |staged AS (
       |  SELECT
       |    CASE WHEN ok3 THEN 3 WHEN ok2 THEN 2
       |         WHEN tv IS NOT NULL THEN 1 ELSE 0 END AS depth,
       |    CASE WHEN ok3 THEN epoch_us(tp) - epoch_us(tv) END AS conv_us
       |  FROM (
       |    SELECT tv, tc, tp,
       |      (tc IS NOT NULL AND epoch_us(tc) - epoch_us(tv) <= $clickWinUs) AS ok2,
       |      (tc IS NOT NULL AND epoch_us(tc) - epoch_us(tv) <= $clickWinUs
       |       AND tp IS NOT NULL AND epoch_us(tp) - epoch_us(tc) <= $buyWinUs) AS ok3
       |    FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
       |         LEFT JOIN p USING (user_id)))
       |SELECT CAST(depth AS INT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_users,
       |  CAST(SUM(conv_us) AS BIGINT) AS sum_conv_us
       |FROM staged GROUP BY depth ORDER BY depth""".stripMargin
  }

  // ---- q52: cohort retention ------------------------------------------
  /** Daily cohort retention: users are cohorted by the day of their
    * FIRST event; for each (cohort, day-offset) cell, how many of the
    * cohort's users were active that day and what fraction of the
    * cohort that is — the standard growth-analytics triangle (daily
    * grain: the synthetic corpus spans ~5 weeks with every user
    * active every week, so weekly cells saturate at 1.0 — measured).
    *
    * 100 TB: first-touch is one user-keyed min-aggregation; activity
    * is a distinct (user, day) projection; the cell count is one
    * join on user_id (co-partitioned with the first-touch agg) and a
    * small-keyed aggregation. Day arithmetic is exact integer
    * epoch-µs division — no calendar functions whose conventions
    * could diverge across engines. */
  def q52(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    // exact integer day index: floor(epoch_us / 1 day in us)
    val dayOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column = ts =>
      floor(unix_micros(ts) / lit(86400000000L)).cast("bigint")
    val first = e.groupBy(col("user_id"))
      .agg(min(dayOf(col("ts"))).as("cohort_day"))
    val active = e.select(col("user_id"), dayOf(col("ts")).as("dy")).distinct()
    val cohortSize = first.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_n"))
    active.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("dy") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(cohortSize, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        (col("n_active").cast("double") / col("cohort_n")).as("retention"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val q52Sql: String =
    """WITH dy AS (
      |  SELECT user_id,
      |    CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS dy
      |  FROM events),
      |first AS (SELECT user_id, MIN(dy) AS cohort_day FROM dy GROUP BY 1),
      |active AS (SELECT DISTINCT user_id, dy FROM dy),
      |size_ AS (SELECT cohort_day, COUNT(*) AS cohort_n FROM first GROUP BY 1),
      |cells AS (
      |  SELECT f.cohort_day, a.dy - f.cohort_day AS day_offset,
      |    CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
      |  FROM active a JOIN first f USING (user_id)
      |  GROUP BY 1, 2)
      |SELECT c.cohort_day, c.day_offset, c.n_active,
      |  CAST(c.n_active AS DOUBLE) / s.cohort_n AS retention
      |FROM cells c JOIN size_ s USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  // ---- q53: market-basket pair affinity --------------------------------
  /** Frequent pair mining over order baskets: for every pair of parts
    * co-purchased in >= 2 orders, the pair support and its lift
    * (observed co-occurrence vs independence), top 200 by support.
    * The association-rule / "bought together" primitive.
    *
    * 100 TB: the pair space is generated by a SELF-JOIN CO-PARTITIONED
    * ON THE BASKET KEY (one shuffle of the distinct (order, part)
    * projection; never a part×part cross product) and the per-basket
    * fan-out is bounded by basket size squared (TPC-H baskets are <= 7
    * lines). Map-side partial aggregation collapses the pair stream
    * before the support shuffle; the support filter then prunes the
    * singleton long tail (99.7% of pairs at sf0.1) before the item-
    * support joins, which are keyed on part — no skew (parts are
    * near-uniform). Only the top 200 rows leave via TakeOrdered. Lift
    * is exact-integer products with ONE double division, so it is
    * bit-identical across engines. */
  def q53(s: SparkSession, d: String): DataFrame = {
    // ONE basket materialization instead of four executions of the
    // distinct projection (r9 clean-window profile: the self-join
    // form re-ran the distinct for x, y, item support and the order
    // count, plus re-partitioned both join sides on the basket key —
    // 2.1 s best-of vs DuckDB 0.48; this form is ~1.1 s). collect_set
    // IS the distinct; sort_array makes pair order deterministic.
    // (r13 note: a single-pass variant — sentinel/item/pair rows from
    // one explode into ONE groupBy, pinning only the aggregate — was
    // built and MEASURED 2.43 s isolated paired min-of-3 vs this
    // form's 1.9 s class: the struct-array construction per basket
    // costs more than the three separate jobs it saves. Reverted; the
    // house measure-before-adopting rule, again.)
    val baskets = graft.Checkpoints.pin(
      lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts")))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val itemN = baskets.select(explode(col("parts")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
    // pairs are generated NARROWLY inside each basket (posexplode +
    // tail slice — basket-size² bounded, TPC-H baskets ≤ 7), so the
    // only full-data exchange left is the basket groupBy; the pair
    // stream hits map-side partial aggregation before its shuffle.
    val pairs = baskets
      .select(posexplode(col("parts")).as(Seq("i", "part_a")), col("parts"))
      .select(col("part_a"),
        explode(expr("slice(parts, i + 2, size(parts))")).as("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 2)
    pairs
      .join(itemN.select(col("l_partkey").as("part_a"), col("n_item").as("n_a")), "part_a")
      .join(itemN.select(col("l_partkey").as("part_b"), col("n_item").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_pair"),
        ((col("n_pair") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("n_pair").desc, col("part_a"), col("part_b"))
      .limit(200)
  }

  val q53Sql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
      |item AS (SELECT l_partkey, COUNT(*) AS n_item FROM b GROUP BY 1),
      |pairs AS (
      |  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_pair
      |  FROM b x JOIN b y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 2)
      |SELECT p.part_a, p.part_b, p.n_pair,
      |  CAST(p.n_pair * o.n_orders AS DOUBLE) /
      |    CAST(a.n_item * c.n_item AS DOUBLE) AS lift
      |FROM pairs p
      |JOIN item a ON a.l_partkey = p.part_a
      |JOIN item c ON c.l_partkey = p.part_b
      |CROSS JOIN n_orders o
      |ORDER BY n_pair DESC, part_a, part_b
      |LIMIT 200""".stripMargin

  // ---- q54: event-type transition matrix -------------------------------
  /** Per-user event-path transitions (the Markov-edge / Sankey-diagram
    * primitive behind "where do users go next" product analytics):
    * consecutive event pairs inside each user's time-ordered stream,
    * counted per (src, dst) with the conditional transition share
    * P(dst | src), top 20 edges by count. The ordering key is
    * (ts, event_id) so simultaneous events break ties
    * deterministically on both engines.
    *
    * 100 TB: ONE shuffle on user_id for the lead() window (the same
    * partitioning sessionization already pays — at scale these share a
    * stage), then the transition stream collapses in a map-side
    * combined aggregate to at most |event_type|² rows; the per-src
    * totals frame is |event_type| rows and broadcasts into the share
    * join. The share is exact-integer counts with ONE double division,
    * bit-identical across engines. */
  def q54(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tr = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull)
      .select(col("event_type").as("src"), col("dst"))
    // ONE pass over the transition stream (r13 floor shave): n_src is
    // algebraically Σ_dst n(src, dst), so the per-src totals come from
    // the |types|²-row aggregate via a window — the r12 form consumed
    // `tr` twice, which re-executed the scan + lead-window for the
    // broadcast build side (a full second data-proportional job to
    // produce a 5-row frame). Identical results by construction.
    tr.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .withColumn("n_src", sum(col("n")).over(Window.partitionBy(col("src"))))
      .select(col("src"), col("dst"), col("n"),
        (col("n").cast("double") / col("n_src")).as("p"))
      .orderBy(col("n").desc, col("src"), col("dst"))
      .limit(20)
  }

  val q54Sql: String =
    """WITH tr AS (
      |  SELECT event_type AS src,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      |  FROM events),
      |e AS (SELECT src, dst FROM tr WHERE dst IS NOT NULL),
      |by_src AS (SELECT src, COUNT(*) AS n_src FROM e GROUP BY 1)
      |SELECT e.src, e.dst, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(b.n_src) AS p
      |FROM e JOIN by_src b ON e.src = b.src
      |GROUP BY e.src, e.dst
      |ORDER BY n DESC, e.src, e.dst
      |LIMIT 20""".stripMargin

  // ---- q55: peak concurrency (sweep line) ------------------------------
  /** Max concurrent activity per event type — each event opens a
    * half-open 5-minute interval [ts, ts+300 s) and the peak is the
    * high-water mark of the +1/−1 sweep line, the classic
    * interval-overlap counting shape (concurrent sessions, license
    * seats, connection pools). Half-open semantics: an interval ending
    * at t does not overlap one starting at t, so the −1 sorts BEFORE
    * the +1 at equal instants (delta ascending); event_id completes a
    * deterministic total order. The peak itself is order-invariant
    * within a same-(t, delta) run — all deltas share a sign, so only
    * the run's endpoint matters — but the pinned order means both
    * engines walk identical prefixes.
    *
    * 100 TB: ONE shuffle keyed by event_type for the running-sum
    * window; the sweep stream is 2 rows per event of three ints —
    * never the payload. The per-type partition serializes a type's
    * sweep on one task by design (a running max is sequential);
    * at extreme per-type volume the remedy is pack_sequences' two-phase
    * chunked prefix sum (per-chunk partials, then a broadcast offset
    * join), which composes here because max(prefix) distributes over
    * chunk maxima. */
  def q55(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_type"),
      unix_micros(col("ts")).as("t0"), col("event_id"))
    val pts = ev.select(col("event_type"), col("t0").as("t"),
        lit(1).as("delta"), col("event_id"))
      .unionAll(ev.select(col("event_type"),
        (col("t0") + lit(300000000L)).as("t"),
        lit(-1).as("delta"), col("event_id")))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("t"), col("delta"), col("event_id"))
    pts.withColumn("conc", sum(col("delta")).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("conc")).as("peak"),
        sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_events"))
      .orderBy(col("event_type"))
  }

  val q55Sql: String =
    """WITH ev AS (SELECT event_type, epoch_us(ts) AS t0, event_id FROM events),
      |pts AS (
      |  SELECT event_type, t0 AS t, 1 AS delta, event_id FROM ev
      |  UNION ALL
      |  SELECT event_type, t0 + 300000000, -1, event_id FROM ev),
      |run AS (
      |  SELECT event_type, delta,
      |    SUM(delta) OVER (PARTITION BY event_type
      |      ORDER BY t, delta, event_id) AS conc
      |  FROM pts)
      |SELECT event_type, CAST(MAX(conc) AS BIGINT) AS peak,
      |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_events
      |FROM run GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q56: RFM segmentation ------------------------------------------
  /** RFM customer segmentation — the classic marketing cube: per
    * customer, Recency (days since last order, against the dataset's
    * own max date so the query is reproducible), Frequency (order
    * count) and Monetary (exact cents), each cut into quartiles, then
    * the 4×4×4 segment census. Quartiles use ntile(4) under a total
    * order (metric, custkey) so tie placement is identical on both
    * engines; monetary accumulates as ROUND-cents BIGINT (the
    * etl_histogram rule — floor(·100) is off-by-one on IEEE prices).
    *
    * Scale: the windows run over the CUSTOMER DIMENSION (post-
    * aggregation — one row per customer), not facts. At gated SFs the
    * three quartile cuts use ntile(4) global windows (single-partition
    * by nature, fine for a dimension that fits one task); past a
    * footer-count gate the SAME cuts run through [[ntileTwoPhase]] —
    * exact global rank via range-partition + per-partition row_number
    * + broadcast partition offsets, then NTILE's closed-form bucket —
    * which is BIT-IDENTICAL to ntile (same tie splitting, the total
    * order is unique) with no SinglePartition window, so it survives a
    * 1e9-customer dimension. Q56ScaleSpec forces the past-gate path
    * and pins census equality against the ntile twin. */
  def q56(s: SparkSession, d: String): DataFrame =
    // gate at 1M orders: gated SFs (≤150k) keep the ntile windows the
    // oracle replays; the ×10 sweep corpus (1.5M) runs the two-phase
    // path, so its scale row measures the shape that survives growth
    q56Census(q56Quartiles(s, rfmFrame(s, d),
      distributed = graft.Tables.footerRowCount(s, d, "orders") > 1000000L))

  /** The per-customer (recency, frequency, monetary) dimension frame
    * shared by both q56 paths. */
  private[graft] def rfmFrame(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val cust = o.groupBy(col("o_custkey")).agg(
      max(col("o_orderdate")).as("last_dt"),
      count(lit(1)).as("f"),
      expr("SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))").as("m_cents"))
    val anchor = o.agg(max(col("o_orderdate")).as("anchor_dt"))
    cust.crossJoin(broadcast(anchor)).select(
      col("o_custkey"),
      datediff(col("anchor_dt").cast("date"), col("last_dt").cast("date"))
        .as("r_days"),
      col("f"), col("m_cents"))
  }

  /** Quartile-cut the RFM frame on all three metrics; `distributed`
    * selects ntile windows (gated SFs) vs the two-phase exact-rank
    * path (scale). Both produce identical (o_custkey, r_q, f_q, m_q). */
  private[graft] def q56Quartiles(s: SparkSession, rfm: DataFrame,
      distributed: Boolean): DataFrame = {
    val specs = Seq[(String, Seq[Column])](
      ("r_q", Seq(col("r_days"), col("o_custkey"))),
      ("f_q", Seq(col("f").desc, col("o_custkey"))),
      ("m_q", Seq(col("m_cents").desc, col("o_custkey"))))
    if (!distributed)
      specs.foldLeft(rfm) { case (df, (out, sc)) =>
        df.withColumn(out, ntile(4).over(Window.orderBy(sc: _*)))
      }.select("o_custkey", "r_q", "f_q", "m_q")
    else
      specs.map { case (out, sc) =>
        ntileTwoPhase(s, rfm, 4, sc, out).select(col("o_custkey"), col(out))
      }.reduce(_.join(_, Seq("o_custkey")))
  }

  private[graft] def q56Census(q: DataFrame): DataFrame =
    q.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("o_custkey")).as("sample_cust"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))

  /** Exact distributed NTILE(q) under a TOTAL order (sortCols must
    * include a unique tiebreaker) — bit-identical to
    * `ntile(q).over(Window.orderBy(sortCols))` with no SinglePartition
    * window over the DATA: range-partition on the sort key,
    * per-partition row_number, add partition offsets computed IN-PLAN
    * (a prefix-sum window over the ≤ nPart per-partition counts —
    * tiny, never data), then NTILE's closed form over the 1-based
    * global rank: with n rows the first n%q buckets take ceil(n/q)
    * rows, the rest floor(n/q). One plan, one action: both references
    * to the range exchange dedupe through ReuseExchange, so the
    * offsets and the rank pass see the SAME boundaries by
    * construction — no driver collect, no checkpoint dependence (the
    * collect+pin variant was wrong under the noCheckpoint audit
    * passthrough, review r11). */
  private[graft] def ntileTwoPhase(s: SparkSession, df: DataFrame, q: Int,
      sortCols: Seq[Column], out: String): DataFrame = {
    // CORRECTNESS precondition, not an optimization (review r12): the
    // offsets pass and the rank pass are two references to the SAME
    // range exchange, and RangePartitioner samples with an rdd-id-
    // dependent seed — if the exchange were physically executed twice
    // the two passes could see DIFFERENT boundaries and silently
    // mis-bucket. Exchange reuse (plan-canonicalization dedup; under
    // AQE, stage-cache reuse keyed the same way) is what guarantees
    // one physical shuffle. Fail fast if it is disabled; the spec
    // side (Q56ScaleSpec) asserts the executed plan really carries
    // exactly one range exchange with a reused second reference.
    require(s.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "ntileTwoPhase requires spark.sql.exchange.reuse=true: both passes " +
        "must observe one physical range exchange or buckets can diverge")
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val withPid = df.repartitionByRange(nPart, sortCols: _*)
      .withColumn("pid", spark_partition_id())
    val wAll = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrev = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withPid.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .select(col("pid"),
        coalesce(sum(col("c")).over(wPrev), lit(0L)).as("off"),
        sum(col("c")).over(wAll).as("n"))
    val w = Window.partitionBy("pid").orderBy(sortCols: _*)
    withPid.join(broadcast(offs), "pid")
      .withColumn("rnk_g", row_number().over(w).cast("long") + col("off"))
      // integer arithmetic throughout (DIV, not /): with k = n DIV q
      // and r = n % q, rank <= r*(k+1) lands in the first (bigger)
      // buckets, the rest in size-k buckets; GREATEST guards the
      // (unreachable when k=0) else-branch divisor
      .withColumn(out, expr(
        s"""CAST(CASE WHEN rnk_g <= (n % $q) * (n DIV $q + 1)
           |  THEN (rnk_g - 1) DIV (n DIV $q + 1) + 1
           |  ELSE (n % $q) + (rnk_g - (n % $q) * (n DIV $q + 1) - 1)
           |       DIV GREATEST(n DIV $q, 1) + 1
           |  END AS INT)""".stripMargin))
      .drop("pid", "off", "n", "rnk_g")
  }

  val q56Sql: String =
    """WITH cust AS (
      |  SELECT o_custkey, MAX(o_orderdate) AS last_dt,
      |    CAST(COUNT(*) AS BIGINT) AS f,
      |    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS m_cents
      |  FROM orders GROUP BY o_custkey),
      |anchor AS (SELECT MAX(o_orderdate) AS anchor_dt FROM orders),
      |rfm AS (
      |  SELECT o_custkey,
      |    date_diff('day', CAST(last_dt AS DATE), CAST(anchor_dt AS DATE)) AS r_days,
      |    f, m_cents
      |  FROM cust CROSS JOIN anchor),
      |q AS (
      |  SELECT o_custkey,
      |    CAST(NTILE(4) OVER (ORDER BY r_days, o_custkey) AS INTEGER) AS r_q,
      |    CAST(NTILE(4) OVER (ORDER BY f DESC, o_custkey) AS INTEGER) AS f_q,
      |    CAST(NTILE(4) OVER (ORDER BY m_cents DESC, o_custkey) AS INTEGER) AS m_q
      |  FROM rfm)
      |SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  MIN(o_custkey) AS sample_cust
      |FROM q GROUP BY r_q, f_q, m_q
      |ORDER BY r_q, f_q, m_q""".stripMargin

  // ---- q57: sketch-based join cardinality estimation -------------------
  /** Estimate |events ⋈ orders ON user_id = o_custkey| — the optimizer
    * statistic that picks join strategy and shuffle sizing BEFORE
    * paying for the join — from a hash-threshold (bottom-p theta)
    * sample of the key domain, reported beside the exact values so the
    * audit shows its error. The join is genuinely many-to-many (events
    * per user × orders per customer), the case where size estimation
    * is hard and naive NDV math fails.
    *
    * Shape: per-key counts reduce each side to its key cardinality
    * first (partial-aggregated — the only full-width work, and it is
    * what ANALYZE computes anyway); the count frames then join
    * co-partitioned on the key (no extra exchange after the groupBys)
    * and ONE final aggregate produces all eight statistics. A key is
    * sampled iff md5(key) < '20' — a fixed 1/8 hash threshold:
    * deterministic, uniform over the key DOMAIN (heavy keys cannot
    * bias inclusion, unlike row sampling), identical on both engines,
    * so the sample itself replays in the oracle. Estimates are the
    * sampled statistics × 8; join size = 8·Σ_{sampled k∈both}
    * ce(k)·co(k), the unbiased Horvitz-Thompson estimator.
    *
    * 100 TB: the theta-sketch discipline — everything after the
    * per-key counting moves sampled (key, count) pairs, 1/8 of the
    * key domain; tighten p by widening the hex threshold (the
    * one-pass shape is unchanged) and drop the exact columns, which
    * exist here to make the estimator auditable. */
  def q57(s: SparkSession, d: String): DataFrame = {
    val ec = events(s, d).groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("ce"))
    val oc = orders(s, d).groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("co"))
    val j = ec.join(oc, Seq("k"), "full_outer")
    val sampled = md5(col("k").cast("string")) < "20"
    val both = col("ce").isNotNull && col("co").isNotNull
    j.agg(
      count(col("ce")).as("ndv_events_exact"),
      (count(when(sampled, col("ce"))) * 8).as("ndv_events_est"),
      count(col("co")).as("ndv_orders_exact"),
      (count(when(sampled, col("co"))) * 8).as("ndv_orders_est"),
      sum(when(both, 1L).otherwise(0L)).as("inter_exact"),
      (sum(when(both && sampled, 1L).otherwise(0L)) * 8).as("inter_est"),
      sum(when(both, col("ce") * col("co")).otherwise(0L)).as("join_exact"),
      (sum(when(both && sampled, col("ce") * col("co")).otherwise(0L)) * 8)
        .as("join_est"))
  }

  val q57Sql: String =
    """WITH ec AS (
      |  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS ce
      |  FROM events GROUP BY user_id),
      |oc AS (
      |  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS co
      |  FROM orders GROUP BY o_custkey),
      |t AS (
      |  SELECT COALESCE(ec.k, oc.k) AS k, ce, co,
      |    md5(CAST(COALESCE(ec.k, oc.k) AS VARCHAR)) < '20' AS s,
      |    (ce IS NOT NULL AND co IS NOT NULL) AS b
      |  FROM ec FULL OUTER JOIN oc ON ec.k = oc.k)
      |SELECT CAST(COUNT(ce) AS BIGINT) AS ndv_events_exact,
      |  CAST(COUNT(CASE WHEN s THEN ce END) * 8 AS BIGINT) AS ndv_events_est,
      |  CAST(COUNT(co) AS BIGINT) AS ndv_orders_exact,
      |  CAST(COUNT(CASE WHEN s THEN co END) * 8 AS BIGINT) AS ndv_orders_est,
      |  CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS inter_exact,
      |  CAST(SUM(CASE WHEN b AND s THEN 1 ELSE 0 END) * 8 AS BIGINT) AS inter_est,
      |  CAST(SUM(CASE WHEN b THEN ce * co ELSE 0 END) AS BIGINT) AS join_exact,
      |  CAST(SUM(CASE WHEN b AND s THEN ce * co ELSE 0 END) * 8 AS BIGINT)
      |    AS join_est
      |FROM t""".stripMargin

  // ---- q58: sketch set algebra over customer activity sets -------------
  /** Union / intersection / difference cardinalities of two customer
    * activity sets (H1'95 vs H2'95 buyers) from ONE hash-threshold
    * sample of the key domain — the theta-sketch set algebra every
    * sketch warehouse (Druid/Pinot/DataSketches) ships for audience
    * overlap, reported beside the exact values so the audit shows the
    * error. The estimator is q57's discipline: a customer is sampled
    * iff md5(custkey) < '20' (fixed 1/8, uniform over the DOMAIN —
    * activity volume cannot bias inclusion), every set statistic is
    * the sampled count × 8, and the sample replays bit-for-bit in the
    * oracle.
    *
    * Shape: one per-customer aggregate (partial-agg'd shuffle of
    * (key, 2 bools)) computes H1/H2 membership, one final row derives
    * all ten statistics. At 100 TB drop the exact columns and push
    * `md5(key) < '20'` INTO the scan — the shuffle then carries 1/8
    * of the key domain and nothing else changes. */
  def q58(s: SparkSession, d: String): DataFrame = {
    val dt = col("o_orderdate").cast("date")
    val flags = orders(s, d)
      .select(col("o_custkey").as("k"),
        (dt >= lit("1995-01-01").cast("date") &&
          dt <= lit("1995-06-30").cast("date")).as("ia"),
        (dt >= lit("1995-07-01").cast("date") &&
          dt <= lit("1995-12-31").cast("date")).as("ib"))
      .groupBy(col("k"))
      .agg(max(col("ia")).as("a"), max(col("ib")).as("b"))
    val sampled = md5(col("k").cast("string")) < "20"
    def cnt(p: Column, alias: String) = Seq(
      sum(when(p, 1L).otherwise(0L)).as(s"${alias}_exact"),
      (sum(when(p && sampled, 1L).otherwise(0L)) * 8).as(s"${alias}_est"))
    val aggs = cnt(col("a"), "a") ++ cnt(col("b"), "b") ++
      cnt(col("a") || col("b"), "un") ++
      cnt(col("a") && col("b"), "inter") ++
      cnt(col("a") && !col("b"), "only_a")
    flags.agg(aggs.head, aggs.tail: _*)
  }

  val q58Sql: String =
    """WITH flags AS (
      |  SELECT o_custkey AS k,
      |    MAX(CASE WHEN CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
      |      AND DATE '1995-06-30' THEN 1 ELSE 0 END) = 1 AS a,
      |    MAX(CASE WHEN CAST(o_orderdate AS DATE) BETWEEN DATE '1995-07-01'
      |      AND DATE '1995-12-31' THEN 1 ELSE 0 END) = 1 AS b,
      |    md5(CAST(o_custkey AS VARCHAR)) < '20' AS s
      |  FROM orders GROUP BY o_custkey)
      |SELECT
      |  CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS a_exact,
      |  CAST(SUM(CASE WHEN a AND s THEN 1 ELSE 0 END) * 8 AS BIGINT) AS a_est,
      |  CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS b_exact,
      |  CAST(SUM(CASE WHEN b AND s THEN 1 ELSE 0 END) * 8 AS BIGINT) AS b_est,
      |  CAST(SUM(CASE WHEN a OR b THEN 1 ELSE 0 END) AS BIGINT) AS un_exact,
      |  CAST(SUM(CASE WHEN (a OR b) AND s THEN 1 ELSE 0 END) * 8 AS BIGINT) AS un_est,
      |  CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS inter_exact,
      |  CAST(SUM(CASE WHEN a AND b AND s THEN 1 ELSE 0 END) * 8 AS BIGINT) AS inter_est,
      |  CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS only_a_exact,
      |  CAST(SUM(CASE WHEN a AND NOT b AND s THEN 1 ELSE 0 END) * 8 AS BIGINT) AS only_a_est
      |FROM flags""".stripMargin

  // ---- q59: per-group least-squares price ~ quantity fit ---------------
  /** Ordinary-least-squares fit of extendedprice against quantity per
    * returnflag (slope / intercept / correlation) — the regression-
    * aggregate family (REGR_SLOPE / REGR_INTERCEPT / CORR) every
    * warehouse ships for trend panels and anomaly baselines.
    *
    * Exactness discipline: the engines' native regr_* and corr aggregates
    * accumulate DOUBLES in partition order, so their results drift
    * across engines AND across Spark task orderings. Instead the six
    * sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT
    * DECIMAL sums (the Frags discipline — quantity and price are
    * 2-decimal money-class columns, products are exact decimals), and
    * the closed-form fit is ONE identical double expression over them
    * on both engines — bit-exact regardless of aggregation order.
    *
    * The product sums are FLOOR-quantised to WHOLE units before
    * summing (davg9's no-ties discipline): a 4-decimal product sum
    * crosses unscaled 2^53 already at sf0.1 (Σy² ≈ 7.1e16 tenths of a
    * basis point), where DECIMAL→DOUBLE casting double-rounds in
    * engines that divide a hugeint by 10^scale (observed: 1-ulp corr
    * drift at sf0.001) — whereas the floored integer sums stay exactly
    * double-representable through the ×10 sweep (Σy² ≈ 7.1e15 < 2^53)
    * and their casts are exact everywhere. The ≤1-unit-per-row floor
    * perturbs corr in the ~12th digit, identically on both engines.
    *
    * 100 TB: one partial-aggregated shuffle of 6 decimals per group —
    * the cheapest possible regression at any scale (the sufficient-
    * statistic decomposition IS the distributed-regression textbook
    * shape; no second pass, no residual join). */
  private val RegX = "CAST(l_quantity AS DECIMAL(12,2))"
  private val RegY = "CAST(l_extendedprice AS DECIMAL(12,2))"
  def q59(s: SparkSession, d: String): DataFrame = {
    val (x, y) = (RegX, RegY)
    val stats = lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr(s"CAST(SUM($x) AS DOUBLE)").as("sx"),
        expr(s"CAST(SUM($y) AS DOUBLE)").as("sy"),
        expr(s"CAST(SUM(CAST(FLOOR($x * $y) AS DECIMAL(38,0))) AS DOUBLE)").as("sxy"),
        expr(s"CAST(SUM(CAST(FLOOR($x * $x) AS DECIMAL(38,0))) AS DOUBLE)").as("sxx"),
        expr(s"CAST(SUM(CAST(FLOOR($y * $y) AS DECIMAL(38,0))) AS DOUBLE)").as("syy"))
      .withColumn("n", col("n_rows").cast("double"))
    // degenerate (zero-variance) groups answer NULL on BOTH engines
    // (review finding): the floor quantisation can push a constant
    // column's n·Σx² - (Σx)² a hair NEGATIVE, where bare arithmetic
    // diverges cross-engine (Spark non-ANSI divide-by-zero null vs
    // DuckDB inf; sqrt of negative NaN) — undefined fits get an
    // explicit, identical NULL instead
    val fit = stats
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("slope", when(col("vx") > 0,
        (col("n") * col("sxy") - col("sx") * col("sy")) / col("vx")))
    fit.select(col("l_returnflag"), col("n_rows"),
        col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"),
        when(col("vx") > 0 && col("vy") > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("vx")) * sqrt(col("vy")))).as("corr"))
      .orderBy(col("l_returnflag"))
  }

  val q59Sql: String = {
    val (x, y) = (RegX, RegY)
    s"""WITH stats AS (
       |  SELECT l_returnflag,
       |    CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM($x) AS DOUBLE) AS sx,
       |    CAST(SUM($y) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(FLOOR($x * $y) AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
       |    CAST(SUM(CAST(FLOOR($x * $x) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(FLOOR($y * $y) AS DECIMAL(38,0))) AS DOUBLE) AS syy
       |  FROM lineitem GROUP BY l_returnflag),
       |v AS (
       |  SELECT *, n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy
       |  FROM stats),
       |fit AS (
       |  SELECT *, CASE WHEN vx > 0
       |    THEN (n * sxy - sx * sy) / vx END AS slope
       |  FROM v)
       |SELECT l_returnflag, n_rows, slope,
       |  (sy - slope * sx) / n AS intercept,
       |  CASE WHEN vx > 0 AND vy > 0 THEN (n * sxy - sx * sy) /
       |    (SQRT(vx) * SQRT(vy)) END AS corr
       |FROM fit
       |ORDER BY l_returnflag""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_regression" -> (q59 _),
    "q58_set_sketch" -> (q58 _),
    "q57_join_card" -> (q57 _),
    "q55_concurrency" -> (q55 _),
    "q56_rfm" -> (q56 _),
    "q54_transitions" -> (q54 _),
    "q53_market_basket" -> (q53 _),
    "q52_retention" -> (q52 _),
    "q51_funnel" -> (q51 _),
    "q50_cube" -> (q50 _),
    "q49_kmv_distinct" -> (q49 _),
    "q48_order_profile" -> (q48 _),
    "q46_yoy_growth" -> (q46 _),
    "q47_share_of_total" -> (q47 _),
    "q41_moving_avg" -> (q41 _),
    "q42_mode" -> (q42 _),
    "q43_range_count" -> (q43 _),
    "q44_rolling_active" -> (q44 _),
    "q45_bloom_prefilter" -> (q45 _))

  val oracles: Map[String, String] = Map(
    "q59_regression" -> q59Sql,
    "q58_set_sketch" -> q58Sql,
    "q57_join_card" -> q57Sql,
    "q55_concurrency" -> q55Sql,
    "q56_rfm" -> q56Sql,
    "q54_transitions" -> q54Sql,
    "q53_market_basket" -> q53Sql,
    "q52_retention" -> q52Sql,
    "q51_funnel" -> q51Sql,
    "q50_cube" -> q50Sql,
    "q49_kmv_distinct" -> q49Sql,
    "q48_order_profile" -> q48Sql,
    "q46_yoy_growth" -> q46Sql,
    "q47_share_of_total" -> q47Sql,
    "q41_moving_avg" -> q41Sql,
    "q42_mode" -> q42Sql,
    "q43_range_count" -> q43Sql,
    "q44_rolling_active" -> q44Sql,
    "q45_bloom_prefilter" -> q45Sql)
}

