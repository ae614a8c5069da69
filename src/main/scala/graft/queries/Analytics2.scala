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

  // ---- q22: HLL approximate distinct ----------------------------------
  // The HLL estimates themselves are engine-specific (sketch hash +
  // register layout), so they can't be hash-compared — but the ≤5%
  // error CONTRACT can: emit the exact distincts (oracle-comparable)
  // plus a boolean that both estimates landed within 5% of exact. The
  // oracle asserts TRUE, turning the former rows-only row into a full
  // hash gate that numerically checks the bound.
  // Plan note: the sketches and the two exact distincts are computed
  // as THREE separate single-distinct aggregates joined on the 3-row
  // group key, NOT one multi-distinct agg — two countDistinct on
  // different children force an Expand (row multiplication) and, mixed
  // with the imperative HLL aggregates, a SortAggregate fallback
  // (measured 52 s vs ~2 s at sf0.1; same trap as etl_stats, SURVEY
  // §6). Each single-distinct agg keeps the two-phase hash shape with
  // map-side partial dedup; the joins are broadcasts of ≤3 rows.
  def q22(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
    val exactOrders = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
    val exactParts = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    approx.join(broadcast(exactOrders), "l_returnflag")
      .join(broadcast(exactParts), "l_returnflag")
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * 0.05 &&
          abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.05)
          .as("within_5pct"))
      .orderBy(col("l_returnflag"))
  }

  val q22Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_5pct
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

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

  // ---- q23a: sketch percentiles with a rank-error gate -----------------
  // The SCALE path for q23: exact `percentile` buffers whole groups in
  // the agg buffer (memory-unbounded at 100 TB); approx_percentile is
  // a bounded GK-style sketch whose buffer is O(accuracy) regardless
  // of group size. The sketch VALUES are engine/merge-order-specific,
  // so — the q22 pattern — the gated output carries the deterministic
  // group stats plus booleans asserting the sketch's rank-error
  // CONTRACT: the returned element's rank interval [#{x<v}, #{x≤v}]
  // must intersect [p·n − tol, p·n + tol] with tol = n/accuracy + 2
  // (the +2 absorbs rank-convention off-by-ones; GK guarantees
  // |rank − p·n| ≤ n/accuracy always, so the flag is TRUE under any
  // partitioning). Two passes over orders — the sketch must finish
  // before ranks of its outputs can be counted — joined via a ≤3-row
  // broadcast; both keep the two-phase hash-agg shape.
  def q23a(s: SparkSession, d: String): DataFrame = {
    val accuracy = 100
    val o = orders(s, d).select(col("o_orderstatus"), col("o_totalprice"))
    val ap = o.groupBy(col("o_orderstatus"))
      .agg(expr(s"approx_percentile(o_totalprice, array(0.5, 0.9), $accuracy)")
        .as("ap"))
    def inBound(p: Double, lt: String, le: String) = {
      val tol = col("n_orders").cast("double") / accuracy + 2.0
      val target = col("n_orders").cast("double") * p
      (col(le).cast("double") >= target - tol) &&
        (col(lt).cast("double") <= target + tol)
    }
    o.join(broadcast(ap), "o_orderstatus")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        sum(when(col("o_totalprice") < col("ap")(0), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("o_totalprice") <= col("ap")(0), 1L).otherwise(0L)).as("le50"),
        sum(when(col("o_totalprice") < col("ap")(1), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("o_totalprice") <= col("ap")(1), 1L).otherwise(0L)).as("le90"))
      .select(col("o_orderstatus"), col("n_orders"), col("lo"), col("hi"),
        inBound(0.5, "lt50", "le50").as("p50_in_bound"),
        inBound(0.9, "lt90", "le90").as("p90_in_bound"))
      .orderBy(col("o_orderstatus"))
  }

  val q23aSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
      |  TRUE AS p50_in_bound, TRUE AS p90_in_bound
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

  // ---- q25: range join (errors within 5 min before a purchase) ---------
  // The naive plan is a per-user join with a range filter — fine here,
  // quadratic on hot users at scale. Instead both sides are binned to
  // the range width (300 s): a candidate error can only live in the
  // purchase's bin or the one before, so the purchase side explodes to
  // exactly 2 candidate bins and the join is a plain equi-join on
  // (user_id, bin). Join input grows 2×; candidate pairs shrink from
  // |user-pairs| to only near-in-time ones.
  def q25(s: SparkSession, d: String): DataFrame = {
    val widthUs = 300000000L // 5 min in µs
    val ev = events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("p_us"),
        explode(array(expr(s"us DIV $widthUs") - 1,
          expr(s"us DIV $widthUs"))).as("bin"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        col("us").as("e_us"),
        expr(s"us DIV $widthUs").as("bin"))
    p.join(e, Seq("user_id", "bin"))
      .filter(col("p_us") - col("e_us") >= 0 &&
        col("p_us") - col("e_us") <= widthUs)
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        (col("p_us") - col("e_us")).as("gap_us"))
      .orderBy(col("user_id"), col("purchase_id"), col("error_id"))
  }

  val q25Sql: String =
    """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
      |  e.event_id AS error_id,
      |  epoch_us(p.ts) - epoch_us(e.ts) AS gap_us
      |FROM events p
      |JOIN events e ON p.user_id = e.user_id
      |  AND p.event_type = 'purchase' AND e.event_type = 'error'
      |  AND epoch_us(p.ts) - epoch_us(e.ts) BETWEEN 0 AND 300000000
      |ORDER BY user_id, purchase_id, error_id""".stripMargin

  // ---- q26: latest-per-key dedup (upsert-latest pattern) ---------------
  def q26(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"))
      .orderBy(col("user_id"))
  }

  val q26Sql: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type
      |FROM (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ---- q27: deterministic hash-stratified sample -----------------------
  // Content-hash sampling instead of RNG: reproducible across engines,
  // runs, and partitionings (md5 first hex char in 0..3 = 25%).
  def q27(s: SparkSession, d: String): DataFrame = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 1)
    documents(s, d)
      .filter(bucket.isin("0", "1", "2", "3"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("chars"))
      .orderBy(col("lang"))
  }

  val q27Sql: String =
    """SELECT lang, COUNT(*) AS n_sampled,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM documents
      |WHERE SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_latest_per_key" -> (q26 _),
    "q27_hash_sample" -> (q27 _),
    "q21_count_distinct" -> (q21 _),
    "q22_approx_distinct" -> (q22 _),
    "q23_percentile" -> (q23 _),
    "q23_percentile_approx" -> (q23a _),
    "q24_asof_join" -> (q24 _),
    "q25_range_join" -> (q25 _))

  val oracles: Map[String, String] = Map(
    "q26_latest_per_key" -> q26Sql,
    "q27_hash_sample" -> q27Sql,
    "q21_count_distinct" -> q21Sql,
    "q22_approx_distinct" -> q22Sql,
    "q23_percentile" -> q23Sql,
    "q23_percentile_approx" -> q23aSql,
    "q24_asof_join" -> q24Sql,
    "q25_range_join" -> q25Sql)
}
