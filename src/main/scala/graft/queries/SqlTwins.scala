package graft.queries

/** Spark-dialect SQL for analytics queries whose portable
  * (DuckDB-runnable) oracle text uses syntax Spark's parser or
  * function registry rejects. Two layers, both pinned by
  * SqlParitySpec (every analytics name's text executes through
  * `spark.sql` and must equal the DataFrame plan's result):
  *
  *  - [[toSpark]]: token-level translation for pure FUNCTION-NAME
  *    divergences — same argument shapes, same semantics, different
  *    spelling. Identity on the ~2/3 of texts that are verbatim
  *    bi-dialect.
  *  - [[texts]]: hand twins for the few STRUCTURAL divergences
  *    (generator placement, IGNORE NULLS position) a token map can't
  *    express.
  */
object SqlTwins {

  /** DuckDB→Spark function-name translation (applied to oracle texts
    * that have no hand twin):
    * epoch_us→unix_micros, quantile_cont→percentile (both exact
    * linear-interpolation percentiles), json_extract_string→
    * get_json_object (same path syntax), VARCHAR→STRING,
    * date_diff('day',…)→date_diff(DAY,…) (Spark wants the unit
    * unquoted). */
  def toSpark(sql: String): String = sql
    .replaceAll("(?i)epoch_us\\(", "unix_micros(")
    .replaceAll("(?i)quantile_cont\\(", "percentile(")
    .replaceAll("(?i)json_extract_string\\(", "get_json_object(")
    .replaceAll("(?i)AS VARCHAR\\)", "AS STRING)")
    .replaceAll("(?i)date_diff\\('day',", "date_diff(DAY,")

  import Frags.dsum6

  val texts: Map[String, String] = Map(
    // DuckDB puts IGNORE NULLS inside the call parens; Spark takes it
    // between the call and OVER
    "q24_asof_join" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  CAST(clicked_at AS TIMESTAMP) AS clicked_at
        |FROM (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END) IGNORE NULLS
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS clicked_at
        |  FROM events)
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, ts, event_id""".stripMargin,
    // UNNEST(generate_series(…)) inside an expression → Spark's
    // explode(sequence(…)) as a top-level generator
    "q37_gap_fill" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
         |    ${dsum6("value")} AS sum_value
         |  FROM events GROUP BY 1),
         |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
         |days AS (SELECT explode(sequence(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds)
         |SELECT d.day AS day, COALESCE(n, 0) AS n,
         |  COALESCE(sum_value, 0.0) AS sum_value
         |FROM days d LEFT JOIN daily USING (day)
         |ORDER BY day""".stripMargin,
    // DuckDB's list_reduce hex-digit fold → Spark's conv(hex, 16, 10)
    "q49_kmv_distinct" -> {
      val k = 256
      def kmv(valCol: String, alias: String): String =
        s"""(SELECT l_returnflag,
           |  CASE WHEN cnt < $k THEN cnt
           |       ELSE CAST(FLOOR((${k - 1}.0) /
           |         (CAST(conv(substr(kth,1,15), 16, 10) AS BIGINT) / 1152921504606846976.0)) AS BIGINT)
           |  END AS $alias
           | FROM (
           |   SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt,
           |     MAX(CASE WHEN rk = $k THEN h END) AS kth
           |   FROM (
           |     SELECT l_returnflag, h,
           |       ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
           |     FROM (SELECT DISTINCT l_returnflag, md5(CAST($valCol AS STRING)) AS h
           |           FROM (SELECT DISTINCT l_returnflag, $valCol FROM lineitem)))
           |   WHERE rk <= $k
           |   GROUP BY l_returnflag))""".stripMargin
      s"""SELECT o.l_returnflag, o.kmv_orders, p.kmv_parts
         |FROM ${kmv("l_orderkey", "kmv_orders")} o
         |JOIN ${kmv("l_partkey", "kmv_parts")} p USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin
    },
    // LATERAL (SELECT unnest(…)) → LATERAL VIEW explode(sequence(…))
    "q44_rolling_active" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
        |  FROM events),
        |days AS (SELECT DISTINCT d AS day FROM ud),
        |cover AS (
        |  SELECT user_id, d + i * INTERVAL 1 DAY AS day
        |  FROM ud LATERAL VIEW explode(sequence(0, 6)) g AS i)
        |SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_7d
        |FROM cover JOIN days USING (day)
        |GROUP BY day
        |ORDER BY day""".stripMargin)
}
