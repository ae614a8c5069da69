package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.TypeMapping
import graft.sources.ParquetSource

/** Oracle-checked queries exercising the reference ETL surface
  * (SURVEY.md §2.1) through the real modules: field projection
  * (ParquetSource), alias renaming, and the converters.rs type matrix
  * (TypeMapping). The JDBC sink + work-list loop are spec-tested
  * against embedded Derby (no Postgres in the oracle environment).
  */
object EtlQueries {

  /** desired_fields projection in request order (pruned scan). */
  def projection(s: SparkSession, d: String): DataFrame =
    ParquetSource.selectFields(Tables.lineitem(s, d),
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val projectionSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** parquet_to_db alias map applied as a rename-only projection. */
  def rename(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("balance"))
      .orderBy(col("customer_id"))

  val renameSql: String =
    """SELECT c_custkey AS customer_id, c_name AS customer_name,
      |  c_mktsegment AS segment, c_acctbal AS balance
      |FROM customer
      |ORDER BY customer_id""".stripMargin

  /** The converters.rs cast matrix through TypeMapping: int widening,
    * bool→smallint(1/0), date→"YYYY-mm-dd" text. */
  def cast(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey"),
      (col("o_orderstatus") === "O").as("is_open"),
      col("o_orderdate").cast("date").as("odate"))
    TypeMapping.castTo(base, Map(
      "o_orderkey" -> "bigint",
      "is_open" -> "smallint",
      "odate" -> "varchar"))
      .orderBy(col("o_orderkey"))
  }

  val castSql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderstatus = 'O' AS SMALLINT) AS is_open,
      |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_projection" -> (projection _),
    "etl_rename" -> (rename _),
    "etl_cast" -> (cast _))

  val oracles: Map[String, String] = Map(
    "etl_projection" -> projectionSql,
    "etl_rename" -> renameSql,
    "etl_cast" -> castSql)
}
