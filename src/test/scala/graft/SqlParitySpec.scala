package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The user-facing SQL-TEXT surface, swept over the WHOLE analytics
  * family (r12 verdict item 2): every q* query's SQL text
  * ([[graft.queries.SqlSurface.textFor]] — the portable oracle text,
  * or its Spark-dialect twin where the dialects diverge) must execute
  * through `spark.sql` over the registered views and produce the SAME
  * result as the DataFrame plan. This is reachability, not a second
  * engine: Spark has one optimizer, so text and DataFrame compile to
  * the same plans — the gate proves a warehouse user can type SQL for
  * every analytics query with zero Scala. */
class SqlParitySpec extends AnyFunSuite {
  import SparkTestSession._

  /** Canonical row set: columns sorted by name (the driver-gate
    * convention), cells rendered type-stably. Doubles print at 9
    * significant digits — text-vs-DataFrame plans can differ in float
    * reduction order only where the query itself is order-sensitive,
    * which the money-exact Frags patterns already avoid. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toIndexedSeq
      .map(_.toSeq.map {
        case null => "∅"
        case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
        case f: Float => f"${f.toDouble}%.9e"
        case x: Double => f"$x%.9e"
        case x => x.toString
      }.mkString("\u0001"))
      .sorted
  }

  test("every analytics query (q1..q59 + variants) runs as SQL text with identical results") {
    val names = SparkEntry.queries.keys.filter(_.matches("q\\d+.*")).toSeq.sorted
    assert(names.size >= 60, s"analytics family shrank? found ${names.size}")
    graft.Tables.registerViews(spark, sf)
    graft.GraftFunctions.register(spark)
    val failures = names.flatMap { name =>
      try {
        val viaText = canon(spark.sql(graft.queries.SqlSurface.textFor(name)))
        val viaDf = canon(SparkEntry.queries(name)(spark, sf))
        if (viaText == viaDf) None
        else if (viaText.size != viaDf.size)
          Some(s"$name: row counts differ text=${viaText.size} df=${viaDf.size}")
        else {
          val i = viaText.zip(viaDf).indexWhere(p => p._1 != p._2)
          Some(s"$name: first differing row #$i\n  text: ${viaText(i).take(200)}\n  df:   ${viaDf(i).take(200)}")
        }
      } catch {
        case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(2).mkString(" | ").take(300)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${names.size} analytics queries not reachable as SQL text:\n" +
        failures.mkString("\n"))
  }
}
