package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B harness (not part of the shipped surface): measures the two
  * remedies for a skewed fact⋈dim shuffle join — q36's explicit
  * content-derived salt (operators/ScaleJoins.saltedJoin) vs AQE's
  * runtime skew-join split (spark.sql.adaptive.skewJoin) — against the
  * unmitigated plain join, on a synthetic hot-key fact built from sf0.1
  * lineitem.
  *
  * Skew model: lineitem amplified 20× (~12M rows at sf0.1), then ~70%
  * of rows rewritten deterministically onto ONE part key, so one
  * shuffle partition holds ~8.4M join rows while the median holds
  * ~115k.
  * Broadcast is disabled for the measurement: a broadcastable dim
  * removes the shuffle entirely (and IS the production first choice —
  * this harness measures the case where the dim doesn't fit).
  *
  * AQE's splitter only fires when the skewed partition crosses its
  * byte thresholds, so those are lowered to match the synthetic size
  * (at 100 TB the defaults fire unmodified).
  *
  * Usage: sbt "runMain graft.SkewAB [sfDir]" — prints one JSON line
  * with per-variant seconds (min of 2 runs) and the common result
  * checksum proving all three plans agree.
  */
object SkewAB {

  private def skewedFact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .withColumn("rep", explode(sequence(lit(0), lit(19))))
      .withColumn("l_partkey",
        when(pmod(xxhash64(col("l_partkey"), col("l_extendedprice"), col("rep")),
          lit(100)) < 70, lit(1L)).otherwise(col("l_partkey")))
      .drop("rep")

  private def agg(joined: DataFrame): DataFrame =
    joined.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    val dim = Tables.part(spark, sfDir).select(col("p_partkey").as("l_partkey"), col("p_brand"))
    // freeze the synthetic fact so every variant reads identical bytes
    // (and skew injection isn't re-timed per variant)
    val factPath = s"${sys.props("java.io.tmpdir")}/graft_skew_fact"
    skewedFact(spark, sfDir).write.mode("overwrite").parquet(factPath)

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    def variant(name: String, aqe: Boolean, skew: Boolean, salted: Boolean): (String, Double, Long) = {
      conf("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf("spark.sql.adaptive.enabled", aqe.toString)
      conf("spark.sql.adaptive.skewJoin.enabled", skew.toString)
      // the post-join groupBy re-shuffles, which by default vetoes the
      // skew split; force it (the aggregate is tiny vs the join)
      conf("spark.sql.adaptive.forceOptimizeSkewedJoin", skew.toString)
      // synthetic partitions are ~10s of MB; production defaults (256M)
      // are tuned for real executors
      conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      val fact = spark.read.parquet(factPath)
      val joined =
        if (salted) graft.operators.ScaleJoins.saltedJoin(fact, dim, "l_partkey", saltFactor = 8)
        else fact.join(dim, Seq("l_partkey"))
      val out = agg(joined)
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        out.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      // agreement proof must be add-order-independent: the timed plan's
      // double `revenue` sums in partition order, which differs between
      // the salted and unsalted shuffles — so checksum on the exact
      // micro-unit decimal sum (per-row product is plan-invariant)
      val check = joined.groupBy(col("p_brand")).agg(
        count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e6)
          .cast("decimal(28,0)")).as("rev_u"))
      val checksum = check.agg(xxhash64(
        sort_array(collect_list(concat_ws("|", col("p_brand"), col("n_items"),
          col("rev_u").cast("string"))))).as("h")).head().getLong(0)
      (name, secs, checksum)
    }

    val rows = Seq(
      variant("plain_smj", aqe = false, skew = false, salted = false),
      variant("aqe_skew_join", aqe = true, skew = true, salted = false),
      variant("salted_x8", aqe = false, skew = false, salted = true),
      // salt under AQE too: the two remedies compose (AQE coalesces the
      // salted sub-partitions it no longer needs to split)
      variant("salted_x8_aqe", aqe = true, skew = true, salted = true))
    require(rows.map(_._3).distinct.size == 1,
      s"variants disagree: ${rows.map(r => r._1 -> r._3)}")
    val js = rows.map { case (n, s, _) => s""""$n":$s""" }.mkString("{", ",", "}")
    println(s"""{"metric":"skew_ab","unit":"sec","variants":$js,"checksum":${rows.head._3},"sf":"$sfDir"}""")
    spark.stop()
  }
}
