package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for pathological key distributions at scale
  * (SURVEY.md §4): explicit salting for skewed keys (when AQE's
  * runtime skew-join split isn't available or the skew is in a
  * broadcast-ineligible dimension), and bucketed co-located joins
  * that eliminate the shuffle entirely for repeated fact-fact joins.
  */
object ScaleJoins {

  /** Salted inner equi-join: the skewed (big) side gets a
    * deterministic salt derived from its row content; the small side
    * is replicated once per salt value. Result is identical to
    * `big.join(small, key)` — the salt only spreads one hot key over
    * `saltFactor` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    val bigCols = big.columns
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(bigCols.map(col).toIndexedSeq: _*)), lit(saltFactor))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write both sides bucketed+sorted by the join key so subsequent
    * joins are shuffle-free (SortMergeJoin reads co-located buckets).
    * Returns the bucketed tables re-read from the catalog. */
  def bucketize(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, buckets: Int, leftName: String, rightName: String): (DataFrame, DataFrame) = {
    def save(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"${spark.conf.get("spark.sql.warehouse.dir")}/$name")
        .saveAsTable(name)
    save(left, leftName)
    save(right, rightName)
    (spark.table(leftName), spark.table(rightName))
  }
}
