package graft.sinks

import org.apache.spark.sql.DataFrame

/** Parquet output for pipeline results (the reference only writes to
  * Postgres; a Spark-native engine also lands curated/deduplicated
  * corpora back on the object store).
  *
  * `partitionBy` columns become directory partitions, which at 100 TB
  * is what makes downstream reads prunable (partition filters skip
  * whole directories before any footer is opened). `maxRecordsPerFile`
  * bounds file sizes so a skewed partition can't produce one
  * multi-GB file.
  */
object ParquetSink {
  def write(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L,
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }
}
