package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Small-files compaction: rewrite a parquet prefix into
    * ceil(bytes/targetBytes) files. Streaming ingest and per-batch
    * loads accumulate thousands of small files; at scale every one
    * costs a task launch, a footer read, and an object-store request
    * per scan, so periodic compaction is part of operating the
    * warehouse. Rewrites via a staging dir then swaps, so a reader
    * never sees a half-written prefix; the swap itself is the
    * object-store-specific step (rename here; copy+delete on S3).
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val before = parquetFiles(hadoopPath)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val staging = new org.apache.hadoop.fs.Path(path + "_compacting")
    spark.read.parquet(path).repartition(nOut)
      .write.mode("overwrite").parquet(staging.toString)
    val nAfter = parquetFiles(staging).size
    fs.delete(hadoopPath, true)
    fs.rename(staging, hadoopPath)
    (before.size, nAfter)
  }
}
