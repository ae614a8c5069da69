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

  /** Small-files compaction: rewrite the parquet files CURRENTLY in a
    * flat prefix into ceil(bytes/targetBytes) files. Streaming ingest
    * and per-batch loads accumulate thousands of small files; at scale
    * every one costs a task launch, a footer read, and an object-store
    * request per scan, so periodic compaction is part of operating the
    * warehouse.
    *
    * Semantics, explicitly:
    *  - operates on the EXPLICIT file list snapshotted at entry; files
    *    landed concurrently after the snapshot are untouched and
    *    survive.
    *  - compacted files are moved IN before the snapshotted originals
    *    are deleted, so readers may transiently see duplicates, never
    *    missing rows; a crash in that window leaves duplicates that
    *    must be reconciled (this utility is filesystem-level — for
    *    transactional compaction put a table format in front).
    *  - hive-partitioned layouts (key=value dirs) are refused: compact
    *    each leaf partition directory instead, or the partition layout
    *    (and its pruning) would be silently flattened.
    *  - every delete/rename result is checked; an empty prefix is a
    *    no-op returning (0, 0).
    *
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listing = fs.listStatus(root)
    require(!listing.exists(s => s.isDirectory && s.getPath.getName.contains("=")),
      s"$path is hive-partitioned; compact leaf partition directories individually")
    val before = listing.filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")).toSeq
    if (before.isEmpty) return (0, 0)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val staging = new Path(path + "_compacting")
    if (fs.exists(staging))
      require(fs.delete(staging, true), s"cannot clear stale $staging")
    spark.read.parquet(before.map(_.getPath.toString): _*)
      .repartition(nOut)
      .write.mode("overwrite").parquet(staging.toString)
    val compacted = fs.listStatus(staging).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")).toSeq
    // move in first (duplicate window), then delete the snapshot
    val tag = System.nanoTime()
    compacted.zipWithIndex.foreach { case (f, i) =>
      val dest = new Path(root, f"compacted_${tag}%x_$i%05d.parquet")
      require(fs.rename(f.getPath, dest), s"rename ${f.getPath} -> $dest failed")
    }
    before.foreach(f =>
      require(fs.delete(f.getPath, false), s"delete ${f.getPath} failed"))
    require(fs.delete(staging, true), s"cannot remove $staging")
    (before.size, compacted.size)
  }
}
