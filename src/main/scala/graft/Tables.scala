package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-generated TPC-H-ish testdata.
  *
  * Mirrors the reference's parquet ingestion surface
  * (reference: src/parquet_ops.rs:16-55) as a plain multi-path Spark
  * parquet scan: column pruning and predicate pushdown are delegated to
  * Catalyst/the parquet DataSource rather than hand-rolled row readers.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-(session, dir, content) memo of the RESOLVED base-table frames
    * (r14 optimization, guide §1.2-1/§6 — "shared scan relations"):
    * every query construction previously paid a fresh
    * `spark.read.parquet` per table it touches — a driver parquet
    * footer read for schema inference plus a new file index, ~20-60 ms
    * each, 1-3 tables per query × 210 queries ≈ 10-20 s of every cold
    * session. The memo reuses the resolved PLAN (schema + file
    * listing) only; every action still computes from the parquet
    * input — no rows, results or intermediates are cached. Keys:
    * weak session reference (the viewsRegistered precedent — never
    * pin a stopped session), plus [[SourceKey]] content fingerprint so
    * a regenerated table (the ScaleUp/amp scratch dirs) misses instead
    * of serving a stale file listing. */
  private val frameMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String, Long), DataFrame]]())

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = frameMemo.synchronized {
      var m = frameMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String, Long), DataFrame]()
        frameMemo.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((dir, name, SourceKey.of(dir, name)),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Register every testdata table as a temp view so the whole surface
    * is reachable from `spark.sql(...)` as well as the DataFrame API.
    * Memoized per (session, dir): re-registering costs ~10 footer
    * reads (~0.5 s) and the views are session-global state anyway —
    * only a DIFFERENT dir (the ScaleUp x1/xR alternation) re-binds. */
  private val viewsRegistered = java.util.Collections.synchronizedMap(
    // weak keys: the memo must never pin a stopped session (and its
    // SessionState) for the JVM lifetime — review r12
    new java.util.WeakHashMap[SparkSession, String]())

  def registerViews(s: SparkSession, d: String): Unit =
    viewsRegistered.synchronized {
      if (viewsRegistered.get(s) != d) {
        All.foreach { n =>
          val df = if (n == "events") events(s, d) else t(s, d, n)
          df.createOrReplaceTempView(n)
        }
        viewsRegistered.put(s, d): Unit
      }
    }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** The ns→µs conversion for TIMESTAMP(NANOS) parquet files surfaced
    * as a nanos long via `nanosAsLong` — truncate to microseconds
    * exactly (integer division; a double roundtrip would lose precision
    * at 1e18). DuckDB's TIMESTAMP_NS→µs truncation matches. Shared
    * verbatim with the streaming source (Streams.eventStream) so the
    * truncation semantics can't drift. */
  val EventTsFromNanosExpr = "timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"

  /** Normalise a scanned events frame so `ts` is always TIMESTAMP
    * (with-tz, µs), whatever unit/annotation the generator wrote:
    *  - LongType: TIMESTAMP(NANOS) surfaced via `nanosAsLong` → exact
    *    ns→µs truncation;
    *  - TIMESTAMP_NTZ: stored µs without UTC annotation → cast; the
    *    session is pinned UTC so the cast is value-preserving and the
    *    DuckDB oracle's `epoch_us(ts)` agrees (and `withWatermark`
    *    requires TIMESTAMP, not NTZ);
    *  - TimestampType: pass through. */
  def adaptEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr(EventTsFromNanosExpr))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported stored type $other; expected " +
          "TIMESTAMP(NANOS)-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    // harmless when ts is a real timestamp; required when it's NANOS
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    adaptEventTs(t(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Exact row count of `$dir/$name.parquet` read from the parquet
    * FOOTERS on the driver — no Spark job at all, so the self-tuning
    * rules (minhash band rows, embedding bits, the pagerank broadcast
    * gate) cost file-metadata reads, not a scheduled count() action
    * (~0.1-0.4 s each at local[32], and a full stage round-trip on a
    * real cluster). Works for a single file or a directory of part
    * files. Scale note: footer reads are per-file driver IO — at a
    * 100k-file table prefer the catalog/statistics path; the tuning
    * rules only need order-of-magnitude, so even sampling the file
    * list would do. */
  def footerRowCount(s: SparkSession, dir: String, name: String): Long =
    // process-lifetime memo keyed by content fingerprint (r14): the
    // self-tuning rules (minhash band rows, semantic k, amp factor)
    // re-derive this constant on every query construction — a footer
    // open per call. SourceKey in the key makes a regenerated table
    // (length/mtime change) miss instead of serving a stale count.
    footerCountMemo.computeIfAbsent((dir, name, SourceKey.of(dir, name)),
      _ => footerRowCountUncached(s, dir, name))

  private val footerCountMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long), Long]()

  private def footerRowCountUncached(s: SparkSession, dir: String, name: String): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = s.sessionState.newHadoopConf()
    val f = new java.io.File(s"$dir/$name.parquet")
    val files =
      if (f.isDirectory)
        f.listFiles.filter(x => x.isFile && x.getName.endsWith(".parquet"))
      else Array(f)
    files.map { x =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(x.getAbsolutePath), conf))
      try r.getRecordCount finally r.close()
    }.sum
  }
}
