package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fail loudly and FIRST on testdata schema drift — one named-column
    // error beats 19 scattered DATATYPE_MISMATCH crashes (round 5)
    Preflight.assertClean(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // Dev knob: SPARK_GRAFT_ONLY=q30_lead_lag,q31_ntile restricts the dump
    // (the driver leaves it unset and always dumps everything).
    val selected = SparkEntry.parseOnly() match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    // Record what this run attempts and what crashed, so the gate can
    // tell "not selected" (skip) from "selected but threw" (FAIL) —
    // without this a crashed query's missing output reads as a benign
    // partial-run skip and the gate exits green. Written TWICE: the
    // pre-loop sentinel marks every selected query as failed, so a
    // process-level death mid-run (OOM, kill) can't leave a previous
    // run's green marker in the reused outDir — only a run that
    // reaches the end rewrites it with the true failure list.
    def jsonArr(xs: Seq[String]): String =
      xs.sorted.map("\"" + _ + "\"").mkString("[", ", ", "]")
    def writeAttempted(failedNow: Seq[String]): Unit =
      Files.writeString(Paths.get(s"$outDir/attempted.json"),
        s"""{"attempted": ${jsonArr(selected.keys.toSeq)}, "failed": ${jsonArr(failedNow)}}""")
    writeAttempted(selected.keys.toSeq)
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      // sweeping: free each query's pinned checkpoint blocks once its
      // dump lands — the 100+-query session footprint stays flat
      try Checkpoints.sweeping(spark) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    writeAttempted(failed.toSeq)
    // dedup_minhash's oracle equality is recall-conditional (LSH): the
    // margin between the threshold (0.5) and the weakest true pair is
    // what makes P(miss) negligible, and a new corpus could shrink it
    // with no code change. Measure and emit it EVERY run so the erosion
    // is visible in the verify output before it flips the oracle.
    if (selected.contains("dedup_minhash")) {
      try {
        val j = graft.operators.Dedup.jaccardPairsAbove(spark, sfDir, 0.5)
          .select("jaccard").collect().map(_.getDouble(0))
        val margin = if (j.isEmpty) 1.0 else j.min
        // worst pair evades all b bands of r rows with prob (1 - J^r)^b
        // — r from the SELF-TUNING rule at this corpus size (r8), so
        // the emitted risk tracks the geometry actually run
        val nDocs = graft.Tables.footerRowCount(spark, sfDir, "documents")
        val r = graft.operators.Dedup.minhashBandRowsFor(nDocs)
        val b = graft.operators.Dedup.minhashBandsFor(r)
        val pMiss = math.pow(1.0 - math.pow(margin, r.toDouble), b.toDouble)
        val body = f"""{"min_true_pair_jaccard": $margin%.6f, "threshold": 0.5, "bands": $b, "band_rows": $r, "p_miss_worst_pair": $pMiss%.3e, "n_true_pairs": ${j.length}}"""
        Files.writeString(Paths.get(s"$outDir/minhash_margin.json"), body)
        System.err.println(s"[verify] dedup_minhash recall margin: $body")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] minhash margin probe failed: ${e.getMessage}")
      }
    }
    // The rows-only ANN trio (LSH / IVF / PQ) has no DuckDB oracle, but
    // each answers the SAME top-10 query as the exact brute force — so
    // recall@10 IS measurable. Emit it every run: a corpus or parameter
    // change degrading the approximations shows up here, not in silence.
    val annApprox = Seq("ann_lsh", "ann_ivf", "ann_pq", "ann_pq_rerank",
      "ann_ivfpq", "ann_ivfpq_rerank", "ann_index_query")
    if (annApprox.exists(n => selected.contains(n) && !failed.contains(n))) {
      try {
        // read the dumps just written above instead of re-running the
        // full LSH/IVF/PQ pipelines (the probe only needs vec_ids)
        def ids(name: String): Set[Long] =
          (try spark.read.parquet(s"$outDir/$name")
           catch { case _: Throwable => selected(name)(spark, sfDir) })
            .select("vec_id").collect().map(_.getLong(0)).toSet
        val exact =
          if (selected.contains("ann_bruteforce") && !failed.contains("ann_bruteforce"))
            ids("ann_bruteforce")
          else graft.operators.Similarity.bruteForce(spark, sfDir)
            .select("vec_id").collect().map(_.getLong(0)).toSet
        // emptiness guard: recall divides by exact.size — an empty
        // brute-force result would yield NaN, which f"%.2f" renders as
        // bare NaN and corrupts ann_recall.json into invalid JSON
        if (exact.isEmpty)
          System.err.println("[verify] ann recall probe skipped: empty exact top-k")
        else {
          val recalls = annApprox.filter(n => selected.contains(n) && !failed.contains(n))
            .map { name => name -> (ids(name).intersect(exact).size.toDouble / exact.size) }
          val body = recalls.map { case (n, r) => f""""$n": $r%.2f""" }
            .mkString("{", ", ", s""", "k": ${exact.size}}""")
          Files.writeString(Paths.get(s"$outDir/ann_recall.json"), body)
          System.err.println(s"[verify] ann recall@10 vs exact: $body")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] ann recall probe failed: ${e.getMessage}")
      }
    }
    // Batch-serving recall (r9): ann_index_knn_join's per-query top-5
    // vs ann_topk_join's exact brute-force top-5 — the single-query
    // probe above cannot see a batch-path recall regression (shared
    // probe cells, per-query ADC tables), so the query-SET entry point
    // gets its own measured number every run.
    if (Seq("ann_index_knn_join", "ann_topk_join")
        .forall(n => selected.contains(n) && !failed.contains(n))) {
      try {
        def perQ(name: String): Map[Long, Set[Long]] =
          spark.read.parquet(s"$outDir/$name")
            .select("q_id", "vec_id").collect()
            .groupBy(_.getLong(0))
            .view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val exactQ = perQ("ann_topk_join")
        val servedQ = perQ("ann_index_knn_join")
        if (exactQ.nonEmpty && exactQ.keySet == servedQ.keySet) {
          val per = exactQ.keys.toSeq.sorted.map { qid =>
            qid -> (servedQ(qid).intersect(exactQ(qid)).size.toDouble /
              math.max(exactQ(qid).size, 1))
          }
          val mean = per.map(_._2).sum / per.size
          val body = per.map { case (qid, r) => f""""q$qid": $r%.2f""" }
            .mkString("{", ", ", f""", "mean": $mean%.2f}""")
          Files.writeString(Paths.get(s"$outDir/ann_batch_recall.json"), body)
          System.err.println(s"[verify] batch knn-join recall@5 vs exact: $body")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] batch recall probe failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
