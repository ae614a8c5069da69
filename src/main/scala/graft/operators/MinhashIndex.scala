package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted minhash band index — the DEDUP twin of [[AnnIndex]]
  * (SURVEY §2.3 `dedup_minhash_index`, r9): near-duplicate detection
  * of an ARRIVING batch against a stored corpus without recomputing
  * the corpus's signatures per ingest.
  *
  * The stored artifact is the banded signature table (doc_id, band,
  * band_key) of the indexed corpus — `numHashes` minhashes per doc
  * split into bands, exactly [[Dedup.bandedSigs]]'s expressions (one
  * definition, so index and inline dedup can't drift). An ingest then
  * costs O(batch): shingle + sign ONLY the batch, equi-join its bands
  * against the stored table, and exact-Jaccard-confirm the candidate
  * pairs ([[Dedup.exactConfirm]] — the candidates→confirm shape used
  * across the dedup family). Nothing corpus-sized is recomputed; the
  * band join shuffles (band, band_key, doc_id) triples only.
  *
  * Keying follows the AnnIndex discipline: the index dir is named by
  * a fingerprint of the source parquet + banding params + format
  * version, the completion marker is written LAST, and a testdata
  * regeneration re-keys (never serves stale). [[append]] extends the
  * stored table with a new batch's bands (idempotent — anti-joined on
  * doc_id), which is what an accepting ingest does after the near-dup
  * gate passes.
  *
  * The gated query ([[incrementalNearDups]]) splits the corpus
  * deterministically — doc_id ≡ 0 mod 4 is "the arriving batch", the
  * rest is "the stored corpus" — builds/reuses the stored side's
  * index, probes the batch, and emits (batch_doc, corpus_doc,
  * jaccard ≥ 0.5). The probe NEVER mutates the index, so the query is
  * idempotent across verify/bench invocations. Oracle: exact
  * batch×stored pairs at the threshold (recall-conditional exactness,
  * the dedup_minhash precedent — the corpus's J ≥ 0.85 margin is
  * probed every verify run).
  */
object MinhashIndex {
  private val FormatVersion = 1

  private def root: String =
    sys.props.getOrElse("graft.minhashIndexDir",
      new java.io.File("target/minhash_index").getAbsolutePath)

  /** Content fingerprint of the documents table + banding params. */
  private[graft] def fingerprint(d: String, numHashes: Int,
      bandRows: Int): String = {
    val f = new java.io.File(s"$d/documents.parquet")
    def stat(x: java.io.File) = s"${x.getName}:${x.length}:${x.lastModified}"
    val src =
      if (f.isDirectory)
        f.listFiles.filter(_.isFile).sortBy(_.getName).map(stat).mkString("|")
      else stat(f)
    val key = s"v$FormatVersion:nh=$numHashes:r=$bandRows:" +
      s"${f.getCanonicalPath}:$src"
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }

  private def marker(dir: String) = java.nio.file.Paths.get(dir, "_GRAFT_MH_OK")
  private val builtMemo = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** ONE recursive delete for the whole object (review r12 — three
    * local copies were three chances to get null listFiles wrong). */
  private def rmr(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rmr)
    f.delete(): Unit
  }

  /** Self-tuned banding geometry for `d`'s corpus — the exact rule
    * dedup_minhash runs (footer count → rows per band, 16 bands). */
  private def geometry(s: SparkSession, d: String): (Int, Int) = {
    val n = graft.Tables.footerRowCount(s, d, "documents")
    val r = Dedup.minhashBandRowsFor(n)
    (Dedup.minhashBandsFor(r) * r, r)
  }

  /** Build-if-absent: persist the banded signature table of the STORED
    * corpus slice (everything outside the batch split). Returns the
    * index dir. Batch-sized probes must not pay this more than once
    * per corpus version ([[builtMemo]] + marker). */
  def ensure(s: SparkSession, d: String): String = {
    val (nh, r) = geometry(s, d)
    val dir = s"$root/${fingerprint(d, nh, r)}"
    if (builtMemo.contains(dir)) return dir
    if (!java.nio.file.Files.exists(marker(dir))) {
      val dirF = new java.io.File(dir)
      if (dirF.exists()) rmr(dirF)
      val storedSh = Dedup.shingles(s, d).filter(col("doc_id") % 4 =!= 0)
      Dedup.bandedSigs(storedSh, nh, r)
        // bands rows ≈ nBands per doc — small fixed width; one file
        // per ~2M rows, the AnnIndex artifact-sizing rule
        .repartition(math.max(1L,
          (graft.Tables.footerRowCount(s, d, "documents") * (nh / r) + 1999999L)
            / 2000000L).toInt)
        .write.mode("overwrite").parquet(s"$dir/bands")
      java.nio.file.Files.createFile(marker(dir))
    }
    builtMemo.add(dir)
    dir
  }

  /** Drop a (possibly mutated) index dir AND its in-session memo so
    * the next [[ensure]] rebuilds from the stored slice — the spec
    * hook that keeps an append-exercising test from poisoning later
    * probes in the same JVM. */
  private[graft] def invalidate(dir: String): Unit = {
    builtMemo.remove(dir)
    rmr(new java.io.File(dir))
  }

  /** Extend the stored band table with an accepted batch's bands —
    * what ingest does AFTER the near-dup gate. Idempotent: the batch
    * anti-joins the stored doc_ids first (the AnnIndex.append
    * discipline), so retries can't duplicate band rows (a duplicated
    * band row would double-emit its candidate pairs; the downstream
    * distinct masks correctness but not cost). Returns rows added. */
  def append(s: SparkSession, d: String, batchDocs: DataFrame): Long = {
    val (nh, r) = geometry(s, d)
    val dir = ensure(s, d)
    // Idempotence keys on bands ∪ seen; DURABILITY orders bands FIRST,
    // published atomically (review r12 — the r11 seen-first ordering
    // could crash between the two writes and permanently leave docs
    // "seen" but unindexed, silently losing near-dup recall with no
    // repair path). The protocol: stage the batch's band rows under
    // staging/, publish them with ONE atomic directory rename into
    // bands/batch-<uuid>/, THEN append `seen`. Every crash window now
    // heals on retry: (a) crash before the rename → the docs are in
    // neither table, the retry reprocesses them fully and the orphan
    // staging dir is swept below; (b) crash after the rename, before
    // `seen` → shingled docs are in bands, so the anti-join excludes
    // them (no duplicate band rows), and the shingle-less remainder —
    // which never lands a band row and is exactly why `seen` exists
    // (review r11) — is retried into `seen` with an empty band batch.
    // Single writer assumed (an ingest), as the seen append already
    // requires.
    val seenPath = s"$dir/seen"
    val stagingRoot = new java.io.File(s"$dir/staging")
    // sweep orphans from crashed attempts (window (a) above): nothing
    // under staging/ has ever been readable, so deletion is safe
    if (stagingRoot.exists()) rmr(stagingRoot)
    val storedIds = {
      val bandIds = bandsTable(s, dir).select(col("doc_id"))
      val seenIds =
        if (new java.io.File(seenPath).exists)
          s.read.parquet(seenPath).select(col("doc_id"))
        else bandIds.limit(0)
      bandIds.unionByName(seenIds).distinct()
    }
    val freshIds = graft.Checkpoints.pin(
      batchDocs.select(col("doc_id")).distinct()
        .join(storedIds, Seq("doc_id"), "left_anti"))
    val n = freshIds.count()
    if (n == 0) return 0L
    val batchKey = s"batch-${java.util.UUID.randomUUID().toString.take(12)}"
    val staged = s"$dir/staging/$batchKey"
    // ONE shingle definition with the stored table (Dedup.shinglesOf)
    val sh = Dedup.shinglesOf(batchDocs).join(freshIds, "doc_id")
    Dedup.bandedSigs(sh, nh, r)
      // artifact-sizing rule (the ensure()/AnnIndex.append discipline):
      // ~2M band rows per file, never an unconditional single file
      .repartition(math.max(1L, (n * (nh / r) + 1999999L) / 2000000L).toInt)
      .write.mode("overwrite").parquet(staged)
    // atomic publish: one rename(2) of the whole batch dir — readers
    // see all of the batch's band files or none of them
    java.nio.file.Files.move(
      java.nio.file.Paths.get(staged),
      java.nio.file.Paths.get(s"$dir/bands/$batchKey"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    freshIds.write.mode("append").parquet(seenPath)
    n
  }

  /** The stored band table — base build files plus any published
    * append batches (subdirs named `batch-<uuid>`), via recursive
    * lookup (which also disables partition inference on them). */
  private def bandsTable(s: SparkSession, dir: String): DataFrame =
    s.read.option("recursiveFileLookup", "true").parquet(s"$dir/bands")

  /** `dedup_minhash_index` — incremental near-dup of the arriving
    * batch (doc_id ≡ 0 mod 4) against the stored corpus, served from
    * the persisted band table. See the object doc for the plan. */
  def incrementalNearDups(s: SparkSession, d: String,
      threshold: Double = 0.5): DataFrame = {
    val (nh, r) = geometry(s, d)
    val dir = ensure(s, d)
    // NOT pinned: an r13 ABBA measured eager materialization of the
    // shingle table a REGRESSION here (2.42/2.64 -> 4.06/2.96 s, CPU
    // doubled) — the probe's %4 batch filter stops pushing to the
    // documents scan once the plan reads checkpointed blocks
    val shAll = Dedup.shingles(s, d)
    val batchBands = Dedup.bandedSigs(
      shAll.filter(col("doc_id") % 4 === 0), nh, r)
    // structural guard, not an assumption (review r11): a dir mutated
    // by append() may carry batch-split rows; restricting the stored
    // side to the stored slice keeps the probe's exactly-one-side-in-
    // batch contract (the oracle's CASE split) whatever the dir holds
    val storedBands = bandsTable(s, dir)
      .filter(col("doc_id") % 4 =!= 0)
    val cands = graft.Checkpoints.pin(
      batchBands.as("x").join(storedBands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct())
    Dedup.exactConfirm(cands, shAll, Some(graft.Tables.documents(s, d)))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a").as("batch_doc"), col("doc_b").as("corpus_doc"),
        col("jaccard"))
      .orderBy(col("batch_doc"), col("corpus_doc"))
  }

  /** Oracle: exact batch×stored Jaccard at the threshold, from the
    * SHARED shingle-pair CTEs (Dedup.ShPairsCte — one definition with
    * every exact-pair oracle). Pairs where exactly one side is in the
    * batch; output keyed (batch_doc, corpus_doc) whichever order the
    * a<b pair enumeration produced. */
  val incrementalSql: String =
    s"""WITH ${Dedup.ShPairsCte}
       |SELECT CASE WHEN doc_a % 4 = 0 THEN doc_a ELSE doc_b END AS batch_doc,
       |  CASE WHEN doc_a % 4 = 0 THEN doc_b ELSE doc_a END AS corpus_doc,
       |  CAST(common AS DOUBLE) / (a.n_sh + b.n_sh - common) AS jaccard
       |FROM common
       |JOIN sizes a ON a.doc_id = doc_a
       |JOIN sizes b ON b.doc_id = doc_b
       |WHERE (doc_a % 4 = 0) <> (doc_b % 4 = 0)
       |  AND CAST(common AS DOUBLE) / (a.n_sh + b.n_sh - common) >= 0.5
       |ORDER BY batch_doc, corpus_doc""".stripMargin
}
