package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.functions.TextFunctions._

/** Corpus-preparation operators for the training-data pipeline
  * (SURVEY.md §2.5/§2.3 extensions): sliding-window chunking, token-
  * budget sequence packing, benchmark decontamination, incremental
  * (novelty) ingest dedup, and proportional source mixing.
  *
  * Scale design notes per operator are inline; the common theme is
  * that nothing here materializes a global order on a single machine:
  * chunking is a bounded per-row explode, packing uses a two-phase
  * distributed prefix sum (per-partition cumsum + a driver-side offset
  * table bounded by the partition count), decontamination broadcasts
  * the small eval-set n-gram inventory, novelty dedup is a fingerprint
  * anti-join (shuffles 32-hex strings, never text), and mixing windows
  * only within a source stratum.
  */
object Corpus {

  // ---------------------------------------------------------------- chunking

  /** `chunk_documents` — sliding-window chunking with overlap: the
    * standard pre-tokenization step that turns long documents into
    * model-sized pieces. Chunks start every `stride` chars and span
    * `len` chars (so consecutive chunks overlap by `len - stride`).
    * Emits (doc_id, chunk_id, chunk_start, chunk_chars, chunk_md5) —
    * the hash stands in for the chunk text so only fixed-width rows
    * leave the executors.
    *
    * 100 TB: a narrow per-row explode with blow-up factor
    * ceil(doc_len/stride) — no shuffle at all until the final
    * presentation sort; pipeline it into a writer and the sort
    * disappears too.
    */
  def chunks(s: SparkSession, d: String,
             len: Int = 200, stride: Int = 150): DataFrame =
    documents(s, d)
      .filter(col("n_chars") >= 1) // 0-len docs: engines disagree on (n-1) DIV s
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("chunk_id",
        explode(expr(s"sequence(0, CAST((n_chars - 1) DIV $stride AS INT))")))
      .withColumn("chunk", expr(s"substr(text, chunk_id * $stride + 1, $len)"))
      .select(col("doc_id"),
        col("chunk_id"),
        (col("chunk_id") * stride + 1).cast("int").as("chunk_start"),
        length(col("chunk")).cast("bigint").as("chunk_chars"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val chunksSql: String =
    """SELECT doc_id, CAST(i AS INT) AS chunk_id,
      |  CAST(i*150+1 AS INT) AS chunk_start,
      |  CAST(length(substr(text, CAST(i*150+1 AS INT), 200)) AS BIGINT) AS chunk_chars,
      |  md5(substr(text, CAST(i*150+1 AS INT), 200)) AS chunk_md5
      |FROM documents, unnest(generate_series(0, (n_chars-1)//150)) AS t(i)
      |WHERE n_chars >= 1
      |ORDER BY doc_id, chunk_id""".stripMargin

  // ----------------------------------------------------------------- packing

  /** `pack_sequences` — greedy contiguous sequence packing: documents
    * in doc_id order are packed into fixed token-budget training
    * sequences; a doc belongs to the pack where its running token
    * count starts (`(cumsum - tokens) DIV budget`). Emits per-pack
    * stats (n_docs, pack_tokens, first/last doc).
    *
    * The global running sum is NOT a single-partition window (the
    * classic scale-killer): it is a two-phase distributed prefix sum —
    * range-partition by doc_id, per-partition cumsum under a
    * pid-partitioned window, then add per-partition offsets computed
    * from a driver-side table bounded by the partition count. The
    * input is localCheckpoint-pinned so the offset table and the
    * cumsum pass see identical range boundaries.
    */
  def packSequences(s: SparkSession, d: String, budget: Long = 1000L): DataFrame =
    packFrom(s,
      documents(s, d)
        .select(col("doc_id"), size(words(col("text"))).cast("bigint").as("tokens")),
      budget)

  /** `pack_sequences_bpe` — the same packer re-keyed on
    * TOKENIZER-FAITHFUL counts: documents are packed by their mini-BPE
    * token counts (TextAnalysis.bpeCounts) instead of whitespace words,
    * which is what an actual training-data pipeline budgets on — a
    * 1000-unit budget means model tokens, not words. Same two-phase
    * distributed prefix sum; the oracle replays the BPE training CTEs
    * and the global-window packing. */
  def packSequencesBpe(s: SparkSession, d: String, budget: Long = 1000L): DataFrame =
    packFrom(s,
      TextAnalysis.bpeCounts(s, d)
        .select(col("doc_id"), col("n_bpe").as("tokens")),
      budget)

  /** Two-phase distributed global prefix sum — appends `cum`, the
    * running total of `valueCol` in the total order given by
    * `sortCols` (which must be a total order: include a unique
    * tiebreaker). Range-partition on the sort key, per-partition
    * cumsum under a pid-partitioned window, then add per-partition
    * offsets from a driver-side table bounded by the partition count
    * (≤ 1 row per partition — the legitimate bounded-table pattern,
    * never data). The input is localCheckpoint-pinned so the offset
    * table and the cumsum pass see identical range boundaries; the
    * harness sweep frees the pinned blocks after the consumer's
    * action. Shared by [[packSequences]]/[[packSequencesBpe]] (doc_id
    * order) and [[tokenBudget]] (quality-descending order). */
  private def withGlobalCumsum(s: SparkSession, df: DataFrame,
      sortCols: Seq[Column], valueCol: String): DataFrame = {
    // same correctness precondition as Analytics4.ntileTwoPhase
    // (review r12): the offsets and cumsum passes must dedupe onto ONE
    // physical range exchange or they can sample different boundaries
    require(s.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "withGlobalCumsum requires spark.sql.exchange.reuse=true: both " +
        "passes must observe one physical range exchange")
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val withPid = df.repartitionByRange(nPart, sortCols: _*)
      .withColumn("pid", spark_partition_id())
    // per-partition offsets computed IN-PLAN (r11, the ntileTwoPhase
    // review fix): a prefix-sum window over the <= nPart per-pid
    // totals — metadata-sized, never data. One plan, one action: both
    // references to the range exchange dedupe via ReuseExchange, so
    // the offsets and the cumsum pass see identical range boundaries
    // by construction. The previous collect+pin variant depended on
    // Checkpoints.pin for that consistency, which the noCheckpoint
    // audit passthrough silently removed.
    val wPrev = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withPid.groupBy(col("pid")).agg(sum(valueCol).as("t"))
      .select(col("pid"), coalesce(sum(col("t")).over(wPrev), lit(0L)).as("off"))
    val w = Window.partitionBy("pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid
      .withColumn("lcum", sum(valueCol).over(w))
      .join(broadcast(offs), "pid")
      .withColumn("cum", col("lcum") + col("off"))
      .drop("pid", "lcum", "off")
  }

  /** Shared packer over any (doc_id, tokens) frame — see
    * [[packSequences]] for the two-phase prefix-sum design notes. */
  private def packFrom(s: SparkSession, tokensDf: DataFrame,
      budget: Long): DataFrame =
    withGlobalCumsum(s, tokensDf, Seq(col("doc_id")), "tokens")
      .withColumn("pack_id", expr(s"CAST((cum - tokens) DIV $budget AS BIGINT)"))
      .groupBy("pack_id")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("tokens").as("pack_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("pack_id")

  /** `corpus_token_budget` — data selection under a token budget: rank
    * the corpus by the composite quality score (descending, doc_id
    * tiebreak) and keep the greedy prefix whose running token count
    * stays within `budget` — "fill N training tokens with the best
    * documents", the selection step between scoring and packing in a
    * curation pipeline. Emits (doc_id, quality, tokens, cum_tokens)
    * for the selected prefix in rank order.
    *
    * 100 TB: the rank order is a range partition (no global
    * single-partition sort) and the running total is the same
    * two-phase distributed prefix sum as [[packSequences]]; the
    * only driver-side state is the ≤-one-row-per-partition offset
    * table. The quality score is [[TextAnalysis.quality]]'s exact
    * composite — bit-stable doubles, so rank order and the budget
    * cut agree with the oracle bit-for-bit. */
  def tokenBudget(s: SparkSession, d: String, budget: Long = 10000L): DataFrame = {
    val scored = TextAnalysis.quality(s, d)
      .select(col("doc_id"), col("quality"),
        col("n_tokens").cast("bigint").as("tokens"))
    withGlobalCumsum(s, scored, Seq(col("quality").desc, col("doc_id")), "tokens")
      .withColumn("cum_tokens", col("cum").cast("bigint"))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("quality"), col("tokens"), col("cum_tokens"))
      .orderBy(col("cum_tokens"))
  }

  /** Oracle: the scored subquery IS [[TextAnalysis.qualitySql]] embedded
    * verbatim (so the score formula cannot drift between the two), with
    * the global window replaying the rank-order running sum. */
  val tokenBudgetSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, quality, CAST(n_tokens AS BIGINT) AS tokens
       |  FROM (${TextAnalysis.qualitySql.replace("\n", "\n  ")})),
       |cum AS (
       |  SELECT doc_id, quality, tokens,
       |    CAST(SUM(tokens) OVER (ORDER BY quality DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM scored)
       |SELECT doc_id, quality, tokens, cum_tokens
       |FROM cum WHERE cum_tokens <= 10000
       |ORDER BY cum_tokens""".stripMargin

  val packSequencesSql: String =
    """SELECT CAST(pack_id AS BIGINT) AS pack_id,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(tokens) AS BIGINT) AS pack_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM (SELECT doc_id, tokens,
      |        (SUM(tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |          - tokens) // 1000 AS pack_id
      |      FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |            FROM documents))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val packSequencesBpeSql: String =
    s"""WITH ${TextAnalysis.BpeCtes},
       |bt AS (
       |  SELECT doc_id,
       |    CAST(SUM(LENGTH(t) - LENGTH(replace(t, '<', ''))) AS BIGINT) AS tokens
       |  FROM tok GROUP BY doc_id)
       |SELECT CAST(pack_id AS BIGINT) AS pack_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(tokens) AS BIGINT) AS pack_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM (SELECT doc_id, tokens,
       |        (SUM(tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |          - tokens) // 1000 AS pack_id
       |      FROM bt)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------- decontamination

  /** `dedup_decontaminate` — benchmark decontamination: flag training
    * documents sharing any word 5-gram with a held-out eval set (the
    * 50 hash-smallest docs, a deterministic stand-in for a benchmark
    * suite). Emits (doc_id, n_overlap) for contaminated docs only —
    * n_overlap = how many distinct eval 5-grams the doc contains.
    *
    * 100 TB: the eval-side n-gram inventory is tiny by construction
    * (benchmarks are fixed-size), so it broadcasts; the corpus side is
    * a narrow explode → distinct → broadcast-hash-join, no shuffle of
    * document text and no pairwise doc×doc stage at all.
    */
  def decontaminate(s: SparkSession, d: String,
                    n: Int = 5, evalK: Int = 50): DataFrame = {
    val docs = documents(s, d)
    val evalIds = docs
      .select(col("doc_id"), Curation.sampleRank.as("h"))
      .orderBy(col("h"), col("doc_id")).limit(evalK)
      .select("doc_id")
    def gramRows(df: DataFrame): DataFrame = df
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), explode(ngrams(col("ws"), n)).as("g"))
    val evalGrams = gramRows(docs.join(broadcast(evalIds), "doc_id"))
      .select("g").distinct()
    gramRows(docs.join(broadcast(evalIds), Seq("doc_id"), "left_anti"))
      .distinct() // count each shared gram once per doc
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_overlap"))
      .orderBy("doc_id")
  }

  val decontaminateSql: String =
    """WITH ev AS (SELECT doc_id FROM documents
      |            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 50),
      |tok AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |egrams AS (
      |  SELECT DISTINCT unnest(list_transform(generate_series(1, len(ws)-4),
      |      i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])) AS g
      |  FROM tok WHERE doc_id IN (SELECT doc_id FROM ev) AND len(ws) >= 5),
      |fgrams AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(ws)-4),
      |      i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])) AS g
      |  FROM tok WHERE doc_id NOT IN (SELECT doc_id FROM ev) AND len(ws) >= 5)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
      |FROM fgrams JOIN egrams USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- incremental dedup

  /** `dedup_incremental` — novelty filter for incremental ingest: an
    * incoming batch is deduplicated against the already-ingested base
    * corpus by content fingerprint, keeping only never-seen documents.
    * Base = even doc_ids; incoming batch = odd doc_ids plus a
    * re-delivered slice of the base (doc_id % 10 == 0 — a simulated
    * re-crawl overlap), so the anti-join provably drops exactly the
    * re-delivered rows.
    *
    * 100 TB: the anti-join shuffles 32-char fingerprints, never text;
    * with the base side persisted as a bucketed fingerprint table the
    * batch-side shuffle is all that remains per increment.
    */
  def incremental(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), md5(col("text")).as("fp"))
    val base = docs.filter(col("doc_id") % 2 === 0).select("fp")
    docs.filter(col("doc_id") % 2 === 1 || col("doc_id") % 10 === 0)
      .join(base, Seq("fp"), "left_anti")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  val incrementalSql: String =
    """SELECT doc_id, lang, source FROM documents b
      |WHERE (doc_id % 2 = 1 OR doc_id % 10 = 0)
      |  AND NOT EXISTS (SELECT 1 FROM documents a
      |                  WHERE a.doc_id % 2 = 0 AND md5(a.text) = md5(b.text))
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- source mix

  /** `corpus_interleave` — deterministic source-proportional TRAINING
    * ORDER: corpus_mix decides HOW MANY docs each source contributes;
    * this decides WHEN they are seen. Each source's docs are spread
    * uniformly over the global order (fractional-position round-robin —
    * the curriculum primitive behind "consume sources at fixed rates,
    * not in blocks", cf. the data-ordering discussion in GPT-3/Pile-era
    * training setups). The doc ranked rk of cnt in its source gets the
    * integer midpoint key ((2·rk − 1) · 2^19) div cnt — exact integer
    * arithmetic, no doubles cross the engine boundary; within-source
    * order is the same hash-smallest-first rank corpus_mix uses.
    *
    * 100 TB: the rank/count windows partition by source (one shuffle on
    * the source key, no global sort of the corpus); the global order is
    * realized only for the k-row prefix via TakeOrdered, and the final
    * row_number runs over those k rows. Past cnt > 2^20 per source,
    * midpoint keys coalesce and the (source, src_rank) tie-break
    * degrades the interleave granularity gracefully to ~cnt/2^20-doc
    * micro-blocks while preserving per-source rank order.
    */
  def corpusInterleave(s: SparkSession, d: String, k: Int = 300): DataFrame = {
    val w = Window.partitionBy("source").orderBy(Curation.sampleRank, col("doc_id"))
    val ordKey = Seq(col("k"), col("source"), col("src_rank"))
    documents(s, d)
      .select(col("doc_id"), col("source"))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("k", expr("((2 * src_rank - 1) * 524288) div cnt"))
      .orderBy(ordKey: _*)
      .limit(k)
      .withColumn("pos",
        row_number().over(Window.orderBy(ordKey: _*)).cast("long"))
      .select(col("pos"), col("doc_id"), col("source"), col("src_rank"))
      .orderBy(col("pos"))
  }

  val corpusInterleaveSql: String =
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS src_rank,
      |    COUNT(*) OVER (PARTITION BY source) AS cnt
      |  FROM documents),
      |keyed AS (
      |  SELECT doc_id, source, src_rank,
      |    ((2 * src_rank - 1) * 524288) // cnt AS k
      |  FROM ranked)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY k, source, src_rank) AS BIGINT) AS pos,
      |  doc_id, source, src_rank
      |FROM keyed
      |ORDER BY pos
      |LIMIT 300""".stripMargin

  /** `corpus_mix` — proportional source mixing: resample the gate-
    * passing corpus to a target size with per-source quotas
    * proportional to each source's passing count (the mixture-weights
    * step of corpus assembly; integer floor quotas with a 1-doc floor
    * so no source disappears, arithmetic exact on both engines). Docs
    * within a source are taken hash-smallest-first (deterministic on
    * any cluster layout).
    *
    * 100 TB: quotas come from a per-source aggregate (tiny) broadcast
    * back; the rank window partitions by source, so no global sort —
    * the one shuffle is on the source key.
    */
  def corpusMix(s: SparkSession, d: String, target: Int = 200): DataFrame = {
    // Checkpoint the narrow reasons projection BEFORE filtering on it:
    // a filter directly over withReasons gets pushed into the
    // projection, re-inlining the token split per array element
    // (O(words²) — measured 4.5 s vs 0.4 s at sf0.1). The checkpoint
    // also means the gate runs ONCE for its three consumers (counts,
    // total, rank window), and downstream re-reads (doc_id, source)
    // blocks, never the text.
    val gated = Curation.withReasons(documents(s, d))
      .select(col("doc_id"), col("source"), col("reasons"))
      .transform(df => graft.Checkpoints.pin(df))
      .filter(col("reasons") === 0)
      .select(col("doc_id"), col("source"))
    // per-source passing counts: bounded by the source domain (mixing
    // weights are per-source by definition), safe to collect — same
    // driver-side-table pattern as packSequences' partition offsets
    val counts = gated.groupBy("source").agg(count(lit(1)).as("n_pass"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val total = counts.map(_._2).sum
    import s.implicits._
    val quotas = counts
      .map { case (src, n) => (src, math.max(1L, target.toLong * n / total)) }
      .toDF("source", "quota")
    val w = Window.partitionBy("source").orderBy(Curation.sampleRank, col("doc_id"))
    gated
      .withColumn("rk", row_number().over(w))
      .join(broadcast(quotas), "source")
      .filter(col("rk") <= col("quota"))
      .select(col("source"), col("rk").cast("int").as("rk"), col("doc_id"))
      .orderBy(col("source"), col("rk"))
  }

  val corpusMixSql: String =
    s"""WITH gr AS (${Curation.GateReasonsSql}),
       |passed AS (SELECT d.doc_id, d.source FROM documents d
       |           JOIN gr USING (doc_id) WHERE gr.reasons = 0),
       |counts AS (SELECT source, count(*) AS n_pass FROM passed GROUP BY source),
       |quotas AS (SELECT source,
       |             greatest(1, (200 * n_pass) // (SELECT sum(n_pass) FROM counts)) AS quota
       |           FROM counts),
       |ranked AS (SELECT source, doc_id,
       |             ROW_NUMBER() OVER (PARTITION BY source
       |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |           FROM passed)
       |SELECT r.source, CAST(r.rk AS INT) AS rk, r.doc_id
       |FROM ranked r JOIN quotas q ON r.source = q.source AND r.rk <= q.quota
       |ORDER BY r.source, r.rk""".stripMargin

  // ------------------------------------------------------------- sharding

  /** `corpus_shard` — deterministic output sharding: the write-side
    * stage of a training pipeline. Every document is assigned one of
    * `nShards` shards by the low bits of a content hash (FNV-1a over
    * the text — the same hash family as text_hashfeatures, so shard
    * membership is stable across runs, machines and partitionings and
    * insensitive to doc_id renumbering), and the query emits per-shard
    * balance statistics — the numbers an operator watches to confirm no
    * shard is hot before a training job reads them.
    *
    * 100 TB: one narrow projection + one 16-group aggregation; in the
    * real write this shard column feeds partitionBy (cf. ParquetSink),
    * so readers get one directory per shard. */
  def corpusShard(s: SparkSession, d: String, nShards: Int = 16): DataFrame = {
    require((nShards & (nShards - 1)) == 0, "nShards must be a power of two")
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        graft.functions.HashFunctions.fnv64(col("text"))
          .bitwiseAND(lit((nShards - 1).toLong)).cast("int").as("shard"),
        size(words(col("text"))).cast("bigint").as("toks"),
        length(col("text")).cast("bigint").as("chars"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("chars")).as("n_chars"),
        countDistinct(col("lang")).cast("int").as("n_langs"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))
  }

  val corpusShardSql: String =
    s"""WITH dw AS (SELECT doc_id, lang, text, text AS w FROM documents),
       |th AS (SELECT doc_id, lang, text, ${Dedup.FnvWordSql} AS h FROM dw)
       |SELECT CAST(h % 16 AS INT) AS shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |  CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
       |  CAST(COUNT(DISTINCT lang) AS INT) AS n_langs,
       |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM th GROUP BY 1 ORDER BY 1""".stripMargin

  /** `corpus_domain_cap` — per-domain document caps, the Gopher /
    * FineWeb-style curation stage that stops any one source dominating
    * the training mix: within each `source`, rank documents by
    * size (n_chars DESC, doc_id tiebreak — deterministic) and keep
    * the top `cap`.
    *
    * Deliberately declared as `row_number().over(source window)` +
    * `rk <= cap` filter rather than any hand-built top-k: Catalyst's
    * InferWindowGroupLimit rewrites exactly this shape into a
    * WindowGroupLimit that drops rows BELOW the per-group limit on the
    * map side, BEFORE the shuffle — so a hot domain with 10⁹ docs
    * ships ~cap rows per input partition instead of all of them, which
    * is precisely the skew mitigation a hand-rolled version would need
    * to reimplement. CurationSpec pins the WindowGroupLimit node in
    * the physical plan so a regression to full-window shuffling is a
    * test failure, not a silent 100×-scale cliff. */
  def domainCap(s: SparkSession, d: String, cap: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .orderBy(col("source"), col("rk"))
  }

  val domainCapSql: String =
    """SELECT source, doc_id, n_chars, rk FROM (
      |  SELECT source, doc_id, n_chars,
      |    CAST(ROW_NUMBER() OVER (
      |      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS INT) AS rk
      |  FROM documents)
      |WHERE rk <= 10
      |ORDER BY source, rk""".stripMargin

  /** `corpus_epochs` — epoch-aware token budgeting: given a training
    * budget of 2× the corpus (the up-sampling regime), split it across
    * languages by τ=0.5 temperature weights (√-token shares, the
    * sample_temperature schedule applied to TOKENS), then turn each
    * language's target into a repeat plan — micro-epochs
    * (1e6 × target ÷ tokens) capped at 4 epochs, the
    * repeat-without-degradation bound from data-constrained scaling
    * work (Muennighoff et al., arXiv:2305.16264), and the realized
    * token count after the cap. The output is the mixture PLAN a
    * trainer consumes; a capped language under-fills its target
    * (realized < target) and the shortfall is visible, not refilled —
    * the sample_temperature discipline.
    *
    * Integer-exact end-to-end: √-weights quantised as floor(√n·1e6)
    * BIGINT (1e6, not the sampling ops' 1e9: the ppm apportionment
    * multiplies z by 1e6 again, and 1e9-scale weights overflow Long
    * at ~8.5e7 tokens per language — review finding r8), Hamilton-
    * apportioned to EXACTLY 1e6 ppm, targets and epochs by integer
    * division (safe to ~4.5e12 corpus tokens / ~8.5e13 per-language
    * in 64-bit; past that the arithmetic needs DECIMAL). 100 TB: one
    * token-count aggregate (|langs| rows) and two broadcast scalars —
    * the plan itself never touches the data again. */
  def corpusEpochs(s: SparkSession, d: String,
      epochCapMicro: Long = 4000000L): DataFrame = {
    val tok = documents(s, d)
      .select(col("lang"), size(words(col("text"))).cast("long").as("t"))
      .groupBy(col("lang")).agg(sum(col("t")).as("n_tokens"))
      .withColumn("z",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
    val tot = tok.agg(sum(col("z")).as("zsum"), sum(col("n_tokens")).as("ntot"))
    val a1 = tok.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_tokens"), col("ntot"),
        expr("(1000000 * z) DIV zsum").as("wbase"),
        expr("(1000000 * z) % zsum").as("wrem"))
    val tot2 = a1.agg((lit(1000000L) - sum(col("wbase"))).as("leftover"))
    // unpartitioned window over the ≤|langs|-row allocation table
    val wRem = Window.orderBy(col("wrem").desc, col("lang"))
    a1.crossJoin(broadcast(tot2))
      .withColumn("w_ppm", col("wbase") +
        when(row_number().over(wRem) <= col("leftover"), 1L).otherwise(0L))
      .withColumn("target_tokens", expr("(2 * ntot * w_ppm) DIV 1000000"))
      .withColumn("epochs_micro", least(lit(epochCapMicro),
        expr("(1000000 * target_tokens) DIV n_tokens")))
      .withColumn("realized_tokens", least(col("target_tokens"),
        expr(s"(n_tokens * $epochCapMicro) DIV 1000000")))
      .select(col("lang"), col("n_tokens"), col("w_ppm"),
        col("target_tokens"), col("epochs_micro"), col("realized_tokens"))
      .orderBy(col("lang"))
  }

  val corpusEpochsSql: String =
    """WITH tk AS (
      |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |z AS (SELECT lang, n_tokens,
      |        CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS z
      |      FROM tk),
      |t AS (SELECT SUM(z) AS zsum, SUM(n_tokens) AS ntot FROM z),
      |a1 AS (SELECT lang, n_tokens, ntot,
      |         (1000000 * z) // zsum AS wbase,
      |         (1000000 * z) % zsum AS wrem
      |       FROM z CROSS JOIN t),
      |t2 AS (SELECT 1000000 - SUM(wbase) AS leftover FROM a1),
      |al AS (SELECT lang, n_tokens, ntot,
      |         wbase + CASE WHEN ROW_NUMBER()
      |             OVER (ORDER BY wrem DESC, lang) <= leftover
      |           THEN 1 ELSE 0 END AS w_ppm
      |       FROM a1 CROSS JOIN t2),
      |tg AS (SELECT lang, n_tokens, w_ppm,
      |         (2 * ntot * w_ppm) // 1000000 AS target_tokens
      |       FROM al)
      |SELECT lang, n_tokens, CAST(w_ppm AS BIGINT) AS w_ppm,
      |  CAST(target_tokens AS BIGINT) AS target_tokens,
      |  CAST(LEAST(4000000, (1000000 * target_tokens) // n_tokens) AS BIGINT)
      |    AS epochs_micro,
      |  CAST(LEAST(target_tokens, (n_tokens * 4000000) // 1000000) AS BIGINT)
      |    AS realized_tokens
      |FROM tg ORDER BY lang""".stripMargin

  // ------------------------------------------------------------ version diff

  /** `corpus_diff` — corpus version diff by content fingerprint: the
    * reproducibility audit every dataset release needs (VERDICT r8
    * #4/#6). Given two corpus versions, report per source how many
    * documents were added, dropped, changed (same doc_id, different
    * content), and unchanged — the release-notes table that makes a
    * training-corpus snapshot diffable instead of "trust the new
    * parquet".
    *
    * Versions here are deterministic derivations of the gated corpus
    * (the testdata ships one snapshot): OLD excludes doc_id ≡ 0 mod 11
    * and carries a one-char-shorter text for doc_id ≡ 5 mod 13 (a
    * simulated re-crawl edit); NEW excludes doc_id ≡ 3 mod 17. So the
    * diff exercises all four classes on every SF. A production caller
    * passes two real snapshot paths through [[corpusDiffOf]].
    *
    * 100 TB: the md5 content fingerprint is computed in the scan
    * projection, so the full-outer join on doc_id shuffles (doc_id,
    * source, 16-byte fp) — never text; the per-source rollup is a
    * second tiny aggregate over status rows. Identity is doc_id,
    * change detection is the fingerprint — fp-only identity would
    * misclass an edited doc as one drop + one add. */
  def corpusDiffOf(oldV: DataFrame, newV: DataFrame): DataFrame = {
    def fpd(df: DataFrame) = df.select(col("doc_id"), col("source"),
      md5(col("text").cast("binary")).as("fp"))
    val o = fpd(oldV).withColumnRenamed("fp", "fp_old")
      .withColumnRenamed("source", "src_old")
    val n = fpd(newV).withColumnRenamed("fp", "fp_new")
      .withColumnRenamed("source", "src_new")
    o.join(n, Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_old"), col("src_new")).as("source"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "dropped")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("st"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("st") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("st") === "dropped", 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("st") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("st") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
      .orderBy(col("source"))
  }

  def corpusDiff(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val oldV = docs.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 13 === 5,
          col("text").substr(lit(1), greatest(length(col("text")) - 1, lit(0))))
          .otherwise(col("text")))
    val newV = docs.filter(col("doc_id") % 17 =!= 3)
    corpusDiffOf(oldV, newV)
  }

  val corpusDiffSql: String =
    """WITH oldv AS (
      |  SELECT doc_id, source,
      |    md5(CASE WHEN doc_id % 13 = 5
      |          THEN substring(text, 1, GREATEST(length(text) - 1, 0))
      |          ELSE text END) AS fp
      |  FROM documents WHERE doc_id % 11 <> 0),
      |newv AS (
      |  SELECT doc_id, source, md5(text) AS fp
      |  FROM documents WHERE doc_id % 17 <> 3),
      |j AS (
      |  SELECT COALESCE(o.source, n.source) AS source,
      |    CASE WHEN o.fp IS NULL THEN 'added'
      |         WHEN n.fp IS NULL THEN 'dropped'
      |         WHEN o.fp <> n.fp THEN 'changed'
      |         ELSE 'unchanged' END AS st
      |  FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id)
      |SELECT source,
      |  CAST(SUM(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(SUM(CASE WHEN st = 'dropped' THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  CAST(SUM(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(SUM(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------ dataset card

  /** `corpus_card` — per-source dataset datasheet: the "Datasheets for
    * Datasets" summary table every corpus release publishes — volume
    * (docs, chars), language spread (distinct langs, dominant lang and
    * its exact ppm share), and exact-duplicate pressure (docs whose
    * content fingerprint repeats within the source). corpus_diff says
    * what changed between releases; the card says what a release IS.
    *
    * 100 TB: three map-side-combined aggregates over the scan — the
    * shuffles carry (source), (source, lang) and (source, 16-byte fp)
    * keys, never text; every post-aggregation frame is O(sources) or
    * O(sources·langs) and the final joins are broadcast-sized by
    * construction. The dominant-lang pick is a per-source top-1
    * window over the tiny (source, lang) frame with a (count desc,
    * lang) total order, so ties are deterministic on both engines;
    * the share is exact integer ppm (1e6·n DIV total — no doubles). */
  def corpusCard(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val base = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      countDistinct(col("lang")).as("n_langs"))
    val langCounts = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("nl"))
    val wTop = Window.partitionBy(col("source"))
      .orderBy(col("nl").desc, col("lang"))
    val top = langCounts.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("nl"))
    val dups = docs
      .select(col("source"), md5(col("text").cast("binary")).as("fp"))
      .groupBy(col("source"), col("fp")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
        .as("n_dup_docs"))
    base.join(top, "source").join(dups, "source")
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("n_langs"), col("top_lang"),
        expr("1000000 * nl DIV n_docs").as("top_lang_ppm"),
        col("n_dup_docs"))
      .orderBy(col("source"))
  }

  val corpusCardSql: String =
    """WITH base AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |  FROM documents GROUP BY source),
      |lc AS (
      |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nl
      |  FROM documents GROUP BY source, lang),
      |top AS (
      |  SELECT source, lang AS top_lang, nl FROM (
      |    SELECT source, lang, nl,
      |      ROW_NUMBER() OVER (PARTITION BY source
      |        ORDER BY nl DESC, lang) AS rn
      |    FROM lc) WHERE rn = 1),
      |dups AS (
      |  SELECT source,
      |    CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
      |      AS n_dup_docs
      |  FROM (SELECT source, md5(text) AS fp, COUNT(*) AS c
      |        FROM documents GROUP BY source, md5(text))
      |  GROUP BY source)
      |SELECT b.source, n_docs, total_chars, n_langs, top_lang,
      |  (1000000 * nl) // n_docs AS top_lang_ppm, n_dup_docs
      |FROM base b JOIN top USING (source) JOIN dups USING (source)
      |ORDER BY source""".stripMargin
}
