package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.functions.TextFunctions._

/** Corpus-curation operators for the training-data pipeline
  * (SURVEY.md §2.3/§2.5 extensions): deterministic sampling, intra-doc
  * repetition scoring, and a composite quality gate with machine-
  * readable reason codes.
  *
  * Scale design: sampling is rank-by-content-hash — reproducible across
  * engines, partitionings, and cluster sizes (no RNG state, no
  * `sample()` nondeterminism); the fixed-size variant is a single
  * TakeOrderedAndProject (no global sort materialized), the stratified
  * variant shuffles once on the stratum key. Repetition and the gate
  * are narrow per-row passes over codegen'd built-ins — at 100 TB they
  * pipeline inside the scan stage with zero shuffles.
  */
object Curation {

  /** Stable per-doc sampling rank: md5 of the decimal doc_id string.
    * Uniform over docs, independent of row order and partitioning. */
  private[operators] def sampleRank = md5(col("doc_id").cast("string").cast("binary"))

  /** Deterministic fixed-size uniform sample (the distributed
    * stand-in for reservoir sampling: rank every row by a content
    * hash, keep the global top-N — one TakeOrderedAndProject, no
    * full sort, same N rows on any cluster layout). */
  def sampleUniformN(s: SparkSession, d: String, n: Int = 100): DataFrame =
    documents(s, d)
      .orderBy(sampleRank, col("doc_id"))
      .limit(n)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  val sampleUniformNSql: String =
    """SELECT doc_id, lang, source, n_chars
      |FROM (SELECT * FROM documents
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100)
      |ORDER BY doc_id""".stripMargin

  /** `sample_split` — deterministic leak-proof train/val/test
    * assignment, the split discipline every dataset release needs:
    * the split key is a hash of the CONTENT (md5 of text), not the id
    * or a random draw, so (a) the split is reproducible on any
    * cluster layout with no seed to lose, and (b) exact duplicates
    * land in the SAME split structurally — the train/test
    * contamination that id- or random-keyed splits ship silently is
    * impossible by construction. Buckets are the first two hex chars
    * (256 buckets, compared lexicographically — lowercase fixed-width
    * hex orders identically as text on both engines): < 'f6' train
    * (246/256 ≈ 96.1%), < 'fb' val (5/256 ≈ 2.0%), else test. The
    * audit emits per-(split, source) volumes plus `n_straddle` — the
    * count of fingerprints seen in more than one split — computed
    * from the data (not asserted), so the oracle hash-checks the
    * leak-proof property itself (any drift from 0 fails the gate).
    *
    * 100 TB: assignment is a pure narrow map (hash in the scan
    * projection — no shuffle, no global state, no sampling pass);
    * both audit aggregates are map-side combined over (split, source,
    * fp)-sized rows, and the straddle frame is a 1-row broadcast. */
  def sampleSplit(s: SparkSession, d: String): DataFrame =
    sampleSplitOf(documents(s, d))

  def sampleSplitOf(docs: DataFrame): DataFrame = {
    val fp = md5(col("text").cast("binary"))
    val bucket = substring(fp, 1, 2)
    val tagged = docs.select(
      col("source"), col("n_chars"), fp.as("fp"),
      when(bucket < "f6", "train")
        .when(bucket < "fb", "val")
        .otherwise("test").as("split"))
    val straddle = tagged.groupBy(col("fp"))
      .agg(countDistinct(col("split")).as("ns"))
      .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("n_straddle"))
    tagged.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .crossJoin(broadcast(straddle))
      .orderBy(col("split"), col("source"))
  }

  val sampleSplitSql: String =
    """WITH tagged AS (
      |  SELECT source, n_chars, md5(text) AS fp,
      |    CASE WHEN substring(md5(text), 1, 2) < 'f6' THEN 'train'
      |         WHEN substring(md5(text), 1, 2) < 'fb' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |straddle AS (
      |  SELECT CAST(COALESCE(SUM(CASE WHEN ns > 1 THEN 1 END), 0) AS BIGINT)
      |    AS n_straddle
      |  FROM (SELECT fp, COUNT(DISTINCT split) AS ns FROM tagged GROUP BY fp))
      |SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars, n_straddle
      |FROM tagged CROSS JOIN straddle
      |GROUP BY split, source, n_straddle
      |ORDER BY split, source""".stripMargin

  /** Exact per-stratum quotas: the k hash-smallest docs of every
    * language — the class-balancing primitive. One shuffle on the
    * stratum key; the rank window never sees more than one stratum. */
  def sampleStratified(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(sampleRank, col("doc_id"))
    documents(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id"), col("source"))
      .orderBy(col("lang"), col("rk"))
  }

  val sampleStratifiedSql: String =
    """SELECT lang, CAST(rk AS INT) AS rk, doc_id, source
      |FROM (SELECT lang, doc_id, source,
      |        ROW_NUMBER() OVER (PARTITION BY lang
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |      FROM documents)
      |WHERE rk <= 20
      |ORDER BY lang, rk""".stripMargin

  /** `sample_temperature` — temperature-scaled language sampling (the
    * mBERT/XLM-R multilingual data schedule): per-language quotas
    * ∝ n_lang^τ with τ = 0.5, smoothing the head language's dominance
    * toward the tail (en holds 41% of this corpus but √-weights to
    * ~30% of the budget), then the quota filled by the deterministic
    * md5 content-hash rank ([[sampleRank]] idiom). The quota split is
    * the largest-remainder (Hamilton) apportionment computed ENTIRELY
    * in integer arithmetic — weights quantised as floor(√n·1e9)
    * BIGINT, integer-div base shares, remainder ranking — so both
    * engines agree bit-for-bit with no cross-engine float summation
    * anywhere (the davg9 lesson applied to apportionment).
    *
    * A quota is capped at its stratum's size and the surplus is NOT
    * redistributed: when smoothing asks for more docs than a language
    * has, the sample simply comes back under budget (loud in the row
    * count, pinned in CurationSpec) — silently refilling from other
    * languages would defeat the temperature (it hands the head back
    * exactly the share τ removed). No gated corpus caps (largest
    * quota ~60 vs n ≥ 702).
    *
    * 100 TB: the allocation table is ≤ |langs| rows (two tiny
    * broadcast aggregates + one bounded unpartitioned window over
    * |langs| rows — same class as the other documented bounded driver
    * tables); selection is sample_stratified's one shuffle on the
    * stratum key with a per-stratum rank window. */
  def sampleTemperature(s: SparkSession, d: String, budget: Int = 200): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, least, row_number, sum => fsum}
    val zt = documents(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("z", floor(sqrt(col("n").cast("double")) * 1e9).cast("long"))
    val tot = zt.agg(fsum(col("z")).as("zsum"))
    val a1 = zt.crossJoin(broadcast(tot))
      .select(col("lang"), col("n"),
        expr(s"(CAST($budget AS BIGINT) * z) DIV zsum").as("base"),
        expr(s"(CAST($budget AS BIGINT) * z) % zsum").as("rem"))
    val tot2 = a1.agg((lit(budget.toLong) - fsum(col("base"))).as("leftover"))
    // unpartitioned window: the frame is the ≤|langs|-row alloc table
    val wRem = Window.orderBy(col("rem").desc, col("lang"))
    val alloc = a1.crossJoin(broadcast(tot2))
      .withColumn("extra",
        when(row_number().over(wRem) <= col("leftover"), 1L).otherwise(0L))
      .select(col("lang"), least(col("base") + col("extra"), col("n")).as("alloc"))
    val wRank = Window.partitionBy(col("lang")).orderBy(sampleRank, col("doc_id"))
    documents(s, d)
      .withColumn("rk", row_number().over(wRank))
      .join(broadcast(alloc), "lang")
      .filter(col("rk") <= col("alloc"))
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  val sampleTemperatureSql: String =
    """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      |z AS (SELECT lang, n,
      |        CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1e9) AS BIGINT) AS z
      |      FROM c),
      |t AS (SELECT SUM(z) AS zsum FROM z),
      |a1 AS (SELECT lang, n,
      |         (CAST(200 AS BIGINT) * z) // zsum AS base,
      |         (CAST(200 AS BIGINT) * z) % zsum AS rem
      |       FROM z CROSS JOIN t),
      |t2 AS (SELECT 200 - SUM(base) AS leftover FROM a1),
      |al AS (SELECT lang,
      |         LEAST(base + CASE WHEN ROW_NUMBER()
      |             OVER (ORDER BY rem DESC, lang) <= leftover
      |           THEN 1 ELSE 0 END, n) AS alloc
      |       FROM a1 CROSS JOIN t2),
      |rk AS (SELECT lang, doc_id,
      |         ROW_NUMBER() OVER (PARTITION BY lang
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |       FROM documents)
      |SELECT r.lang, CAST(r.rk AS INT) AS rk, r.doc_id
      |FROM rk r JOIN al USING (lang) WHERE r.rk <= al.alloc
      |ORDER BY lang, rk""".stripMargin

  /** `sample_importance` — quality-weighted importance sampling, the
    * data-mixing primitive behind "sample better documents more
    * often" corpus recipes: each doc is kept with probability
    * keep_p = √quality (temperature T = 2 flattening — high-quality
    * docs are near-certain keeps, low-quality docs survive at a
    * down-weighted rate instead of a hard gate's zero). The coin is
    * DETERMINISTIC — u(doc) = md5(doc_id) as a fraction of the hash
    * space, the [[sampleRank]] idiom — so the sample is reproducible
    * on any cluster layout and the oracle replays the exact draw
    * (same md5 slice, same 2⁻⁶⁰ division, same IEEE sqrt —
    * engine-identical comparisons). 100 TB: a stateless narrow
    * filter over the quality projection; nothing shuffles. */
  def sampleImportance(s: SparkSession, d: String): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string").cast("binary")),
      1, 15), 16, 10).cast("bigint") / lit(1.152921504606846976E18)).as("u")
    // checkpoint the quality projection BEFORE filtering on it — the
    // corpus_mix discipline (§6 filter-over-expensive-projection trap):
    // a filter over quality's stop_ratio lambda re-inlines the token
    // split per array element when pushdown collapses the layers
    // (flagged by FilterAudit when this was written filter-direct)
    TextAnalysis.quality(s, d)
      .select(col("doc_id"), col("quality"), u)
      .transform(df => graft.Checkpoints.pin(df))
      .withColumn("keep_p", sqrt(col("quality")))
      .filter(col("u") < col("keep_p"))
      .select(col("doc_id"), col("quality"), col("keep_p"))
      .orderBy(col("doc_id"))
  }

  val sampleImportanceSql: String = {
    val hexval =
      """list_reduce(list_transform(string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, d) -> a * 16 + d)""".stripMargin
    s"""SELECT doc_id, quality, SQRT(quality) AS keep_p
      |FROM (${TextAnalysis.QualityBodySql}) q
      |WHERE $hexval / 1152921504606846976.0 < SQRT(quality)
      |ORDER BY doc_id""".stripMargin
  }

  /** `sample_dsir` — Data Selection via Importance Resampling (Xie et
    * al. 2023, arXiv:2302.03169, the DSIR recipe): pick raw-corpus
    * documents whose hashed-feature profile matches a TARGET
    * distribution — the standard move for skewing a web crawl toward
    * a curated reference corpus. Feature space is the hashing-trick
    * bucket ([[TextAnalysis.hashFeatures]]'s FNV low bits, k=64);
    * target = the `lang = 'en'` slice of the corpus; per-bucket
    * importance weight is the smoothed target/raw token-count ratio.
    *
    * Determinism over transcendentals (the BPE/LM-score discipline):
    * DSIR's per-token log-likelihood ratio is replaced by its
    * FIXED-POINT ratio, wb = ⌊1e6·(tcnt+1)/(rcnt+1)⌋ — integer DIV on
    * exact counts, no ln() whose last-ulp differs per libm — and the
    * per-doc score is the MEAN token weight (integer DIV again), which
    * both removes doc-length bias and makes the skipped global
    * normalization constants (N_target/N_raw) a rank-invariant common
    * factor. Selection is the zero-temperature variant of DSIR's
    * Gumbel-top-k: the top-n docs by score (deterministic tie-break),
    * reproducible on any cluster layout and replayable in SQL.
    *
    * 100 TB: token explode + ONE 64-row weight table (broadcast back),
    * one hash agg keyed on doc_id, one TakeOrderedAndProject for the
    * cut — no doc×doc stage, no shuffle wider than (doc_id, sum). */
  def sampleDsir(s: SparkSession, d: String, n: Int = 200, k: Int = 64): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(words(col("text"))).as("w"))
      .select(col("doc_id"), col("lang"), col("source"),
        graft.functions.HashFunctions.fnv64(col("w"))
          .bitwiseAND(lit((k - 1).toLong)).cast("int").as("bucket"))
      .transform(df => graft.Checkpoints.pin(df))
    val raw = toks.groupBy(col("bucket")).agg(count(lit(1)).as("rcnt"))
    val tgt = toks.filter(col("lang") === "en")
      .groupBy(col("bucket")).agg(count(lit(1)).as("tcnt"))
    // target ⊆ raw ⇒ tcnt ≤ rcnt ⇒ wb ∈ [0, 1e6]: a long sum over any
    // realistic doc length can't overflow
    val wts = raw.join(tgt, Seq("bucket"), "left")
      .select(col("bucket"),
        expr("(1000000 * (coalesce(tcnt, 0) + 1)) DIV (rcnt + 1)").as("wb"))
    toks.join(broadcast(wts), "bucket")
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(expr("sum(wb) DIV count(1)").as("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(n)
      .select(col("doc_id"), col("dsir_score"), col("lang"), col("source"))
  }

  /** The DSIR pipeline replayed in DuckDB: the FNV-1a HUGEINT chain
    * ([[Dedup.FnvWordSql]], shared with hashfeatures/simhash), integer
    * `//` for both fixed-point DIVs (floor == truncate on these
    * non-negative counts), HUGEINT sums cast back to BIGINT. */
  val sampleDsirSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |tb AS (SELECT doc_id, lang, source,
       |         CAST(${Dedup.FnvWordSql} % 64 AS INT) AS bucket FROM toks),
       |raw AS (SELECT bucket, COUNT(*) AS rcnt FROM tb GROUP BY bucket),
       |tgt AS (SELECT bucket, COUNT(*) AS tcnt FROM tb WHERE lang = 'en' GROUP BY bucket),
       |wts AS (
       |  SELECT r.bucket,
       |    (1000000 * (COALESCE(t.tcnt, 0) + 1)) // (r.rcnt + 1) AS wb
       |  FROM raw r LEFT JOIN tgt t USING (bucket)),
       |sc AS (
       |  SELECT tb.doc_id, tb.lang, tb.source,
       |    CAST(SUM(w2.wb) // COUNT(*) AS BIGINT) AS dsir_score
       |  FROM tb JOIN wts w2 USING (bucket)
       |  GROUP BY tb.doc_id, tb.lang, tb.source)
       |SELECT doc_id, dsir_score, lang, source FROM sc
       |ORDER BY dsir_score DESC, doc_id LIMIT 200""".stripMargin

  /** Intra-document repetition score (Gopher-style boilerplate
    * signal): fraction of word-bigram occurrences that are repeats of
    * an earlier bigram in the same doc. Counts are exact integers; the
    * ratio is one IEEE division — bit-stable across engines. */
  def repetition(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2) // bigrams needs >= 2 tokens
      .select(col("doc_id"), bigrams(col("ws")).as("bgs"))
      .select(col("doc_id"),
        size(col("bgs")).cast("bigint").as("n_bigrams"),
        size(array_distinct(col("bgs"))).cast("bigint").as("n_distinct"))
      .withColumn("rep_ratio",
        (col("n_bigrams") - col("n_distinct")).cast("double") / col("n_bigrams"))
      .orderBy(col("doc_id"))

  val repetitionSql: String =
    """SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  CAST(n_distinct AS BIGINT) AS n_distinct,
      |  CAST(n_bigrams - n_distinct AS DOUBLE) / n_bigrams AS rep_ratio
      |FROM (
      |  SELECT doc_id, len(bgs) AS n_bigrams, len(list_distinct(bgs)) AS n_distinct
      |  FROM (SELECT doc_id, list_transform(
      |          generate_series(1, len(string_split(text, ' ')) - 1),
      |          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]) AS bgs
      |        FROM documents)
      |  WHERE len(bgs) >= 1)
      |ORDER BY doc_id""".stripMargin

  /** Composite quality gate: every doc with a bitmask of failed rules
    * (0 = clean). All rules compare exact integers, so the verdict is
    * engine- and order-independent:
    *   1 — too short (n_chars < 100)
    *   2 — too few tokens (< 20)
    *   4 — repetitious (duplicate bigrams > half of all bigrams)
    *   8 — degenerate mean word length (outside [3, 8] chars)
    * The reason-code pattern (rather than a bare filter) is what a
    * production curation pipeline audits: every drop is attributable. */
  /** Append the gate's `reasons` bitmask to a frame carrying
    * (text, n_chars). Original columns are preserved EXCEPT the
    * working names below, which would be clobbered — rejected loudly
    * rather than silently overwritten. Shared by the batch gate and
    * the streaming corpus pipeline. */
  /** Gate rule 1's length threshold — shared by the rule, its SQL
    * fragment, and pre-prune filters (streamCorpus) so they can't
    * drift apart. */
  val MinChars = 100

  def withReasons(docs: DataFrame): DataFrame = {
    val working = Seq("ws", "n_words", "bgs", "nb", "nd", "reasons")
    val clash = docs.columns.toSet.intersect(working.toSet)
    require(clash.isEmpty,
      s"withReasons would clobber caller columns: ${clash.toSeq.sorted.mkString(", ")}")
    docs
      // materialize the token array ONCE per row: inlining words(text)
      // into the bigram lambda would re-split the text per element
      .withColumn("ws", words(col("text")))
      .withColumn("n_words", size(col("ws")).cast("bigint"))
      // bigrams needs >= 2 tokens (sequence(1,0) would descend)
      .withColumn("bgs", when(size(col("ws")) >= 2, bigrams(col("ws")))
        .otherwise(array().cast("array<string>")))
      .withColumn("nb", size(col("bgs")).cast("bigint"))
      .withColumn("nd", size(array_distinct(col("bgs"))).cast("bigint"))
      .withColumn("reasons",
        when(col("n_chars") < MinChars, 1).otherwise(0) +
          when(col("n_words") < 20, 2).otherwise(0) +
          when(col("nb") > 0 && (col("nb") - col("nd")) * 2 > col("nb"), 4)
            .otherwise(0) +
          when(
            (col("n_chars") - col("n_words") + 1) < col("n_words") * 3 ||
              (col("n_chars") - col("n_words") + 1) > col("n_words") * 8, 8)
            .otherwise(0))
      .drop("ws", "n_words", "bgs", "nb", "nd")
  }

  def qualityGate(s: SparkSession, d: String): DataFrame =
    withReasons(documents(s, d))
      .select(col("doc_id"), col("reasons"),
        (col("reasons") === 0).as("pass"))
      .orderBy(col("doc_id"))

  /** The gate's reason-bitmask computation as a SQL fragment — a
    * relation (doc_id, reasons) over `documents` — shared by the
    * qualityGate oracle and every downstream oracle that filters on
    * the gate (one definition, no drift). */
  val GateReasonsSql: String =
    s"""SELECT doc_id,
      |    (CASE WHEN n_chars < $MinChars THEN 1 ELSE 0 END)
      |    + (CASE WHEN n_words < 20 THEN 2 ELSE 0 END)
      |    + (CASE WHEN nb > 0 AND (nb - nd) * 2 > nb THEN 4 ELSE 0 END)
      |    + (CASE WHEN (n_chars - n_words + 1) < n_words * 3
      |             OR (n_chars - n_words + 1) > n_words * 8 THEN 8 ELSE 0 END)
      |    AS reasons
      |  FROM (
      |    SELECT doc_id, n_chars,
      |      len(string_split(text, ' ')) AS n_words,
      |      len(bgs) AS nb, len(list_distinct(bgs)) AS nd
      |    FROM (SELECT doc_id, n_chars, text, list_transform(
      |            generate_series(1, len(string_split(text, ' ')) - 1),
      |            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]) AS bgs
      |          FROM documents))""".stripMargin

  val qualityGateSql: String =
    s"""SELECT doc_id, CAST(reasons AS INT) AS reasons, reasons = 0 AS "pass"
       |FROM ($GateReasonsSql)
       |ORDER BY doc_id""".stripMargin
}
