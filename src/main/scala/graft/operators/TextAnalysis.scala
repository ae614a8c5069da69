package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.functions.TextFunctions._

/** Text-analysis queries over `documents` (SURVEY.md §2.5).
  * All single-pass narrow plans (no shuffle except final ordering /
  * the n-gram frequency groupBy) — at 100 TB these scale linearly with
  * input splits.
  */
object TextAnalysis {

  /** Token counting: whitespace tokens + BPE-ish subword segments. */
  def tokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        size(words(col("text"))).as("n_ws"),
        subtokenCount(col("text")).as("n_subtok"),
        length(col("text")).as("len_chars"))
      .orderBy(col("doc_id"))

  val tokensSql: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws,
       |  CAST(len(regexp_extract_all(text, '$SubtokenPattern')) AS INT) AS n_subtok,
       |  CAST(LENGTH(text) AS INT) AS len_chars
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  private def markerCount(markers: Seq[String]): Column =
    countIn(words(col("text")), markers)

  private def markerCountSql(markers: Seq[String]): String =
    s"CAST(len(list_filter(string_split(text, ' '), w -> w IN (${markers.map("'" + _ + "'").mkString(", ")}))) AS INT)"

  /** Heuristic language ID from per-language marker-token counts.
    * `words(text)` is materialized ONCE in a first projection — four
    * inline markerCount(words(text)) calls re-ran the regex split per
    * marker column (codegen subexpression elimination did not fuse
    * them: the r2 bench showed 4.75× on this query — same trap as
    * corpus_gate's transform-lambda recompute). */
  def langId(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang").as("declared_lang"),
        words(col("text")).as("ws"))
      .select(col("doc_id"), col("declared_lang"),
        countIn(col("ws"), MarkersEn).as("s_en"),
        countIn(col("ws"), MarkersDe).as("s_de"),
        countIn(col("ws"), MarkersFr).as("s_fr"),
        countIn(col("ws"), MarkersEs).as("s_es"))
      .withColumn("pred_lang",
        when(col("s_en") + col("s_de") + col("s_fr") + col("s_es") === 0, "und")
          .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
      .orderBy(col("doc_id"))

  val langIdSql: String =
    s"""SELECT doc_id, lang AS declared_lang, s_en, s_de, s_fr, s_es,
       |  CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'und'
       |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |       WHEN s_fr >= s_es THEN 'fr'
       |       ELSE 'es' END AS pred_lang
       |FROM (
       |  SELECT doc_id, lang,
       |    ${markerCountSql(MarkersEn)} AS s_en,
       |    ${markerCountSql(MarkersDe)} AS s_de,
       |    ${markerCountSql(MarkersFr)} AS s_fr,
       |    ${markerCountSql(MarkersEs)} AS s_es
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Quality scoring: structural text-health ratios + composite.
    * The token array is split once (see langId — the split is the
    * dominant cost); downstream ratios read size(ws), not words(text). */
  def quality(s: SparkSession, d: String): DataFrame = {
    val nTok = size(col("ws"))
    documents(s, d)
      .select(col("doc_id"), col("text"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        nTok.as("n_tokens"),
        meanTokenLen(col("text"), nTok).as("mean_tok_len"),
        alphaRatio(col("text")).as("alpha_ratio"),
        (countIn(col("ws"), MarkersEn).cast("double")
          / greatest(nTok, lit(1))).as("stop_ratio"))
      .withColumn("quality",
        lit(0.4) * col("stop_ratio") + lit(0.4) * col("alpha_ratio") +
          lit(0.2) * least(col("n_tokens").cast("double") / 200.0, lit(1.0)))
      .orderBy(col("doc_id"))
  }

  /** The quality projection WITHOUT ordering — one definition shared
    * by [[qualitySql]] and Curation.sampleImportanceSql (the ShCte
    * discipline: consumers compose the fragment instead of doing
    * textual surgery on a finished statement). */
  private[operators] val QualityBodySql: String =
    s"""SELECT doc_id, n_tokens, mean_tok_len, alpha_ratio, stop_ratio,
       |  0.4 * stop_ratio + 0.4 * alpha_ratio
       |    + 0.2 * LEAST(CAST(n_tokens AS DOUBLE) / 200.0, 1.0) AS quality
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       |    CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
       |      / GREATEST(len(string_split(text, ' ')), 1) AS mean_tok_len,
       |    CAST(LENGTH(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
       |      / GREATEST(LENGTH(text), 1) AS alpha_ratio,
       |    CAST(${markerCountSql(MarkersEn)} AS DOUBLE)
       |      / GREATEST(len(string_split(text, ' ')), 1) AS stop_ratio
       |  FROM documents)""".stripMargin

  val qualitySql: String =
    s"""$QualityBodySql
       |ORDER BY doc_id""".stripMargin

  /** Top-20 word bigrams corpus-wide. */
  def topNgrams(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(bigrams(col("ws"))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  val topNgramsSql: String =
    """SELECT bigram, COUNT(*) AS n
      |FROM (
      |  SELECT UNNEST(list_transform(
      |    generate_series(1, len(string_split(text, ' ')) - 1),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2)
      |GROUP BY bigram
      |ORDER BY n DESC, bigram
      |LIMIT 20""".stripMargin

  /** Top-5 distinctive terms per language by linear tf-idf
    * (tf × N / df, kept in exact integer arithmetic until one final
    * double division — log-free so both engines agree bit-exactly). */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(s, d)
    val wordsEx = docs.select(col("lang"), col("doc_id"),
      explode(words(col("text"))).as("w"))
    val tf = wordsEx.groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfw = wordsEx.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val win = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("w"))
    tf.join(dfw, "w")
      .crossJoin(broadcast(n))
      .select(col("lang"), col("w"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= 5)
      .orderBy(col("lang"), col("rnk"))
  }

  val tfidfSql: String =
    """SELECT lang, w, score, rnk FROM (
      |  SELECT lang, w, score,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, w) AS rnk
      |  FROM (
      |    SELECT tf.lang, tf.w,
      |      CAST(tf.tf * n.n_docs AS DOUBLE) / dfw.df AS score
      |    FROM (SELECT lang, w, COUNT(*) AS tf
      |          FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS w
      |                FROM documents)
      |          GROUP BY lang, w) tf
      |    JOIN (SELECT w, COUNT(DISTINCT doc_id) AS df
      |          FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
      |                FROM documents)
      |          GROUP BY w) dfw ON tf.w = dfw.w
      |    CROSS JOIN (SELECT COUNT(*) AS n_docs FROM documents) n))
      |WHERE rnk <= 5
      |ORDER BY lang, rnk""".stripMargin

  /** Character-distribution Gini diversity per doc: 1 − Σ pᵢ² over the
    * word-character frequencies — the log-free cousin of entropy
    * (degenerate/repetitive docs score low). All arithmetic is exact
    * integers (Σ cᵢ² as BIGINT) until ONE double division, so the
    * score is bit-identical across engines and partitionings — unlike
    * a log-based entropy, whose libm rounding differs per platform. */
  def gini(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= " ")
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_letters"),
        count(lit(1)).as("distinct_chars"),
        sum(col("c") * col("c")).as("sum_sq"))
      .select(col("doc_id"), col("n_letters"), col("distinct_chars"),
        (lit(1.0) - col("sum_sq").cast("double") /
          (col("n_letters") * col("n_letters"))).as("gini"))
      .orderBy(col("doc_id"))

  val giniSql: String =
    """SELECT doc_id, CAST(n_letters AS BIGINT) AS n_letters,
      |  CAST(distinct_chars AS BIGINT) AS distinct_chars,
      |  1.0 - CAST(sum_sq AS DOUBLE) / (n_letters * n_letters) AS gini
      |FROM (
      |  SELECT doc_id, SUM(c) AS n_letters, COUNT(*) AS distinct_chars,
      |    SUM(c * c) AS sum_sq
      |  FROM (
      |    SELECT doc_id, ch, COUNT(*) AS c
      |    FROM (SELECT doc_id, UNNEST(string_split(text, '')) AS ch
      |          FROM documents)
      |    WHERE ch <> ' '
      |    GROUP BY doc_id, ch)
      |  GROUP BY doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Corpus-level boilerplate mining: the 20 most frequent word
    * 5-gram phrases — shared templates/boilerplate surface here long
    * before pairwise dedup sees them. Explode + count + TakeOrdered;
    * the phrase strings shuffle once as (phrase, partial-count). */
  def phrases(s: SparkSession, d: String, n: Int = 5, k: Int = 20): DataFrame =
    gram5Shared(s, d, n)
      .getOrElse(gramStream(s, d, n, withPhrase = true))
      .groupBy(col("phrase")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("phrase"))
      .limit(k)

  /** One pass over the documents scan: (doc_id, position,
    * xxhash64-of-the-n-words[, phrase string]). The hash is EXACTLY
    * the expression boilerplateScrub always used, so its oracle
    * hashes are unchanged; phrases groups on the real string. */
  private def gramStream(s: SparkSession, d: String, n: Int,
      withPhrase: Boolean): DataFrame = {
    val fields = Seq(
      Some((i: Column) => i.as("i")),
      Some((i: Column) => xxhash64(
        (0 until n).map(j => element_at(col("ws"), i + j)): _*).as("h")),
      if (withPhrase) Some((i: Column) => concat_ws(" ",
        (0 until n).map(j => element_at(col("ws"), i + j)): _*).as("phrase"))
      else None).flatten
    val outCols = col("doc_id") +: (
      Seq("i", "h") ++ (if (withPhrase) Seq("phrase") else Nil))
      .map(f => col(s"g.$f").as(f))
    documents(s, d).select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ws")) - (n - 1)),
        i => struct(fields.map(f => f(i)): _*)))
        .as("g"))
      .select(outCols: _*)
  }

  private[graft] def gramStreamForSpec(s: SparkSession, d: String, n: Int,
      withPhrase: Boolean): DataFrame = gramStream(s, d, n, withPhrase)

  /** Past-[[GramShareMaxDocs]] documents the stream is corpus-sized
    * and a SESSION-lifetime pin would hold it in executor memory until
    * shutdown — the exact accumulation Checkpoints.sweeping exists to
    * stop. The share is a small-corpus optimization ONLY. */
  private val GramShareMaxDocs = 1000000L

  /** The word n-gram stream SHARED by [[phrases]] and
    * [[boilerplateScrub]] (r9 verdict item 4): one scan + split +
    * explode builds (doc_id, position, xxhash64-of-words, phrase
    * string) and pins it for the session — both gated queries were
    * paying the same explode pass, and the harness sweep freed a
    * per-query pin before the sibling ran. ~250k rows × ~70 B at
    * sf0.1; the key folds in the documents file stats so a testdata
    * regeneration misses (the scratchDir discipline). None past the
    * footer gate (r10): callers fall back to their own per-query
    * stream — boilerplate re-pins the hash-only projection per query,
    * phrases streams unpinned — so nothing corpus-sized outlives a
    * query at scale. */
  private def gram5Shared(s: SparkSession, d: String, n: Int)
      : Option[DataFrame] =
    if (graft.Tables.footerRowCount(s, d, "documents") > GramShareMaxDocs)
      None
    else {
      val srcKey = graft.SourceKey.of(d, "documents") // shared fingerprint
      Some(graft.Checkpoints.pinShared(s, s"gram$n:$d:$srcKey")(
        gramStream(s, d, n, withPhrase = true)))
    }

  val phrasesSql: String =
    """SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      |FROM (
      |  SELECT UNNEST(list_transform(
      |    generate_series(1, len(ws) - 4),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS phrase
      |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 5)
      |GROUP BY phrase
      |ORDER BY n_occurrences DESC, phrase
      |LIMIT 20""".stripMargin

  /** C4-style boilerplate REMOVAL — the consumer of [[phrases]]'s
    * mining (Raffel et al., JMLR'20 §2.2 deduplicate the C4 corpus at
    * the span level): every word position covered by an occurrence of
    * a 5-gram that appears in >= `minDf` DISTINCT documents is
    * dropped, and each document is re-emitted scrubbed (doc_id,
    * n_tokens, n_removed, scrubbed). Near-dup documents collapse to
    * empty strings; unique prose survives untouched.
    *
    * Scale shape (100 TB): two linear passes over the token stream.
    * Pass 1 aggregates document frequency over (phrase, doc_id) —
    * Spark's single-distinct rewrite makes the partial dedup map-side,
    * so only distinct (phrase, doc_id) pairs shuffle. The hot set is
    * the df >= minDf tail of a Zipf distribution — tiny — so the
    * pass-2 join is an AQE broadcast (not forced: past ~100M hot
    * phrases it degrades to a shuffle join and still never widens the
    * row). Covered positions are collect_set-ed per doc (bounded by
    * doc length) and the rebuild is a lambda `filter` over the token
    * array INSIDE the scan projection — the document's tokens never
    * leave their row, there is no word-level reassembly shuffle.
    */
  def boilerplateScrub(s: SparkSession, d: String, n: Int = 5, minDf: Int = 3): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), words(col("text")).as("ws"))
    // grams key as xxhash64 of the n words — the dedup_substring
    // discipline: the ~50-char phrase string was only ever a
    // group/join key, and building it per gram dominated the pass
    // (r9 clean-window: 2.2 s best-of vs DuckDB 0.84; hashed+pinned
    // ~1.2 s). 64-bit collisions over ~235k grams at sf0.1 are
    // P ≈ 1.5e-9 — the same accepted bound, and the DuckDB oracle
    // still groups on the real phrase, so a collision would surface
    // as a hash-gate mismatch, not ship silently. The pin stops
    // pass 2 from re-running the explode (rows are (id, i, h) —
    // ~5 MB at sf0.1).
    // the session-shared gram stream when the corpus is small enough
    // to hold (the phrase column projects away narrowly off the pinned
    // blocks); past the share gate, the r9 hash-only form — a
    // per-query pin the harness sweep frees after the action
    val grams = gram5Shared(s, d, n)
      .map(_.select(col("doc_id"), col("i"), col("h")))
      .getOrElse(graft.Checkpoints.pin(gramStream(s, d, n, withPhrase = false)))
    val hot = grams.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h"))
    val covered = grams.join(hot, "h")
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (n - 1))).as("p"))
      .groupBy(col("doc_id")).agg(collect_set(col("p")).as("cov"))
    docs.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"),
        when(col("cov").isNull, concat_ws(" ", col("ws")))
          .otherwise(concat_ws(" ", filter(col("ws"),
            (w, idx) => !array_contains(col("cov"), idx + 1)))).as("scrubbed"))
      .orderBy(col("doc_id"))
  }

  val boilerplateScrubSql: String =
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (
      |  SELECT doc_id, i,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS phrase
      |  FROM (SELECT doc_id, ws, UNNEST(generate_series(1, len(ws) - 4)) AS i
      |        FROM ws WHERE len(ws) >= 5)),
      |hot AS (SELECT phrase
      |        FROM (SELECT phrase, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY phrase)
      |        WHERE df >= 3),
      |cov AS (SELECT DISTINCT g.doc_id, g.i + o.o AS p
      |        FROM g JOIN hot h USING (phrase)
      |        CROSS JOIN (SELECT UNNEST(generate_series(0, 4)) AS o) o),
      |tok AS (SELECT doc_id, UNNEST(ws) AS w, UNNEST(generate_series(1, len(ws))) AS p FROM ws)
      |SELECT t.doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(c.p) AS BIGINT) AS n_removed,
      |  COALESCE(string_agg(CASE WHEN c.p IS NULL THEN t.w END, ' ' ORDER BY t.p), '') AS scrubbed
      |FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
      |GROUP BY t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Content fingerprints (md5-derived 64-bit hex). */
  def fingerprints(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  val fingerprintsSql: String =
    """SELECT doc_id, SUBSTR(md5(text), 1, 16) AS fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- text_fingerprint_utf8: multibyte text gate ------------------------

  /** The deterministic multibyte transform behind [[utf8Gate]]: keyed
    * on doc_id % 3, substitute common letters with 2-byte (ä, é),
    * 3-byte (中, 語) and 4-byte (𝕆 — a supplementary-plane codepoint,
    * the classic place UTF-16-centric engines break) characters.
    * Spaces are never substituted, so tokenization boundaries are
    * unchanged and the word-level machinery runs on genuinely
    * multibyte tokens. Exposed for Utf8GateSpec. */
  private[graft] def utf8Transform(cls: Column): Column =
    when(cls === 0, expr("replace(replace(text, 'a', 'ä'), 'e', 'é')"))
      .when(cls === 1, expr("replace(replace(text, 't', '中'), 's', '語')"))
      .otherwise(expr("replace(replace(text, 'o', '𝕆'), 'n', 'ñ')"))

  /** `text_fingerprint_utf8` — proves the text/dedup machinery is not
    * ASCII-conditional: the corpus is deterministically rewritten into
    * multibyte UTF-8 (see [[utf8Transform]]), then THREE byte-sensitive
    * pipelines run over it and must hash-match the DuckDB replay —
    * (a) content fingerprints (md5 over UTF-8 bytes) plus byte/char
    * length censuses (which differ exactly when multibyte encoding is
    * in play), (b) the fnv64 token hash (Spark folds UTF-8 bytes; the
    * oracle replays with [[Dedup.FnvWordBytesSql]], expanding each
    * codepoint to its UTF-8 byte sequence in SQL — the character-
    * folding ASCII replay would NOT match, which is the point), and
    * (c) content-defined chunking end-to-end (boundary rule, chunk
    * reassembly, chunk fingerprints) through [[cdcChunkTableFrom]].
    * One row per substitution class; all counters BIGINT so the gate
    * hashes cross-engine.
    *
    * 100 TB: a multilingual corpus hits non-ASCII on day one; this
    * gate pins that shingles, fingerprints and chunk boundaries are
    * byte-deterministic, not ASCII-lucky. Same plan shape as the
    * ASCII ops (per-document array expressions, constant-width
    * aggregation) — the transform is a scan-side projection. */
  def utf8Gate(s: SparkSession, d: String): DataFrame = {
    val cls = pmod(col("doc_id"), lit(3L)).cast("int")
    val docs = documents(s, d)
      .select(col("doc_id"), cls.as("cls"), utf8Transform(cls).as("text"))
    val docAgg = docs.groupBy(col("cls")).agg(
      count(lit(1)).as("n_docs"),
      sum(octet_length(col("text"))).as("bytes"),
      sum(length(col("text"))).as("chars"),
      countDistinct(fingerprint(col("text"))).as("n_fp"),
      min(fingerprint(col("text"))).as("min_fp"))
    val wordAgg = docs
      .select(col("cls"), explode(words(col("text"))).as("w"))
      .groupBy(col("cls"))
      .agg(sum(graft.functions.HashFunctions.fnv64(col("w"))
        .bitwiseAND(lit(1048575L))).as("fnv_low_sum"))
    val chunkAgg = cdcChunkTableFrom(docs.select(col("doc_id"), col("text")))
      .groupBy(pmod(col("doc_id"), lit(3L)).cast("int").as("cls"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("fp")).as("n_chunk_fps"),
        sum(col("n_words")).cast("long").as("chunk_words"))
    docAgg.join(wordAgg, Seq("cls")).join(chunkAgg, Seq("cls"))
      .orderBy(col("cls"))
  }

  val utf8GateSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS cls,
       |    CASE CAST(doc_id % 3 AS INT)
       |      WHEN 0 THEN replace(replace(text, 'a', 'ä'), 'e', 'é')
       |      WHEN 1 THEN replace(replace(text, 't', '中'), 's', '語')
       |      ELSE replace(replace(text, 'o', '𝕆'), 'n', 'ñ') END AS text
       |  FROM documents),
       |${cdcChunksCtesFrom("docs", Dedup.FnvWordBytesSql)},
       |da AS (
       |  SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(strlen(text)) AS BIGINT) AS bytes,
       |    CAST(SUM(length(text)) AS BIGINT) AS chars,
       |    CAST(COUNT(DISTINCT SUBSTR(md5(text), 1, 16)) AS BIGINT) AS n_fp,
       |    MIN(SUBSTR(md5(text), 1, 16)) AS min_fp
       |  FROM docs GROUP BY cls),
       |wa AS (
       |  SELECT cls, CAST(SUM(f) AS BIGINT) AS fnv_low_sum FROM (
       |    SELECT cls, ${Dedup.FnvWordBytesSql} % 1048576 AS f
       |    FROM (SELECT cls, unnest(string_split(text, ' ')) AS w FROM docs))
       |  GROUP BY cls),
       |ca AS (
       |  SELECT CAST(doc_id % 3 AS INT) AS cls,
       |    CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |    CAST(COUNT(DISTINCT SUBSTR(md5(ctext), 1, 16)) AS BIGINT) AS n_chunk_fps,
       |    CAST(SUM(n_words) AS BIGINT) AS chunk_words
       |  FROM chunks GROUP BY 1)
       |SELECT da.cls, n_docs, bytes, chars, n_fp, min_fp, fnv_low_sum,
       |  n_chunks, n_chunk_fps, chunk_words
       |FROM da JOIN wa USING (cls) JOIN ca USING (cls)
       |ORDER BY cls""".stripMargin

  // ---- text_cdc_chunks / dedup_cdc: content-defined chunking ------------

  /** Containment threshold for [[cdcPairs]] — interpolated into
    * [[cdcPairsSql]] so the oracle cannot desynchronize from the
    * Scala default (review finding r8). */
  private[operators] val CdcPairTau = 0.5

  /** The per-chunk table behind [[cdcChunks]] and [[cdcPairs]]: one
    * row per chunk occurrence (doc_id, fp, n_words), computed entirely
    * as per-document array expressions (zero shuffle). ONE definition
    * of the boundary rule and reassembly, so the report and the
    * pair-join consumer cannot drift (the kmeansAssign discipline). */
  private[operators] def cdcChunkTable(s: SparkSession, d: String,
      mask: Int = 15): DataFrame =
    cdcChunkTableFrom(documents(s, d), mask)

  /** [[cdcChunkTable]] over an arbitrary (doc_id, text) frame — lets
    * the UTF-8 gate chunk TRANSFORMED text through the same boundary
    * rule and reassembly. */
  private[operators] def cdcChunkTableFrom(docs: DataFrame,
      mask: Int = 15): DataFrame = {
    val ws = col("ws")
    // 0-based boundary positions: word i (i >= 3) ends its chunk when
    // FNV(words[i-3..i]) has the low bits clear; element_at is 1-based
    val bpos = when(size(ws) >= 4,
      filter(sequence(lit(3), size(ws) - 1), i =>
        graft.functions.HashFunctions.fnv64(concat_ws(" ",
          element_at(ws, i - 2), element_at(ws, i - 1),
          element_at(ws, i), element_at(ws, i + 1)))
          .bitwiseAND(lit(mask.toLong)) === 0))
      .otherwise(array().cast("array<int>"))
    val starts = concat(array(lit(0)), transform(col("bpos"), p => p + 1))
    val ends = concat(col("bpos"), array(size(ws) - 1))
    // a boundary on the last word leaves an empty trailing slice
    // (start > end) — dropped by the null filter
    val chunkArr = filter(
      zip_with(starts, ends, (st, en) => when(st <= en,
        struct(array_join(slice(ws, st + 1, en - st + 1), " ").as("ctext"),
          (en - st + 1).as("n_words")))),
      c => c.isNotNull)
    docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("bpos", bpos)
      .select(col("doc_id"), explode(chunkArr).as("ck"))
      .select(col("doc_id"), fingerprint(col("ck.ctext")).as("fp"),
        col("ck.n_words").as("n_words"))
  }

  /** `text_cdc_chunks` — content-defined chunking: a document is cut
    * where the FNV-1a hash of the rolling 4-word gram has its low 4
    * bits zero (expected chunk ≈ 16 words), so chunk boundaries depend
    * only on LOCAL content — two documents sharing a shifted span
    * produce byte-identical chunks inside it, which fixed-width
    * chunking never does (the rsync/LBFS boundary trick, the standard
    * near-dup shingling alternative for code/doc corpora). Output is
    * the top-20 most-duplicated chunks corpus-wide (fingerprint,
    * document frequency, occurrences, width).
    *
    * 100 TB: boundaries, chunk assembly and fingerprints are all
    * per-document array expressions inside the scan projection — ZERO
    * shuffle until the final constant-width (fp-keyed, top-20)
    * aggregation; no window over exploded tokens, no per-doc state
    * beyond the words array the other text ops already build. */
  def cdcChunks(s: SparkSession, d: String, mask: Int = 15): DataFrame =
    cdcChunkTable(s, d, mask)
      // chunks narrower than the 4-word gram window never contained a
      // boundary decision — they are stray tokens between two adjacent
      // cuts, and ranking them buries the real duplicated spans
      .filter(col("n_words") >= 4)
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        max(col("n_words")).as("n_words"))
      .orderBy(col("n_occurrences").desc, col("fp"))
      .limit(20)

  /** `dedup_cdc` — document-level near-dup detection via shared CDC
    * chunks, the reason content-defined chunking exists: two documents
    * are near-dups when the fraction of their (≥ gram-width, distinct)
    * chunk fingerprints in common reaches `tau` of the SMALLER
    * document's chunk set (containment — catches a doc embedded in a
    * longer one, the dedup_containment semantics at chunk granularity).
    * Because boundaries are content-defined, shifted shared spans
    * produce identical fingerprints, so the pair survives prefix
    * edits that defeat fixed-width shingling at this granularity.
    *
    * 100 TB: the candidate join is keyed on the chunk fingerprint —
    * only (fp, doc_id) pairs shuffle, and the ≥4-word filter is the
    * hot-key guard (a stray single-token chunk shared by half the
    * corpus would otherwise create a quadratic bucket — the df-cap
    * lesson); sizes join is keys-only. Pair count is bounded by real
    * shared content, not the corpus square. */
  def cdcPairs(s: SparkSession, d: String, tau: Double = CdcPairTau): DataFrame = {
    // pinned: the chunking projection (per-gram FNV + per-chunk md5 —
    // the heaviest per-row work here) feeds the sizes aggregate AND
    // both self-join sides; without the pin it recomputes from the
    // scan (review finding r8)
    val ch = graft.Checkpoints.pin(cdcChunkTable(s, d)
      .filter(col("n_words") >= 4)
      .select(col("doc_id"), col("fp").as("sh")).distinct())
    // the shingle family's shared-key pair stage, keyed on chunk fps
    Dedup.ngramPairsJoin(ch)
      .withColumn("score", col("common") / least(col("n_a"), col("n_b")))
      .filter(col("score") >= tau)
      .select(col("doc_a"), col("doc_b"), col("common").as("shared"), col("score"))
      .orderBy(col("score").desc, col("doc_a"), col("doc_b"))
  }

  /** The chunking replayed over an exploded token table (same result,
    * window-based plan): LAG-built grams, FNV boundary bits
    * (Dedup.FnvWordSql — the hashFeatures precedent), exclusive
    * prefix-sum chunk ids, ordered string_agg reassembly. CTE chain
    * ending in `chunks` (doc_id, chunk, ctext, n_words) — shared
    * verbatim by [[cdcChunksSql]] and [[cdcPairsSql]]. */
  /** The CDC chunking CTE chain, parameterized by the doc source (a
    * table or prior CTE exposing doc_id, text) and the FNV replay
    * (character-folding [[Dedup.FnvWordSql]] for the ASCII corpus,
    * byte-exact [[Dedup.FnvWordBytesSql]] for multibyte text). */
  private def cdcChunksCtesFrom(docsSrc: String, fnvSql: String): String =
    s"""wst AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $docsSrc),
       |toks AS (
       |  SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS i
       |  FROM wst),
       |g AS (
       |  SELECT doc_id, i, tok,
       |    CASE WHEN i >= 4 THEN
       |      LAG(tok, 3) OVER dw || ' ' || LAG(tok, 2) OVER dw || ' ' ||
       |      LAG(tok, 1) OVER dw || ' ' || tok END AS w
       |  FROM toks WINDOW dw AS (PARTITION BY doc_id ORDER BY i)),
       |gb AS (
       |  SELECT doc_id, i, tok,
       |    CASE WHEN w IS NULL THEN 0
       |         WHEN $fnvSql % 16 = 0 THEN 1 ELSE 0 END AS b
       |  FROM g),
       |ck AS (
       |  SELECT doc_id, i, tok,
       |    COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
       |  FROM gb),
       |chunks AS (
       |  SELECT doc_id, chunk, string_agg(tok, ' ' ORDER BY i) AS ctext,
       |    COUNT(*) AS n_words
       |  FROM ck GROUP BY doc_id, chunk)""".stripMargin

  private val CdcChunksCtes: String =
    s"WITH ${cdcChunksCtesFrom("documents", Dedup.FnvWordSql)}"

  val cdcChunksSql: String =
    s"""$CdcChunksCtes
       |SELECT SUBSTR(md5(ctext), 1, 16) AS fp,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |  CAST(MAX(n_words) AS INT) AS n_words
       |FROM chunks WHERE n_words >= 4 GROUP BY fp
       |ORDER BY n_occurrences DESC, fp LIMIT 20""".stripMargin

  val cdcPairsSql: String =
    s"""$CdcChunksCtes,
       |chd AS (
       |  SELECT DISTINCT doc_id, SUBSTR(md5(ctext), 1, 16) AS fp
       |  FROM chunks WHERE n_words >= 4),
       |sz AS (SELECT doc_id, COUNT(*) AS nch FROM chd GROUP BY doc_id),
       |pr AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |  FROM chd a JOIN chd b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
       |  shared / LEAST(sa.nch, sb.nch) AS score
       |FROM pr
       |JOIN sz sa ON doc_a = sa.doc_id
       |JOIN sz sb ON doc_b = sb.doc_id
       |WHERE score >= $CdcPairTau
       |ORDER BY score DESC, doc_a, doc_b""".stripMargin

  /** `text_hashfeatures` — the hashing-trick featurizer: every token
    * maps to one of `k` buckets via FNV-1a (low log₂k bits ≡ unsigned
    * mod for a power-of-two k), and the corpus feature profile is the
    * per-(lang, bucket) token and document counts — the fixed-width,
    * vocabulary-free text representation classical quality classifiers
    * train on. Oracle-exact: the DuckDB side replays FNV-1a in HUGEINT
    * (Dedup.FnvWordSql) and takes the same low bits.
    *
    * 100 TB: one narrow explode + one hash aggregation keyed on
    * (lang, bucket) — cardinality ≤ langs×k regardless of corpus size,
    * so the shuffle is constant-width. */
  def hashFeatures(s: SparkSession, d: String, k: Int = 64): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"), col("lang"),
        graft.functions.HashFunctions.fnv64(col("w"))
          .bitwiseAND(lit((k - 1).toLong)).cast("int").as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("lang"), col("bucket"))

  val hashFeaturesSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
       |th AS (SELECT doc_id, lang, ${Dedup.FnvWordSql} AS h FROM toks)
       |SELECT lang, CAST(h % 64 AS INT) AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM th GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin

  // ---- text_bpe_tokens: corpus-trained mini-BPE token counts ------------

  /** Left-to-right non-overlapping merge of adjacent (a, b) token pairs
    * — the exact semantics of a single-pass literal string replace over
    * the bracket-delimited form (shared by operator, oracle and spec). */
  private def mergePair(ts: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < ts.length) {
      if (i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) { out += (a + b); i += 2 }
      else { out += ts(i); i += 1 }
    }
    out.result()
  }

  /** Classic BPE training (Sennrich-style) over a weighted vocabulary:
    * per round, count adjacent token pairs (weighted by word frequency),
    * merge the argmax — ties broken by the bracketed pair string, so the
    * ranking is total-order deterministic and replayable in SQL. Returns
    * (literal, replacement) pairs over the bracket-delimited token form:
    * `<a><b>` → `<ab>`. */
  private[graft] def trainMerges(vocab: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    var toks: Seq[(Vector[String], Long)] =
      vocab.map { case (w, c) => (w.toCharArray.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    for (_ <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((ts, c) <- toks; i <- 0 until ts.length - 1) {
        val k = (ts(i), ts(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + c
      }
      // no pairs left = no-op round (the SQL oracle's NULL-guarded
      // replace does the same), so both sides stay aligned
      if (counts.nonEmpty) {
        val ((a, b), _) = counts.toSeq.minBy { case ((x, y), n) => (-n, s"<$x><$y>") }
        merges += ((s"<$a><$b>", s"<$a$b>"))
        toks = toks.map { case (ts, c) => (mergePair(ts, a, b), c) }
      }
    }
    merges.result()
  }

  /** `text_bpe_tokens` — tokenizer-faithful token counts: a mini-BPE
    * whose merges table is trained FROM the corpus (top-`vocabSize`
    * words by frequency, `nMerges` classic merge rounds with compounding
    * — later merges combine earlier merged tokens), then applied to
    * every word as a chain of codegen'd literal `replace` calls over a
    * bracket-delimited token form (`the` → `<t><h><e>`). Brackets make
    * single-pass literal replacement boundary-safe: a pair can only
    * match whole tokens, and adjacent matches share no characters, so
    * Java and DuckDB replace semantics agree exactly. Integer-exact
    * throughout; [[bpeTokensSql]] replays the ENTIRE pipeline — vocab,
    * the 12 training rounds (argmax via scalar subqueries), and the
    * application — in DuckDB, the same full-training-replay pattern as
    * the PQ oracle.
    *
    * 100 TB: training reads one corpus-wide word count and then runs on
    * a driver-side top-V table (the bounded-domain pattern — V is a
    * constant, like corpusMix's source quotas); application is a narrow
    * map (12 chained replaces) plus one aggregation keyed on doc_id. */
  def bpeTokens(s: SparkSession, d: String, vocabSize: Int = 300,
      nMerges: Int = 12): DataFrame =
    bpeCounts(s, d, vocabSize, nMerges).orderBy(col("doc_id"))

  /** Unordered per-doc BPE counts — shared by [[bpeTokens]] and
    * Corpus.packSequencesBpe (which re-keys sequence packing on them). */
  private[operators] def bpeCounts(s: SparkSession, d: String,
      vocabSize: Int = 300, nMerges: Int = 12): DataFrame = {
    val docs = documents(s, d)
    val vocab = docs.select(explode(words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = trainMerges(vocab, nMerges)
    val spaced = concat(lit("<"), array_join(split(col("w"), ""), "><"), lit(">"))
    val applied = merges.foldLeft(spaced) { case (c, (p, mg)) =>
      call_function("replace", c, lit(p), lit(mg))
    }
    docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      // `t` materialized in its own projection: referencing the
      // 12-replace chain twice below would otherwise recompute it per
      // reference (the langId recompute trap)
      .select(col("doc_id"), col("w"), applied.as("t"))
      .select(col("doc_id"), length(col("w")).as("wlen"),
        (length(col("t")) -
          length(call_function("replace", col("t"), lit("<"), lit("")))).as("ntok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_ws"),
        sum(col("wlen")).cast("bigint").as("n_chars"),
        sum(col("ntok")).cast("bigint").as("n_bpe"))
  }

  /** The BPE pipeline's CTE block (vocab → 12 unrolled training rounds
    * → per-word application) — shared by [[bpeTokensSql]] and
    * Corpus.packSequencesBpeSql. Use as `WITH $BpeCtes <final select
    * over tok(doc_id, w, t)>`. */
  private[operators] val BpeCtes: String = {
    val (v, m) = (300, 12)
    // every chained CTE is MATERIALIZED: DuckDB inlines CTEs by
    // default, and v_k/m_k are each referenced twice — inlining would
    // expand the 12-round chain 2^12-fold (observed as a too-many-open-
    // files explosion on the vocab scan)
    val stages = (1 to m).map { k =>
      val prev = s"v${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT pr, SUM(cnt) AS total FROM (
         |    SELECT cnt, unnest(list_transform(generate_series(1, len(ts) - 1),
         |      i -> '<' || ts[i] || '><' || ts[i+1] || '>')) AS pr
         |    FROM (SELECT cnt, string_split(t[2:len(t)-1], '><') AS ts FROM $prev))
         |  GROUP BY pr),
         |m$k AS MATERIALIZED (SELECT pr, replace(pr, '><', '') AS mg FROM p$k ORDER BY total DESC, pr LIMIT 1),
         |v$k AS MATERIALIZED (SELECT cnt, replace(t, COALESCE((SELECT pr FROM m$k), chr(1)),
         |  COALESCE((SELECT mg FROM m$k), chr(1))) AS t FROM $prev)""".stripMargin
    }.mkString(",\n")
    val applied = (1 to m).foldLeft(
      "'<' || array_to_string(string_split(w, ''), '><') || '>'") { (acc, k) =>
      s"replace($acc, COALESCE((SELECT pr FROM m$k), chr(1)), COALESCE((SELECT mg FROM m$k), chr(1)))"
    }
    s"""vocab AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w ORDER BY cnt DESC, w LIMIT $v),
       |v0 AS MATERIALIZED (SELECT cnt, '<' || array_to_string(string_split(w, ''), '><') || '>' AS t FROM vocab),
       |$stages,
       |tok AS (
       |  SELECT doc_id, w, $applied AS t
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents))""".stripMargin
  }

  /** The full BPE pipeline as DuckDB SQL: vocab → 12 unrolled training
    * rounds (pair counts → argmax row → NULL-guarded apply) → per-word
    * application → per-doc counts. Token counting reads the number of
    * `<` delimiters, exactly like the operator. */
  val bpeTokensSql: String =
    s"""WITH $BpeCtes
       |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_ws,
       |  CAST(SUM(LENGTH(w)) AS BIGINT) AS n_chars,
       |  CAST(SUM(LENGTH(t) - LENGTH(replace(t, '<', ''))) AS BIGINT) AS n_bpe
       |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- text_lm_score: bigram-LM quality scoring -------------------------

  /** `text_lm_score` — KenLM-style statistical quality scoring with a
    * corpus-trained bigram language model: P(w₂|w₁) = c(w₁w₂)/c(w₁·)
    * by maximum likelihood, and a document scores the mean conditional
    * probability over its word bigrams. The fluency/quality filter
    * stage of a training-data pipeline (docs whose transitions are
    * atypical for the corpus score low), without the log-space floats
    * that break cross-engine parity: each conditional probability is
    * quantised EXACTLY as (10⁹·c_pair) DIV c_prefix — pure integer
    * arithmetic — summed as integers, with one final double division
    * for the readable score.
    *
    * 100 TB: bigram explode (narrow) → two hash aggregations (pair and
    * prefix counts) → one equi-join keyed on the bigram → one doc-keyed
    * aggregation. Counts shuffle as (word-pair, long); no driver-side
    * state. The 10⁹ quantiser bounds c_pair at ~9·10⁹ in int64 — a
    * 100 TB corpus promotes the product to DECIMAL(38,0), same
    * semantics. */
  def lmScore(s: SparkSession, d: String): DataFrame = {
    val bi = documents(s, d)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1),
          i => struct(element_at(col("ws"), i).as("w1"),
            element_at(col("ws"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val pairC = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cp"))
    val prefC = bi.groupBy(col("w1")).agg(count(lit(1)).as("cw"))
    val probs = pairC.join(prefC, "w1")
      .select(col("w1"), col("w2"),
        expr("CAST((1000000000 * cp) DIV cw AS BIGINT)").as("q"))
    bi.join(probs, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_bigrams"), sum(col("q")).as("q_sum"))
      .select(col("doc_id"), col("n_bigrams"), col("q_sum"),
        (col("q_sum").cast("double") / col("n_bigrams") / 1e9).as("lm_score"))
      .orderBy(col("doc_id"))
  }

  val lmScoreSql: String =
    """WITH bi AS MATERIALIZED (
      |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) dd,
      |       unnest(generate_series(1, len(ws) - 1)) AS t(i)
      |  WHERE len(ws) >= 2),
      |pc AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS cp FROM bi GROUP BY w1, w2),
      |wc AS MATERIALIZED (SELECT w1, COUNT(*) AS cw FROM bi GROUP BY w1),
      |pr AS MATERIALIZED (
      |  SELECT pc.w1, pc.w2, (1000000000 * cp) // cw AS q
      |  FROM pc JOIN wc ON pc.w1 = wc.w1)
      |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
      |  CAST(SUM(q) AS BIGINT) AS q_sum,
      |  CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1e9 AS lm_score
      |FROM bi JOIN pr ON bi.w1 = pr.w1 AND bi.w2 = pr.w2
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- text_scrub: PII redaction ----------------------------------------

  /** Engine-portable PII patterns: explicit character classes and
    * bounded quantifiers only — no \d/\b/\w shorthands, whose semantics
    * (and unicode behavior) differ between Java regex (Spark) and RE2
    * (DuckDB). Shared verbatim by the operator, the oracle SQL and the
    * spec's independent Java-regex recheck. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Deterministic PII augmentation: the synthetic corpus carries no
    * natural emails/phones/IPs, so both engines append identical
    * doc_id-derived contact lines to keyed subsets (the slices overlap,
    * so some docs carry several PII kinds and most carry none — both
    * cases exercised). This stands in for real documents' embedded PII;
    * the scrub itself never depends on how the PII got there. */
  private def augmented: Column = concat(col("text"),
    when(col("doc_id") % 5 === 0,
      concat(lit(" Contact alice.smith+"), col("doc_id").cast("string"),
        lit("@mail-example.org or bob@test.net for details.")))
      .otherwise(lit("")),
    when(col("doc_id") % 7 === 0,
      concat(lit(" Call 415-555-0"),
        lpad((col("doc_id") % 100).cast("string"), 3, "0"), lit(" now.")))
      .otherwise(lit("")),
    when(col("doc_id") % 11 === 0,
      concat(lit(" Server 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".42 responded.")))
      .otherwise(lit("")))

  /** `text_scrub` — the standard pre-training privacy stage: redact
    * emails, phone numbers and IPv4 addresses via codegen'd
    * regexp_replace, emitting per-doc redaction counts by kind plus the
    * md5 of the scrubbed text (so the oracle proves REPLACEMENT parity,
    * not just counting parity). Counts are taken before redaction;
    * replacements apply email → phone → IP (the patterns are disjoint
    * on this construction, so order only matters for determinism).
    *
    * 100 TB: a pure narrow map — no shuffle except the final ordering;
    * scales with input splits like the rest of the text family. */
  def scrub(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), augmented.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(EmailPattern)).as("n_emails"),
        regexp_count(col("t"), lit(PhonePattern)).as("n_phones"),
        regexp_count(col("t"), lit(Ipv4Pattern)).as("n_ips"),
        md5(regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), EmailPattern, "<EMAIL>"),
            PhonePattern, "<PHONE>"),
          Ipv4Pattern, "<IP>")).as("scrubbed_md5"))
      .orderBy(col("doc_id"))

  val scrubSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' Contact alice.smith+' || CAST(doc_id AS VARCHAR) || '@mail-example.org or bob@test.net for details.' ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' Call 415-555-0' || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0') || ' now.' ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0 THEN ' Server 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.42 responded.' ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$EmailPattern')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$PhonePattern')) AS INT) AS n_phones,
       |  CAST(len(regexp_extract_all(t, '$Ipv4Pattern')) AS INT) AS n_ips,
       |  md5(regexp_replace(regexp_replace(regexp_replace(t,
       |    '$EmailPattern', '<EMAIL>', 'g'),
       |    '$PhonePattern', '<PHONE>', 'g'),
       |    '$Ipv4Pattern', '<IP>', 'g')) AS scrubbed_md5
       |FROM aug
       |ORDER BY doc_id""".stripMargin
}
