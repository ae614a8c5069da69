package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.6): media payloads are
  * opaque `binary` columns beside a typed metadata struct, processed in
  * batch-shaped `mapPartitions` passes.
  *
  * The container has no real image/audio codecs, so the decode boundary
  * is STUBBED with a deterministic fake (byte histogram / byte slicing)
  * — clearly marked below. Everything Spark-side is real: schemas,
  * encoders, partition-batch processing shape, and the explode pattern
  * for frame sampling. Swapping `FakeCodec` for a JNI/ffmpeg decoder
  * changes no plan shape.
  *
  * Scale: payloads never pass through a shuffle — feature extraction is
  * a narrow mapPartitions before any aggregation, so at 100 TB only the
  * (id, features/meta) rows move.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int,
      codec: String, durationMs: Long)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, nBytes: Int,
      features: Array[Double])
  case class Frame(media_id: Long, frameIdx: Int, tsMs: Long,
      framePayload: Array[Byte])
  case class MediaQualityRaw(media_id: Long, kind: String, width: Int,
      height: Int, durationMs: Long, nBytes: Int, maxBucket: Int)

  /** Deterministic fake decode/encode boundary — the stub. */
  object FakeCodec {
    /** "Decode": raw 16-bucket byte-class histogram counts. */
    def histCounts(payload: Array[Byte]): Array[Int] = {
      val h = new Array[Int](16)
      var i = 0
      while (i < payload.length) { h((payload(i) & 0xff) % 16) += 1; i += 1 }
      h
    }
    /** "Decode + feature-extract": the histogram, L1-normalized. */
    def features(payload: Array[Byte]): Array[Double] = {
      val n = math.max(payload.length, 1).toDouble
      histCounts(payload).map(_ / n)
    }
    /** "Resize/re-encode": size-capped byte slice standing in for a
      * real transcode. */
    def reencode(payload: Array[Byte], maxBytes: Int): Array[Byte] =
      payload.take(maxBytes)
    /** "Frame sample": one pseudo-frame per `stepMs` of duration. */
    def frames(r: MediaRow, stepMs: Long): Iterator[Frame] = {
      val n = math.max(1, (r.meta.durationMs / stepMs).toInt)
      (0 until n).iterator.map { i =>
        // O(64) slice, not drop+take: Array.drop copies the whole tail
        // per frame, turning the sweep quadratic in payload length
        val from = math.min(i * 16, r.payload.length)
        val until = math.min(from + 64, r.payload.length)
        Frame(r.media_id, i, i * stepMs,
          java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** Deterministic media table synthesized from `documents` (payload =
    * UTF-8 text bytes as the opaque blob; metadata is a pure function
    * of doc_id so the DuckDB oracle can recompute it). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      struct(
        element_at(lit(Array("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        (lit(64) + (col("doc_id") % 16) * 16).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 9) * 16).cast("int").as("height"),
        element_at(lit(Array("raw", "lz", "rle")),
          (col("doc_id") % 3 + 1).cast("int")).as("codec"),
        (col("n_chars") * 10).as("durationMs")).as("meta"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batch-shaped feature extraction through the stubbed decoder. */
  def extractFeatures(s: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import s.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length,
          FakeCodec.features(r.payload))
      }
    }
  }

  /** Frame sampling: one row per pseudo-frame of each video. */
  def frameSample(s: SparkSession, media: DataFrame, stepMs: Long = 500): Dataset[Frame] = {
    import s.implicits._
    media.as[MediaRow]
      .filter(_.meta.kind == "video")
      .flatMap(FakeCodec.frames(_, stepMs))
  }

  /** Oracle-checkable metadata aggregate (meta is a pure function of
    * doc_id/n_chars, so DuckDB recomputes it from `documents`). */
  def metaAgg(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .groupBy(col("meta.kind").as("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("meta.width").cast("bigint")).as("total_width"),
        sum(col("meta.durationMs")).as("total_ms"),
        sum(length(col("payload")).cast("bigint")).as("total_bytes"))
      .orderBy(col("kind"))

  val metaAggSql: String =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  COUNT(*) AS n,
      |  CAST(SUM(64 + (doc_id % 16) * 16) AS BIGINT) AS total_width,
      |  CAST(SUM(n_chars * 10) AS BIGINT) AS total_ms,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM documents
      |GROUP BY 1
      |ORDER BY kind""".stripMargin

  /** Binary-payload content dedup: survivor (min media_id) per distinct
    * payload hash — exact dedup over the opaque blob column itself, no
    * decode needed. The shuffle carries 16-byte hashes + counters,
    * never payloads (same shape as Dedup.exact, proven on binary). */
  def payloadDedup(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Payloads are the UTF-8 text bytes, so DuckDB's md5(text) hashes
    * the identical byte string. */
  val payloadDedupSql: String =
    """SELECT md5(text) AS payload_md5, MIN(doc_id) AS keep_id,
      |  COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY keep_id""".stripMargin

  /** `mm_quality` — the media curation gate (corpus_gate's multimodal
    * twin): every asset gets a REASONS bitmask over metadata- and
    * content-level checks, `pass` ⇔ no bit set. Checks, each the stub
    * stand-in for a real perceptual filter:
    *  - bit 0 `too_small`   — payload under 256 bytes (thumbnail-sized
    *    asset; a real pipeline drops sub-resolution media);
    *  - bit 1 `aspect`      — extreme aspect ratio (w > 2h or h > 2w),
    *    metadata-only, the banner/sliver filter;
    *  - bit 2 `low_diversity` — dominant byte-class share above 1/5
    *    through the DECODED histogram (flat/monochrome stand-in). The
    *    comparison is 5·max > n in exact integers — no share division
    *    for engines to disagree on;
    *  - bit 3 `over_long`   — declared duration above 4 s (the clip
    *    length cap).
    * All mask arithmetic is integer; the only decode is the same
    * narrow mapPartitions pass the mm family already pays, emitting
    * (id, kind, meta scalars, max bucket) — payloads never shuffle,
    * and the mask itself is a codegen'd scan-side projection. At
    * 100 TB this is a single narrow pass, like corpus_gate. */
  def qualityTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = mediaTable(s, d).as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val h = FakeCodec.histCounts(r.payload)
        MediaQualityRaw(r.media_id, r.meta.kind, r.meta.width,
          r.meta.height, r.meta.durationMs, r.payload.length, h.max)
      }
    }.toDF()
    raw.select(col("media_id"), col("kind"),
      col("nBytes").as("n_bytes"),
      (when(col("nBytes") < 256, 1).otherwise(0)
        + when(col("width") > col("height") * 2 ||
            col("height") > col("width") * 2, 2).otherwise(0)
        + when(col("maxBucket") * 5 > col("nBytes"), 4).otherwise(0)
        + when(col("durationMs") > 4000, 8).otherwise(0))
        .cast("int").as("reasons"))
      .withColumn("pass", col("reasons") === 0)
      .orderBy(col("media_id"))
  }

  /** The gate replayed from `documents`: metadata is the mediaTable
    * doc_id formula, the decoded histogram is the char-class count
    * (ASCII corpus — the featureTableSql contract), mask arithmetic
    * identical integers. */
  val qualitySql: String = {
    val counts = (0 until 16).map(b =>
      s"len(list_filter(string_split(text, ''), c -> ord(c) % 16 = $b))")
      .mkString(",\n      ")
    s"""WITH m AS (
       |  SELECT doc_id, text, n_chars,
       |    64 + (doc_id % 16) * 16 AS w,
       |    64 + (doc_id % 9) * 16 AS h,
       |    octet_length(encode(text)) AS nb,
       |    GREATEST($counts) AS maxb
       |  FROM documents)
       |SELECT doc_id AS media_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |  CAST(nb AS INT) AS n_bytes,
       |  CAST((CASE WHEN nb < 256 THEN 1 ELSE 0 END)
       |     + (CASE WHEN w > 2 * h OR h > 2 * w THEN 2 ELSE 0 END)
       |     + (CASE WHEN 5 * maxb > nb THEN 4 ELSE 0 END)
       |     + (CASE WHEN n_chars * 10 > 4000 THEN 8 ELSE 0 END) AS INT) AS reasons,
       |  ((CASE WHEN nb < 256 THEN 1 ELSE 0 END)
       |     + (CASE WHEN w > 2 * h OR h > 2 * w THEN 2 ELSE 0 END)
       |     + (CASE WHEN 5 * maxb > nb THEN 4 ELSE 0 END)
       |     + (CASE WHEN n_chars * 10 > 4000 THEN 8 ELSE 0 END)) = 0 AS "pass"
       |FROM m
       |ORDER BY media_id""".stripMargin
  }

  /** Per-media features through the stubbed decoder. Feature values are
    * emitted as floor(1e6·f) micro-units: the histogram ratio k/n is an
    * exact IEEE division in both engines, and floor is unambiguous —
    * unlike round(), whose half-way tie-break differs across engines. */
  def featureTable(s: SparkSession, d: String): DataFrame = {
    val f = extractFeatures(s, mediaTable(s, d))
    f.toDF().select(col("media_id"), col("kind"), col("nBytes"),
      floor(element_at(col("features"), 1) * lit(1e6)).cast("bigint").as("f0_ppm"),
      floor(element_at(col("features"), 8) * lit(1e6)).cast("bigint").as("f7_ppm"))
      .orderBy(col("media_id"))
  }

  /** The payload is the UTF-8 text bytes (pure ASCII corpus), so the
    * byte histogram buckets are recomputable from character codes. */
  val featureTableSql: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS INT) AS "nBytes",
      |  CAST(FLOOR((len(list_filter(string_split(text, ''), c -> ord(c) % 16 = 0))
      |       / GREATEST(octet_length(encode(text)), 1)) * 1e6) AS BIGINT) AS f0_ppm,
      |  CAST(FLOOR((len(list_filter(string_split(text, ''), c -> ord(c) % 16 = 7))
      |       / GREATEST(octet_length(encode(text)), 1)) * 1e6) AS BIGINT) AS f7_ppm
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** `mm_similar` — payload similarity search through the stubbed
    * decoder: every medium's 16-bin byte-histogram feature vector
    * (FakeCodec.features — the stand-in for a real image/audio
    * embedding), ppm-quantised (the featureTable idiom), scored by
    * cosine against the query medium's vector, top-10 — the
    * "find visually similar assets" near-dup path, composed from the
    * SAME decode boundary as the other mm_* queries and the SAME
    * cosine fold as the ann_* family (one shared oracle fragment).
    *
    * 100 TB: feature extraction is the narrow mapPartitions decode
    * pass the mm family already pays; only (id, kind, 16-dim vector)
    * rows leave it, the query vector broadcasts, and the scoring is
    * a scan-side projection + top-k — payloads never shuffle. */
  def similarTable(s: SparkSession, d: String,
      queryId: Long = 0L, k: Int = 10): DataFrame = {
    import graft.functions.VectorFunctions.dotD
    // the native codegen'd dot (its dotDD arm handles array<double>;
    // same left-to-right IEEE fold as cosOf's list_reduce — a seedless
    // reduce starting at the first product, and 0.0 + x == x exactly
    // for these non-negative histograms); norms precomputed once per
    // row, the cosineToQuery n2/q_n2 idiom
    def quantized(media: DataFrame): DataFrame =
      extractFeatures(s, media).toDF()
        .select(col("media_id"), col("kind"),
          transform(col("features"), v => floor(v * 1e6) / 1e6).as("v"))
        .withColumn("n2", dotD(col("v"), col("v")))
    // the id predicates sit BEFORE the opaque mapPartitions decode —
    // a filter above extractFeatures cannot push through it, and the
    // broadcast side would otherwise re-decode the whole corpus
    // (review finding r8)
    val q = quantized(mediaTable(s, d).filter(col("media_id") === queryId))
      .select(col("v").as("qv"), col("n2").as("q_n2"))
    quantized(mediaTable(s, d).filter(col("media_id") =!= queryId))
      .crossJoin(broadcast(q))
      .select(col("media_id"), col("kind"),
        (dotD(col("v"), col("qv")) / sqrt(col("n2") * col("q_n2"))).as("cos"))
      .orderBy(col("cos").desc, col("media_id"))
      .limit(k)
  }

  /** The 16 histogram buckets recomputed from character codes (pure
    * ASCII corpus — the featureTableSql contract), then the shared
    * ann-family cosine fold over the quantised vectors. */
  val similarSql: String = {
    val buckets = (0 until 16).map(b =>
      s"""CAST(FLOOR((len(list_filter(string_split(text, ''), c -> ord(c) % 16 = $b))
         |      / GREATEST(octet_length(encode(text)), 1)) * 1e6) AS DOUBLE) / 1e6""".stripMargin)
      .mkString(",\n    ")
    s"""WITH feat AS (
       |  SELECT doc_id AS media_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    [$buckets] AS v
       |  FROM documents)
       |SELECT f.media_id, f.kind,
       |  ${graft.operators.Similarity.cosOf("f.v", "q.qv")} AS cos
       |FROM feat f
       |CROSS JOIN (SELECT v AS qv FROM feat WHERE media_id = 0) q
       |WHERE f.media_id <> 0
       |ORDER BY cos DESC, media_id LIMIT 10""".stripMargin
  }

  /** Transcode surface: re-encode every payload through the stubbed
    * codec at a 64-byte budget and emit size + content hash of the
    * result — the "resize/compress the blob column" pipeline step.
    * Narrow mapPartitions; at 100 TB the payloads stream through the
    * scan stage and only (id, size, hash) rows leave the executors. */
  def transcodeTable(s: SparkSession, d: String, maxBytes: Int = 64): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val out = FakeCodec.reencode(r.payload, maxBytes)
        (r.media_id, out.length, out)
      }
    }.toDF("media_id", "out_bytes", "out_payload")
      .select(col("media_id"), col("out_bytes"),
        md5(col("out_payload")).as("out_md5"))
      .orderBy(col("media_id"))
  }

  /** The stub truncates bytes, and the payload is the ASCII text — so
    * the transcoded blob is exactly substr(text, 1, 64). */
  val transcodeTableSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(LEAST(octet_length(encode(text)), 64) AS INT) AS out_bytes,
      |  md5(substr(text, 1, 64)) AS out_md5
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Sampled frames for video media. */
  def frameTable(s: SparkSession, d: String): DataFrame =
    frameSample(s, mediaTable(s, d)).toDF()
      .select(col("media_id"), col("frameIdx"), col("tsMs"),
        length(col("framePayload")).as("frame_bytes"))
      .orderBy(col("media_id"), col("frameIdx"))

  /** `mm_asof_align` — A/V synchronization audit: every sampled video
    * frame is aligned to the LATEST audio chunk at or before it (the
    * as-of join every multimodal training pipeline runs to pair visual
    * tokens with their covering audio segment), and the per-media
    * audit reports frame count, worst/total alignment lag and the
    * misaligned-frame count (lag > 600 ms — more than an audio chunk
    * away). Frames come through the stubbed decoder (real plumbing —
    * only (id, ts) leaves the partition); the audio chunk track is
    * plan-side from metadata (no decode needed for timestamps).
    *
    * The as-of is the DISTRIBUTED shape (the q24 idiom): one union of
    * both tracks, ONE shuffle on media_id, and a running
    * last-chunk-timestamp window — never a frames×chunks range join,
    * which is quadratic per media. Chunks sort BEFORE frames at equal
    * timestamps (isF tiebreak), so a frame landing exactly on a chunk
    * boundary aligns to that chunk. All lags are exact integer ms. */
  def avAlign(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val media = mediaTable(s, d)
    val frames = frameSample(s, media).toDF()
      .select(col("media_id"), col("tsMs").as("ts"), lit(1).as("isF"))
    val chunks = media.filter(col("meta.kind") === "video")
      .select(col("media_id"), explode(expr(
        "sequence(0, CAST(greatest(1, meta.durationMs DIV 700) AS INT) - 1)"))
        .as("chunk_idx"))
      .select(col("media_id"), (col("chunk_idx") * 700L).as("ts"),
        lit(0).as("isF"))
    val w = Window.partitionBy(col("media_id"))
      .orderBy(col("ts"), col("isF"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frames.unionByName(chunks)
      .withColumn("asof_ts",
        last(when(col("isF") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("isF") === 1)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(col("ts") - col("asof_ts")).as("max_lag_ms"),
        sum(col("ts") - col("asof_ts")).as("total_lag_ms"),
        sum(when(col("ts") - col("asof_ts") > 600, 1L).otherwise(0L))
          .as("n_misaligned"))
      .orderBy(col("media_id"))
  }

  /** Both tracks are pure functions of (doc_id, n_chars), so the
    * oracle regenerates them and replays the same running-last as-of. */
  val avAlignSql: String =
    """WITH v AS (
      |  SELECT doc_id AS media_id, n_chars * 10 AS dur
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (
      |  SELECT media_id, CAST(g.i * 500 AS BIGINT) AS ts, 1 AS isf
      |  FROM v, LATERAL (SELECT unnest(generate_series(0,
      |    GREATEST(1, dur // 500) - 1)) AS i) g),
      |c AS (
      |  SELECT media_id, CAST(g.j * 700 AS BIGINT) AS ts, 0 AS isf
      |  FROM v, LATERAL (SELECT unnest(generate_series(0,
      |    GREATEST(1, dur // 700) - 1)) AS j) g),
      |a AS (
      |  SELECT media_id, ts, isf,
      |    LAST_VALUE(CASE WHEN isf = 0 THEN ts END IGNORE NULLS) OVER
      |      (PARTITION BY media_id ORDER BY ts, isf
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
      |  FROM (SELECT * FROM f UNION ALL SELECT * FROM c))
      |SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
      |  CAST(MAX(ts - asof_ts) AS BIGINT) AS max_lag_ms,
      |  CAST(SUM(ts - asof_ts) AS BIGINT) AS total_lag_ms,
      |  CAST(SUM(CASE WHEN ts - asof_ts > 600 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_misaligned
      |FROM a WHERE isf = 1
      |GROUP BY media_id
      |ORDER BY media_id""".stripMargin

  /** Frame count/size are pure functions of n_chars / byte length:
    * n = max(1, durationMs/500), frame i carries bytes [16i, 16i+64). */
  val frameTableSql: String =
    """SELECT doc_id AS media_id, CAST(g.i AS INT) AS "frameIdx",
      |  CAST(g.i * 500 AS BIGINT) AS "tsMs",
      |  CAST(LEAST(64, GREATEST(0, octet_length(encode(text)) - g.i * 16)) AS INT) AS frame_bytes
      |FROM documents,
      |  LATERAL (SELECT unnest(generate_series(0, GREATEST(1, (n_chars * 10) // 500) - 1)) AS i) g
      |WHERE doc_id % 3 = 2
      |ORDER BY media_id, "frameIdx"""".stripMargin
}
