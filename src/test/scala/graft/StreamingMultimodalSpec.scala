package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.streaming.Streams

class StreamingMultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming windowed agg equals the batch equivalent") {
    val streamed = Streams.windowedAgg(spark, sf).collect()
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").as("total"))
      .orderBy(col("window_start"), col("event_type"))
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
  }

  test("stateful sessionize agrees with the batch window query (q18)") {
    val sess = Streams.sessionizeTable(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
    val batch = queries.Analytics.q18(spark, sf)
    val j = sess.as("s").join(batch.as("b"), Seq("user_id"))
    val total = j.count()
    assert(total > 0)
    val mismatch = j.filter(col("s.n_sessions") =!= col("b.n_sessions") ||
      col("s.n_events") =!= col("b.n_events")).count()
    assert(mismatch == 0, s"$mismatch users disagree between streaming and batch sessionization")
    assert(sess.count() == batch.count())
  }

  /** Timeout-closed vs upsert-snapshot sessionization must produce the
    * SAME sessions: sessionTimeoutTable emits each exactly once (tail
    * sessions reaped by the event-time timeout — a user's final
    * session has no later event, so its presence proves the timeout
    * path fired), while sessionizeTable upserts snapshots and keeps
    * the latest. */
  test("stream_session_timeout equals upsert sessionization, emit-once") {
    val viaTimeout = Streams.sessionTimeoutTable(spark, sf).collect()
    val viaUpsert = Streams.sessionizeTable(spark, sf).collect()
    assert(viaTimeout.nonEmpty)
    assert(viaTimeout.map(_.toSeq).toSeq == viaUpsert.map(_.toSeq).toSeq,
      "timeout-closed sessions diverge from upsert-closed sessions")
    // emit-once: raw emissions already unique per (user, start)
    val keys = viaTimeout.map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(keys.distinct.length == keys.length, "a session was emitted twice")
  }

  test("multimodal: feature extraction is deterministic and normalized") {
    val media = Multimodal.mediaTable(spark, sf)
    val f = Multimodal.extractFeatures(spark, media).collect()
    assert(f.length == media.count())
    f.foreach { r =>
      assert(math.abs(r.features.sum - 1.0) < 1e-9, "histogram must be L1-normalized")
      assert(r.nBytes > 0)
    }
    // determinism across runs
    val f2 = Multimodal.extractFeatures(spark, media).collect()
    assert(f.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("multimodal: frame sampling yields duration/step frames per video") {
    val media = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.frameSample(spark, media, stepMs = 500)
    val perVideo = frames.groupBy("media_id").count()
    val videos = media.filter(col("meta.kind") === "video")
      .select(col("media_id"), (col("meta.durationMs") / 500).cast("long").as("expect"))
    val bad = perVideo.join(videos, "media_id")
      .filter(col("count") =!= greatest(col("expect"), lit(1L))).count()
    assert(bad == 0)
  }

  test("mm_similar: parity with an in-memory FakeCodec cosine scan") {
    import graft.multimodal.Multimodal
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def vec(t: String): Array[Double] =
      Multimodal.FakeCodec.features(t.getBytes("UTF-8"))
        .map(f => math.floor(f * 1e6) / 1e6)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val q = vec(docs.find(_._1 == 0L).get._2)
    val expected = docs.filter(_._1 != 0L)
      .map { case (id, t) =>
        val v = vec(t)
        (id, dot(v, q) / math.sqrt(dot(v, v) * dot(q, q)))
      }
      .sortBy { case (id, cos) => (-cos, id) }.take(10).toSeq
    val got = Multimodal.similarTable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("mm_quality: mask parity with an in-memory FakeCodec replay; every check fires") {
    import graft.multimodal.Multimodal
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.map { case (id, t, nChars) =>
      val bytes = t.getBytes("UTF-8")
      val (w, h) = (64 + (id % 16) * 16, 64 + (id % 9) * 16)
      val maxB = Multimodal.FakeCodec.histCounts(bytes).max
      val reasons = (if (bytes.length < 256) 1 else 0) +
        (if (w > 2 * h || h > 2 * w) 2 else 0) +
        (if (5L * maxB > bytes.length) 4 else 0) +
        (if (nChars * 10 > 4000) 8 else 0)
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video" }
      (id, kind, bytes.length, reasons, reasons == 0)
    }.sortBy(_._1).toSeq
    val got = Multimodal.qualityTable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4))).toSeq
    assert(got == expected, "quality mask must replay exactly")
    for (bit <- Seq(1, 2, 4, 8))
      assert(got.exists(r => (r._4 & bit) != 0),
        s"check bit $bit never fires — the gate would rubber-stamp")
    assert(got.exists(_._5), "some assets must pass")
  }

  test("mm_asof_align: per-media replay; boundary frames align to their own chunk") {
    val got = Multimodal.avAlign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 3 == 2)
    val expected = docs.map { case (id, nChars) =>
      val dur = nChars * 10
      val frames = (0L until math.max(1L, dur / 500)).map(_ * 500)
      val chunkTs = (0L until math.max(1L, dur / 700)).map(_ * 700)
      // as-of: latest chunk at or BEFORE the frame (boundary inclusive)
      val lags = frames.map(f => f - chunkTs.filter(_ <= f).max)
      (id, frames.size.toLong, lags.max, lags.sum,
        lags.count(_ > 600).toLong)
    }.sortBy(_._1).toSeq
    assert(got.toSeq == expected)
    // construction must exercise both aligned and misaligned frames,
    // and at least one exact-boundary alignment (lag == 0 beyond idx 0)
    assert(got.exists(_._5 > 0) && got.exists(_._3 <= 600),
      "degenerate lag distribution")
  }

  test("fnv64/simhash64/dot_product are SQL-callable after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT fnv64('a') AS h, simhash64(array('x','y')) AS sh, " +
        "dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dp").head()
    assert(r.getLong(0) == 0xaf63dc4c8601ec8cL)
    assert(r.getLong(1) != 0L)
    assert(r.getDouble(2) == 11.0)
  }

  test("SQL functions reject wrong argument counts with a clear error") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception](spark.sql("SELECT fnv64('a', 'b')").head())
    assert(ex.getMessage.contains("expects 1 argument"))
  }
}
