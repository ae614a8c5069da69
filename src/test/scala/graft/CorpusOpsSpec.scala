package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

/** Specs for the corpus-preparation operators (Corpus.scala): each is
  * checked against an independent in-memory recomputation at sf0.001,
  * plus the plan properties that make it scale (no global window for
  * packing, broadcast joins for decontamination).
  */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  test("chunk_documents covers every doc with the substr sliding window") {
    val got = Corpus.chunks(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getLong(3), r.getString(4))))
      .toMap
    val expected = for {
      (id, text) <- docs
      nChunks = (text.length - 1) / 150 + 1
      i <- 0 until nChunks
    } yield {
      val start = i * 150
      val chunk = text.substring(start, math.min(start + 200, text.length))
      ((id, i), (start + 1, chunk.length.toLong, md5hex(chunk)))
    }
    assert(got.size == expected.size, "chunk count mismatch")
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"chunk $k differs")
    }
  }

  test("pack_sequences equals a sequential greedy pack of the same order") {
    val toks = docs.map { case (id, t) => (id, t.split(" ", -1).length.toLong) }
    var cum = 0L
    val packOf = toks.map { case (id, n) =>
      val p = cum / 1000; cum += n; (id, n, p)
    }
    val expected = packOf.groupBy(_._3).toSeq.sortBy(_._1).map {
      case (p, rows) =>
        (p, rows.length.toLong, rows.map(_._2).sum, rows.map(_._1).min, rows.map(_._1).max)
    }
    val got = Corpus.packSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // every pack except possibly the last starts within budget of its
    // predecessor: pack ids are contiguous from 0
    assert(got.map(_._1) == got.indices.map(_.toLong))
  }

  /** pack_sequences_bpe: PACKING semantics vs a sequential greedy pack
    * over the BPE counts (the counts themselves are independently
    * verified against an in-memory BPE in CurationSpec). */
  test("pack_sequences_bpe equals a sequential greedy pack of BPE counts") {
    val toks = graft.operators.TextAnalysis.bpeTokens(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    var cum = 0L
    val packOf = toks.map { case (id, n) =>
      val p = cum / 1000; cum += n; (id, n, p)
    }
    val expected = packOf.groupBy(_._3).toSeq.sortBy(_._1).map {
      case (p, rows) =>
        (p, rows.length.toLong, rows.map(_._2).sum, rows.map(_._1).min, rows.map(_._1).max)
    }
    val got = Corpus.packSequencesBpe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.map(_._1) == got.indices.map(_.toLong))
  }

  test("corpus_shard covers the corpus exactly, deterministically, in range") {
    val rows = Corpus.corpusShard(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall { case (s, _, _, _) => s >= 0 && s < 16 })
    assert(rows.map(_._2).sum == docs.length, "shards must cover every doc once")
    val totalTokens = docs.map(_._2.split(" ", -1).length.toLong).sum
    val totalChars = docs.map(_._2.length.toLong).sum
    assert(rows.map(_._3).sum == totalTokens && rows.map(_._4).sum == totalChars)
    // stable across runs (content-hash keyed, not partitioning-keyed)
    val again = Corpus.corpusShard(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == rows.toSeq)
    // and no empty/hot shard on this corpus: every shard has docs
    assert(rows.length == 16 && rows.forall(_._2 > 0))
  }

  test("corpus_token_budget equals a sequential greedy selection by quality rank") {
    // the score itself is text_quality's (oracle-checked there); this
    // pins the SELECTION: rank by (quality desc, doc_id), running sum,
    // cut at the budget — recomputed sequentially in memory
    val scored = graft.operators.TextAnalysis.quality(spark, sf)
      .select("doc_id", "quality", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2).toLong))
    val ranked = scored.sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    val expected = ranked.flatMap { case (id, q, n) =>
      cum += n
      if (cum <= 10000L) Some((id, q, n, cum)) else None
    }.toSeq
    val got = Corpus.tokenBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "budget selection must be non-empty at sf0.001")
  }


  /** SinglePartition is legitimate ONLY directly over an aggregate
    * (the <=nPart in-plan offsets counts / scalar partials —
    * metadata-sized); over anything else it is a data-scale global
    * window (the shape these specs exist to forbid). */
  private def assertSinglePartitionOnlyOverAggregates(p: String): Unit = {
    val lines = p.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (_, i) =>
        val child = lines.drop(i + 1).take(1).mkString
        assert(child.contains("HashAggregate"),
          s"SinglePartition over non-aggregate data at line $i:\n$p")
      }
  }

  test("corpus_token_budget does not run a global single-partition window") {
    val df = Corpus.tokenBudget(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assertSinglePartitionOnlyOverAggregates(p)
    assert(p.contains("Window"), "expected the per-partition cumsum window")
  }

  test("pack_sequences does not run a global single-partition window") {
    val df = Corpus.packSequences(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the cumsum window must be pid-partitioned; a data-scale global
    // window would force an Exchange SinglePartition over non-aggregate
    // input (the in-plan offsets window over <=nPart counts is the one
    // legitimate SinglePartition, r11)
    assertSinglePartitionOnlyOverAggregates(p)
    assert(p.contains("Window"), "expected the per-partition cumsum window")
  }

  test("dedup_decontaminate matches a brute-force 5-gram overlap") {
    val evalIds = docs.map { case (id, _) => (md5hex(id.toString), id) }
      .sorted.take(50).map(_._2).toSet
    def grams(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < 5) Set.empty
      else ws.sliding(5).map(_.mkString(" ")).toSet
    }
    val evalGrams = docs.filter(d => evalIds(d._1)).flatMap(d => grams(d._2)).toSet
    val expected = docs.filterNot(d => evalIds(d._1))
      .map { case (id, t) => (id, grams(t).count(evalGrams).toLong) }
      .filter(_._2 > 0)
    val got = Corpus.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("dedup_decontaminate broadcasts the eval side (no pairwise doc join)") {
    val df = Corpus.decontaminate(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairwise join detected:\n$p")
  }

  test("dedup_incremental drops exactly the re-delivered base slice") {
    val fps = docs.map { case (id, t) => (id, md5hex(t)) }
    val baseFps = fps.filter(_._1 % 2 == 0).map(_._2).toSet
    val expected = fps
      .filter { case (id, _) => id % 2 == 1 || id % 10 == 0 }
      .collect { case (id, fp) if !baseFps(fp) => id }
    val got = Corpus.incremental(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(got == expected)
    // the simulated re-crawl rows (even, %10==0) must all be dropped
    assert(got.forall(_ % 2 == 1), "a re-delivered base doc leaked through")
  }

  test("corpus_mix does not re-inline the gate into its filter") {
    val df = Corpus.corpusMix(spark, sf)
    df.collect()
    // the reasons filter must run over the checkpointed attribute; a
    // filter pushed into the withReasons projection re-inlines the
    // token split per array element (O(words²) per doc — measured
    // 4.5 s vs 0.4 s at sf0.1)
    val filters = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Filter ")).mkString("\n")
    assert(!filters.contains("split("),
      s"gate expression re-inlined into a filter:\n$filters")
  }

  test("corpus_mix quotas are proportional with a 1-doc floor and filled exactly") {
    val rows = Corpus.corpusMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val gated = graft.operators.Curation.withReasons(Tables.documents(spark, sf))
      .filter(col("reasons") === 0).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = gated.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val perSrc = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    for ((src, nPass) <- counts) {
      val quota = math.max(1L, 200L * nPass / total)
      assert(perSrc.getOrElse(src, 0L) == math.min(quota, nPass),
        s"source $src: expected min(quota=$quota, nPass=$nPass)")
    }
    // ranks contiguous from 1 within each source
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
    }
  }

  test("corpus_card: parity with an in-memory datasheet recompute") {
    val rows = Tables.documents(spark, sf)
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expected = rows.groupBy(_._1).toSeq.map { case (src, ds) =>
      val nDocs = ds.length.toLong
      val langs = ds.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      val (topLang, nl) = langs.sortBy { case (l, n) => (-n, l) }.head
      val nDup = ds.groupBy(_._4).values
        .collect { case g if g.size > 1 => g.size.toLong }.sum
      (src, nDocs, ds.map(_._3).sum, langs.length.toLong, topLang,
        1000000L * nl / nDocs, nDup)
    }.sortBy(_._1)
    val got = Corpus.corpusCard(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    // the dominant-language share is a valid ppm and langs ≥ 1
    assert(got.forall(c => c._6 > 0 && c._6 <= 1000000L && c._4 >= 1))
  }

  test("corpus_interleave: parity with an in-memory fractional-position interleave") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(t: String): String = MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keyed = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val cnt = ds.length.toLong
      ds.map(d => (d._1, md5hex(d._1.toString))).sortBy(x => (x._2, x._1))
        .zipWithIndex.map { case ((id, _), i) =>
          val rk = i + 1L
          (((2 * rk - 1) * 524288L) / cnt, src, rk, id)
        }
    }
    val expected = keyed.sortBy { case (key, src, rk, _) => (key, src, rk) }
      .take(300).zipWithIndex
      .map { case ((_, src, rk, id), i) => (i + 1L, id, src, rk) }
    val got = Corpus.corpusInterleave(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
    // equal-size sources at sf0.001 => every prefix is balanced within 1
    val counts = got.map(_._3).groupBy(identity).view.mapValues(_.size).values
    assert(counts.max - counts.min <= 1,
      "source-proportional pacing must keep per-source counts balanced")
  }
}
