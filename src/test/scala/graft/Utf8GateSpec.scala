package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Pins the multibyte-text guarantees behind `text_fingerprint_utf8`:
  * fnv64 folds UTF-8 BYTES (property-checked against an in-memory
  * reference over random unicode including the supplementary plane),
  * the gate's corpus transform really produces 2/3/4-byte characters,
  * and the gated output is non-degenerate (bytes > chars — i.e. the
  * cross-engine hash equality is being proven ON multibyte input, not
  * vacuously on ASCII). */
class Utf8GateSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fnvRef(s: String): Long = {
    var h = -3750763034362895579L // 14695981039346656037 as signed
    s.getBytes("UTF-8").foreach { b =>
      h ^= (b & 0xffL); h *= 1099511628211L
    }
    h
  }

  test("fnv64 equals the byte-folding reference on multibyte strings") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    // random strings mixing ASCII, 2-byte, 3-byte and 4-byte codepoints
    val pool = "abz ÄéñØ 中語界 𝕆𝕊🙂".toCharArray
    val samples = (1 to 200).map { _ =>
      val n = rng.nextInt(20)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        val c = pool(rng.nextInt(pool.length))
        // never split a surrogate pair: append both halves together
        if (Character.isHighSurrogate(c)) {
          val j = pool.indexWhere(Character.isLowSurrogate)
          sb.append(c).append(pool(j))
        } else if (!Character.isLowSurrogate(c)) sb.append(c)
        i += 1
      }
      sb.toString
    } :+ "" :+ "𝕆" :+ "中a𝕊"
    val got = samples.toDF("w")
      .select(col("w"), graft.functions.HashFunctions.fnv64(col("w")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.distinct.foreach { w =>
      assert(got(w) == fnvRef(w), s"fnv64 mismatch on '$w'")
    }
  }

  test("the gate transform yields genuinely multibyte text in every class") {
    import spark.implicits._
    val df = Seq((0L, "a test of one"), (1L, "a test of one"), (2L, "a test of one"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.utf8Transform(pmod(col("doc_id"), lit(3L)).cast("int")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(df(0L) == "ä tést of oné")       // 2-byte substitutions
    assert(df(1L) == "a 中e語中 of one")      // 3-byte
    assert(df(2L) == "a test 𝕆f 𝕆ñe")     // 4-byte + 2-byte
    // byte lengths strictly exceed char counts in every class
    df.values.foreach { t =>
      assert(t.getBytes("UTF-8").length > t.codePointCount(0, t.length))
    }
  }

  test("gated output is non-degenerate at sf0.001: multibyte really in play") {
    val rows = TextAnalysis.utf8Gate(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(2) > r.getLong(3),
        s"class ${r.getInt(0)}: bytes must exceed chars (multibyte present)")
      assert(r.getLong(7) > 0 && r.getLong(9) > 0, "chunking must be live")
    }
    // fingerprints unique per doc (md5 collision would be a corpus bug)
    rows.foreach(r => assert(r.getLong(4) == r.getLong(1)))
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.documents(spark, sf).count())
  }
}
