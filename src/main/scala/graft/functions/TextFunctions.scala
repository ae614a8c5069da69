package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline layer
  * (SURVEY.md §2.5). All pure `Column` compositions over Spark's
  * codegen'd built-ins — no Scala UDFs — so whole-stage codegen spans
  * stay unbroken and the same expressions scale to arbitrary corpus
  * sizes without serialization overhead.
  */
object TextFunctions {

  /** Single-space tokenization (matches DuckDB string_split(text,' ')). */
  def words(text: Column): Column = split(text, " ")

  /** Word bigrams "w1 w2", 1-indexed to mirror the DuckDB oracle.
    * Caller must guarantee >= 2 tokens (sequence(1,0) would descend). */
  def bigrams(ws: Column): Column =
    transform(sequence(lit(1), size(ws) - 1),
      i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1)))

  /** Word n-grams "w1 w2 … wn", 1-indexed to mirror the DuckDB oracles.
    * Caller must guarantee >= n tokens (a descending sequence throws). */
  def ngrams(ws: Column, n: Int): Column =
    transform(sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*))

  /** Count of tokens that appear in a fixed marker list. */
  def countIn(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(markers.map(lit(_)))))

  /** Language marker lists — tiny stopword inventories per language.
    * (Heuristic language-ID: the score is the marker-token count; the
    * oracle recomputes the identical heuristic.) */
  val MarkersEn: Seq[String] = Seq("the", "a", "is", "and", "of")
  val MarkersDe: Seq[String] = Seq("der", "die", "das", "und", "ist")
  val MarkersFr: Seq[String] = Seq("le", "la", "les", "et", "est")
  val MarkersEs: Seq[String] = Seq("el", "los", "las", "y", "es")

  /** Alphabetic-character ratio of the raw text. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length: chars excluding spaces / token count. */
  def meanTokenLen(text: Column, nTokens: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") /
      greatest(nTokens, lit(1)).cast("double")

  /** BPE-ish subword segment count: alpha runs, digit runs, other. */
  val SubtokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def subtokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(SubtokenPattern), lit(0)))

  /** 64-bit hex content fingerprint (first 16 md5 hex chars) — the
    * exact-dedup key primitive; portable across engines. */
  def fingerprint(text: Column): Column = substring(md5(text), 1, 16)
}
