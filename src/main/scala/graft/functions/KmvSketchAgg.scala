package graft.functions

import java.security.MessageDigest
import java.util.TreeSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType, LongType, ShortType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded k-minimum-values sketch as a true mergeable aggregate.
  *
  * The KMV distinct-count estimator needs exactly the k smallest
  * md5 hashes of the DISTINCT input values per group. Expressing that
  * with built-ins takes a distinct shuffle plus two ranking windows
  * (the q49 shape before r7) — three exchanges of the full value
  * stream. This aggregate holds the invariant directly in its buffer:
  * a sorted set of hex digests truncated at k, so
  *
  *  - partial state is ≤ k × 32-char strings per (group × partition)
  *    — map-side partials collapse the raw stream BEFORE the only
  *    exchange, which then moves sketches, not values;
  *  - duplicates vanish structurally (set semantics ⇒ no distinct
  *    pre-pass);
  *  - merge = set-union + re-truncate, associative and commutative —
  *    the property that makes KMV the engine-portable sketch at
  *    100 TB (a billion-row group still ships k hashes).
  *
  * Hashing matches SQL `md5(CAST(v AS STRING))` bit-for-bit (lowercase
  * hex of the UTF-8 decimal string), so a DuckDB oracle replaying the
  * same k-smallest ranking reproduces the output exactly; the
  * estimate math stays OUTSIDE the aggregate in shared column
  * expressions. Hex strings order lexicographically = numerically
  * (fixed width, lowercase), the same collation both engines use.
  *
  * Digest-skip cache (r10, verdict item 7): a duplicate value never
  * changes KMV state, yet the r9 form still paid its md5 — on
  * etl_stats_approx 5 of the 7 sketched columns are low-NDV
  * (returnflag 3, linestatus 2, quantity 50, linenumber 7, shipdate
  * ~2.5k), so most of the 7-digests-per-row pass hashed values the
  * buffer had already absorbed. Each map-side buffer now carries a
  * TRANSIENT seen-set (capped at [[KmvSketch.SeenCap]] strings, so a
  * high-NDV column costs one failed lookup per value and bounded
  * memory; never serialized — post-shuffle buffers only merge).
  * Output is bit-identical by construction: the cache only skips
  * inserts that TreeSet.add would reject.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer] with UnaryLike[Expression] {

  require(k > 0, s"kmv_sketch k must be positive, got $k")

  // the md5(CAST(v AS STRING)) oracle contract requires the hashed
  // string to BE the SQL string form. That holds structurally for
  // STRING and for integral/boolean children (JVM toString == SQL
  // cast); a DATE/TIMESTAMP child would hash its internal
  // Int-days/Long-micros toString, and float/decimal formatting can
  // diverge from Spark's cast — those must be stringified by the
  // CALLER, enforced at analysis instead of silently sketching the
  // wrong digests (review r11)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType |
          BooleanType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_sketch child must be STRING or integral/boolean (cast " +
            s"date/timestamp/float/decimal first — the md5 contract is " +
            s"over the SQL string form), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KmvSketch.Buffer =
    new KmvSketch.Buffer(withSeen = true)

  private def insert(tree: TreeSet[String], h: String): Unit =
    if (tree.size < k) { tree.add(h); () }
    else if (h.compareTo(tree.last) < 0 && tree.add(h)) { tree.pollLast(); () }

  override def update(buffer: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val str = v match {
        case u: UTF8String => u.toString
        case other => other.toString
      }
      val seen = buffer.seen
      if (seen == null || !seen.contains(str)) {
        insert(buffer.tree, KmvSketch.md5Hex(str))
        if (seen != null && seen.size < KmvSketch.SeenCap) { seen.add(str); () }
      }
    }
    buffer
  }

  override def merge(buffer: KmvSketch.Buffer, other: KmvSketch.Buffer): KmvSketch.Buffer = {
    val it = other.tree.iterator()
    while (it.hasNext) insert(buffer.tree, it.next())
    buffer
  }

  override def eval(buffer: KmvSketch.Buffer): Any = {
    val tree = buffer.tree
    val kth = if (tree.size >= k) UTF8String.fromString(tree.last) else null
    InternalRow(tree.size.toLong, kth)
  }

  // 32 ASCII bytes per digest, fixed width — length-prefix-free framing
  override def serialize(buffer: KmvSketch.Buffer): Array[Byte] = {
    val tree = buffer.tree
    val out = new Array[Byte](tree.size * 32)
    var i = 0
    val it = tree.iterator()
    while (it.hasNext) {
      val s = it.next()
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, i * 32, 32)
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    // post-shuffle buffers only ever merge — no seen-set needed
    val buffer = new KmvSketch.Buffer(withSeen = false)
    var i = 0
    while (i < bytes.length) {
      buffer.tree.add(new String(bytes, i, 32, "US-ASCII"))
      i += 32
    }
    buffer
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("kth", StringType, nullable = true)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {
  /** Upper bound on the per-buffer transient dedup cache: low-NDV
    * columns fit entirely (every duplicate skips its digest); high-NDV
    * columns blow past it and pay one ~O(1) failed lookup per value —
    * strictly cheaper than the md5 it replaces. ≤ ~4096 short strings
    * per live map-side group buffer. */
  val SeenCap = 4096

  /** KMV buffer: the sorted digest set (the mergeable state) plus the
    * transient map-side seen-set. Only `tree` survives serialization. */
  final class Buffer(withSeen: Boolean) {
    val tree = new TreeSet[String]()
    val seen: java.util.HashSet[String] =
      if (withSeen) new java.util.HashSet[String]() else null
  }

  // MessageDigest is stateful but reset()s after digest(); one
  // instance per task thread amortizes the per-call getInstance
  // (provider lookup + allocation — measured ~25% of the whole
  // etl_stats_approx sketch pass at 7 digests/row)
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Lowercase hex MD5 of the UTF-8 bytes — identical to SQL
    * `md5(CAST(v AS STRING))` on both Spark and DuckDB. */
  def md5Hex(s: String): String = {
    val d = md5Local.get().digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** `kmv_sketch(v, k) -> struct(cnt, kth)`: cnt = distinct count
    * capped at k; kth = k-th smallest md5 hex (null while cnt < k). */
  def kmvSketch(c: Column, k: Int): Column =
    shim.toColumn(KmvSketch(shim.toExpression(c), k).toAggregateExpression())
}
