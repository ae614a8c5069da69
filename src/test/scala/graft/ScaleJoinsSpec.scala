package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleJoins

class ScaleJoinsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join returns exactly the plain join result on skewed keys") {
    import spark.implicits._
    // heavy skew: 90% of rows share one key
    val big = (1 to 20000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = (1L to 20000L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = ScaleJoins.saltedJoin(big, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    val diff = salted.select("k", "v", "name")
      .exceptAll(plain.select("k", "v", "name")).count()
    assert(diff == 0)
  }

  test("dedup_embedding: LSH candidates capture the exact top-20 (deterministic planes)") {
    val lsh = operators.Dedup.embeddingPairs(spark, sf).collect()
    val exact = operators.Dedup.embeddingPairsExact(spark, sf).collect()
    assert(lsh.length == 20)
    assert(lsh.toSeq == exact.toSeq,
      "banded-hyperplane candidates must contain every exact top-20 pair on this corpus")
  }

  test("dedup_embedding: adaptive banding resolves to 4 bits at the gated corpus, widens with n") {
    // every gated SF (500 / 2000 vectors) must keep the 4-bit plan the
    // oracle was tuned against; the ×10 sweep remedy (8 bits at 20k —
    // measured 10.4 s vs 23.6 s at the r7 anchor's 6 bits, identical
    // top-20) must fall out of the same occupancy-at-gated-level rule
    assert(operators.Dedup.embeddingBitsFor(500L) == 4)
    assert(operators.Dedup.embeddingBitsFor(2000L) == 4)
    assert(operators.Dedup.embeddingBitsFor(10000L) == 7)
    assert(operators.Dedup.embeddingBitsFor(20000L) == 8)
    assert(operators.Dedup.embeddingBitsFor(5000000L) == 16)
  }

  test("dedup_minhash: self-tuning band rows — gated geometry unchanged, widens per decade, margin holds") {
    import operators.Dedup
    // every gated SF (≤ 5000 docs) must keep the 16×2 geometry the
    // oracle-equality margin was stated against
    assert(Dedup.minhashBandRowsFor(500L) == 2)
    assert(Dedup.minhashBandRowsFor(5000L) == 2)
    // the ×5 (25k docs) and ×10 (50k) sweep corpora must auto-select
    // the MEASURED remedy (r=4: 8.2 s → 3.3 s at ×10, zero pair loss)
    assert(Dedup.minhashBandRowsFor(25000L) == 4)
    assert(Dedup.minhashBandRowsFor(50000L) == 4)
    // +2 rows per further decade
    assert(Dedup.minhashBandRowsFor(500000L) == 6)
    assert(Dedup.minhashBandRowsFor(5000000L) == 8)
    // oracle-exactness margin at every emittable geometry: true pairs
    // sit at J ≥ 0.85 (PipelineOpsSpec margin spec — the same t=0.5
    // threshold clusters/dedup_corpus_near consume), and P(miss) =
    // (1 - J^r)^b must stay negligible as (b, r) scale together
    for (r <- Seq(2, 4, 6, 8)) {
      val b = Dedup.minhashBandsFor(r)
      val miss = math.pow(1 - math.pow(0.85, r.toDouble), b.toDouble)
      assert(miss < 1e-3, f"geometry ${b}x$r: miss $miss%.2e at the J=0.85 margin")
    }
    // EXPLICIT numHashes clamp (advice r8): the band count is then
    // numHashes/r, not minhashBandsFor(r) — the clamp must walk r down
    // until that geometry passes the same bound. 32 hashes: tuned r=4
    // would give only 8 bands (miss ≈ 2.7e-3, OVER the bound) → r=2
    // (16 bands, miss ≈ 1.2e-9); 96 hashes afford r=6 (16 bands).
    assert(Dedup.clampRowsFor(4, 32) == 2)
    assert(Dedup.clampRowsFor(2, 32) == 2)
    assert(Dedup.clampRowsFor(6, 96) == 6)
    // every emittable clamp output satisfies the bound by construction
    for (tuned <- 1 to 10; nh <- Seq(16, 32, 64, 96, 128)) {
      val r = Dedup.clampRowsFor(tuned, nh)
      assert(nh % r == 0)
      val miss = math.pow(1 - math.pow(0.85, r.toDouble), (nh / r).toDouble)
      assert(miss <= 1e-3, f"clamp($tuned, $nh) -> $r: miss $miss%.2e")
    }
  }

  test("hyperplane_sigs: codegen kernel matches the interpreted HOF form bit-for-bit") {
    // the r13 optimization replaced the transform(typedLit(planes),
    // p => dot_product(emb, p)) + per-band when/element_at chain with
    // one codegen'd kernel (HyperplaneSigs); this pins the replaced
    // form — reconstructed verbatim — against the new path on the real
    // corpus at BOTH gated geometries (embedding 4-bit, banded 9-bit)
    import graft.functions.VectorExpressions.dot
    import spark.implicits._
    // malformed rows ride along (advice r13): the HOF chain maps a
    // ragged or null embedding to sig 0 in every band (dot_product's
    // ragged->NULL, then when(NULL >= 0, bit).otherwise(0)); the
    // kernel must agree instead of truncating to min(len, dim)
    val edge = Seq(
      (200001L, Some(Seq.fill(63)(0.5f))), // ragged short
      (200002L, Some(Seq.fill(65)(0.5f))), // ragged long
      (200003L, None)) // null embedding
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      .unionByName(edge)
    for ((bits, bands, dim) <- Seq((4, 64, 64), (9, 64, 64))) {
      val planes: Seq[Seq[Double]] =
        (0 until bands * bits).map(p =>
          graft.functions.HyperplaneSigsUtil.mixedPlane(p, dim).toSeq)
      val projs = transform(typedLit(planes), p => dot(col("embedding"), p))
      val sig = transform(sequence(lit(0), lit(bands - 1)), bb =>
        (0 until bits).map(i =>
          when(element_at(col("projs"), bb * bits + i + 1) >= 0, 1 << i)
            .otherwise(0)).reduce(_ + _))
      val old = e.select(col("vec_id"), projs.as("projs"))
        .select(col("vec_id"), posexplode(sig).as(Seq("band", "sig")))
        .orderBy("vec_id", "band").collect().toSeq
      val neu = operators.Dedup.hyperplaneBanded(e, bits, bands, dim)
        .orderBy("vec_id", "band").collect().toSeq
      assert(neu == old, s"signature divergence at bits=$bits")
    }
  }

  test("centroid_argmin: codegen kernel matches the interpreted HOF chain bit-for-bit") {
    // r14 optimization: kmeansAssign's assignment projection moved
    // from transform(1..k, i -> sq_diff(emb, element_at(cLit, i))) +
    // element_at(idLit, array_position(d2s, array_min(d2s))) to one
    // codegen'd kernel (CentroidArgmin). This reconstructs the
    // replaced chain VERBATIM and pins (c, cd2) equality on (a) the
    // real corpus against the kmeans seed centroids — the exact
    // first-round assignment — and (b) crafted edge rows: ragged
    // length (NULL d2, skipped), null embedding (all-NULL -> nulls),
    // and an exact duplicate of a centroid (distance-0 tie surface).
    import graft.functions.VectorExpressions.{centroidArgmin, sqDiff}
    import spark.implicits._
    val k = 8
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents: Seq[(Int, Seq[Float])] = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("c"), col("embedding"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toIndexedSeq)
      .sortBy(_._1).toIndexedSeq
    val dim = cents.head._2.length
    val edge = Seq(
      (100001L, Some(cents(3)._2)), // exact copy of centroid 3 (cd2 = 0 tie)
      (100002L, Some(cents(0)._2.take(dim - 1))), // ragged: every d2 NULL
      (100003L, None), // null embedding
      (100004L, Some(Seq.fill(dim)(0.0f))))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    for (src <- Seq(e, edge, e.unionByName(edge))) {
      val cLit = typedLit(cents.map(_._2))
      val idLit = typedLit(cents.map(_._1))
      val old = src
        .withColumn("d2s", transform(sequence(lit(1), lit(cents.size)),
          i => sqDiff(col("embedding"), element_at(cLit, i))))
        .select(col("vec_id"),
          element_at(idLit,
            array_position(col("d2s"), array_min(col("d2s"))).cast("int"))
            .as("c"),
          array_min(col("d2s")).as("cd2"))
        .orderBy("vec_id").collect().toSeq
      val asg = centroidArgmin(col("embedding"), cents.map(_._1), cents.map(_._2))
      val neu = src.select(col("vec_id"),
          asg.getField("c").as("c"), asg.getField("cd2").as("cd2"))
        .orderBy("vec_id").collect().toSeq
      assert(neu == old, "assignment divergence vs the HOF chain")
    }
  }

  test("dedup_embedding: no nested-loop over the full pair space") {
    val df = operators.Dedup.embeddingPairs(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidate generation must be an equi-join, not a nested loop:\n$p")
  }

  test("bucketed join plan has no shuffle exchange") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val (bo, bl) = ScaleJoins.bucketize(spark, o, l, "o_orderkey", 4,
      "b_orders", "b_lineitem")
    val joined = bo.join(bl, "o_orderkey")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$physical")
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }
}
