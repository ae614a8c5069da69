package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.lineitem

/** Graph analytics beyond connected components (SURVEY.md §2.3's
  * cluster machinery): PageRank over the part↔supplier bipartite graph
  * — the importance-scoring primitive a crawl/corpus pipeline uses to
  * prioritize sources (here: which parts/suppliers anchor the supply
  * graph).
  *
  * Scale design: textbook distributed PageRank — each iteration is one
  * shuffle of (dst, contribution) pairs keyed by destination plus a
  * broadcast-free aggregate; ranks/degrees shuffle as (node, value)
  * longs, never adjacency lists. Iterations are lineage-truncated
  * (localCheckpoint) like connectedComponents, so plan depth stays
  * constant.
  *
  * Oracle-exact by construction: every iteration's per-node
  * contribution sum is an EXACT integer sum of floor-quantised (1e-9)
  * contributions, and the damped update re-quantises — so the float
  * work per iteration is a fixed, order-independent IEEE sequence and
  * the DuckDB oracle (the same iterations unrolled as CTEs, generated
  * from the same constants) reproduces every rank bit-for-bit.
  */
object GraphOps {

  /** Long -> dense-int node interner shared by the single-task graph
    * kernels (pagerankLocal, lpRoundsLocal) — ONE definition so a
    * sizing or data-structure change cannot miss a copy (review
    * finding). Instantiated INSIDE the task closure; never serialized. */
  private final class NodeInterner {
    private val idx = new java.util.HashMap[Long, Integer]()
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def id(node: Long): Int = {
      val got = idx.get(node)
      if (got != null) got.intValue()
      else { val i = ids.length; idx.put(node, i); ids += node; i }
    }
  }

  private val Damp = 0.85
  private val Iters = 5

  /** `graph_pagerank` — top-20 nodes of the part↔supplier graph after
    * `Iters` damped iterations (unnormalised Pregel-style update
    * r' = 0.15 + 0.85·Σ r/deg). Node ids: part → 2·key,
    * supplier → 2·key+1 (disjoint integer namespaces). */
  /** The file-scanning stage of [[pagerank]], factored so PlanAudit
    * can audit its scan prune/pushdown: past the `.rdd` hop the
    * iteration is RDD-native by design and carries no file scan.
    * distinct BEFORE symmetrising (r7): part/supplier ids live in
    * disjoint even/odd namespaces, so the swapped half needs no
    * second dedup — half the distinct's shuffle. */
  private[graft] def pagerankEdges(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      (col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sup"))
      .distinct()

  /** Gate + dispatch: the two iteration backends below compute the
    * IDENTICAL quantised fixpoint (messages are floor-quantised Long
    * sums — commutative/associative, so partitioning cannot perturb
    * them), so the choice is pure cost. |E| ≤ |lineitem| (edges are
    * distinct (part, supplier) pairs), read off the parquet footers on
    * the driver — under the gate the whole graph is a few MB and the
    * five rounds run as ONE job in a single task ([[pagerankLocal]]);
    * past it (the ×10 sweep, and any real corpus) the GraphX
    * aggregateMessages rounds take over ([[pagerankDistributed]]).
    * Same twin-path discipline as [[adjacencyHint]] / dedup_semantic:
    * the small-side plan never pays 10 sequential RDD-job floors for a
    * sub-second graph, the big side never single-tasks. */
  def pagerank(s: SparkSession, d: String): DataFrame =
    if (graft.Tables.footerRowCount(s, d, "lineitem") <= 4000000L)
      pagerankLocal(s, d)
    else pagerankDistributed(s, d)

  /** Under-gate backend: shuffle the (distinct, already tiny) edge set
    * to one task and run the five quantised rounds in flat arrays —
    * one Spark job end to end (scan → partial-distinct → single merge
    * task), zero per-round floors. The arithmetic is the verbatim
    * expression sequence of [[pagerankDistributed]]'s vertex program
    * (same constants, same floor/quantise order, Long message sums),
    * so the ranks — and the oracle hash — are bit-identical;
    * PropertySpec pins both backends against the same in-memory
    * replay. */
  private[graft] def pagerankLocal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = 1 - Damp
    val ranks = pagerankEdges(s, d).as[(Long, Long)]
      // coalesce (not repartition): folds the distinct's reduce side
      // into the single task — no second exchange; map-side partial
      // aggregation still dedupes at scan parallelism
      .coalesce(1)
      .mapPartitions { it =>
        val pairs = it.toArray
        val interner = new NodeInterner
        import interner.{id, ids}
        val m = pairs.length * 2
        val src = new Array[Int](m); val dst = new Array[Int](m)
        var i = 0
        while (i < pairs.length) {
          val (p, sup) = pairs(i)
          val pi = id(p); val si = id(sup)
          src(2 * i) = pi; dst(2 * i) = si
          src(2 * i + 1) = si; dst(2 * i + 1) = pi
          i += 1
        }
        val n = ids.length
        val deg = new Array[Int](n)
        i = 0; while (i < m) { deg(src(i)) += 1; i += 1 }
        val rank = Array.fill(n)(1.0)
        val contrib = new Array[Long](n)
        val q = new Array[Long](n)
        var round = 0
        while (round < Iters) {
          var v = 0
          while (v < n) {
            contrib(v) = math.floor(rank(v) / deg(v).toDouble * 1e9).toLong
            q(v) = 0L; v += 1
          }
          i = 0; while (i < m) { q(dst(i)) += contrib(src(i)); i += 1 }
          v = 0
          while (v < n) {
            rank(v) =
              math.floor((base + Damp * (q(v) / 1e9)) * 1e9).toLong / 1e9
            v += 1
          }
          round += 1
        }
        ids.indices.iterator.map(v => (ids(v), rank(v)))
      }.toDF("node", "rank")
    topRanks(ranks)
  }

  /** Past-gate backend (the production shape at 100 TB). */
  private[graft] def pagerankDistributed(s: SparkSession, d: String): DataFrame = {
    val pairs = pagerankEdges(s, d)
    // GRAPH-NATIVE iteration (r10 — the graph_components precedent):
    // the r9 Catalyst loop paid a planner+broadcast+action floor per
    // round (~0.4 s × Iters sequential BHJ iterations — the whole 5.5×
    // residual vs DuckDB was floors, not work). The SAME quantised
    // algebra runs here as GraphX aggregateMessages rounds at RDD-job
    // cost: messages are floor(rank/deg·1e9) INTEGERS merged by +, so
    // partial-aggregation order cannot perturb them, and the rank
    // update replays the oracle's expression verbatim — ranks are
    // bit-identical to the Catalyst loop and the unrolled SQL replay
    // (hash gate unchanged). At 100 TB this is the production
    // distributed-PageRank shape: edges hash-partition once, each
    // round exchanges one integer per (dst × partition) via GraphX's
    // routing tables, ranks never pass through the driver (the old
    // plan's broadcast collected O(V) ranks per round above the
    // footer gate).
    // (an A/B coalescing the graph to edges/250k partitions measured
    // SLOWER — 2.4 vs 1.75 s best-of — the per-round message compute
    // wants the cores more than the scheduler wants fewer tasks)
    val edgeRdd = pairs.rdd.flatMap(r =>
      Iterator((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val graph0 = org.apache.spark.graphx.Graph.fromEdgeTuples(edgeRdd, 1)
    // every node IS a src (symmetrised), so out-degree ≥ 1 everywhere;
    // vertex state = (deg, rank), rank0 = 1.0 (the oracle's r0)
    var g = graph0.outerJoinVertices(graph0.outDegrees)(
      (_, _, dOpt) => (dOpt.getOrElse(0), 1.0)).cache()
    val base = 1 - Damp // Scala double 1-0.85, printed into the oracle
    for (_ <- 1 to Iters) {
      val msgs = g.aggregateMessages[Long](
        ctx => ctx.sendToDst(math.floor(
          ctx.srcAttr._2 / ctx.srcAttr._1.toDouble * 1e9).toLong),
        _ + _)
      // cache each round (the ConnectedComponents.run discipline):
      // every round's vertices feed BOTH the next messages and the
      // next join — uncached, the bifurcating lineage recomputes
      // prior rounds ~2^Iters times at action
      val prev = g
      g = g.outerJoinVertices(msgs)((_, attr, qOpt) =>
        (attr._1, math.floor((base + Damp *
          (qOpt.getOrElse(0L) / 1e9)) * 1e9).toLong / 1e9)).cache()
      // materialize BOTH members before releasing the predecessor (the
      // Pregel discipline): vertices alone would leave g's edge view
      // first computed in the NEXT round's aggregateMessages — after
      // prev's eviction — re-deriving the chain back to the scan
      g.vertices.foreachPartition(_ => ())
      g.edges.foreachPartition(_ => ())
      prev.unpersist(blocking = false)
    }
    val ranks = s.createDataFrame(
      g.vertices.map { case (node, (_, rank)) => (node, rank) })
      .toDF("node", "rank")
    topRanks(ranks)
  }

  /** Shared tail of both pagerank backends — ONE definition of the
    * ranking tiebreak and the node-id → (kind, key) decode, so the
    * gated and past-gate plans cannot drift. */
  private def topRanks(ranks: DataFrame): DataFrame =
    ranks
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
      .select(
        when(col("node") % 2 === 0, "part").otherwise("supplier").as("kind"),
        expr("node DIV 2").as("key"),
        col("rank"))

  /** `graph_triangles` — per-node triangle counts over the co-purchase
    * graph (parts sharing an order), top 20 parts by triangle
    * participation: the community-density / clustering-coefficient
    * numerator, and the classic MapReduce graph benchmark
    * (Suri & Vassilvitskii, WWW'11).
    *
    * Scale design — DEGREE ORIENTATION, the standard distributed
    * remedy: each undirected edge is directed from its
    * (degree, id)-smaller endpoint to the larger, which makes the
    * orientation a total order, so every triangle is enumerated
    * EXACTLY once (at its smallest vertex) and each node's oriented
    * out-degree is O(√E) on heavy-tailed graphs — the wedge join's
    * fan-out Σ out-deg² collapses from the hub-quadratic worst case
    * to near-linear. Wedges co-partition on the pivot node (one
    * shuffle of (src, dst, deg) ints), the closing-edge join keys on
    * the (v, w) pair — ids only, never adjacency lists; the degree
    * table is |V| rows and broadcasts. The oracle replays the
    * orientation-free id-ordered enumeration — the triangle SET is
    * orientation-invariant, so per-node counts agree exactly.
    *
    * At 100 TB: all exact integer counting, three narrow shuffles
    * (pair distinct, wedge pivot, closing pair) — the orientation is
    * what keeps the wedge stage from exploding on hub nodes. */
  def triangles(s: SparkSession, d: String, n: Int = 20): DataFrame = {
    val pairs = basketPairs(s, d)
    // Orientation needs only SOME strict total order on nodes —
    // degree ordering is the arboricity heuristic bounding Σ out-deg²,
    // and for that heuristic the multiplicity-WEIGHTED degree (raw
    // pair occurrences, no dedup) ranks hubs exactly as well. That
    // observation deletes the corpus-wide pair-distinct exchange the
    // r8 form paid before anything else: duplicates now flow through
    // the (cheap, map-side-combined) weighted-degree count and the
    // broadcast orientation joins, and die structurally in the ONE
    // remaining pair-space shuffle — the collect_set adjacency build.
    // (r9 profile: pair-distinct alone cost 1.0 s of the 3.6 s total;
    // this form measured 4.24 → 3.22 s min-of-3 at sf0.1 in a cleaner
    // canary window — ~9% canary-normalized, and one fewer pair-space
    // exchange at any scale.)
    // deg feeds TWO broadcast exchanges (the a-side and c-side
    // orientation joins) whose projections differ, so ReuseExchange
    // never shares them and the |E|·2-row degree aggregate would run
    // twice; one pin of the |V|-row result makes both broadcasts
    // narrow reads of pinned blocks (the basketPairs discipline).
    val deg = graft.Checkpoints.pin(pairs.select(col("a").as("node"))
      .union(pairs.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg")))
    val withDeg = pairs
      .join(broadcast(deg.withColumnRenamed("node", "a")
        .withColumnRenamed("dg", "da")), "a")
      .join(broadcast(deg.withColumnRenamed("node", "c")
        .withColumnRenamed("dg", "dc")), "c")
    val aFirst = col("da") < col("dc") ||
      (col("da") === col("dc") && col("a") < col("c"))
    val o = withDeg.select(
      when(aFirst, col("a")).otherwise(col("c")).as("src"),
      when(aFirst, col("c")).otherwise(col("a")).as("dst"))
    // |V| ≤ |part| → the oriented adjacency broadcasts under the
    // footer gate (pairs per order ≤ C(7,2)=21 ⇒ |E| ≤ 21·|orders| —
    // the pagerank discipline); past the cap the closing joins degrade
    // to shuffle joins of |E| rows each, still never the wedge stream.
    val hint = adjacencyHint(s, d)
    // adjP is consumed from BOTH sides of the closing join (the
    // edge-explode stream and the broadcast right side); without a pin
    // the orientation joins + adjacency shuffle execute twice.
    val adjP = graft.Checkpoints.pin(o.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("np")))
    // edge-parallel INTERSECTION instead of a wedge join: the wedge
    // stream is Σ out-deg² rows (72M at sf0.1 — measured 6.9-9.1 s
    // however its joins are hinted), but the same triangles fall out of
    // |N⁺(u) ∩ N⁺(v)| per edge with NOTHING materialized beyond the
    // |E| result rows: each triangle x<y<z (orientation order) is
    // found exactly once, at its (x,y) edge, with z in the
    // intersection. array_intersect runs inside whole-stage codegen,
    // so the Σ od² work happens in a tight loop, not as join rows.
    val closed = adjP.select(col("src").as("u"), explode(col("np")).as("v"),
        col("np").as("nu"))
      // left: a dst with no out-edges has no adjacency row
      .join(hint(adjP.select(col("src").as("v"), col("np").as("nv"))),
        Seq("v"), "left")
      .select(col("u"), col("v"),
        // sorted_intersect ≡ array_intersect on these sorted distinct
        // arrays (see SortedArrayExpressions) minus the per-edge
        // OpenHashSet build — the closing stage was ~2.0 s of the
        // 3.1 s query under array_intersect at sf0.1.
        graft.functions.SortedArrayExpressions.sortedIntersect(col("nu"),
          coalesce(col("nv"), array().cast("array<bigint>"))).as("ws"))
      .filter(size(col("ws")) > 0)
    // attribution: each triangle (u, v, w∈ws) increments all three
    // nodes — u and v once per w, every w once; 3·#triangles rows total
    closed.select(explode(concat(col("ws"),
        array_repeat(col("u"), size(col("ws"))),
        array_repeat(col("v"), size(col("ws"))))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("part"))
      .limit(n)
  }

  /** Unordered co-purchase part pairs (a < c), generated NARROWLY
    * inside each order's sorted part set (the q53_market_basket
    * shape). Duplicates across orders are INCLUDED — consumers absorb
    * them in set-semantics aggregates (collect_set) instead of paying
    * a corpus-wide pair-distinct exchange. ONE definition shared by
    * [[triangles]] and [[jaccard]] so the slice/posexplode pair idiom
    * and its off-by-ones cannot drift between them.
    *
    * PINNED (r10, verdict item 1): both consumers reference the pair
    * stream from more than one side of a join/union (triangles: the
    * weighted-degree aggregate AND the orientation join; jaccard: both
    * directions of the symmetrising union), and the exchanges differ,
    * so ReuseExchange never kicks in (SURVEY §6) — unpinned, the
    * lineitem scan + per-order collect_set + pair explode ran twice
    * per query. One localCheckpoint materializes the ~|E| (two-long)
    * rows once; every consumer is then a narrow read of pinned blocks.
    * The pin is result-feeding — the harness sweep frees it after the
    * caller's action (Checkpoints policy). */
  private def basketPairs(s: SparkSession, d: String): DataFrame =
    // SESSION-SHARED under the adjacency footer gate (late r10, the
    // gram5Shared discipline): triangles, jaccard AND labelprop all
    // start from this stream, and a per-query pin made each of them
    // rebuild the scan + per-order collect_set + explode (~1 s at
    // sf0.1). One pinShared materialization (~20 MB at sf0.1, bounded
    // by the same 4M-edge gate that bounds every adjacency broadcast)
    // serves the whole session; the key folds in the lineitem file
    // stats so a testdata regeneration misses. Past the gate the
    // per-query pin returns — nothing corpus-sized outlives a query
    // at scale.
    if (21L * graft.Tables.footerRowCount(s, d, "orders") <= 4000000L)
      graft.Checkpoints.pinShared(s,
        s"basketpairs:$d:${graft.SourceKey.of(d, "lineitem")}")(
        basketPairStream(s, d))
    else graft.Checkpoints.pin(basketPairStream(s, d))

  /** The raw (duplicate-carrying) pair stream behind [[basketPairs]],
    * unpinned — for single-consumer callers ([[lpEdges]]) the pin's
    * materialize-then-reread round trip is pure cost; they stream the
    * explode straight into their first exchange instead. */
  private def basketPairStream(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "a")), col("ps"))
      .select(col("a"), explode(expr("slice(ps, i + 2, size(ps))")).as("c"))

  /** Broadcast-or-identity hint for the |V|-row adjacency frames of
    * the co-purchase graph: under the footer gate (pairs per order ≤
    * C(7,2)=21 ⇒ |E| ≤ 21·|orders| — the pagerank discipline) they
    * broadcast; past it consumers degrade to |E|-row shuffle joins —
    * still never a wedge stream. Shared by [[triangles]] / [[jaccard]]
    * so the gate constant cannot drift. */
  private def adjacencyHint(s: SparkSession, d: String): DataFrame => DataFrame =
    if (21L * graft.Tables.footerRowCount(s, d, "orders") <= 4000000L)
      broadcast else identity

  private val LpRounds = 4

  /** `graph_labelprop` — synchronous label propagation over the
    * co-purchase part graph (Raghavan et al., Phys. Rev. E'07), the
    * cheap community-detection primitive that complements
    * [[components]] (LP splits a connected graph into DENSE
    * communities; components only finds disconnected ones) — the
    * source-clustering / topic-grouping pass of a corpus pipeline.
    * Labels init to the node id; each round every node adopts the MOST
    * FREQUENT label among its (distinct-edge) neighbors, ties broken
    * toward the smallest label; `LpRounds` fixed synchronous rounds
    * (deterministic by construction — no async sweep order, no RNG),
    * then the community census: top-20 labels by population.
    *
    * Twin-path like [[pagerank]]: under the co-purchase footer gate
    * the distinct edge set coalesces to one task and the rounds run
    * in flat arrays (one job); past it, [[labelPropDistributed]] runs
    * each round as (dst, lab) count → argmax — two narrow integer
    * shuffles per round, labels never leave the cluster, the LP shape
    * MapReduce community detection has always used. Both backends
    * compute the identical argmax (counts are exact ints; the
    * tiebreak is a total order), so the census is bit-identical —
    * the oracle unrolls the same rounds as CTEs. */
  def labelProp(s: SparkSession, d: String): DataFrame =
    if (21L * graft.Tables.footerRowCount(s, d, "orders") <= 4000000L)
      labelPropLocal(s, d)
    else labelPropDistributed(s, d)

  /** Distinct undirected co-purchase edges (a < c) — [[basketPairs]]
    * deduped, the one pair-space exchange LP pays (its mode counts
    * are per-distinct-neighbor, so multiplicity must die before the
    * rounds, unlike triangles' set-semantics consumers). */
  private def lpEdges(s: SparkSession, d: String): DataFrame =
    basketPairStream(s, d).distinct()

  private[graft] def labelPropLocal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the (session-shared) duplicate-carrying stream, ONE narrow
    // exchange to a single task, dedupe in-task by PRIMITIVE packed
    // sort: a DataFrame `.distinct().coalesce(1)` folds the
    // distinct's reduce into one single-threaded hash aggregate
    // (1.6 s at sf0.1), and a boxed HashSet dedupe measured 2.0 s for
    // 1.2M adds — sorting a primitive long array costs ~0.1 s
    val census = basketPairs(s, d).as[(Long, Long)]
      .repartition(1)
      .mapPartitions(lpRoundsLocal)
      .toDF("node", "lab")
    lpCensus(census)
  }

  /** The single-task LP kernel behind [[labelPropLocal]], factored out
    * so the spec can drive it directly (notably the wide-id fallback,
    * which no gated corpus reaches): duplicate-carrying (a, c) pairs
    * in, final (node, label) out. */
  private[graft] def lpRoundsLocal(
      it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
        // (a << 32 | c) packing for ids < 2^32 (any gated corpus);
        // wider ids dedupe through the boxed fallback set — correct
        // at any id domain, just slower, and the distributed backend
        // owns past-gate corpora anyway
        var packed = new Array[Long](1 << 20); var pLen = 0
        val wide = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
        // normalize each undirected pair to (min,max) BEFORE dedupe:
        // a caller streaming both orientations of one edge must not
        // double-count that neighbor (basketPairStream happens to
        // guarantee a<c, but that is its invariant, not this kernel's)
        it.foreach { case (a0, c0) =>
          val a = math.min(a0, c0); val c = math.max(a0, c0)
          if (a >= 0 && c < (1L << 32)) {
            if (pLen == packed.length)
              packed = java.util.Arrays.copyOf(packed, packed.length << 1)
            packed(pLen) = (a << 32) | c; pLen += 1
          } else { wide += ((a, c)); () }
        }
        java.util.Arrays.sort(packed, 0, pLen)
        val interner = new NodeInterner
        import interner.{id, ids}
        // unique count first (sorted adjacency dedup), then CSR fill
        var uniq = 0
        var i = 0
        while (i < pLen) {
          if (i == 0 || packed(i) != packed(i - 1)) uniq += 1
          i += 1
        }
        val m = (uniq + wide.size) * 2
        val src = new Array[Int](m); val dst = new Array[Int](m)
        var e = 0
        def edge(a: Long, c: Long): Unit = {
          val ai = id(a); val ci = id(c)
          src(2 * e) = ai; dst(2 * e) = ci
          src(2 * e + 1) = ci; dst(2 * e + 1) = ai
          e += 1
        }
        i = 0
        while (i < pLen) {
          if (i == 0 || packed(i) != packed(i - 1))
            edge(packed(i) >>> 32, packed(i) & 0xFFFFFFFFL)
          i += 1
        }
        wide.foreach { case (a, c) => edge(a, c) }
        val n = ids.length
        // CSR adjacency so each node's neighbor-mode count is one
        // contiguous pass (deg, then prefix offsets, then fill)
        val deg = new Array[Int](n)
        i = 0; while (i < m) { deg(dst(i)) += 1; i += 1 }
        val off = new Array[Int](n + 1)
        i = 0; while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
        val nbr = new Array[Int](m); val fill = off.clone()
        i = 0; while (i < m) { nbr(fill(dst(i))) = src(i); fill(dst(i)) += 1; i += 1 }
        // labels are ALWAYS node ids, so they live as node indices and
        // the per-node mode count is epoch-stamped int arrays — O(deg)
        // per node, no hash maps, no per-node clears (a HashMap.clear
        // scans its grown capacity for EVERY node: hub degrees made
        // that quadratic — measured 3.5 s before this form)
        var lab = Array.tabulate(n)(identity)
        val cnt = new Array[Int](n)
        val stamp = new Array[Int](n)
        var epoch = 0
        var round = 0
        while (round < LpRounds) {
          val next = new Array[Int](n)
          var v = 0
          while (v < n) {
            epoch += 1
            var j = off(v)
            var bestLi = -1; var bestC = 0
            while (j < off(v + 1)) {
              val li = lab(nbr(j))
              if (stamp(li) != epoch) { stamp(li) = epoch; cnt(li) = 0 }
              cnt(li) += 1
              val c = cnt(li)
              // argmax with smallest-LABEL-VALUE tiebreak, online
              if (c > bestC || (c == bestC && ids(li) < ids(bestLi))) {
                bestC = c; bestLi = li
              }
              j += 1
            }
            next(v) = bestLi
            v += 1
          }
          lab = next
          round += 1
        }
        ids.indices.iterator.map(v => (ids(v), ids(lab(v))))
  }

  /** Past-gate backend: each round is one (dst, lab) integer-count
    * shuffle plus a per-dst argmax — `max(struct(cnt, -lab))` encodes
    * the highest-count-then-smallest-label total order as ONE
    * partial-aggregable max, so rounds never widen beyond two longs a
    * row. Rounds are lineage-truncated (Checkpoints.pin) like the old
    * pagerank loop; per-round planner floors are the price of the
    * past-gate regime only, where data dominates them. */
  private[graft] def labelPropDistributed(s: SparkSession, d: String): DataFrame = {
    // pin the distinct BEFORE the symmetrising union (review finding):
    // both union branches reference it, and ReuseExchange dedups only
    // the shuffle write — unpinned, the distinct's reduce-side
    // aggregation over the full pair stream ran twice
    val e0 = graft.Checkpoints.pin(lpEdges(s, d))
    // ONE upfront dst-hash exchange, reused by every round: with the
    // edges partitioned on dst, the per-round groupBy(dst, lab) AND
    // the argmax groupBy(dst) both satisfy their distributions from
    // the stored partitioning (the broadcast labels join preserves
    // it), so the 4 rounds run with ZERO data exchanges — previously
    // each round paid two pair-scale shuffles (×10 sweep: 12.5 s)
    val edges = graft.Checkpoints.pin(
      e0.select(col("a").as("src"), col("c").as("dst"))
        .unionByName(e0.select(col("c").as("src"), col("a").as("dst")))
        .repartition(col("dst")))
    // the labels frame is |V| rows (nodes are PARTS — the catalog,
    // which does not grow with traffic): under a 10M-node footer
    // bound it broadcasts EXPLICITLY each round, so every round is
    // one narrow pass over the pinned edges + one (dst, lab) partial-
    // aggregated exchange — without the hint the pinned frame's size
    // stats left the per-round join to planner mood (measured: an SMJ
    // round family at ×5 ran 15.2 s where the broadcast rounds at ×10
    // ran 9.6 s). Past the bound the labels legitimately shuffle.
    val labelsHint: DataFrame => DataFrame =
      if (graft.Tables.footerRowCount(s, d, "part") <= 10000000L)
        broadcast else identity
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
    for (_ <- 1 to LpRounds) {
      // predecessor pins are freed by the harness sweep post-action
      labels = graft.Checkpoints.pin(
        edges.join(labelsHint(labels.withColumnRenamed("node", "src")), "src")
          .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("dst"))
          .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"))
          .select(col("dst").as("node"), (-col("m.nl")).as("lab")))
    }
    lpCensus(labels)
  }

  /** Shared census tail of both LP backends (ONE tiebreak
    * definition, the topRanks discipline). */
  private def lpCensus(labels: DataFrame): DataFrame =
    labels.groupBy(col("lab"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("n_nodes").desc, col("lab"))
      .limit(20)

  val labelPropSql: String = {
    val pre =
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS c
        |  FROM b x JOIN b y ON x.o = y.o AND x.p < y.p),
        |e AS (SELECT a AS src, c AS dst FROM e0
        |      UNION ALL SELECT c AS src, a AS dst FROM e0),
        |r0 AS (SELECT DISTINCT src AS node, src AS lab FROM e)""".stripMargin
    val steps = (1 to LpRounds).map { i =>
      s"""r$i AS (
         |  SELECT dst AS node, lab FROM (
         |    SELECT e.dst, r.lab, COUNT(*) AS cnt,
         |      ROW_NUMBER() OVER (PARTITION BY e.dst
         |        ORDER BY COUNT(*) DESC, r.lab) AS rn
         |    FROM e JOIN r${i - 1} r ON e.src = r.node
         |    GROUP BY e.dst, r.lab)
         |  WHERE rn = 1)""".stripMargin
    }
    s"""$pre,
       |${steps.mkString(",\n")}
       |SELECT lab, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM r$LpRounds GROUP BY lab
       |ORDER BY n_nodes DESC, lab LIMIT 20""".stripMargin
  }

  private val StrongQty = 50

  /** Past-gate neighbor-list truncation for [[jaccard]]: 1024 keeps
    * every gated-SF degree intact (sf0.1 max degree is far below it)
    * while bounding a hub row at 8 KiB of ids however large the
    * corpus. Visible to specs via [[jaccard]]'s `forceCap` hook. */
  private[graft] val JaccardDegreeCap = 1024

  /** `graph_components` — connected components of the STRONG-edge
    * part↔supplier graph (edges = distinct pairs carried by a
    * max-quantity RETURNED lineitem, `l_quantity ≥ 50 ∧
    * l_returnflag = 'R'`): weak-edge pruning before clustering, the
    * shape component analysis is actually used in (supplier
    * communities, entity resolution after thresholding a similarity
    * graph). The full graph is near-connected and says nothing; the
    * strong subgraph fractures into real components (7 / 59 / 586 at
    * the three SFs — measured, and spec-pinned against union-find).
    *
    * RUN-TO-FIXPOINT via GraphX Pregel (r10 — replaces r8's fixed-
    * 16-round Catalyst min-label/pointer-jump loop, closing TWO r9
    * verdict items at once):
    *
    *  - COST (item 2): the Catalyst loop paid a planner + action +
    *    broadcast floor per round — measured 0.9 s intercept +
    *    160 ms/round × 16 = 3.8 s at sf0.1 for a 3k-edge graph, and
    *    the measured fixpoint was EXACTLY 13 rounds with no headroom
    *    to cut (extra pointer jumps per round did NOT reduce
    *    rounds-to-fixpoint below 12: the strong graph's long thin
    *    components are propagation-bound, not chain-compression-bound
    *    — measured r10, rounds×jumps grid at all three SFs). A
    *    per-round floor is intrinsic to expressing an iterative
    *    algorithm as one Catalyst plan per round; GraphX's Pregel is
    *    Spark's native answer — the same distributed min-label
    *    iteration over hash-partitioned vertex/edge RDDs, but each
    *    round is a cheap RDD job with no planning, no exchange
    *    re-derivation, and framework-managed caching/unpersist.
    *  - SAFETY (items 3/8): run-to-fixpoint makes the adversarial-
    *    diameter failure mode STRUCTURALLY impossible — there is no
    *    round budget to exceed, so a 2^16-long chain converges instead
    *    of under-merging. No footer gate needed.
    *
    * The oracle is the TRUE component census too (recursive-CTE
    * transitive closure, min reachable id — the dedup_clusters
    * pattern), so Spark and DuckDB now agree on the FIXPOINT, not
    * merely on replaying the same possibly-short iteration count.
    * Labels are min-node-id per component in both engines — exact
    * integers, order-independent, hash-identical at all three SFs to
    * the r9 fixed-round result (which had provably reached the
    * fixpoint; spec-pinned against union-find truth then and still).
    *
    * Scale: GraphX ConnectedComponents is the textbook 100 TB CC
    * (Pregel min-label over partitioned RDDs — adjacency never moves,
    * messages are (node, label) longs, rounds are data-dependent
    * O(diameter) with framework-level lineage truncation per round).
    * The RDD hop is justified exactly here (SURVEY §4's "genuine
    * per-partition imperative logic" carve-out): an iterative,
    * convergence-tested loop is the one shape Catalyst cannot express
    * without paying a full plan per round. Input edge build and output
    * census stay DataFrame/Catalyst, so pushdown (the strong-edge
    * filter reaches the lineitem scan) and the bounded top-20 census
    * are unchanged. */
  /** The file-scanning stage of [[components]], factored so PlanAudit
    * can audit its scan prune/pushdown (the pagerankEdges discipline —
    * past the `.rdd` hop the iteration is RDD-native and scan-free).
    * distinct before the RDD hop: |E| duplicate pairs would otherwise
    * replay as duplicate (identical) Pregel messages every round. */
  private[graft] def componentsEdges(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity") >= StrongQty && col("l_returnflag") === "R")
      .select(
        (col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sup"))
      .distinct()

  def components(s: SparkSession, d: String, n: Int = 20): DataFrame = {
    val pairs = componentsEdges(s, d)
    val edgeRdd = pairs.rdd.map(r => (r.getLong(0), r.getLong(1)))
    // Graph.fromEdgeTuples hash-partitions edges and derives the
    // vertex RDD; ConnectedComponents.run iterates Pregel min-label to
    // convergence (each vertex adopts the min id reachable over any
    // path, messages flow BOTH directions per edge, rounds stop when
    // no label changes — the GraphX library contract).
    val graph = org.apache.spark.graphx.Graph.fromEdgeTuples(edgeRdd, 1)
    val labels = org.apache.spark.graphx.lib.ConnectedComponents
      .run(graph).vertices.map { case (node, label) => (node, label) }
    val labelDf = s.createDataFrame(labels).toDF("node", "label")
    labelDf
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("node") % 2 === 0, 1L).otherwise(0L)).as("n_parts"),
        sum(when(col("node") % 2 === 1, 1L).otherwise(0L)).as("n_suppliers"))
      .orderBy(col("n_nodes").desc, col("label"))
      .limit(n)
      .select(
        when(col("label") % 2 === 0, lit("part")).otherwise(lit("supplier"))
          .as("root_kind"),
        expr("label DIV 2").as("root_key"),
        col("n_nodes"), col("n_parts"), col("n_suppliers"))
  }

  /** True-fixpoint census oracle: recursive-CTE transitive closure,
    * min reachable node id per node (the dedup_clusters pattern) —
    * closure size is Σ per-component |C|², bounded here because the
    * strong-edge filter fractures the graph into small components. */
  val componentsSql: String =
    s"""WITH RECURSIVE li AS (
       |  SELECT l_partkey*2 AS p, l_suppkey*2+1 AS sup
       |  FROM lineitem
       |  WHERE l_quantity >= $StrongQty AND l_returnflag = 'R'),
       |edges AS (
       |  SELECT DISTINCT p AS src, sup AS dst FROM li
       |  UNION SELECT DISTINCT sup AS src, p AS dst FROM li),
       |reach(node, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.lbl FROM edges e JOIN reach r ON e.src = r.node),
       |lab AS (SELECT node, MIN(lbl) AS label FROM reach GROUP BY node)
       |SELECT CASE WHEN label % 2 = 0 THEN 'part' ELSE 'supplier' END
       |    AS root_kind,
       |  label // 2 AS root_key, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_parts,
       |  CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers
       |FROM lab GROUP BY label
       |ORDER BY n_nodes DESC, label LIMIT 20""".stripMargin

  /** `graph_jaccard` — neighbor-overlap node similarity over the
    * co-purchase graph (the link-prediction / "customers also bought"
    * primitive): for every connected part pair, the Jaccard of their
    * FULL neighbor sets, reported as an integer ppm so both engines
    * agree bit-for-bit, top-20 by (similarity, pair). Same machinery
    * class as [[triangles]] — ONE collect_set shuffle builds the
    * undirected adjacency (set semantics absorb duplicate basket
    * pairs), each undirected edge then surfaces once from the
    * adjacency rows themselves (explode + v>u filter — no separate
    * edge table), carries nu for free, and fetches nv through the
    * footer-gated broadcast join. |N(u)∩N(v)| is an in-row
    * array_intersect inside codegen, never a wedge join — the oracle
    * REPLAYS the wedge join because SQL has no set column, which is
    * exactly the shape this plan avoids at scale.
    *
    * Zero-overlap pairs are excluded (they cannot reach a top-20
    * dominated by clique pairs, and the oracle's inner wedge join
    * never sees them). 100 TB: cost = adjacency shuffle + Σ per-edge
    * (|nu|+|nv|) intersect work; hub arrays are the scale bound, the
    * same one every neighborhood-similarity system (e.g. LSH-based
    * people-also-viewed) caps with degree truncation — compose with
    * corpus_domain_cap-style top-k neighbor truncation past it. */
  def jaccard(s: SparkSession, d: String, n: Int = 20,
      forceCap: Option[Int] = None): DataFrame = {
    val pairs = basketPairs(s, d)
    // DEGREE-TRUNCATION CAP (r10, verdict item 5 — previously a named
    // remedy only): past the same footer gate where the adjacency
    // broadcast degrades, a hub node's full neighbor array is the
    // scale bound (a 1e8-degree hub would build one giant row), so
    // each node keeps only its JaccardDegreeCap STRONGEST neighbors —
    // top-k by co-occurrence count (ties to the larger id via the
    // struct ordering), the weighted truncation every production
    // neighborhood-similarity system applies. collect_top_k keeps the
    // partials bounded at k per (node × partition), so the hub row
    // never materializes even transiently. Under the gate (all gated
    // SFs) the exact full-set path runs unchanged; `forceCap` is the
    // spec hook proving cap ≥ max-degree is a no-op and a tight cap
    // actually truncates.
    val capped: Option[Int] = forceCap.orElse(
      if (21L * graft.Tables.footerRowCount(s, d, "orders") > 4000000L)
        Some(JaccardDegreeCap)
      else None)
    val adjBase = pairs.select(col("a").as("u"), col("c").as("v"))
      .union(pairs.select(col("c").as("u"), col("a").as("v")))
    // pinned: consumed from both sides of the closing join (explode
    // stream + broadcast) — same discipline as triangles' adjP.
    val adj = graft.Checkpoints.pin(capped match {
      case None =>
        adjBase.groupBy(col("u"))
          .agg(sort_array(collect_set(col("v"))).as("nb"))
      case Some(k) =>
        adjBase.groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
          .groupBy(col("u"))
          .agg(org.apache.spark.sql.graft.shim
            .collectTopK(struct(col("w"), col("v")), k).as("tk"))
          .select(col("u"),
            sort_array(transform(col("tk"), x => x.getField("v"))).as("nb"))
    })
    val hint = adjacencyHint(s, d)
    adj.select(col("u").as("a"), explode(col("nb")).as("c"),
        col("nb").as("na"))
      .filter(col("c") > col("a")) // each undirected edge once
      .join(hint(adj.select(col("u").as("c"), col("nb").as("nc"))), "c")
      .select(col("a"), col("c"),
        // merge-walk count ≡ size(array_intersect) on sorted distinct
        // arrays, minus the per-edge hashset (SortedArrayExpressions)
        graft.functions.SortedArrayExpressions
          .sortedIntersectCount(col("na"), col("nc")).as("common"),
        (size(col("na")) + size(col("nc"))).cast("bigint").as("degsum"))
      .filter(col("common") > 0)
      .select(col("a"), col("c"), col("common"),
        expr("CAST((1000000 * common) DIV (degsum - common) AS BIGINT)")
          .as("jac_ppm"))
      .orderBy(col("jac_ppm").desc, col("a"), col("c"))
      .limit(n)
  }

  val jaccardSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (
      |  SELECT DISTINCT x.p AS a, y.p AS c
      |  FROM b x JOIN b y ON x.o = y.o AND x.p < y.p),
      |ed AS (SELECT a AS u, c AS v FROM e UNION ALL SELECT c, a FROM e),
      |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS dg FROM ed GROUP BY u),
      |common AS (
      |  SELECT e.a, e.c, CAST(COUNT(*) AS BIGINT) AS common
      |  FROM e
      |  JOIN ed n1 ON n1.u = e.a
      |  JOIN ed n2 ON n2.u = e.c AND n2.v = n1.v
      |  GROUP BY e.a, e.c)
      |SELECT m.a, m.c, m.common,
      |  (1000000 * m.common) // (da.dg + dc.dg - m.common) AS jac_ppm
      |FROM common m
      |JOIN deg da ON da.u = m.a
      |JOIN deg dc ON dc.u = m.c
      |ORDER BY jac_ppm DESC, m.a, m.c
      |LIMIT 20""".stripMargin

  val trianglesSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (
      |  SELECT DISTINCT x.p AS a, y.p AS c
      |  FROM b x JOIN b y ON x.o = y.o AND x.p < y.p),
      |tri AS (
      |  SELECT e1.a AS u, e1.c AS v, e2.c AS w
      |  FROM e e1
      |  JOIN e e2 ON e2.a = e1.c
      |  JOIN e e3 ON e3.a = e1.a AND e3.c = e2.c),
      |n AS (
      |  SELECT u AS part FROM tri
      |  UNION ALL SELECT v FROM tri
      |  UNION ALL SELECT w FROM tri)
      |SELECT part, CAST(COUNT(*) AS BIGINT) AS n_tri
      |FROM n GROUP BY part
      |ORDER BY n_tri DESC, part
      |LIMIT 20""".stripMargin

  val pagerankSql: String = {
    val pre =
      """WITH li AS (SELECT l_partkey*2 AS p, l_suppkey*2+1 AS sup FROM lineitem),
        |edges AS (SELECT DISTINCT p AS src, sup AS dst FROM li
        |          UNION SELECT DISTINCT sup AS src, p AS dst FROM li),
        |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |r0 AS (SELECT node, 1.0 AS rank FROM nodes)""".stripMargin
    val steps = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    FLOOR((${1 - Damp} + $Damp * (COALESCE(c.qsum, 0) / 1e9)) * 1e9) / 1e9 AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(SUM(CAST(FLOOR(r.rank / d.deg * 1e9) AS BIGINT)) AS BIGINT) AS qsum
         |    FROM edges e JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }
    s"""$pre,
       |${steps.mkString(",\n")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
       |  node // 2 AS key, rank
       |FROM r$Iters
       |ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }
}
