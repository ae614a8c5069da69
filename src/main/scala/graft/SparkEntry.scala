package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Corpus, Curation, Dedup, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Analytics.q1(spark, "/root/testdata/sf0.001")

  private val pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_corpus" -> ((s, d) => Dedup.dedupCorpus(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_ngram_dfcap" -> ((s, d) => Dedup.ngramDfCap(s, d)),
    "dedup_bloom" -> ((s, d) => Dedup.bloomDedup(s, d)),
    "dedup_corpus_near" -> ((s, d) => Dedup.dedupCorpusNear(s, d)),
    "sample_importance" -> ((s, d) => Curation.sampleImportance(s, d)),
    "sample_temperature" -> ((s, d) => Curation.sampleTemperature(s, d)),
    "sample_dsir" -> ((s, d) => Curation.sampleDsir(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingPairs(s, d)),
    "dedup_semantic" -> ((s, d) => Similarity.semanticDedup(s, d)),
    // the past-cap PRODUCTION path on a ×16 amplified corpus at
    // production banding geometry, oracle-checked every round (r9
    // verdict item 6): the oracle replays the EXACT in-cluster pair
    // join over the same amplified relation, so the gate IS the
    // banded path's result-identity claim
    "dedup_semantic_banded" -> ((s, d) =>
      Similarity.semanticDedupBandedAudit(s, d)),
    "sample_cluster_balanced" -> ((s, d) => Similarity.sampleClusterBalanced(s, d)),
    "text_cdc_chunks" -> ((s, d) => TextAnalysis.cdcChunks(s, d)),
    "dedup_cdc" -> ((s, d) => TextAnalysis.cdcPairs(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.clusters(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.containment(s, d)),
    "dedup_fuzzy" -> ((s, d) => Dedup.fuzzy(s, d)),
    "dedup_substring" -> ((s, d) => Dedup.substringCoverage(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprints(s, d)),
    "text_fingerprint_utf8" -> ((s, d) => TextAnalysis.utf8Gate(s, d)),
    "text_hashfeatures" -> ((s, d) => TextAnalysis.hashFeatures(s, d)),
    "text_langid" -> ((s, d) => TextAnalysis.langId(s, d)),
    "text_quality" -> ((s, d) => TextAnalysis.quality(s, d)),
    "text_tokens" -> ((s, d) => TextAnalysis.tokens(s, d)),
    "text_ngrams" -> ((s, d) => TextAnalysis.topNgrams(s, d)),
    "text_tfidf" -> ((s, d) => TextAnalysis.tfidf(s, d)),
    "text_gini" -> ((s, d) => TextAnalysis.gini(s, d)),
    "text_scrub" -> ((s, d) => TextAnalysis.scrub(s, d)),
    "text_bpe_tokens" -> ((s, d) => TextAnalysis.bpeTokens(s, d)),
    "text_lm_score" -> ((s, d) => TextAnalysis.lmScore(s, d)),
    "pack_sequences_bpe" -> ((s, d) => Corpus.packSequencesBpe(s, d)),
    "corpus_shard" -> ((s, d) => Corpus.corpusShard(s, d)),
    "corpus_token_budget" -> ((s, d) => Corpus.tokenBudget(s, d)),
    "corpus_domain_cap" -> ((s, d) => Corpus.domainCap(s, d)),
    "corpus_epochs" -> ((s, d) => Corpus.corpusEpochs(s, d)),
    "dedup_phrases" -> ((s, d) => TextAnalysis.phrases(s, d)),
    "text_boilerplate" -> ((s, d) => TextAnalysis.boilerplateScrub(s, d)),
    "ann_bruteforce" -> ((s, d) => Similarity.bruteForce(s, d)),
    "ann_topk_join" -> ((s, d) => Similarity.topkJoin(s, d)),
    "sample_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "ann_knn_graph" -> ((s, d) => Similarity.knnGraph(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.lsh(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.ivf(s, d)),
    // The PQ family SERVES from the persisted index (AnnIndex): the
    // first invocation in a session builds it, the rest answer from
    // stored codes — bit-identical to the inline training pipelines
    // (AnnIndexSpec pins served == inline), so the training-replay
    // oracles below still hash-match.
    "ann_index_build" -> ((s, d) => graft.operators.AnnIndex.stats(s, d)),
    "ann_index_query" -> ((s, d) => graft.operators.AnnIndex.ivfpqRerankQuery(s, d)),
    "ann_index_knn_join" -> ((s, d) => graft.operators.AnnIndex.knnJoin(s, d)),
    "ann_forget" -> ((s, d) => graft.operators.AnnIndex.forgetAudit(s, d)),
    "ann_index_filtered" -> ((s, d) => graft.operators.AnnIndex.filteredIndexQuery(s, d)),
    "ann_index_compact" -> ((s, d) => graft.operators.AnnIndex.compactAudit(s, d)),
    "ann_index_append_build" -> ((s, d) => graft.operators.AnnIndex.appendBuildAudit(s, d)),
    "ann_recall_audit" -> ((s, d) => graft.operators.AnnIndex.recallAudit(s, d)),
    "embed_truncation" -> ((s, d) => Similarity.truncationAudit(s, d)),
    "ann_hybrid" -> ((s, d) => Similarity.hybridRrf(s, d)),
    "dedup_forget" -> ((s, d) => Dedup.dedupForget(s, d)),
    "dedup_minhash_index" -> ((s, d) => graft.operators.MinhashIndex.incrementalNearDups(s, d)),
    "ann_pq" -> ((s, d) => graft.operators.AnnIndex.pqQuery(s, d)),
    "ann_pq_rerank" -> ((s, d) => graft.operators.AnnIndex.pqRerankQuery(s, d)),
    "ann_ivfpq" -> ((s, d) => graft.operators.AnnIndex.ivfpqQuery(s, d)),
    "ann_ivfpq_rerank" -> ((s, d) => graft.operators.AnnIndex.ivfpqRerankQuery(s, d)),
    "ann_range" -> ((s, d) => Similarity.rangeSearch(s, d)),
    "ann_filtered" -> ((s, d) => Similarity.filteredSearch(s, d)),
    "ann_whiten" -> ((s, d) => Similarity.whiten(s, d)),
    "ann_dim_stats" -> ((s, d) => Similarity.dimStats(s, d)),
    "embed_drift" -> ((s, d) => Similarity.embedDrift(s, d)),
    "embed_kmeans" -> ((s, d) => Similarity.kmeans(s, d)),
    "embed_outliers" -> ((s, d) => Similarity.outliers(s, d)),
    "embed_quantize" -> ((s, d) => Similarity.quantize(s, d)),
    "embed_pca" -> ((s, d) => Similarity.pca(s, d)),
    "chunk_documents" -> ((s, d) => Corpus.chunks(s, d)),
    "pack_sequences" -> ((s, d) => Corpus.packSequences(s, d)),
    "dedup_decontaminate" -> ((s, d) => Corpus.decontaminate(s, d)),
    "dedup_incremental" -> ((s, d) => Corpus.incremental(s, d)),
    "corpus_mix" -> ((s, d) => Corpus.corpusMix(s, d)),
    "corpus_interleave" -> ((s, d) => Corpus.corpusInterleave(s, d)),
    "corpus_diff" -> ((s, d) => Corpus.corpusDiff(s, d)),
    "graph_pagerank" -> ((s, d) => graft.operators.GraphOps.pagerank(s, d)),
    "graph_triangles" -> ((s, d) => graft.operators.GraphOps.triangles(s, d)),
    "graph_jaccard" -> ((s, d) => graft.operators.GraphOps.jaccard(s, d)),
    "graph_components" -> ((s, d) => graft.operators.GraphOps.components(s, d)),
    "graph_labelprop" -> ((s, d) => graft.operators.GraphOps.labelProp(s, d)),
    "corpus_card" -> ((s, d) => Corpus.corpusCard(s, d)),
    "sample_split" -> ((s, d) => Curation.sampleSplit(s, d)),
    "sample_uniform_n" -> ((s, d) => Curation.sampleUniformN(s, d)),
    "sample_stratified" -> ((s, d) => Curation.sampleStratified(s, d)),
    "text_repetition" -> ((s, d) => Curation.repetition(s, d)),
    "corpus_gate" -> ((s, d) => Curation.qualityGate(s, d)),
    "mm_meta_agg" -> ((s, d) => graft.multimodal.Multimodal.metaAgg(s, d)),
    "mm_dedup" -> ((s, d) => graft.multimodal.Multimodal.payloadDedup(s, d)),
    "mm_schema" -> ((s, d) => graft.multimodal.Multimodal.featureTable(s, d)),
    "mm_frames" -> ((s, d) => graft.multimodal.Multimodal.frameTable(s, d)),
    "mm_transcode" -> ((s, d) => graft.multimodal.Multimodal.transcodeTable(s, d)),
    "mm_similar" -> ((s, d) => graft.multimodal.Multimodal.similarTable(s, d)),
    "mm_quality" -> ((s, d) => graft.multimodal.Multimodal.qualityTable(s, d)),
    "mm_asof_align" -> ((s, d) => graft.multimodal.Multimodal.avAlign(s, d)),
    "stream_windowed_agg" -> ((s, d) => graft.streaming.Streams.windowedAgg(s, d)),
    "stream_enrich" -> ((s, d) => graft.streaming.Streams.streamEnrich(s, d)),
    "stream_topk" -> ((s, d) => graft.streaming.Streams.streamTopK(s, d)),
    "stream_upsert" -> ((s, d) => graft.streaming.Streams.streamUpsert(s, d)),
    "stream_corpus" -> ((s, d) => graft.streaming.Streams.streamCorpus(s, d)),
    "stream_sessionize" -> ((s, d) => graft.streaming.Streams.sessionizeTable(s, d)),
    "stream_session_timeout" -> ((s, d) => graft.streaming.Streams.sessionTimeoutTable(s, d)),
    "stream_dedup" -> ((s, d) => graft.streaming.Streams.streamDedup(s, d)),
    "stream_interval_join" -> ((s, d) => graft.streaming.Streams.intervalJoin(s, d)),
    "stream_interval_left" -> ((s, d) => graft.streaming.Streams.intervalJoinLeft(s, d)),
    "stream_anomaly" -> ((s, d) => graft.streaming.Streams.streamAnomaly(s, d)),
    "stream_versioned_sink" -> ((s, d) => graft.streaming.Streams.versionedSink(s, d)),
    "stream_delta_sink" -> ((s, d) => graft.streaming.Streams.deltaSink(s, d)))

  private val pipelineOracles: Map[String, String] = Map(
    "dedup_exact" -> Dedup.exactSql,
    "dedup_corpus" -> Dedup.dedupCorpusSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "dedup_ngram_dfcap" -> Dedup.ngramDfCapSql,
    "dedup_bloom" -> Dedup.bloomDedupSql,
    "dedup_corpus_near" -> Dedup.dedupCorpusNearSql,
    "sample_importance" -> Curation.sampleImportanceSql,
    "sample_temperature" -> Curation.sampleTemperatureSql,
    "sample_dsir" -> Curation.sampleDsirSql,
    "dedup_minhash" -> Dedup.minhashLshSql,
    "dedup_containment" -> Dedup.containmentSql,
    "dedup_fuzzy" -> Dedup.fuzzySql,
    "dedup_substring" -> Dedup.substringCoverageSql,
    "dedup_embedding" -> Dedup.embeddingPairsSql,
    "dedup_semantic" -> Similarity.semanticDedupSql,
    // exact-pair replay on purpose: the banded path's contract is
    // result-identity with the exact pass (its candidates are a
    // superset of every top-50 pair or the hash gate fails)
    "dedup_semantic_banded" -> Similarity.semanticDedupBandedSql,
    "sample_cluster_balanced" -> Similarity.sampleClusterBalancedSql,
    "text_cdc_chunks" -> TextAnalysis.cdcChunksSql,
    "dedup_cdc" -> TextAnalysis.cdcPairsSql,
    "dedup_simhash" -> Dedup.simhashSql,
    "dedup_clusters" -> Dedup.clustersSql,
    "text_fingerprint" -> TextAnalysis.fingerprintsSql,
    "text_fingerprint_utf8" -> TextAnalysis.utf8GateSql,
    "text_hashfeatures" -> TextAnalysis.hashFeaturesSql,
    "text_langid" -> TextAnalysis.langIdSql,
    "text_quality" -> TextAnalysis.qualitySql,
    "text_tokens" -> TextAnalysis.tokensSql,
    "text_ngrams" -> TextAnalysis.topNgramsSql,
    "text_tfidf" -> TextAnalysis.tfidfSql,
    "text_gini" -> TextAnalysis.giniSql,
    "text_scrub" -> TextAnalysis.scrubSql,
    "text_bpe_tokens" -> TextAnalysis.bpeTokensSql,
    "text_lm_score" -> TextAnalysis.lmScoreSql,
    "pack_sequences_bpe" -> Corpus.packSequencesBpeSql,
    "corpus_shard" -> Corpus.corpusShardSql,
    "corpus_token_budget" -> Corpus.tokenBudgetSql,
    "corpus_domain_cap" -> Corpus.domainCapSql,
    "corpus_epochs" -> Corpus.corpusEpochsSql,
    "dedup_phrases" -> TextAnalysis.phrasesSql,
    "text_boilerplate" -> TextAnalysis.boilerplateScrubSql,
    "ann_bruteforce" -> Similarity.bruteForceSql,
    "ann_topk_join" -> Similarity.topkJoinSql,
    "sample_hard_negatives" -> Similarity.hardNegativesSql,
    "ann_knn_graph" -> Similarity.knnGraphSql,
    "ann_dim_stats" -> Similarity.dimStatsSql,
    "embed_drift" -> Similarity.embedDriftSql,
    "embed_kmeans" -> Similarity.kmeansSql,
    "embed_outliers" -> Similarity.outliersSql,
    "embed_quantize" -> Similarity.quantizeSql,
    "embed_pca" -> Similarity.pcaSql,
    "ann_range" -> Similarity.rangeSearchSql,
    "ann_filtered" -> Similarity.filteredSearchSql,
    "ann_whiten" -> Similarity.whitenSql,
    "ann_lsh" -> Similarity.lshSql,
    "ann_ivf" -> Similarity.ivfSql,
    "ann_index_build" -> graft.operators.AnnIndex.statsSql,
    // the served query answers the SAME top-k as the inline pipeline,
    // so it shares ann_ivfpq_rerank's training-replay oracle verbatim
    "ann_index_query" -> Similarity.ivfpqRerankSql,
    "ann_index_knn_join" -> graft.operators.AnnIndex.knnJoinSql,
    "ann_forget" -> graft.operators.AnnIndex.forgetSql,
    "ann_index_filtered" -> graft.operators.AnnIndex.filteredIndexSql,
    "ann_index_compact" -> graft.operators.AnnIndex.compactSql,
    // the full-rebuild serve replay: hash-match IS the incremental-vs-
    // rebuild serve-parity claim
    "ann_index_append_build" -> graft.operators.AnnIndex.appendBuildSql,
    "ann_recall_audit" -> graft.operators.AnnIndex.recallAuditSql,
    "embed_truncation" -> Similarity.truncationAuditSql,
    "ann_hybrid" -> Similarity.hybridRrfSql,
    "dedup_forget" -> Dedup.dedupForgetSql,
    "dedup_minhash_index" -> graft.operators.MinhashIndex.incrementalSql,
    "ann_pq" -> Similarity.pqSql,
    "ann_pq_rerank" -> Similarity.pqRerankSql,
    "ann_ivfpq" -> Similarity.ivfpqSql,
    "ann_ivfpq_rerank" -> Similarity.ivfpqRerankSql,
    "chunk_documents" -> Corpus.chunksSql,
    "pack_sequences" -> Corpus.packSequencesSql,
    "dedup_decontaminate" -> Corpus.decontaminateSql,
    "dedup_incremental" -> Corpus.incrementalSql,
    "corpus_mix" -> Corpus.corpusMixSql,
    "corpus_interleave" -> Corpus.corpusInterleaveSql,
    "corpus_diff" -> Corpus.corpusDiffSql,
    "graph_pagerank" -> graft.operators.GraphOps.pagerankSql,
    "graph_triangles" -> graft.operators.GraphOps.trianglesSql,
    "graph_jaccard" -> graft.operators.GraphOps.jaccardSql,
    "graph_components" -> graft.operators.GraphOps.componentsSql,
    "graph_labelprop" -> graft.operators.GraphOps.labelPropSql,
    "corpus_card" -> Corpus.corpusCardSql,
    "sample_split" -> Curation.sampleSplitSql,
    "sample_uniform_n" -> Curation.sampleUniformNSql,
    "sample_stratified" -> Curation.sampleStratifiedSql,
    "text_repetition" -> Curation.repetitionSql,
    "corpus_gate" -> Curation.qualityGateSql,
    "mm_meta_agg" -> graft.multimodal.Multimodal.metaAggSql,
    "mm_dedup" -> graft.multimodal.Multimodal.payloadDedupSql,
    "mm_schema" -> graft.multimodal.Multimodal.featureTableSql,
    "mm_frames" -> graft.multimodal.Multimodal.frameTableSql,
    "mm_transcode" -> graft.multimodal.Multimodal.transcodeTableSql,
    "mm_similar" -> graft.multimodal.Multimodal.similarSql,
    "mm_quality" -> graft.multimodal.Multimodal.qualitySql,
    "mm_asof_align" -> graft.multimodal.Multimodal.avAlignSql,
    "stream_windowed_agg" -> graft.streaming.Streams.windowedAggSql,
    "stream_enrich" -> graft.streaming.Streams.streamEnrichSql,
    "stream_topk" -> graft.streaming.Streams.streamTopKSql,
    "stream_upsert" -> graft.streaming.Streams.streamUpsertSql,
    "stream_corpus" -> graft.streaming.Streams.streamCorpusSql,
    "stream_sessionize" -> graft.streaming.Streams.sessionizeSql,
    "stream_session_timeout" -> graft.streaming.Streams.sessionTimeoutSql,
    "stream_dedup" -> graft.streaming.Streams.streamDedupSql,
    "stream_interval_join" -> graft.streaming.Streams.intervalJoinSql,
    "stream_interval_left" -> graft.streaming.Streams.intervalJoinLeftSql,
    "stream_anomaly" -> graft.streaming.Streams.streamAnomalySql,
    "stream_versioned_sink" -> graft.streaming.Streams.versionedSinkSql,
    "stream_delta_sink" -> graft.streaming.Streams.deltaSinkSql)
    // Every pipeline query is oracle-gated: the formerly rows-only
    // four are replayed exactly — deterministic hyperplane / centroid /
    // codebook literals for ann_lsh/ann_ivf/ann_pq, and HUGEINT
    // mod-2^64 FNV-1a for dedup_simhash. q22_approx_distinct (r6)
    // emits exact distincts + a within-5% flag, so even the HLL
    // contract is hash-gated (the sketch values themselves stay
    // engine-specific and out of the output).

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++ graft.queries.Analytics2.queries ++
      graft.queries.Analytics3.queries ++ graft.queries.Analytics4.queries ++
      pipelineQueries ++ graft.queries.EtlQueries.queries ++
      graft.queries.SqlSurface.queries

  /** Parse the SPARK_GRAFT_ONLY dev knob (comma-separated query names)
    * shared by the Verify and Bench mains; unknown names fail loudly —
    * a typo must not silently select nothing. */
  def parseOnly(): Option[Set[String]] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- queries.keySet
      if (unknown.nonEmpty)
        sys.error(s"SPARK_GRAFT_ONLY names unknown queries: " +
          unknown.toSeq.sorted.mkString(", "))
    }
    only
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Analytics.oracles ++ graft.queries.Analytics2.oracles ++
      graft.queries.Analytics3.oracles ++ graft.queries.Analytics4.oracles ++
      pipelineOracles ++ graft.queries.EtlQueries.oracles ++
      graft.queries.SqlSurface.oracles
}
