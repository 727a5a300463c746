package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Assets, GraphOps, MultimodalOps, Relational, Retrieval, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a scale-factor directory; `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL for the driver's differential check.
  * Column names are aligned between both sides (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The two-phase collectServicesFromSummaries pipeline (SURVEY.md §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    Assets.servicesFromSummaries(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference-parity asset pipelines (SURVEY.md §3)
    "svc_summaries"   -> ((s, d) => Assets.servicesFromSummaries(s, d)),
    "svc_latest"      -> ((s, d) => Assets.servicesLatest(s, d)),
    "svc_collapse"    -> ((s, d) => Assets.servicesCollapse(s, d)),
    "container_graph" -> ((s, d) => Assets.containerGraph(s, d)),
    "pods_collapse"   -> ((s, d) => Assets.podsCollapse(s, d)),
    "node_graph"      -> ((s, d) => Assets.nodeGraph(s, d)),
    "pods_multi_source" -> ((s, d) => Assets.podsMultiSource(s, d)),
    "svc_multivalued"   -> ((s, d) => Assets.svcMultivalued(s, d)),
    "host_multivalued"  -> ((s, d) => Assets.hostMultivalued(s, d)),
    "sig_host_family"   -> ((s, d) => Assets.hostFamily(s, d)),
    "assets_all"        -> ((s, d) => Assets.assetsAll(s, d)),
    "asset_upsert"      -> ((s, d) => Assets.assetUpsert(s, d)),
    "asset_upsert_merge" -> ((s, d) => Assets.assetUpsertMerge(s, d)),
    // General relational operator library (SURVEY.md §7.2 step 4)
    "q1_pricing_summary" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q2_filter_project"  -> ((s, d) => Relational.q2FilterProject(s, d)),
    "q3_join_agg"        -> ((s, d) => Relational.q3JoinAgg(s, d)),
    "q4_semi_join"       -> ((s, d) => Relational.q4SemiJoin(s, d)),
    "q5_anti_join"       -> ((s, d) => Relational.q5AntiJoin(s, d)),
    "q6_broadcast_join"  -> ((s, d) => Relational.q6BroadcastJoin(s, d)),
    "q7_outer_join"      -> ((s, d) => Relational.q7OuterJoin(s, d)),
    "q8_window_topn"     -> ((s, d) => Relational.q8WindowTopN(s, d)),
    "q9_window_running"  -> ((s, d) => Relational.q9WindowRunning(s, d)),
    "q10_distinct"       -> ((s, d) => Relational.q10Distinct(s, d)),
    "q11_except"         -> ((s, d) => Relational.q11Except(s, d)),
    "q12_intersect"      -> ((s, d) => Relational.q12Intersect(s, d)),
    "q13_rollup"         -> ((s, d) => Relational.q13Rollup(s, d)),
    "q14_cube"           -> ((s, d) => Relational.q14Cube(s, d)),
    "q15_topk"           -> ((s, d) => Relational.q15TopK(s, d)),
    "q16_having"         -> ((s, d) => Relational.q16Having(s, d)),
    "q17_case_when"      -> ((s, d) => Relational.q17CaseWhen(s, d)),
    "q18_string_funcs"   -> ((s, d) => Relational.q18StringFuncs(s, d)),
    "q19_date_funcs"     -> ((s, d) => Relational.q19DateFuncs(s, d)),
    "q20_scalar_subquery" -> ((s, d) => Relational.q20ScalarSubquery(s, d)),
    "q21_count_distinct" -> ((s, d) => Relational.q21CountDistinct(s, d)),
    "q22_approx_distinct" -> ((s, d) => Relational.q22ApproxDistinct(s, d)),
    "q23_star_join"      -> ((s, d) => Relational.q23StarJoin(s, d)),
    "q24_json"           -> ((s, d) => Relational.q24Json(s, d)),
    "q25_array_funcs"    -> ((s, d) => Relational.q25ArrayFuncs(s, d)),
    "q26_full_outer"     -> ((s, d) => Relational.q26FullOuter(s, d)),
    "q27_union"          -> ((s, d) => Relational.q27Union(s, d)),
    "q28_asof_join"      -> ((s, d) => Relational.q28AsofJoin(s, d)),
    "q29_range_join"     -> ((s, d) => Relational.q29RangeJoin(s, d)),
    "q30_sessionize"     -> ((s, d) => Relational.q30Sessionize(s, d)),
    "q31_histogram"      -> ((s, d) => Relational.q31Histogram(s, d)),
    "q32_percentile"     -> ((s, d) => Relational.q32Percentile(s, d)),
    // LLM-data-pipeline: text analysis + dedup (builder brief; documents table)
    "txt_tokens"          -> ((s, d) => TextOps.tokens(s, d)),
    "txt_tokens_bpe"      -> ((s, d) => TextOps.tokensBpe(s, d)),
    "txt_quality"         -> ((s, d) => TextOps.quality(s, d)),
    "txt_langid"          -> ((s, d) => TextOps.langid(s, d)),
    "txt_fingerprint"     -> ((s, d) => TextOps.fingerprint(s, d)),
    "txt_simhash"         -> ((s, d) => TextOps.simhash(s, d)),
    "txt_simhash_native"  -> ((s, d) => TextOps.simhashNative(s, d)),
    "dedup_exact"         -> ((s, d) => TextOps.dedupExact(s, d)),
    "dedup_minhash"       -> ((s, d) => TextOps.minhash(s, d)),
    "dedup_minhash_lsh"   -> ((s, d) => TextOps.dedupMinhashLsh(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => TextOps.dedupNgramJaccard(s, d)),
    "dedup_simhash"       -> ((s, d) => TextOps.dedupSimhash(s, d)),
    "txt_tfidf"           -> ((s, d) => TextOps.tfidf(s, d)),
    "txt_normalize"       -> ((s, d) => TextOps.normalize(s, d)),
    "txt_split"           -> ((s, d) => TextOps.split90_5_5(s, d)),
    "dedup_fuzzy_edit"    -> ((s, d) => TextOps.dedupFuzzyEdit(s, d)),
    "dedup_clusters"      -> ((s, d) => TextOps.dedupClusters(s, d)),
    "txt_pack"            -> ((s, d) => TextOps.pack(s, d)),
    "txt_decontaminate"   -> ((s, d) => TextOps.decontaminate(s, d)),
    "txt_decontaminate_bloom" -> ((s, d) => TextOps.decontaminateBloom(s, d)),
    "txt_sample_stratified" -> ((s, d) => TextOps.sampleStratified(s, d)),
    "txt_repetition"      -> ((s, d) => TextOps.repetition(s, d)),
    "dedup_clusters_fixpoint" -> ((s, d) => TextOps.dedupClustersFixpoint(s, d)),
    "dedup_clusters_star" -> ((s, d) => TextOps.dedupClustersStar(s, d)),
    "fuzzy_join"          -> ((s, d) => TextOps.fuzzyJoin(s, d)),
    "dedup_segments"      -> ((s, d) => TextOps.dedupSegments(s, d)),
    "txt_shard"           -> ((s, d) => TextOps.shard(s, d)),
    "txt_ngram_stats"     -> ((s, d) => TextOps.ngramStats(s, d)),
    "txt_scrub"           -> ((s, d) => TextOps.scrub(s, d)),
    "txt_mix_weights"     -> ((s, d) => TextOps.mixWeights(s, d)),
    "txt_chunks"          -> ((s, d) => TextOps.chunks(s, d)),
    "dedup_containment"   -> ((s, d) => TextOps.dedupContainment(s, d)),
    "txt_surprisal"       -> ((s, d) => TextOps.surprisal(s, d)),
    "txt_chunk_dedup"     -> ((s, d) => TextOps.chunkDedup(s, d)),
    "q33_pivot"           -> ((s, d) => Relational.q33Pivot(s, d)),
    "q34_salted_wordcount" -> ((s, d) => Relational.q34SaltedWordcount(s, d)),
    "q35_approx_quantile" -> ((s, d) => Relational.q35ApproxQuantile(s, d)),
    "q36_rolling_window"  -> ((s, d) => Relational.q36RollingWindow(s, d)),
    "q37_lead_lag"        -> ((s, d) => Relational.q37LeadLag(s, d)),
    "q38_funnel"          -> ((s, d) => Relational.q38Funnel(s, d)),
    "q39_retention"       -> ((s, d) => Relational.q39Retention(s, d)),
    "q40_grouping_sets"   -> ((s, d) => Relational.q40GroupingSets(s, d)),
    "q41_exists_subquery" -> ((s, d) => Relational.q41ExistsSubquery(s, d)),
    "q42_rank_family"     -> ((s, d) => Relational.q42RankFamily(s, d)),
    "q43_lateral_topn"    -> ((s, d) => Relational.q43LateralTopN(s, d)),
    "q44_heavy_hitters"   -> ((s, d) => Relational.q44HeavyHitters(s, d)),
    "q49_weighted_sample" -> ((s, d) => Relational.q49WeightedSample(s, d)),
    "q50_sample_quantiles" -> ((s, d) => Relational.q50SampleQuantiles(s, d)),
    "evt_transitions"     -> ((s, d) => Relational.evtTransitions(s, d)),
    "evt_anomaly"         -> ((s, d) => Relational.evtAnomaly(s, d)),
    "evt_paths"           -> ((s, d) => Relational.evtPaths(s, d)),
    "evt_date_histogram"  -> ((s, d) => Relational.evtDateHistogram(s, d)),
    "q51_percentile_ranks" -> ((s, d) => Relational.q51PercentileRanks(s, d)),
    "q52_pagination"      -> ((s, d) => Relational.q52Pagination(s, d)),
    "q53_keyset_page"     -> ((s, d) => Relational.q53KeysetPage(s, d)),
    "evt_rolling_distinct" -> ((s, d) => Relational.evtRollingDistinct(s, d)),
    "evt_rolling_distinct_hll" -> ((s, d) => Relational.evtRollingDistinctHll(s, d)),
    "emb_knn_filtered"    -> ((s, d) => VectorOps.knnFiltered(s, d)),
    "emb_knn_ivf_filtered" -> ((s, d) => VectorOps.knnIvfFiltered(s, d)),
    "emb_knn_label_part"  -> ((s, d) => VectorOps.knnLabelPartitioned(s, d)),
    // Storage layout (sources.Layout): write-time levers, oracle-proven
    // to preserve semantics
    "q46_cms_counts"      -> ((s, d) => Relational.q46CmsCounts(s, d)),
    "q47_hll_distinct"    -> ((s, d) => Relational.q47HllDistinct(s, d)),
    "q48_kmv_distinct"    -> ((s, d) => Relational.q48KmvDistinct(s, d)),
    "q45_bucketed_join"   -> ((s, d) => graft.sources.Layout.q45BucketedJoin(s, d)),
    "evt_partition_pruned" -> ((s, d) => graft.sources.Layout.evtPartitionPruned(s, d)),
    "evt_zorder_box"      -> ((s, d) => graft.sources.Layout.evtZorderBox(s, d)),
    "evt_bloom_skip"      -> ((s, d) => graft.sources.Layout.evtBloomSkip(s, d)),
    // Graph analytics over relationally-derived edges (SURVEY.md §8.2)
    "graph_degree"        -> ((s, d) => GraphOps.degreeCentrality(s, d)),
    "graph_pagerank"      -> ((s, d) => GraphOps.pagerank(s, d)),
    "graph_triangles"     -> ((s, d) => GraphOps.triangles(s, d)),
    "asset_reachability"  -> ((s, d) => GraphOps.assetReachability(s, d)),
    "asset_closure"       -> ((s, d) => GraphOps.assetClosure(s, d)),
    "asset_closure_incr"  -> ((s, d) => GraphOps.assetClosureIncremental(s, d)),
    // LLM-data-pipeline: embedding similarity search (embeddings table)
    "emb_knn_exact"  -> ((s, d) => VectorOps.knnExact(s, d)),
    "emb_knn_native" -> ((s, d) => VectorOps.knnExactNative(s, d)),
    "emb_knn_topk"   -> ((s, d) => VectorOps.knnExactTopK(s, d)),
    "emb_knn_lsh"    -> ((s, d) => VectorOps.knnLsh(s, d)),
    "emb_centroids"  -> ((s, d) => VectorOps.centroids(s, d)),
    "emb_ivf_assign" -> ((s, d) => VectorOps.ivfAssign(s, d)),
    "emb_knn_ivf"    -> ((s, d) => VectorOps.knnIvf(s, d)),
    "emb_lsh_recall" -> ((s, d) => VectorOps.lshRecall(s, d)),
    "emb_lsh_mp_recall" -> ((s, d) => VectorOps.lshRecall(s, d, probeBits = 1)),
    "emb_knn_sq8"    -> ((s, d) => VectorOps.knnSq8(s, d)),
    "emb_sq8_recall" -> ((s, d) => VectorOps.sq8Recall(s, d)),
    "emb_knn_bq"     -> ((s, d) => VectorOps.knnBq(s, d)),
    "emb_bq_recall"  -> ((s, d) => VectorOps.bqRecall(s, d)),
    "emb_knn_pq"     -> ((s, d) => VectorOps.knnPq(s, d)),
    "emb_pq_recall"  -> ((s, d) => VectorOps.pqRecall(s, d)),
    "emb_knn_mrl"    -> ((s, d) => VectorOps.knnMrl(s, d)),
    "emb_mrl_recall" -> ((s, d) => VectorOps.mrlRecall(s, d)),
    "emb_knn_ivfpq"  -> ((s, d) => VectorOps.knnIvfPq(s, d)),
    "emb_ivfpq_recall" -> ((s, d) => VectorOps.ivfPqRecall(s, d)),
    "emb_ivfpq_mp_recall" -> ((s, d) => VectorOps.ivfPqRecall(s, d, nprobe = 4)),
    "emb_pq_mse"     -> ((s, d) => VectorOps.pqMse(s, d)),
    "emb_ivf_recall" -> ((s, d) => VectorOps.ivfRecall(s, d)),
    "emb_ivf_mp_recall" -> ((s, d) => VectorOps.ivfRecall(s, d, nprobe = 4)),
    "emb_dedup_clusters" -> ((s, d) => VectorOps.dedupEmbeddingClusters(s, d)),
    "emb_semdedup"   -> ((s, d) => VectorOps.semDedup(s, d)),
    "emb_cluster_sample" -> ((s, d) => VectorOps.clusterSample(s, d)),
    "dedup_embedding" -> ((s, d) => VectorOps.dedupEmbedding(s, d)),
    "emb_decontaminate" -> ((s, d) => VectorOps.embDecontaminate(s, d)),
    "corpus_curation" -> ((s, d) => TextOps.corpusCuration(s, d)),
    "txt_source_overlap" -> ((s, d) => TextOps.sourceOverlap(s, d)),
    "txt_novelty"    -> ((s, d) => TextOps.novelty(s, d)),
    "txt_bm25"       -> ((s, d) => TextOps.bm25(s, d)),
    "txt_sig_terms"  -> ((s, d) => TextOps.sigTerms(s, d)),
    "hybrid_rrf"     -> ((s, d) => Retrieval.hybridRrf(s, d)),
    "cluster_cards"  -> ((s, d) => Retrieval.clusterCards(s, d)),
    "mmr_rerank"     -> ((s, d) => Retrieval.mmrRerank(s, d)),
    // LLM-data-pipeline: multimodal binary columns (media_decode runs
    // a real pure-JVM PPM parser at the codec seam, oracle-checked)
    "media_metadata" -> ((s, d) => MultimodalOps.mediaMetadata(s, d)),
    "media_frames"   -> ((s, d) => MultimodalOps.mediaFrames(s, d)),
    "media_features" -> ((s, d) => MultimodalOps.mediaFeatures(s, d)),
    "media_resize"   -> ((s, d) => MultimodalOps.mediaResize(s, d)),
    "media_dedup_exact" -> ((s, d) => MultimodalOps.mediaDedupExact(s, d)),
    "media_dedup_near"  -> ((s, d) => MultimodalOps.mediaDedupNear(s, d)),
    "media_decode"   -> ((s, d) => MultimodalOps.mediaDecode(s, d).toDF()),
  )

  /** Bench warmup entries, owned HERE next to [[queries]] so a new
    * operator family cannot forget its warmup without failing the
    * WarmupSpec staleness test (every memoized artifact key any
    * registry query builds must be touched by some warmup entry —
    * hand-maintained lists missed a family two rounds running: r6
    * residual PQ, r7 graph).
    *
    * What warmup buys, per family: JVM/codegen/parquet-footer startup
    * (q1/q18/q23 cover the TPC-H star, svc_collapse the events
    * family), the heaviest janino codegen units (the simhash pair: 32
    * aggregate expressions each, 2.1s cold vs 0.73s warm), and every
    * build-once-per-session memoized artifact: dedup signatures + LSH
    * edges + labels (dedup_minhash/dedup_clusters), embedding dedup
    * edges (emb_dedup_clusters), IVF codebook + assignment
    * (emb_knn_ivf), PQ codebooks (emb_knn_pq), residual IVF-PQ
    * artifacts (emb_knn_ivfpq), re-laid-out storage copies
    * (q45/evt_partition_pruned/evt_zorder_box write bucketed and
    * date-partitioned tables once), the asset graph's memoized edge
    * set + first-touch of the closure loop (asset_reachability /
    * asset_closure — 19.5s first sample vs 3.7s steady when it lands
    * in a timed run), and pagerank's trade-edge table
    * (graph_pagerank).
    */
  def warmups: Seq[String] = Seq(
    "q1_pricing_summary", "q18_string_funcs", "q23_star_join",
    "svc_collapse", "txt_tokens", "txt_simhash", "dedup_simhash",
    "emb_centroids", "dedup_minhash", "dedup_clusters",
    "emb_dedup_clusters", "emb_knn_ivf", "emb_knn_pq", "emb_knn_ivfpq",
    "q45_bucketed_join", "evt_partition_pruned", "evt_zorder_box",
    "asset_reachability", "asset_closure", "graph_pagerank",
    // surfaced by WarmupSpec on its very first run: the memoized exact
    // KNN baseline (r6's knnExact memo) and the SQ8 stats/codes pair
    // had no warmup either — the third family the hand list missed
    "emb_knn_exact", "emb_knn_sq8",
    // r8: the containment digest-set, triangle oriented-edge, and
    // bloom file-index memos
    "dedup_containment", "graph_triangles", "evt_bloom_skip",
    // r9: the retrieval family's stored inverted index (postings +
    // doc-length sidecar), the binary-quantization sign codes, and
    // the MMR candidate/pair tables
    "txt_bm25", "emb_knn_bq", "mmr_rerank")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "svc_summaries"   -> OracleAssets.svcSummaries,
    "svc_latest"      -> OracleAssets.svcLatest,
    "svc_collapse"    -> OracleAssets.svcCollapse,
    "container_graph" -> OracleAssets.containerGraph,
    "pods_collapse"   -> OracleAssets.podsCollapse,
    "node_graph"      -> OracleAssets.nodeGraph,
    "pods_multi_source" -> OracleAssets.podsMultiSource,
    "svc_multivalued"   -> OracleAssets.svcMultivalued,
    "host_multivalued"  -> OracleAssets.hostMultivalued,
    "sig_host_family"   -> OracleAssets.hostFamily,
    "assets_all"        -> OracleAssets.assetsAll,
    "asset_upsert"      -> OracleAssets.assetUpsert,
    "asset_upsert_merge" -> OracleAssets.assetUpsertMerge,
    "q1_pricing_summary" -> OracleRelational.q1,
    "q2_filter_project"  -> OracleRelational.q2,
    "q3_join_agg"        -> OracleRelational.q3,
    "q4_semi_join"       -> OracleRelational.q4,
    "q5_anti_join"       -> OracleRelational.q5,
    "q6_broadcast_join"  -> OracleRelational.q6,
    "q7_outer_join"      -> OracleRelational.q7,
    "q8_window_topn"     -> OracleRelational.q8,
    "q9_window_running"  -> OracleRelational.q9,
    "q10_distinct"       -> OracleRelational.q10,
    "q11_except"         -> OracleRelational.q11,
    "q12_intersect"      -> OracleRelational.q12,
    "q13_rollup"         -> OracleRelational.q13,
    "q14_cube"           -> OracleRelational.q14,
    "q15_topk"           -> OracleRelational.q15,
    "q16_having"         -> OracleRelational.q16,
    "q17_case_when"      -> OracleRelational.q17,
    "q18_string_funcs"   -> OracleRelational.q18,
    "q19_date_funcs"     -> OracleRelational.q19,
    "q20_scalar_subquery" -> OracleRelational.q20,
    "q21_count_distinct" -> OracleRelational.q21,
    // q22_approx_distinct: HLL sketch — not oracle-expressible; rows-only.
    // q35_approx_quantile: GK sketch — not oracle-expressible; rows-only.
    "q23_star_join"      -> OracleRelational.q23,
    "q24_json"           -> OracleRelational.q24,
    "q25_array_funcs"    -> OracleRelational.q25,
    "q26_full_outer"     -> OracleRelational.q26,
    "q27_union"          -> OracleRelational.q27,
    "q28_asof_join"      -> OracleRelational.q28,
    "q29_range_join"     -> OracleRelational.q29,
    "q30_sessionize"     -> OracleRelational.q30,
    "q31_histogram"      -> OracleRelational.q31,
    "q32_percentile"     -> OracleRelational.q32,
    "txt_tokens"          -> OracleText.tokens,
    "txt_tokens_bpe"      -> OracleText.tokensBpe,
    "txt_quality"         -> OracleText.quality,
    "txt_langid"          -> OracleText.langid,
    "txt_fingerprint"     -> OracleText.fingerprint,
    "txt_simhash"         -> OracleText.simhash,
    // same oracle as txt_simhash — the native aggregate's differential proof
    "txt_simhash_native"  -> OracleText.simhash,
    "dedup_exact"         -> OracleText.dedupExact,
    "dedup_minhash"       -> OracleText.minhash,
    "dedup_minhash_lsh"   -> OracleText.dedupMinhashLsh,
    "dedup_ngram_jaccard" -> OracleText.dedupNgramJaccard,
    "dedup_simhash"       -> OracleText.dedupSimhash,
    "txt_tfidf"           -> OracleText.tfidf,
    "txt_normalize"       -> OracleText.normalize,
    "txt_split"           -> OracleText.split,
    "dedup_fuzzy_edit"    -> OracleText.dedupFuzzyEdit,
    "dedup_clusters"      -> OracleText.dedupClusters,
    "txt_pack"            -> OracleText.pack,
    "txt_decontaminate"   -> OracleText.decontaminate,
    // bloom pre-filter + exact verify ≡ exact — same oracle (differential)
    "txt_decontaminate_bloom" -> OracleText.decontaminate,
    "txt_sample_stratified" -> OracleText.sampleStratified,
    "txt_repetition"      -> OracleText.repetition,
    // same oracle as dedup_clusters — the fixpoint loop's differential proof
    "dedup_clusters_fixpoint" -> OracleText.dedupClusters,
    // same oracle again: star contraction is a DIFFERENT algorithm with
    // the same fixed point (component minimum) — differential proof #2
    "dedup_clusters_star" -> OracleText.dedupClusters,
    "fuzzy_join"          -> OracleText.fuzzyJoin,
    "dedup_segments"      -> OracleText.dedupSegments,
    "txt_shard"           -> OracleText.shard,
    "txt_ngram_stats"     -> OracleText.ngramStats,
    "txt_scrub"           -> OracleText.scrub,
    "txt_mix_weights"     -> OracleText.mixWeights,
    "txt_chunks"          -> OracleText.chunks,
    "dedup_containment"   -> OracleText.dedupContainment,
    "txt_surprisal"       -> OracleText.surprisal,
    "txt_chunk_dedup"     -> OracleText.chunkDedup,
    "q33_pivot"           -> OracleRelational.q33,
    "q34_salted_wordcount" -> OracleRelational.q34,
    "q36_rolling_window"  -> OracleRelational.q36,
    "q37_lead_lag"        -> OracleRelational.q37,
    "q38_funnel"          -> OracleRelational.q38,
    "q39_retention"       -> OracleRelational.q39,
    "q40_grouping_sets"   -> OracleRelational.q40,
    "q41_exists_subquery" -> OracleRelational.q41,
    "q42_rank_family"     -> OracleRelational.q42,
    "q43_lateral_topn"    -> OracleRelational.q43,
    "q44_heavy_hitters"   -> OracleRelational.q44,
    "q49_weighted_sample" -> OracleRelational.q49,
    "q50_sample_quantiles" -> OracleRelational.q50,
    "evt_transitions"     -> OracleRelational.evtTransitions,
    "evt_anomaly"         -> OracleRelational.evtAnomaly,
    "evt_paths"           -> OracleRelational.evtPaths,
    "evt_date_histogram"  -> OracleRelational.evtDateHistogram,
    "q51_percentile_ranks" -> OracleRelational.q51,
    "q52_pagination"      -> OracleRelational.q52,
    "q53_keyset_page"     -> OracleRelational.q53,
    "evt_rolling_distinct" -> OracleRelational.evtRollingDistinct,
    "evt_rolling_distinct_hll" -> OracleRelational.evtRollingDistinctHll,
    "emb_knn_filtered"    -> OracleVectors.knnFiltered,
    "emb_knn_ivf_filtered" -> OracleVectors.knnIvf(filtered = true),
    "emb_knn_label_part"  -> OracleVectors.knnLabelPartitioned(),
    "q46_cms_counts"      -> OracleRelational.q46,
    "q47_hll_distinct"    -> OracleRelational.q47,
    "q48_kmv_distinct"    -> OracleRelational.q48,
    "q45_bucketed_join"   -> OracleRelational.q45,
    "evt_partition_pruned" -> OracleRelational.evtPruned,
    "evt_zorder_box"      -> OracleRelational.evtZorderBox,
    "evt_bloom_skip"      -> OracleRelational.evtBloomSkip,
    "graph_degree"        -> OracleGraph.degreeCentrality,
    "graph_pagerank"      -> OracleGraph.pagerank,
    "graph_triangles"     -> OracleGraph.triangles,
    "asset_reachability"  -> OracleGraph.assetReachability,
    "asset_closure"       -> OracleGraph.assetClosure,
    "asset_closure_incr"  -> OracleGraph.assetClosure,
    "emb_knn_exact"  -> OracleVectors.knnExact,
    "emb_knn_native" -> OracleVectors.knnExact,
    "emb_knn_topk"   -> OracleVectors.knnExact,
    "emb_knn_lsh"    -> OracleVectors.knnLsh(),
    "emb_centroids"  -> OracleVectors.centroids(),
    "emb_ivf_assign" -> OracleVectors.ivfAssign(),
    "emb_knn_ivf"    -> OracleVectors.knnIvf(),
    "emb_lsh_recall" -> OracleVectors.lshRecall(),
    "emb_lsh_mp_recall" -> OracleVectors.lshRecall(probeBits = 1),
    "emb_knn_sq8"    -> OracleVectors.knnSq8,
    "emb_sq8_recall" -> OracleVectors.sq8Recall,
    "emb_knn_bq"     -> OracleVectors.knnBq,
    "emb_bq_recall"  -> OracleVectors.bqRecall,
    "emb_knn_pq"     -> OracleVectors.knnPq,
    "emb_pq_recall"  -> OracleVectors.pqRecall,
    "emb_knn_mrl"    -> OracleVectors.knnMrl,
    "emb_mrl_recall" -> OracleVectors.mrlRecall,
    "emb_knn_ivfpq"  -> OracleVectors.knnIvfPq(),
    "emb_ivfpq_recall" -> OracleVectors.ivfPqRecall(),
    "emb_ivfpq_mp_recall" -> OracleVectors.ivfPqRecall(nprobe = 4),
    "emb_pq_mse"     -> OracleVectors.pqMse(),
    "emb_ivf_recall" -> OracleVectors.ivfRecall(),
    "emb_ivf_mp_recall" -> OracleVectors.ivfRecall(nprobe = 4),
    "emb_dedup_clusters" -> OracleVectors.dedupEmbeddingClusters(),
    "emb_semdedup"   -> OracleVectors.semDedup(),
    "emb_cluster_sample" -> OracleVectors.clusterSample(),
    "dedup_embedding" -> OracleVectors.dedupEmbedding(),
    "emb_decontaminate" -> OracleVectors.embDecontaminate(),
    "corpus_curation" -> OracleText.corpusCuration,
    "txt_source_overlap" -> OracleText.sourceOverlap,
    "txt_novelty"    -> OracleText.novelty,
    "txt_bm25"       -> OracleText.bm25,
    "txt_sig_terms"  -> OracleText.sigTerms,
    "hybrid_rrf"     -> OracleRetrieval.hybridRrf,
    "cluster_cards"  -> OracleRetrieval.clusterCards,
    "mmr_rerank"     -> OracleRetrieval.mmrRerank,
    "media_metadata" -> OracleMultimodal.metadata,
    "media_frames"   -> OracleMultimodal.frames,
    "media_features" -> OracleMultimodal.features,
    "media_resize"   -> OracleMultimodal.resize,
    "media_dedup_exact" -> OracleMultimodal.dedupExact,
    "media_dedup_near"  -> OracleMultimodal.dedupNear,
    "media_decode"   -> OracleMultimodal.decode,
  )
}
