package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-runnable ANSI-SQL twin in
  * `oracleSql` (same column names, same canonical ORDER BY) unless the
  * operator is not SQL-expressible. Determinism rules: every query ends in
  * an `orderBy` of a unique key; money sums go through DECIMAL(18,2) (see
  * `ReferenceOps.moneySum`); session timezone is UTC.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceOps.salesTotals(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — Part A: the reference's own operator surface —
    "sales_totals"         -> (ReferenceOps.salesTotals(_, _)),
    "record_projection"    -> (ReferenceOps.recordProjection(_, _)),
    "malformed_filter"     -> (ReferenceOps.malformedFilter(_, _)),
    "event_dispatch"       -> (ReferenceOps.eventDispatch(_, _)),
    "custom_partition"     -> (ReferenceOps.customPartition(_, _)),
    "offset_commit"        -> (ReferenceOps.offsetCommit(_, _)),
    "json_roundtrip"       -> (ReferenceOps.jsonRoundtrip(_, _)),
    "json_field_agg"       -> (ReferenceOps.jsonFieldAgg(_, _)),
    "wire_format"          -> (ReferenceOps.wireFormatRoundtrip(_, _)),
    "filter_pushdown_scan" -> (ReferenceOps.filterPushdownScan(_, _)),
    "avro_roundtrip"       -> (ReferenceOps.avroRoundtrip(_, _)),
    "avro_evolution"       -> (ReferenceOps.avroEvolution(_, _)),
    "registry_evolution"   -> (ReferenceOps.registryEvolution(_, _)),
    "proto_roundtrip"      -> (ReferenceOps.protoRoundtrip(_, _)),
    // — Part B: relational closure —
    "equi_join"            -> (Relational.equiJoin(_, _)),
    "multi_join_agg"       -> (Relational.multiJoinAgg(_, _)),
    "pricing_summary"      -> (Relational.pricingSummary(_, _)),
    "revenue_forecast"     -> (Relational.revenueForecast(_, _)),
    "brand_promo"          -> (Relational.brandPromo(_, _)),
    "shipping_priority"    -> (Relational.shippingPriority(_, _)),
    "promo_revenue"        -> (Relational.promoRevenue(_, _)),
    "top_spenders"         -> (Relational.topSpenders(_, _)),
    "min_cost_supplier"    -> (Relational.minCostSupplier(_, _)),
    "cust_order_dist"      -> (Relational.custOrderDist(_, _)),
    "idle_customers"       -> (Relational.idleCustomers(_, _)),
    "top_supplier"         -> (Relational.topSupplier(_, _)),
    "status_transitions"   -> (Relational.statusTransitions(_, _)),
    "rolling_wau"          -> (Relational.rollingWau(_, _)),
    "ks_drift"             -> (Relational.ksDrift(_, _)),
    "basket_pairs"         -> (Relational.basketPairs(_, _)),
    "returned_items"       -> (Relational.returnedItems(_, _)),
    "nation_trade"         -> (Relational.nationTrade(_, _)),
    "market_share"         -> (Relational.marketShare(_, _)),
    "product_profit"       -> (Relational.productProfit(_, _)),
    "late_orders"          -> (Relational.lateOrders(_, _)),
    "late_arrivals"        -> (Relational.lateArrivals(_, _)),
    "freshness_sla"        -> (Relational.freshnessSla(_, _)),
    "user_streaks"         -> (Relational.userStreaks(_, _)),
    "funnel_steps"         -> (Relational.funnelSteps(_, _)),
    "daily_revenue_ma7"    -> (Relational.dailyRevenueMa7(_, _)),
    "revenue_bridge"       -> (Relational.revenueBridge(_, _)),
    "pareto_share"         -> (Relational.paretoShare(_, _)),
    "dup_orders"           -> (Relational.dupOrders(_, _)),
    "rfm_segments"         -> (Relational.rfmSegments(_, _)),
    "ab_test"              -> (Relational.abTest(_, _)),
    "benford_check"        -> (Relational.benfordCheck(_, _)),
    "seasonality_dow"      -> (Relational.seasonalityDow(_, _)),
    "new_vs_returning"     -> (Relational.newVsReturning(_, _)),
    "chi2_drift"           -> (Relational.chi2Drift(_, _)),
    "gini_revenue"         -> (Relational.giniRevenue(_, _)),
    "small_qty_revenue"    -> (Relational.smallQtyRevenue(_, _)),
    "big_orders"           -> (Relational.bigOrders(_, _)),
    "waiting_suppliers"    -> (Relational.waitingSuppliers(_, _)),
    "range_bounds"         -> (Scale.rangeBounds(_, _)),
    "exact_median"         -> (Relational.exactMedian(_, _)),
    "idle_rich_customers"  -> (Relational.idleRichCustomers(_, _)),
    "skyline_2d"           -> (Scale.skyline2d(_, _)),
    "local_volume"         -> (Relational.localVolume(_, _)),
    "linear_attribution"   -> (Relational.linearAttribution(_, _)),
    "rendezvous_shards"    -> (Scale.rendezvousShards(_, _)),
    "semi_anti_join"       -> (Relational.semiAntiJoin(_, _)),
    "full_outer_join"      -> (Relational.fullOuterJoin(_, _)),
    "asof_join"            -> (Relational.asofJoin(_, _)),
    "asof_join_left"       -> (Relational.asofJoinLeft(_, _)),
    "asof_join_tolerance"  -> (Relational.asofJoinTolerance(_, _, 3600000000L)),
    "asof_join_forward"    -> (Relational.asofJoinForward(_, _)),
    "lead_time"            -> (Relational.leadTime(_, _)),
    "funnel_conversion"    -> (Relational.funnelConversion(_, _)),
    "windowed_agg"         -> (Relational.windowedAgg(_, _)),
    "sliding_window"       -> (Relational.slidingWindow(_, _)),
    "session_window"       -> (Relational.sessionWindow(_, _)),
    "dynamic_sessions"     -> (Relational.dynamicSessionize(_, _)),
    "ranking_window"       -> (Relational.rankingWindow(_, _)),
    "grouped_topk"         -> (Relational.groupedTopk(_, _)),
    "rank_family"          -> (Relational.rankFamily(_, _)),
    "running_total"        -> (Relational.runningTotal(_, _)),
    "lag_lead_gaps"        -> (Relational.lagLeadGaps(_, _)),
    "inter_event_gaps"     -> (Relational.interEventGaps(_, _)),
    "grouping_sets_report" -> (Relational.groupingSetsReport(_, _)),
    "ktable_latest"        -> (Relational.ktableLatest(_, _)),
    "user_journey"         -> (Relational.userJourney(_, _)),
    "winsorized_stats"     -> (Relational.winsorizedStats(_, _)),
    "trailing_1h"          -> (Relational.trailingWindow(_, _)),
    "unpivot_metrics"      -> (Relational.unpivotMetrics(_, _)),
    "merge_upsert"         -> (Relational.mergeUpsert(_, _)),
    "snapshot_diff"        -> (Relational.snapshotDiff(_, _)),
    "retention_cohorts"    -> (Relational.retentionCohorts(_, _)),
    "order_reconcile"      -> (Relational.orderReconcile(_, _)),
    "correlated_subquery"  -> (Relational.correlatedSubquery(_, _)),
    "time_gapfill"         -> (Relational.timeGapfill(_, _)),
    "corr_report"          -> (Relational.corrReport(_, _)),
    "corr_matrix"          -> (Relational.corrMatrix(_, _)),
    "attribution_report"   -> (Relational.attributionReport(_, _)),
    "vector_normalize"     -> (Similarity.vectorNormalize(_, _)),
    "topk_sort"            -> (Relational.topkSort(_, _)),
    "set_ops"              -> (Relational.setOps(_, _)),
    "set_ops_all"          -> (Relational.setOpsAll(_, _)),
    "revenue_share"        -> (Relational.revenueShare(_, _)),
    "distinct_users"       -> (Relational.distinctUsers(_, _)),
    "distinct_users_approx" -> (Relational.distinctUsersApprox(_, _)),
    "rollup_report"        -> (Relational.rollupReport(_, _)),
    "cube_report"          -> (Relational.cubeReport(_, _)),
    "pivot_report"         -> (Relational.pivotReport(_, _)),
    "vocab_topk"           -> (Relational.vocabTopk(_, _)),
    "quantile_report"      -> (Relational.quantileReport(_, _)),
    "loglin_quantiles"     -> (Relational.loglinQuantiles(_, _)),
    "scd2_build"           -> (Relational.scd2Build(_, _)),
    "scd2_slice"           -> (Relational.scd2Slice(_, _)),
    "anomaly_zscore"       -> (Relational.anomalyZscore(_, _, 3.0)),
    "burst_detection"      -> (Relational.burstDetection(_, _)),
    "data_profile"         -> (Relational.dataProfile(_, _)),
    "dedup"                -> (Relational.dedup(_, _)),
    "salted_join"          -> (Scale.saltedJoinQuery(_, _)),
    "range_join"           -> (Scale.bucketedRangeJoin(_, _)),
    "bloom_prune_join"     -> (Scale.bloomPruneJoin(_, _)),
    "zorder_key"           -> (Scale.zorderKey(_, _)),
    "hilbert_key"          -> (Scale.hilbertKey(_, _)),
    "partition_advisor"    -> (Scale.partitionAdvisor(_, _)),
    "join_size_estimate"   -> (Scale.joinSizeEstimate(_, _)),
    "compaction_plan"      -> (Scale.compactionPlan(_, _, 4096L)),
    // the pre-salting diagnostic (full-scan form; saltedJoinQuery samples):
    // top-16 hottest join keys + their row share, exchange-reuse single scan
    "skew_profile"         -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, desc}
      Scale.skewProfile(graft.Tables.events(s, dir).select(col("user_id")),
          "user_id", 16)
        .orderBy(desc("n"), col("user_id"))
    }),
    "kmv_distinct"         -> (Relational.kmvDistinct(_, _)),
    // — LLM-data-pipeline operators —
    "text_analysis"        -> (TextAnalysis.textAnalysis(_, _)),
    "token_count"          -> (TextAnalysis.tokenCount(_, _)),
    "quality_score"        -> (TextAnalysis.qualityScore(_, _)),
    "lang_id"              -> (TextAnalysis.langId(_, _)),
    "lang_id_eval"         -> (TextAnalysis.langIdEval(_, _)),
    "fingerprint"          -> (TextAnalysis.fingerprint(_, _)),
    "corpus_curation"      -> (TextAnalysis.corpusCuration(_, _)),
    "corpus_pipeline"      -> (CorpusOps.corpusPipeline(_, _)),
    "token_budget"         -> (CorpusOps.tokenBudget(_, _)),
    "k_anonymity"          -> (TextAnalysis.kAnonymity(_, _)),
    "text_normalize"       -> (TextAnalysis.textNormalize(_, _)),
    "hash_split"           -> (TextAnalysis.hashSplit(_, _)),
    "repetition_score"     -> (TextAnalysis.repetitionScore(_, _)),
    "winnow_spans"         -> (TextAnalysis.winnowSpans(_, _)),
    "winnow_dedup_pairs"   -> (TextAnalysis.winnowDedupPairs(_, _)),
    "cdc_chunks"           -> (TextAnalysis.cdcChunks(_, _)),
    "lang_drift"           -> (CorpusOps.langDrift(_, _)),
    "token_spectrum"       -> (TextAnalysis.tokenSpectrum(_, _)),
    "token_fertility"      -> (TextAnalysis.tokenFertility(_, _)),
    "ngram_novelty"        -> (CorpusOps.ngramNovelty(_, _)),
    "embedding_gram"       -> (Similarity.embeddingGram(_, _)),
    "cms_vocab"            -> (TextAnalysis.cmsVocab(_, _)),
    "cms_calibration"      -> (TextAnalysis.cmsCalibration(_, _, 32)),
    "quality_ensemble"     -> (TextAnalysis.qualityEnsemble(_, _)),
    "domain_cap"           -> (TextAnalysis.domainCap(_, _, 25)),
    "tfidf_topk"           -> (CorpusOps.tfidfTopk(_, _, 3)),
    "decontaminate"        -> (CorpusOps.decontaminate(_, _, 5)),
    "decontaminate_pairs"  -> (CorpusOps.decontaminatePairs(_, _, 3)),
    "pii_scrub"            -> (CorpusOps.piiScrub(_, _)),
    "sequence_pack"        -> (CorpusOps.sequencePack(_, _, 512)),
    "inverted_index"       -> (CorpusOps.invertedIndex(_, _, 20)),
    "lm_score"             -> (CorpusOps.lmScore(_, _)),
    "dsir_weights"         -> (CorpusOps.dsirWeights(_, _)),
    "cooccur_pmi"          -> (CorpusOps.cooccurPmi(_, _, 5L, 20)),
    "source_mix"           -> (CorpusOps.sourceMix(_, _)),
    "mixture_resample"     -> (CorpusOps.mixtureResample(_, _)),
    "length_quartiles"     -> (CorpusOps.lengthQuartiles(_, _)),
    "chunk_overlap"        -> (CorpusOps.chunkOverlap(_, _, 32, 24)),
    "bm25_topk"            -> (CorpusOps.bm25Topk(_, _, 10)),
    "rrf_fusion"           -> (CorpusOps.rrfFusion(_, _, 20)),
    "bpe_merges"           -> (CorpusOps.bpeMerges(_, _, 20)),
    "bpe_apply"            -> (CorpusOps.bpeApply(_, _, 20)),
    "decayed_counts"       -> (Relational.decayedCounts(_, _)),
    "vocab_coverage"       -> (CorpusOps.vocabCoverage(_, _, 256)),
    "stratified_sample"    -> (CorpusOps.stratifiedSample(_, _)),
    "doc_dedup_exact"      -> (DocDedup.docDedupExact(_, _)),
    "minhash_signatures"   -> (DocDedup.minhashSignatures(_, _)),
    "minhash_dedup_pairs"  -> (DocDedup.minhashDedupPairs(_, _)),
    "minhash_incremental"  -> (DocDedup.minhashIncremental(_, _)),
    "minhash_calibration"  -> (DocDedup.minhashCalibration(_, _)),
    "split_leakage"        -> (DocDedup.splitLeakage(_, _)),
    "cluster_split"        -> (DocDedup.clusterSplit(_, _)),
    "simhash_docs"         -> (DocDedup.simhashDocs(_, _)),
    "simhash_neardup_pairs" -> (DocDedup.simhashNearDupPairs(_, _)),
    "pair_budget_governor" -> (DocDedup.pairBudgetGovernor(_, _)),
    "governor_recall"      -> (DocDedup.governorRecall(_, _)),
    "governor_recall_floor" -> (DocDedup.governorRecallFloor(_, _)),
    "ngram_jaccard"        -> (DocDedup.ngramJaccardProbe(_, _)),
    "fuzzy_join"           -> (DocDedup.fuzzyJoinPairs(_, _)),
    "dedup_clusters"       -> (DocDedup.dedupClusters(_, _)),
    "dedup_clusters_incremental" -> (DocDedup.dedupClustersIncremental(_, _)),
    "cluster_stats"        -> (DocDedup.clusterStats(_, _)),
    "dedup_survivorship"   -> (DocDedup.dedupSurvivorship(_, _)),
    "dedup_ensemble"       -> (DocDedup.dedupEnsemble(_, _)),
    "dup_spans"            -> (DocDedup.dupSpans(_, _, 16)),
    "dedup_rewrite"        -> (DocDedup.dedupRewrite(_, _, 16)),
    "source_overlap"       -> (DocDedup.sourceOverlap(_, _)),
    "similarity_search"    -> (Similarity.similaritySearch(_, _)),
    "contrastive_negatives" -> (Similarity.contrastiveNegatives(_, _)),
    "ann_lsh_buckets"      -> (Similarity.annLshBuckets(_, _)),
    "ann_lsh_search"       -> (Similarity.annLshSearch(_, _)),
    "ann_multiprobe"       -> (Similarity.annMultiprobe(_, _)),
    "ann_ivf_cells"        -> (Similarity.annIvfCells(_, _)),
    "ann_ivf_search"       -> (Similarity.annIvfSearch(_, _)),
    "ann_recall_eval"      -> (Similarity.annRecallEval(_, _)),
    "quantize_recall_eval" -> (Similarity.quantizeRecallEval(_, _)),
    "ann_ndcg"             -> (Similarity.annNdcg(_, _)),
    "embedding_quantize"   -> (Similarity.embeddingQuantize(_, _)),
    "pq_codes"             -> (Similarity.pqCodes(_, _)),
    "pq_search"            -> (Similarity.pqSearch(_, _)),
    "pq_recall_eval"       -> (Similarity.pqRecallEval(_, _)),
    "ivfpq_search"         -> (Similarity.ivfpqSearch(_, _)),
    "cluster_purity"       -> (Similarity.clusterPurity(_, _)),
    "embedding_centroids"  -> (Similarity.embeddingCentroids(_, _)),
    "embedding_pca"        -> (Similarity.embeddingPca(_, _)),
    "embedding_neardup"    -> (Similarity.embeddingNearDupPairs(_, _)),
    "semantic_cell_profile" -> (Similarity.semanticCellProfile(_, _)),
    "semantic_dedup"       -> (Similarity.semanticDedup(_, _, 0.40)),
    "pair_graph_pagerank"  -> (GraphOps.pairGraphPagerank(_, _)),
    "graph_triangles"      -> (GraphOps.graphTriangles(_, _)),
    "graph_degree_hist"    -> (GraphOps.graphDegreeHist(_, _)),
    "reservoir_sample"     -> (CorpusOps.reservoirSample(_, _)),
    "weighted_sample"      -> (CorpusOps.weightedSample(_, _)),
    "zipf_slope"           -> (CorpusOps.zipfSlope(_, _)),
    "mixture_temperature"  -> (CorpusOps.mixtureTemperature(_, _)),
    "curriculum_order"     -> (CorpusOps.curriculumOrder(_, _)),
    "ann_nprobe_frontier"  -> (Similarity.annNprobeFrontier(_, _)),
    "kcore_membership"     -> (GraphOps.kcoreMembership(_, _)),
    "corpus_pipeline_incremental" -> (CorpusOps.corpusPipelineIncremental(_, _)),
    "dedup_threshold_sweep" -> (DocDedup.dedupThresholdSweep(_, _)),
    "lsh_scurve"           -> (DocDedup.lshScurve(_, _)),
    "graph_modularity"     -> (GraphOps.graphModularity(_, _)),
    "watermark_advisor"    -> (Relational.watermarkAdvisor(_, _)),
    "perplexity_buckets"   -> (CorpusOps.perplexityBuckets(_, _)),
    "cusum_changepoint"    -> (Relational.cusumChangepoint(_, _)),
    "label_propagation"    -> (GraphOps.labelPropagation(_, _, 2)),
    "entropy_score"        -> (TextAnalysis.entropyScore(_, _)),
    "mad_outliers"         -> (Relational.madOutliers(_, _)),
    "multimodal_cols"      -> (Multimodal.multimodalCols(_, _)),
    "media_text_pairs"     -> (Multimodal.mediaTextPairs(_, _)),
    "media_shard_pack"     -> (Multimodal.mediaShardPack(_, _, 4096L)),
    "media_decode"         -> (Multimodal.mediaDecode(_, _)),
    "media_frame_sample"   -> (Multimodal.mediaFrameSample(_, _)),
    "media_dedup"          -> (Multimodal.mediaDedup(_, _)),
    "media_neardup_pairs"  -> (Multimodal.mediaNeardupPairs(_, _)),
    "kmv_set_ops"          -> (Relational.kmvSetOps(_, _)),
    "autocorr_daily"       -> (Relational.autocorrDaily(_, _)),
    "markov_transitions"   -> (Relational.markovTransitions(_, _)),
    "gopher_rules"         -> (TextAnalysis.gopherRules(_, _)),
    "graph_bfs_distance"   -> (GraphOps.bfsDistance(_, _)),
    "format_roundtrip"     -> (ReferenceOps.formatRoundtrip(_, _)),
    "bracket_revenue"      -> (Relational.bracketRevenue(_, _)),
    "cohort_ltv"           -> (Relational.cohortLtv(_, _)),
    "csv_malformed_audit"  -> (ReferenceOps.csvMalformedAudit(_, _)),
  )

  /** DuckDB oracle twins (driver runs these on the same parquet dirs).
    * LLM-operator oracles (incl. generated simhash/LSH SQL) live in
    * [[Oracles.llm]]. Every registered query has a twin — including
    * `distinct_users_approx`, whose HLL++ accuracy band is emitted AS
    * DATA (within-10% booleans next to exact counts) so the twin is pure
    * SQL with literal `true`s. */
  def oracleSql: Map[String, String] = Oracles.llm ++ Map(
    "sales_totals" ->
      """SELECT user_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_purchases
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "record_projection" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_returnflag || '|' || l_linestatus AS record_key,
        |       l_extendedprice * (1.0 - l_discount) AS net_revenue,
        |       l_quantity * l_extendedprice AS gross
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "malformed_filter" ->
      """SELECT event_id, props FROM events
        |WHERE length(props) >= 5 AND substr(props, 1, 1) = '{'
        |ORDER BY event_id""".stripMargin,
    "event_dispatch" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "custom_partition" ->
      """WITH RECURSIVE k AS (
        |  SELECT event_id, CAST(user_id AS VARCHAR) AS key FROM events
        |), f AS (
        |  SELECT event_id, key, 1 AS pos, CAST(2166136261 AS BIGINT) AS h FROM k
        |  UNION ALL
        |  SELECT event_id, key, pos + 1,
        |         (xor(h, ord(substr(key, pos, 1))) * 16777619) % 4294967296
        |  FROM f WHERE pos <= length(key)
        |)
        |SELECT event_id, key,
        |       CASE WHEN key = 'CUSTOM' THEN 0 ELSE h % 8 END AS part_id
        |FROM f WHERE pos = length(key) + 1
        |ORDER BY event_id""".stripMargin,
    "offset_commit" ->
      """SELECT user_id, max(event_id) + 1 AS commit_offset
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "json_roundtrip" ->
      """SELECT event_id,
        |       CAST(props->>'$.k' AS INTEGER) AS k,
        |       '{"k":' || (props->>'$.k') || '}' AS reencoded
        |FROM events ORDER BY event_id""".stripMargin,
    "wire_format" ->
      """SELECT event_id,
        |       CAST(user_id % 1000 AS INTEGER) AS schema_id,
        |       printf('00%08X', user_id % 1000) AS header_hex,
        |       CAST(user_id % 1000 AS INTEGER) AS decoded_id,
        |       TRUE AS payload_ok,
        |       CAST(length(props) AS INTEGER) AS payload_len
        |FROM events ORDER BY event_id""".stripMargin,
    "filter_pushdown_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-06-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "avro_roundtrip" ->
      """SELECT event_id, event_type AS name, CAST(user_id AS VARCHAR) AS real_name,
        |       props AS movie0,
        |       CAST(1 + length(event_type) + 1 + length(CAST(user_id AS VARCHAR))
        |            + 1 + 1 + length(props) + 1 AS INTEGER) AS frame_len
        |FROM events ORDER BY event_id""".stripMargin,
    "avro_evolution" ->
      """SELECT event_id,
        |       CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS INTEGER)
        |         AS writer_version,
        |       event_type AS name,
        |       CAST(user_id AS VARCHAR) AS real_name,
        |       CASE WHEN event_id % 2 = 0 THEN '' ELSE props END AS movies_csv,
        |       CAST(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS INTEGER)
        |         AS n_movies,
        |       CAST(1 + length(event_type) + 1 + length(CAST(user_id AS VARCHAR))
        |            + CASE WHEN event_id % 2 = 0 THEN 0
        |                   ELSE 1 + 1 + length(props) + 1 + 1 + 9 END
        |            AS INTEGER) AS frame_len
        |FROM events ORDER BY event_id""".stripMargin,
    "registry_evolution" ->
      """SELECT event_id,
        |       CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS INTEGER)
        |         AS schema_id,
        |       event_type AS name,
        |       CAST(user_id AS VARCHAR) AS real_name,
        |       CASE WHEN event_id % 2 = 0 THEN '' ELSE props END AS movies_csv,
        |       CAST(5 + 1 + length(event_type) + 1 + length(CAST(user_id AS VARCHAR))
        |            + CASE WHEN event_id % 2 = 0 THEN 0
        |                   ELSE 1 + 1 + length(props) + 1 END
        |            AS INTEGER) AS frame_len
        |FROM events ORDER BY event_id""".stripMargin,
    "proto_roundtrip" ->
      """SELECT event_id, event_type AS name, CAST(user_id AS VARCHAR) AS real_name,
        |       props AS movie0,
        |       CAST(2 + length(event_type) + 2 + length(CAST(user_id AS VARCHAR))
        |            + 2 + length(props) AS INTEGER) AS frame_len
        |FROM events ORDER BY event_id""".stripMargin,
    "equi_join" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "multi_join_agg" ->
      """SELECT n_name, r_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue,
        |       count(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name ORDER BY n_name""".stripMargin,
    "pricing_summary" ->
      """WITH l AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
        |         CAST(l_discount AS DECIMAL(18,2)) AS disc,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |              AS DECIMAL(18,4)) AS disc_price,
        |         CAST(l_tax AS DECIMAL(18,2)) AS tax
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01')
        |SELECT l_returnflag, l_linestatus,
        |       CAST(sum(qty) AS DOUBLE) AS sum_qty,
        |       CAST(sum(price) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(disc_price) AS DOUBLE) AS sum_disc_price,
        |       -- VARCHAR bridge (the corr_report discipline): the charge
        |       -- sum is DECIMAL(38,6) and exceeds 2^53 scaled units at
        |       -- sf1+, where DuckDB's int128->double-then-divide cast
        |       -- double-rounds 1 ulp off Spark's correctly-rounded cast;
        |       -- string->double is correctly rounded in both engines
        |       CAST(CAST(sum(disc_price * (CAST(1 AS DECIMAL(18,2)) + tax))
        |                 AS VARCHAR) AS DOUBLE) AS sum_charge,
        |       CAST(sum(qty) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(sum(price) AS DOUBLE) / count(*) AS avg_price,
        |       CAST(sum(disc) AS DOUBLE) / count(*) AS avg_disc,
        |       count(*) AS count_order
        |FROM l GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "revenue_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |         AS forecast_revenue,
        |       count(*) AS n_lineitems
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "brand_promo" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue,
        |       count(*) AS n_lineitems,
        |       CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "shipping_priority" ->
      """SELECT l_orderkey, o_orderpriority,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue,
        |       CAST(max(o_orderdate) AS DATE) AS order_date
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate  > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "promo_revenue" ->
      """WITH j AS (
        |  SELECT p_type,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01')
        |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev END) AS DOUBLE)
        |         AS promo_revenue,
        |       CAST(sum(rev) AS DOUBLE) AS total_revenue,
        |       count(*) AS n_lineitems,
        |       CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev END) AS DOUBLE)
        |         / CAST(sum(rev) AS DOUBLE) AS promo_share
        |FROM j""".stripMargin,
    "top_spenders" ->
      """WITH s AS (
        |  SELECT o_custkey,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec,
        |         count(*) AS n_orders, max(o_totalprice) AS max_order
        |  FROM orders GROUP BY o_custkey
        |  HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) > 4000000)
        |SELECT o_custkey AS custkey, c_name, c_mktsegment, n_orders,
        |       CAST(spend_dec AS DOUBLE) AS total_spend, max_order
        |FROM s JOIN customer ON o_custkey = c_custkey
        |ORDER BY custkey""".stripMargin,
    "idle_customers" ->
      """WITH a AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |                  / count(*) AS avg_bal
        |           FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_balance
        |FROM customer, a
        |WHERE c_acctbal > a.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "cust_order_dist" ->
      """WITH pc AS (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |            GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "rolling_wau" ->
      """WITH du AS (SELECT DISTINCT epoch_ns(ts)//1000 // 86400000000 AS day,
        |                            user_id FROM events),
        |c AS (SELECT day + t.i AS anchor, user_id, day FROM du, range(7) t(i)),
        |a AS (SELECT DISTINCT day AS anchor FROM du)
        |SELECT c.anchor AS epoch_day,
        |       CAST(count(DISTINCT CASE WHEN c.day = c.anchor THEN user_id END)
        |            AS BIGINT) AS dau,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS wau,
        |       CAST(count(DISTINCT CASE WHEN c.day = c.anchor THEN user_id END)
        |            AS DOUBLE) / count(DISTINCT user_id) AS stickiness
        |FROM c JOIN a ON c.anchor = a.anchor
        |GROUP BY c.anchor ORDER BY epoch_day""".stripMargin,
    "ks_drift" ->
      """WITH ev AS (SELECT event_type, value FROM events
        |            WHERE event_type IN ('purchase', 'view')),
        |pv AS (SELECT value,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS cb
        |       FROM ev GROUP BY value),
        |t AS (SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |             AS BIGINT) AS na,
        |             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |             AS BIGINT) AS nb FROM ev),
        |c AS (SELECT value,
        |        CAST(sum(ca) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |             AS BIGINT) AS cuma,
        |        CAST(sum(cb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |             AS BIGINT) AS cumb
        |      FROM pv),
        |d AS (SELECT value,
        |        CAST(floor(abs(CAST(cuma AS DOUBLE) / na
        |                       - CAST(cumb AS DOUBLE) / nb)
        |                   * 1048576.0 + 0.5) AS BIGINT) AS d_u20,
        |        na, nb
        |      FROM c CROSS JOIN t)
        |SELECT na AS n_a, nb AS n_b, d_u20 AS ks_d_u20, value AS argmax_value
        |FROM (SELECT *, row_number() OVER (ORDER BY d_u20 DESC, value) AS rn
        |      FROM d)
        |WHERE rn = 1""".stripMargin,
    "status_transitions" ->
      """WITH e AS (SELECT o_custkey, o_orderstatus,
        |             lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey) AS from_status
        |           FROM orders),
        |c AS (SELECT from_status, o_orderstatus AS to_status,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM e WHERE from_status IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_status, CAST(sum(n) AS BIGINT) AS from_n
        |      FROM c GROUP BY 1)
        |SELECT c.from_status, c.to_status, c.n,
        |       CAST(c.n AS DOUBLE) / f.from_n AS p
        |FROM c JOIN f USING (from_status)
        |ORDER BY from_status, to_status""".stripMargin,
    "basket_pairs" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |            FROM lineitem JOIN part ON l_partkey = p_partkey),
        |no AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM it),
        |bn AS (SELECT brand, CAST(count(*) AS BIGINT) AS bn FROM it GROUP BY brand),
        |pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
        |              CAST(count(*) AS BIGINT) AS pair_n
        |       FROM it a JOIN it b ON a.okey = b.okey AND a.brand < b.brand
        |       GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT brand_a, brand_b, pair_n, na.bn AS na, nb.bn AS nb,
        |       CAST(floor(CAST(pair_n AS DOUBLE) * no.n_orders / na.bn / nb.bn
        |                  * 1048576.0 + 0.5) AS BIGINT) AS lift_u20
        |FROM pr JOIN bn na ON pr.brand_a = na.brand
        |        JOIN bn nb ON pr.brand_b = nb.brand
        |        CROSS JOIN no
        |ORDER BY brand_a, brand_b""".stripMargin,
    "returned_items" ->
      """SELECT c_custkey AS custkey, c_name, n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, custkey LIMIT 20""".stripMargin,
    "nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, yr""".stripMargin,
    "market_share" ->
      """WITH asia AS (SELECT n_nationkey FROM nation
        |              JOIN region ON n_regionkey = r_regionkey
        |              WHERE r_name = 'ASIA'),
        |j AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev,
        |         s_nationkey IN (SELECT n_nationkey FROM asia) AS intra
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE c_nationkey IN (SELECT n_nationkey FROM asia))
        |SELECT yr,
        |       CAST(sum(CASE WHEN intra THEN rev
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |         AS intra_revenue,
        |       CAST(sum(rev) AS DOUBLE) AS total_revenue,
        |       CAST(count(*) AS BIGINT) AS n_lineitems,
        |       CAST(sum(CASE WHEN intra THEN rev
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |         / CAST(sum(rev) AS DOUBLE) AS intra_share
        |FROM j GROUP BY yr ORDER BY yr""".stripMargin,
    "product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS profit,
        |       CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, yr""".stripMargin,
    "late_orders" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND epoch_ns(l_shipdate)//1000 >
        |                    epoch_ns(o_orderdate)//1000 + 7776000000000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "late_arrivals" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |                  epoch_ns(ts)//1000 AS ts_us FROM events),
        |m AS (SELECT event_type, ts_us,
        |        max(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS prev_max_us
        |      FROM e),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |        CAST(sum(CASE WHEN prev_max_us IS NOT NULL
        |                       AND ts_us < prev_max_us THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_ooo
        |      FROM m GROUP BY event_type)
        |SELECT event_type, n_events, n_ooo,
        |       CAST(n_ooo * 1000 // n_events AS BIGINT) AS ooo_permille
        |FROM a ORDER BY event_type""".stripMargin,
    "freshness_sla" ->
      """WITH p AS (SELECT event_type,
        |             CAST(max(epoch_ns(ts)//1000) AS BIGINT) AS latest_us,
        |             CAST(count(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY event_type),
        |g AS (SELECT max(latest_us) AS global_us FROM p)
        |SELECT event_type, n_events, latest_us,
        |       CAST(g.global_us - latest_us AS BIGINT) AS lag_us,
        |       CASE WHEN g.global_us - latest_us > 86400000000
        |            THEN 1 ELSE 0 END AS stale_1d
        |FROM p, g ORDER BY event_type""".stripMargin,
    "user_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |                  epoch_ns(ts)//1000 // 86400000000 AS day FROM events),
        |r AS (SELECT user_id, day,
        |        day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |          AS grp
        |      FROM d),
        |i AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
        |             CAST(min(day) AS BIGINT) AS start_day
        |      FROM r GROUP BY 1, 2),
        |u AS (SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |             CAST(max(len) AS BIGINT) AS longest
        |      FROM i GROUP BY 1)
        |SELECT i.user_id AS user_id, n_active_days, longest AS longest_streak,
        |       CAST(min(start_day) AS BIGINT) AS streak_start_day
        |FROM i JOIN u ON i.user_id = u.user_id AND i.len = u.longest
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "funnel_steps" ->
      """WITH ev AS (SELECT user_id, event_type,
        |                   epoch_ns(ts)//1000 AS ts_us FROM events),
        |v AS (SELECT user_id, CAST(min(ts_us) AS BIGINT) AS v_us
        |      FROM ev WHERE event_type = 'view' GROUP BY 1),
        |s AS (SELECT ev.user_id, CAST(min(ts_us) AS BIGINT) AS s_us
        |      FROM ev JOIN v ON ev.user_id = v.user_id
        |      WHERE event_type = 'click' AND ts_us > v_us
        |        AND ts_us <= v_us + 86400000000 GROUP BY 1),
        |p AS (SELECT ev.user_id, CAST(min(ts_us) AS BIGINT) AS p_us
        |      FROM ev JOIN s ON ev.user_id = s.user_id
        |      WHERE event_type = 'purchase' AND ts_us > s_us
        |        AND ts_us <= s_us + 86400000000 GROUP BY 1),
        |f AS (SELECT v.user_id, v_us, s_us, p_us,
        |        1 + CAST(s_us IS NOT NULL AS INTEGER)
        |          + CAST(p_us IS NOT NULL AS INTEGER) AS steps_completed
        |      FROM v LEFT JOIN s ON v.user_id = s.user_id
        |             LEFT JOIN p ON v.user_id = p.user_id)
        |SELECT steps_completed, CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(CASE WHEN p_us IS NOT NULL THEN p_us - v_us END)
        |            AS BIGINT) AS total_conv_us
        |FROM f GROUP BY 1 ORDER BY steps_completed""".stripMargin,
    "daily_revenue_ma7" ->
      """WITH pur AS (SELECT epoch_ns(ts)//1000 // 86400000000 AS day,
        |                    CAST(value AS DECIMAL(18,2)) AS v
        |             FROM events WHERE event_type = 'purchase'),
        |daily AS (SELECT day, sum(v) AS day_rev,
        |                 CAST(count(*) AS BIGINT) AS n_purchases
        |          FROM pur GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM pur),
        |grid AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b),
        |j AS (SELECT g.day AS day,
        |        COALESCE(day_rev, CAST(0 AS DECIMAL(18,2))) AS day_rev,
        |        COALESCE(n_purchases, 0) AS n_purchases
        |      FROM grid g LEFT JOIN daily ON g.day = daily.day),
        |m AS (SELECT day, day_rev, n_purchases,
        |        CAST(sum(day_rev) OVER (ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |        / CAST(count(*) OVER (ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |          AS ma7
        |      FROM j)
        |SELECT day AS epoch_day, CAST(day_rev AS DOUBLE) AS day_rev,
        |       n_purchases, ma7
        |FROM m ORDER BY epoch_day""".stripMargin,
    // CUSUM via the prefix-min identity: S_t = max(0, cum_t − min(0,
    // min_{j<t} cum_j)) — all integer cents, mirrors the distributed
    // cumsum/prefix-max pair on the Spark side
    "cusum_changepoint" ->
      """WITH o AS (SELECT epoch_ns(o_orderdate)//1000 // 86400000000 AS day,
        |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |           FROM orders),
        |pd AS (SELECT day, CAST(sum(cents) AS BIGINT) AS x FROM o GROUP BY day),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM pd),
        |grid AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b),
        |f AS (SELECT g.day AS day, COALESCE(x, 0) AS x
        |      FROM grid g LEFT JOIN pd ON g.day = pd.day),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |             CAST(sum(x) AS BIGINT) AS total FROM f),
        |c AS (SELECT day, x,
        |        CAST(sum(x * n_days - total) OVER (ORDER BY day) AS BIGINT) AS cum
        |      FROM f, t),
        |p AS (SELECT day, x, cum,
        |        COALESCE(min(cum) OVER (ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pmin
        |      FROM c)
        |SELECT day AS epoch_day, x AS day_cents, cum AS cum_drift,
        |       greatest(cum - least(pmin, 0), 0) AS cusum
        |FROM p ORDER BY cusum DESC, epoch_day LIMIT 10""".stripMargin,
    // lateness = strict-prefix running max of event time over ARRIVAL
    // order minus own event time (NULL prefix = first arrival = never
    // late); one conditional aggregate serves all five delays
    "watermark_advisor" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts)//1000 AS us FROM events),
        |pm AS (SELECT event_id, us, max(us) OVER (ORDER BY event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmx FROM e),
        |l AS (SELECT CASE WHEN pmx IS NULL THEN 0
        |             ELSE greatest(pmx - us, 0) END AS late_us FROM pm),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
        |        CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_0,
        |        CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS d_60,
        |        CAST(sum(CASE WHEN late_us > 300000000 THEN 1 ELSE 0 END) AS BIGINT) AS d_300,
        |        CAST(sum(CASE WHEN late_us > 900000000 THEN 1 ELSE 0 END) AS BIGINT) AS d_900,
        |        CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS d_3600
        |      FROM l),
        |d AS (SELECT unnest([0, 60, 300, 900, 3600]) AS delay_s)
        |SELECT CAST(d.delay_s AS INTEGER) AS delay_s, t.n_events,
        |       CASE d.delay_s WHEN 0 THEN d_0 WHEN 60 THEN d_60
        |            WHEN 300 THEN d_300 WHEN 900 THEN d_900 ELSE d_3600 END
        |         AS n_dropped,
        |       COALESCE((CASE d.delay_s WHEN 0 THEN d_0 WHEN 60 THEN d_60
        |            WHEN 300 THEN d_300 WHEN 900 THEN d_900 ELSE d_3600 END
        |         * 1000) // NULLIF(n_events, 0), 0) AS drop_permille
        |FROM d CROSS JOIN t ORDER BY delay_s""".stripMargin,
    "revenue_bridge" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |    COALESCE(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END),
        |             CAST(0 AS DECIMAL(18,2))) AS r1,
        |    COALESCE(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END),
        |             CAST(0 AS DECIMAL(18,2))) AS r2
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate <  TIMESTAMP '1999-01-01'
        |  GROUP BY 1),
        |b AS (SELECT r1, r2,
        |        CASE WHEN r1 = 0 THEN 'new'
        |             WHEN r2 = 0 THEN 'churned'
        |             WHEN r2 > r1 THEN 'expanded'
        |             WHEN r2 < r1 THEN 'contracted'
        |             ELSE 'flat' END AS bucket
        |      FROM pc)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(r1) AS DOUBLE) AS rev_1997,
        |       CAST(sum(r2) AS DOUBLE) AS rev_1998,
        |       CAST(sum(r2 - r1) AS DOUBLE) AS delta
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,
    "pareto_share" ->
      """WITH pc AS (SELECT o_custkey,
        |              sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |            FROM orders GROUP BY 1),
        |d AS (SELECT rev, CAST(ntile(10) OVER (ORDER BY rev DESC, o_custkey)
        |                       AS INTEGER) AS decile
        |      FROM pc),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |             sum(rev) AS dec_rev FROM d GROUP BY 1),
        |t AS (SELECT sum(dec_rev) AS total_rev FROM g),
        |c AS (SELECT decile, n_customers, dec_rev,
        |        sum(dec_rev) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        |          AS cum_rev
        |      FROM g)
        |SELECT decile, n_customers, CAST(dec_rev AS DOUBLE) AS decile_revenue,
        |       CAST(dec_rev AS DOUBLE) / CAST(t.total_rev AS DOUBLE) AS share,
        |       CAST(cum_rev AS DOUBLE) / CAST(t.total_rev AS DOUBLE)
        |         AS cum_share
        |FROM c, t ORDER BY decile""".stripMargin,
    "dup_orders" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(o_totalprice AS DECIMAL(18,2)) AS amount,
        |                  epoch_ns(o_orderdate)//1000 // 86400000000 AS day
        |           FROM orders)
        |SELECT o_custkey AS custkey, CAST(day AS BIGINT) AS epoch_day,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(amount) AS DOUBLE) AS total_amount,
        |       CAST(min(o_orderkey) AS BIGINT) AS first_orderkey,
        |       CAST(max(o_orderkey) AS BIGINT) AS last_orderkey
        |FROM o GROUP BY o_custkey, day HAVING count(*) > 1
        |ORDER BY custkey, epoch_day""".stripMargin,
    "rfm_segments" ->
      """WITH per AS (SELECT o_custkey,
        |               max(epoch_ns(o_orderdate)//1000 // 86400000000)
        |                 AS last_day,
        |               CAST(count(*) AS BIGINT) AS frequency,
        |               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |             FROM orders GROUP BY 1),
        |a AS (SELECT max(last_day) AS anchor FROM per),
        |s AS (SELECT o_custkey, monetary,
        |        CAST(ntile(5) OVER (ORDER BY a.anchor - last_day, o_custkey)
        |             AS INTEGER) AS r_score,
        |        CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
        |             AS INTEGER) AS f_score,
        |        CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
        |             AS INTEGER) AS m_score
        |      FROM per, a)
        |SELECT r_score, f_score, m_score,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(monetary) AS DOUBLE) AS segment_revenue
        |FROM s GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin,
    "ab_test" ->
      """WITH p AS (SELECT (user_id % 2 = 1) AS arm_b,
        |                  CAST(value AS DECIMAL(18,2)) AS v
        |           FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT
        |        CAST(sum(CASE WHEN NOT arm_b THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |        CAST(sum(CASE WHEN arm_b THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |        sum(CASE WHEN NOT arm_b THEN v END) AS sa,
        |        sum(CASE WHEN arm_b THEN v END) AS sb,
        |        sum(CASE WHEN NOT arm_b THEN v * v END) AS qa,
        |        sum(CASE WHEN arm_b THEN v * v END) AS qb
        |      FROM p),
        |x AS (SELECT na, nb,
        |        CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS mean_a,
        |        CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_b,
        |        (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
        |           / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1) AS var_a,
        |        (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
        |           / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1) AS var_b
        |      FROM m),
        |y AS (SELECT *, var_a / CAST(na AS DOUBLE) AS se_a,
        |             var_b / CAST(nb AS DOUBLE) AS se_b
        |      FROM x),
        |z AS (SELECT *, se_a + se_b AS se2 FROM y)
        |SELECT na, nb, mean_a, mean_b, var_a, var_b,
        |       (mean_b - mean_a) / sqrt(se2) AS t_stat,
        |       (se2 * se2) / ((se_a * se_a) / (CAST(na AS DOUBLE) - 1)
        |                    + (se_b * se_b) / (CAST(nb AS DOUBLE) - 1)) AS df
        |FROM z""".stripMargin,
    "benford_check" -> {
      // Benford expectations baked as the SAME JVM-computed literals the
      // Spark plan carries — no runtime log10 on either engine
      val bCase = (1 to 9)
        .map(d => s"WHEN $d THEN ${graft.operators.Relational.BenfordU20(d - 1)}")
        .mkString(" ")
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
         |                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
         |           FROM orders WHERE o_totalprice >= 1),
         |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_orders
         |      FROM d GROUP BY 1),
         |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_total FROM g)
         |SELECT digit, n_orders,
         |       CAST(n_orders * 1048576 // n_total AS BIGINT) AS obs_u20,
         |       CAST(CASE digit $bCase ELSE 0 END AS BIGINT) AS exp_u20,
         |       CAST(n_orders * 1048576 // n_total AS BIGINT)
         |         - CAST(CASE digit $bCase ELSE 0 END AS BIGINT) AS dev_u20
         |FROM g, t ORDER BY digit""".stripMargin
    },
    "seasonality_dow" ->
      """WITH p AS (SELECT (epoch_ns(ts)//1000 // 86400000000 + 4) % 7 AS dow,
        |                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |                    AS cents
        |           FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_purchases,
        |             CAST(sum(cents) AS BIGINT) AS cents
        |      FROM p GROUP BY 1),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM g)
        |SELECT CAST(dow AS BIGINT) AS dow, n_purchases,
        |       CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       CAST(cents * 1048576 // total_cents AS BIGINT) AS share_u20,
        |       CAST(cents * 7340032 // total_cents AS BIGINT) AS lift_u20
        |FROM g, t ORDER BY dow""".stripMargin,
    "new_vs_returning" ->
      """WITH du AS (SELECT DISTINCT epoch_ns(ts)//1000 // 86400000000 AS day,
        |                   user_id FROM events),
        |f AS (SELECT user_id, CAST(min(day) AS BIGINT) AS first_day
        |      FROM du GROUP BY 1)
        |SELECT du.day AS epoch_day,
        |       CAST(sum(CASE WHEN du.day = f.first_day THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_new,
        |       CAST(sum(CASE WHEN du.day <> f.first_day THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_returning,
        |       CAST(count(*) AS BIGINT) AS n_active
        |FROM du JOIN f ON du.user_id = f.user_id
        |GROUP BY du.day ORDER BY epoch_day""".stripMargin,
    "chi2_drift" ->
      """WITH c AS (SELECT o_orderpriority,
        |             CAST(year(o_orderdate) AS INTEGER) AS yr,
        |             CAST(count(*) AS BIGINT) AS n
        |           FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |             AND o_orderdate <  TIMESTAMP '1999-01-01'
        |           GROUP BY 1, 2),
        |r AS (SELECT o_orderpriority, CAST(sum(n) AS BIGINT) AS row_n
        |      FROM c GROUP BY 1),
        |k AS (SELECT yr, CAST(sum(n) AS BIGINT) AS col_n FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n FROM c),
        |e AS (SELECT c.o_orderpriority, c.yr, c.n,
        |        CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
        |          / CAST(total_n AS DOUBLE) AS expected
        |      FROM c JOIN r USING (o_orderpriority) JOIN k USING (yr)
        |             CROSS JOIN t)
        |SELECT o_orderpriority, yr, n, expected,
        |       (CAST(n AS DOUBLE) - expected) * (CAST(n AS DOUBLE) - expected)
        |         / expected AS contrib
        |FROM e ORDER BY o_orderpriority, yr""".stripMargin,
    "gini_revenue" ->
      """WITH per AS (SELECT o_custkey,
        |               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                             AS BIGINT)) AS BIGINT) AS cents
        |             FROM orders GROUP BY 1),
        |r AS (SELECT cents,
        |        CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT)
        |          AS i
        |      FROM per),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(cents) AS BIGINT) AS total_cents FROM per)
        |SELECT n AS n_customers, total_cents,
        |       CAST(sum((2 * i - n - 1) * cents) AS BIGINT) AS gini_num,
        |       CAST(CAST(sum((2 * i - n - 1) * cents) AS BIGINT) AS DOUBLE)
        |         / (CAST(n AS DOUBLE) * CAST(total_cents AS DOUBLE)) AS gini
        |FROM r, n1 GROUP BY n, total_cents""".stripMargin,
    "small_qty_revenue" ->
      """WITH li AS (
        |  SELECT p_brand, l_partkey,
        |         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand IN ('Brand#1', 'Brand#2')),
        |w AS (SELECT p_brand, l_partkey, qc, price,
        |        CAST(sum(qc) OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_q,
        |        CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n_q
        |      FROM li)
        |SELECT p_brand,
        |       CAST(sum(price) AS DOUBLE) / 7.0 AS avg_yearly,
        |       count(*) AS n_small_lots,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM w WHERE qc * n_q * 2 < sum_q
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS qty_cents
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) > 25000)
        |SELECT c_custkey, c_name, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |       CAST(qty_cents AS DOUBLE) / 100.0 AS total_qty
        |FROM big
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,
    "waiting_suppliers" ->
      """WITH ps AS (
        |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_max
        |  FROM lineitem GROUP BY 1, 2),
        |w1 AS (SELECT *,
        |         CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT)
        |           AS n_supp,
        |         max(supp_max) OVER (PARTITION BY l_orderkey) AS order_max
        |       FROM ps),
        |w2 AS (SELECT *,
        |         CAST(sum(CASE WHEN supp_max = order_max THEN 1 ELSE 0 END)
        |              OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_at_max
        |       FROM w1)
        |SELECT s_suppkey, s_name, count(*) AS n_waiting_orders
        |FROM w2 JOIN supplier ON l_suppkey = s_suppkey
        |WHERE n_supp >= 2 AND n_at_max = 1 AND supp_max = order_max
        |GROUP BY 1, 2 ORDER BY n_waiting_orders DESC, s_suppkey""".stripMargin,
    "top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |              AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT l_suppkey AS suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY suppkey""".stripMargin,
    "range_bounds" ->
      """WITH s AS (
        |  SELECT l_orderkey, l_linenumber FROM lineitem
        |  WHERE CAST(concat('0x', substr(md5('sb:' || CAST(l_orderkey AS VARCHAR)
        |          || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
        |        % 50 = 0),
        |r AS (SELECT l_orderkey,
        |        row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rk,
        |        count(*) OVER () AS n FROM s),
        |b AS (SELECT r.l_orderkey AS bv
        |      FROM r JOIN range(1, 8) t(i) ON r.rk = (t.i * r.n + 7) // 8),
        |k AS (SELECT l_orderkey,
        |        (SELECT CAST(count(*) AS INTEGER) FROM b
        |         WHERE b.bv < lineitem.l_orderkey) AS bucket
        |      FROM lineitem),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rows,
        |             min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
        |      FROM k GROUP BY bucket),
        |t AS (SELECT CAST(count(*) AS DOUBLE) / 8 AS target_rows FROM lineitem)
        |SELECT bucket, rows, min_key, max_key, rows / target_rows AS balance
        |FROM g CROSS JOIN t ORDER BY bucket""".stripMargin,
    // cents non-negativity is ENFORCED (error() here, raise_error in the
    // operator): // floors while Spark div truncates, so negative credits
    // would silently diverge — both engines fail loudly instead
    "linear_attribution" ->
      """WITH p0 AS (SELECT event_id AS p_id, user_id, epoch_ns(ts)//1000 AS p_us,
        |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |           FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT p_id, user_id, p_us,
        |        CASE WHEN cents >= 0 THEN cents
        |             ELSE CAST(error('linear_attribution: negative purchase cents violate the non-negative contract: ' || cents) AS BIGINT)
        |        END AS cents
        |      FROM p0),
        |t AS (SELECT user_id, event_type AS touch_type, epoch_ns(ts)//1000 AS t_us
        |      FROM events WHERE event_type IN ('view', 'click')),
        |per AS (SELECT p_id, CAST(count(*) AS BIGINT) AS n_touches,
        |          CAST(sum(CASE WHEN touch_type = 'view' THEN 1 ELSE 0 END)
        |               AS BIGINT) AS n_view,
        |          CAST(sum(CASE WHEN touch_type = 'click' THEN 1 ELSE 0 END)
        |               AS BIGINT) AS n_click
        |        FROM p JOIN t USING (user_id)
        |        WHERE t_us < p_us AND t_us >= p_us - 86400000000
        |        GROUP BY p_id),
        |c AS (SELECT p.cents, per.n_touches, per.n_view, per.n_click
        |      FROM p LEFT JOIN per USING (p_id)),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN n_touches IS NOT NULL
        |       THEN cents * n_view * 1048576 // n_touches ELSE 0 END)
        |       AS BIGINT) AS vu,
        |  CAST(sum(CASE WHEN n_touches IS NOT NULL
        |       THEN cents * n_click * 1048576 // n_touches ELSE 0 END)
        |       AS BIGINT) AS cu,
        |  CAST(sum(CASE WHEN n_touches IS NULL
        |       THEN cents * 1048576 ELSE 0 END) AS BIGINT) AS nu,
        |  CAST(sum(CASE WHEN n_view > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vp,
        |  CAST(sum(CASE WHEN n_click > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |  CAST(sum(CASE WHEN n_touches IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS np
        |  FROM c)
        |SELECT touch, n_purchases, credit_u20,
        |       CAST(credit_u20 AS DOUBLE) / 1048576.0 / 100.0 AS credit
        |FROM (SELECT 'view' AS touch, vp AS n_purchases, vu AS credit_u20 FROM a
        |      UNION ALL
        |      SELECT 'click', cp, cu FROM a
        |      UNION ALL
        |      SELECT 'none', np, nu FROM a)
        |ORDER BY touch""".stripMargin,
    "local_volume" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1997
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "exact_median" ->
      """WITH c AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT) AS cents, l_orderkey, l_linenumber
        |           FROM lineitem),
        |r AS (SELECT cents, row_number()
        |        OVER (ORDER BY cents, l_orderkey, l_linenumber) AS rk FROM c),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c)
        |SELECT n.n AS n_rows,
        |       CAST(max(CASE WHEN rk = (n.n + 3) // 4 THEN cents END)
        |            AS BIGINT) AS p25_cents,
        |       CAST(max(CASE WHEN rk = (n.n + 1) // 2 THEN cents END)
        |          + max(CASE WHEN rk = n.n // 2 + 1 THEN cents END)
        |            AS BIGINT) AS median_x2_cents,
        |       CAST(max(CASE WHEN rk = (3 * n.n + 3) // 4 THEN cents END)
        |            AS BIGINT) AS p75_cents
        |FROM r, n GROUP BY n.n""".stripMargin,
    "idle_rich_customers" ->
      """WITH c AS (SELECT c_custkey, c_nationkey, c_acctbal,
        |             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |               AS cents
        |           FROM customer),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents,
        |             CAST(count(*) AS BIGINT) AS n_pos
        |      FROM c WHERE c_acctbal > 0)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs,
        |       CAST(sum(cents) AS BIGINT) AS bal_cents
        |FROM c CROSS JOIN t
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE cents * n_pos > total_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= DATE '2000-01-01')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "skyline_2d" ->
      """WITH g AS (SELECT p_retailprice AS price,
        |             CAST(max(p_size) AS BIGINT) AS g_size
        |           FROM part GROUP BY 1),
        |s AS (SELECT price, g_size, max(g_size) OVER (ORDER BY price
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM g)
        |SELECT p_partkey, p_name, p_retailprice, p_size
        |FROM part JOIN s ON p_retailprice = s.price
        |               AND CAST(p_size AS BIGINT) = s.g_size
        |WHERE pmax IS NULL OR g_size > pmax
        |ORDER BY p_retailprice, p_partkey""".stripMargin,
    "rendezvous_shards" ->
      """WITH h AS (SELECT d.doc_id, t.s AS shard,
        |             CAST(concat('0x', substr(md5('rv:' || CAST(t.s AS VARCHAR)
        |                  || ':' || CAST(d.doc_id AS VARCHAR)), 1, 15))
        |                  AS BIGINT) AS hv
        |           FROM documents d CROSS JOIN range(0, 8) t(s)),
        |a AS (SELECT doc_id, CAST(shard AS INTEGER) AS shard FROM (
        |        SELECT doc_id, shard, row_number() OVER (
        |          PARTITION BY doc_id ORDER BY hv DESC, shard) AS rn FROM h)
        |      WHERE rn = 1),
        |g AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |             min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |      FROM a GROUP BY shard),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM g)
        |SELECT shard, n_docs, min_doc, max_doc,
        |       CAST(n_docs AS DOUBLE) * 8 / n_total AS balance
        |FROM g CROSS JOIN t ORDER BY shard""".stripMargin,
    "min_cost_supplier" ->
      """WITH u AS (
        |  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price,
        |         count(*) OVER (PARTITION BY l_partkey) AS n_offers,
        |         row_number() OVER (PARTITION BY l_partkey
        |                            ORDER BY l_extendedprice / l_quantity, l_suppkey)
        |           AS rn
        |  FROM lineitem)
        |SELECT l_partkey AS partkey, l_suppkey AS suppkey, s_name, n_name,
        |       unit_price, n_offers
        |FROM u
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE rn = 1 ORDER BY partkey""".stripMargin,
    "semi_anti_join" ->
      """SELECT c_custkey, 'has_orders' AS status FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS status FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "full_outer_join" ->
      """SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice,
        |       CASE WHEN o_orderkey IS NULL THEN 'customer_only'
        |            WHEN c_custkey IS NULL THEN 'order_only'
        |            ELSE 'matched' END AS side
        |FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
        |FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,
    // fuzzy_join: candidate generation via the FastSS deletion
    // neighborhood (public result: d(a,b) <= 1 iff a = b, or one is the
    // other's single-char deletion, or both share a deletion at the same
    // position), then VERIFIED with DuckDB's own levenshtein — the
    // metric stays the independent ground truth, only the enumeration is
    // blocked. The previous brute-force O(n²) levenshtein oracle was
    // 1.1e10 pairs at the sf1 tier (killed after 10+ min; this form runs
    // in seconds at every tier).
    "fuzzy_join" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer),
        |del AS MATERIALIZED (
        |  SELECT c_custkey, c_name, i,
        |         substr(c_name, 1, i - 1) || substr(c_name, i + 1) AS d
        |  FROM (SELECT c_custkey, c_name,
        |          unnest(generate_series(1, length(c_name))) AS i FROM c)),
        |cand AS (
        |  SELECT x.c_custkey AS a_key, y.c_custkey AS b_key,
        |         x.c_name AS na, y.c_name AS nb
        |  FROM del x JOIN del y ON x.i = y.i AND x.d = y.d
        |       AND x.c_custkey < y.c_custkey
        |  UNION
        |  SELECT LEAST(x.c_custkey, z.c_custkey),
        |         GREATEST(x.c_custkey, z.c_custkey),
        |         CASE WHEN x.c_custkey < z.c_custkey
        |              THEN x.c_name ELSE z.c_name END,
        |         CASE WHEN x.c_custkey < z.c_custkey
        |              THEN z.c_name ELSE x.c_name END
        |  FROM del x JOIN c z ON x.d = z.c_name AND x.c_custkey <> z.c_custkey)
        |SELECT a_key, b_key, CAST(levenshtein(na, nb) AS INTEGER) AS dist
        |FROM cand WHERE levenshtein(na, nb) <= 1
        |ORDER BY a_key, b_key""".stripMargin,
    "bloom_prune_join" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "zorder_key" ->
      """WITH s0 AS (SELECT l_orderkey, l_linenumber,
        |                   l_partkey & 4294967295 AS x,
        |                   l_suppkey & 4294967295 AS y FROM lineitem),
        |s1 AS (SELECT l_orderkey, l_linenumber,
        |              (x | (x << 16)) & 281470681808895 AS x,
        |              (y | (y << 16)) & 281470681808895 AS y FROM s0),
        |s2 AS (SELECT l_orderkey, l_linenumber,
        |              (x | (x << 8)) & 71777214294589695 AS x,
        |              (y | (y << 8)) & 71777214294589695 AS y FROM s1),
        |s3 AS (SELECT l_orderkey, l_linenumber,
        |              (x | (x << 4)) & 1085102592571150095 AS x,
        |              (y | (y << 4)) & 1085102592571150095 AS y FROM s2),
        |s4 AS (SELECT l_orderkey, l_linenumber,
        |              (x | (x << 2)) & 3689348814741910323 AS x,
        |              (y | (y << 2)) & 3689348814741910323 AS y FROM s3),
        |s5 AS (SELECT l_orderkey, l_linenumber,
        |              (x | (x << 1)) & 6148914691236517205 AS x,
        |              (y | (y << 1)) & 6148914691236517205 AS y FROM s4)
        |SELECT l_orderkey, l_linenumber, (x | (y << 1)) AS z
        |FROM s5 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "ktable_latest" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type, value AS last_value
        |FROM (SELECT user_id, event_id, event_type, value,
        |             row_number() OVER (
        |               PARTITION BY user_id
        |               ORDER BY epoch_ns(ts)//1000 DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "dynamic_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS ts_us, event_id,
        |                  event_type, value FROM events),
        |x AS (SELECT user_id, ts_us, event_id, value,
        |        lag(ts_us) OVER w AS prev_ts,
        |        lag(event_type) OVER w AS prev_type
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |y AS (SELECT user_id, ts_us, event_id, value,
        |        CASE WHEN prev_ts IS NULL OR ts_us - prev_ts >
        |               (CASE WHEN prev_type = 'purchase'
        |                     THEN 5400000000 ELSE 1800000000 END)
        |             THEN 1 ELSE 0 END AS is_new FROM x),
        |z AS (SELECT user_id, ts_us, value,
        |        CAST(sum(is_new) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS BIGINT) AS session_idx
        |      FROM y)
        |SELECT user_id, session_idx,
        |       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM z GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,
    "unpivot_metrics" ->
      """SELECT l_returnflag, metric, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem) u
        |GROUP BY 1, 2 ORDER BY l_returnflag, metric""".stripMargin,
    "trailing_1h" ->
      """SELECT event_id, user_id, ts_us,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         AS trail_value,
        |       CAST(count(*) OVER w AS BIGINT) AS trail_n
        |FROM (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us, value
        |      FROM events WHERE event_type = 'purchase') t
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "order_reconcile" ->
      """WITH detail AS (SELECT l_orderkey,
        |                  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS detail_total
        |                FROM lineitem GROUP BY l_orderkey),
        |j AS (SELECT o_orderstatus,
        |        CASE WHEN detail_total IS NULL THEN 'missing_detail'
        |             WHEN abs(CAST(o_totalprice AS DECIMAL(18,2))
        |                      - COALESCE(detail_total, CAST(0 AS DECIMAL(18,2)))) * 100
        |                  <= CAST(o_totalprice AS DECIMAL(18,2)) THEN 'matched'
        |             ELSE 'mismatched' END AS recon_status,
        |        abs(CAST(o_totalprice AS DECIMAL(18,2))
        |            - COALESCE(detail_total, CAST(0 AS DECIMAL(18,2)))) AS disc
        |      FROM orders LEFT JOIN detail ON o_orderkey = l_orderkey)
        |SELECT o_orderstatus, recon_status, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(disc) AS DOUBLE) AS total_discrepancy
        |FROM j GROUP BY o_orderstatus, recon_status
        |ORDER BY o_orderstatus, recon_status""".stripMargin,
    "retention_cohorts" ->
      """WITH p AS (SELECT user_id, epoch_ns(ts) // 1000 // 86400000000 // 7 AS week
        |           FROM events WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM p GROUP BY user_id)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |       CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users,
        |       CAST(count(*) AS BIGINT) AS n_purchases
        |FROM p JOIN f ON p.user_id = f.user_id
        |GROUP BY cohort_week, week - cohort_week
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "snapshot_diff" ->
      """WITH cur AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
        |o AS (SELECT c_custkey AS k,
        |        CASE WHEN c_custkey % 13 = 0
        |             THEN CAST(CAST(c_acctbal AS DECIMAL(18,2))
        |                       + CAST(100 AS DECIMAL(18,2)) AS DOUBLE)
        |             ELSE c_acctbal END AS old_bal,
        |        c_mktsegment AS old_seg
        |      FROM cur WHERE c_custkey % 97 <> 0),
        |n AS (SELECT c_custkey AS k, c_acctbal AS new_bal, c_mktsegment AS new_seg
        |      FROM cur WHERE c_custkey % 89 <> 0)
        |SELECT COALESCE(o.k, n.k) AS c_custkey,
        |       CASE WHEN old_bal IS NULL THEN 'I'
        |            WHEN new_bal IS NULL THEN 'D' ELSE 'U' END AS op,
        |       old_bal, new_bal,
        |       COALESCE(new_seg, old_seg) AS c_mktsegment
        |FROM o FULL OUTER JOIN n ON o.k = n.k
        |WHERE old_bal IS NULL OR new_bal IS NULL OR old_bal <> new_bal
        |ORDER BY c_custkey""".stripMargin,
    "merge_upsert" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |updates AS (SELECT DISTINCT o_custkey AS k, 'U' AS op,
        |                   CAST(NULL AS VARCHAR) AS new_name, 100.0 AS delta
        |            FROM orders WHERE o_totalprice > 450000.0),
        |deletes AS (SELECT c_custkey AS k, 'D' AS op,
        |                   CAST(NULL AS VARCHAR) AS new_name, 0.0 AS delta
        |            FROM base WHERE c_acctbal < -900.0),
        |inserts AS (SELECT s_suppkey + 9000000 AS k, 'I' AS op,
        |                   s_name AS new_name, s_acctbal AS delta FROM supplier),
        |changes AS (SELECT * FROM updates UNION ALL
        |            SELECT * FROM deletes UNION ALL
        |            SELECT * FROM inserts)
        |SELECT COALESCE(c_custkey, k) AS c_custkey,
        |       COALESCE(new_name, c_name) AS c_name,
        |       CAST(COALESCE(CAST(c_acctbal AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2)))
        |            + COALESCE(CAST(delta AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2)))
        |            AS DOUBLE) AS c_acctbal,
        |       CASE WHEN op IS NULL THEN 'kept'
        |            WHEN op = 'U' THEN 'updated'
        |            ELSE 'inserted' END AS status
        |FROM base FULL OUTER JOIN changes ON c_custkey = k
        |WHERE op IS NULL OR op <> 'D'
        |ORDER BY c_custkey""".stripMargin,
    "winsorized_stats" ->
      """WITH q AS (SELECT l_returnflag,
        |                  quantile_cont(l_quantity, 0.25) AS q1,
        |                  quantile_cont(l_quantity, 0.75) AS q3
        |           FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, q1, q3,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN l_quantity < q1 OR l_quantity > q3
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |       CAST(sum(CAST(least(greatest(l_quantity, q1), q3)
        |                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_clipped
        |FROM lineitem JOIN q USING (l_returnflag)
        |GROUP BY 1, 2, 3 ORDER BY l_returnflag""".stripMargin,
    "correlated_subquery" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_small,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS small_revenue
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "user_journey" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       string_agg(event_type, '>'
        |                  ORDER BY epoch_ns(ts)//1000, event_id) AS journey
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "time_gapfill" ->
      """WITH ev AS (SELECT date_trunc('hour', ts) AS h, event_type FROM events),
        |counts AS (SELECT h, event_type, CAST(count(*) AS BIGINT) AS n
        |           FROM ev GROUP BY 1, 2),
        |hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |          FROM (SELECT min(h) AS h0, max(h) AS h1 FROM ev)),
        |types AS (SELECT DISTINCT event_type AS et FROM ev)
        |SELECT epoch_us(CAST(hours.h AS TIMESTAMP)) AS w_start,
        |       types.et AS event_type,
        |       COALESCE(n, CAST(0 AS BIGINT)) AS n
        |FROM hours CROSS JOIN types
        |LEFT JOIN counts ON counts.h = hours.h
        |                AND counts.event_type = types.et
        |ORDER BY w_start, event_type""".stripMargin,
    "repetition_score" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |bg AS (SELECT doc_id, list_transform(range(1, len(ts)),
        |                        i -> ts[i] || ' ' || ts[i+1]) AS bgs
        |       FROM tok WHERE len(ts) >= 2),
        |e AS (SELECT doc_id, unnest(bgs) AS bg FROM bg),
        |c AS (SELECT doc_id, bg, count(*) AS n FROM e GROUP BY 1, 2),
        |t AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS top_count,
        |             CAST(sum(n) AS BIGINT) AS n_bigrams FROM c GROUP BY 1)
        |SELECT doc_id, n_bigrams, top_count,
        |       CAST(top_count AS DOUBLE) / n_bigrams AS top_ratio,
        |       CASE WHEN CAST(top_count AS DOUBLE) / n_bigrams > 0.05
        |            THEN 1 ELSE 0 END AS repetitive
        |FROM t ORDER BY doc_id""".stripMargin,
    "token_budget" ->
      """WITH per AS (SELECT source,
        |               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
        |             FROM documents GROUP BY source),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM per),
        |a1 AS (SELECT per.source, per.avail,
        |         CAST(1000000 // n1.n_sources AS BIGINT) AS fair1,
        |         CAST(least(per.avail, 1000000 // n1.n_sources) AS BIGINT)
        |           AS alloc1
        |       FROM per, n1),
        |t1 AS (SELECT CAST(sum(alloc1) AS BIGINT) AS used,
        |         CAST(sum(CASE WHEN avail > fair1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_unsat
        |       FROM a1)
        |SELECT a1.source, a1.avail,
        |       CAST(a1.alloc1 + CASE WHEN a1.avail > a1.fair1
        |         THEN least(a1.avail - a1.alloc1,
        |                    (1000000 - t1.used) // greatest(t1.n_unsat, 1))
        |         ELSE 0 END AS BIGINT) AS allocated,
        |       a1.avail <= a1.fair1 AS saturated,
        |       CAST(a1.alloc1 + CASE WHEN a1.avail > a1.fair1
        |         THEN least(a1.avail - a1.alloc1,
        |                    (1000000 - t1.used) // greatest(t1.n_unsat, 1))
        |         ELSE 0 END AS DOUBLE) / CAST(a1.avail AS DOUBLE)
        |         AS sample_rate
        |FROM a1, t1 ORDER BY source""".stripMargin,
    "k_anonymity" ->
      """WITH cls AS (SELECT lang, source,
        |               CAST(length(bin(n_chars)) - 1 AS INTEGER) AS len_bucket,
        |               CAST(count(*) AS BIGINT) AS class_size
        |             FROM documents GROUP BY 1, 2, 3)
        |SELECT class_size < 5 AS at_risk,
        |       CAST(count(*) AS BIGINT) AS n_classes,
        |       CAST(sum(class_size) AS BIGINT) AS n_docs,
        |       min(class_size) AS min_class, max(class_size) AS max_class
        |FROM cls GROUP BY 1 ORDER BY at_risk""".stripMargin,
    "hash_split" ->
      """SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (SELECT doc_id, n_chars,
        |             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |                  AS BIGINT) % 100 AS bucket,
        |             CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |                       AS BIGINT) % 100 < 80 THEN 'train'
        |                  WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |                       AS BIGINT) % 100 < 90 THEN 'val'
        |                  ELSE 'test' END AS split
        |      FROM documents) t
        |GROUP BY split ORDER BY split""".stripMargin,
    "stratified_sample" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS src_n
        |           FROM documents GROUP BY source),
        |t AS (SELECT min(src_n) AS target_n FROM s),
        |k AS (SELECT d.source, d.doc_id, s.src_n, t.target_n
        |      FROM documents d JOIN s ON d.source = s.source, t
        |      WHERE (CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
        |              AS BIGINT) % 1000000) * s.src_n < t.target_n * 1000000)
        |SELECT source, max(src_n) AS src_n, max(target_n) AS target_n,
        |       CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "domain_cap" ->
      """SELECT source, doc_id, h AS text_hash FROM (
        |  SELECT source, doc_id, h,
        |         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
        |  FROM (SELECT source, doc_id,
        |               CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
        |        FROM documents) i) t
        |WHERE rn <= 25 ORDER BY source, doc_id""".stripMargin,
    "asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us,
        |                  event_type FROM events),
        |p AS (SELECT user_id AS p_user_id, epoch_ns(ts)//1000 AS p_ts_us,
        |             event_id AS p_event_id, value AS p_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.ts_us, e.event_type,
        |       p.p_event_id, p.p_ts_us, p.p_value
        |FROM e ASOF JOIN p
        |  ON e.user_id = p.p_user_id AND e.ts_us >= p.p_ts_us
        |ORDER BY e.event_id""".stripMargin,
    "asof_join_left" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us,
        |                  event_type FROM events),
        |p AS (SELECT user_id AS p_user_id, epoch_ns(ts)//1000 AS p_ts_us,
        |             event_id AS p_event_id, value AS p_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.ts_us, e.event_type,
        |       p.p_event_id, p.p_ts_us, p.p_value
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.p_user_id AND e.ts_us >= p.p_ts_us
        |ORDER BY e.event_id""".stripMargin,
    "asof_join_forward" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us,
        |                  event_type FROM events),
        |p AS (SELECT user_id AS p_user_id, epoch_ns(ts)//1000 AS p_ts_us,
        |             event_id AS p_event_id, value AS p_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.ts_us, e.event_type,
        |       p.p_event_id, p.p_ts_us, p.p_value
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.p_user_id AND e.ts_us <= p.p_ts_us
        |ORDER BY e.event_id""".stripMargin,
    "lead_time" ->
      """WITH j AS (SELECT o_orderpriority AS priority,
        |             CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |                            CAST(l_shipdate AS DATE)) AS BIGINT)
        |               AS lead_days
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT priority, CAST(count(*) AS BIGINT) AS n,
        |       min(lead_days) AS min_days,
        |       quantile_cont(lead_days, 0.5) AS median_days,
        |       quantile_cont(lead_days, 0.75) AS p75_days,
        |       max(lead_days) AS max_days
        |FROM j GROUP BY priority ORDER BY priority""".stripMargin,
    "asof_join_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us,
        |                  event_type FROM events),
        |p AS (SELECT user_id AS p_user_id, epoch_ns(ts)//1000 AS p_ts_us,
        |             event_id AS p_event_id, value AS p_value
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT e.event_id, e.user_id, e.ts_us, e.event_type,
        |             p.p_event_id, p.p_ts_us, p.p_value,
        |             row_number() OVER (PARTITION BY e.event_id
        |               ORDER BY p.p_ts_us DESC, p.p_event_id DESC) AS rn
        |      FROM e LEFT JOIN p
        |        ON p.p_user_id = e.user_id AND p.p_ts_us <= e.ts_us
        |       AND p.p_ts_us >= e.ts_us - 3600000000)
        |SELECT event_id, user_id, ts_us, event_type,
        |       p_event_id, p_ts_us, p_value
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "funnel_conversion" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS t, value
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id AS v_user, epoch_ns(ts)//1000 AS v_t
        |      FROM events WHERE event_type = 'view')
        |SELECT p.user_id, count(*) AS n_converted,
        |       CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS converted_value
        |FROM p ASOF JOIN v ON p.user_id = v.v_user AND p.t >= v.v_t
        |WHERE p.t - v.v_t <= 3600000000
        |GROUP BY p.user_id ORDER BY user_id""".stripMargin,
    "windowed_agg" ->
      """SELECT epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS w_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "sliding_window" ->
      """SELECT epoch_us(CAST(time_bucket(INTERVAL '15 minutes', ts) AS TIMESTAMP))
        |         - CAST(900000000 AS BIGINT) * ks.k AS w_start,
        |       event_type, count(*) AS n
        |FROM events, (SELECT unnest([0,1,2,3]) AS k) ks
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "session_window" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS brk
        |  FROM events
        |), g AS (
        |  SELECT user_id, ts, value,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM o
        |)
        |SELECT user_id, epoch_ns(min(ts)) // 1000 AS session_start,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, session_start""".stripMargin,
    "ranking_window" ->
      """SELECT user_id, CAST(rnk AS INTEGER) AS rnk, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY value DESC, event_id) AS rnk
        |  FROM events WHERE event_type = 'purchase') t
        |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin,
    "rank_family" ->
      """SELECT event_type, event_id, value,
        |       CAST(rank() OVER w AS INTEGER) AS rnk,
        |       CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |       percent_rank() OVER w AS prank,
        |       cume_dist() OVER w AS cdist
        |FROM events WHERE event_type IN ('purchase', 'signup')
        |WINDOW w AS (PARTITION BY event_type ORDER BY value DESC)
        |ORDER BY event_id""".stripMargin,
    "running_total" ->
      """SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us,
        |       CAST(sum(CAST(value AS DECIMAL(18,2)))
        |              OVER (PARTITION BY user_id
        |                    ORDER BY epoch_ns(ts)//1000, event_id
        |                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |         AS running_revenue
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "lag_lead_gaps" ->
      """SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS ts_us,
        |       lag(event_id, 1) OVER w AS prev_event_id,
        |       epoch_ns(ts)//1000 - lag(epoch_ns(ts)//1000, 1) OVER w AS gap_us,
        |       lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id)
        |ORDER BY event_id""".stripMargin,
    "inter_event_gaps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS ts_us,
        |                  event_id FROM events),
        |g AS (SELECT event_type,
        |        ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id, event_type
        |                                    ORDER BY ts_us, event_id) AS gap_us
        |      FROM e)
        |SELECT event_type,
        |       CAST(length(bin(gap_us)) - 1 AS INTEGER) AS gap_bucket,
        |       CAST(count(*) AS BIGINT) AS n_gaps,
        |       min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, gap_bucket""".stripMargin,
    "grouping_sets_report" ->
      """SELECT event_type, weekday, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
        |       CAST(GROUPING(weekday) AS INTEGER) AS g_weekday
        |FROM (SELECT event_type,
        |             CAST(dayofweek(ts) + 1 AS INTEGER) AS weekday, value
        |      FROM events)
        |GROUP BY GROUPING SETS ((event_type), (weekday), ())
        |ORDER BY g_type, g_weekday,
        |         event_type NULLS FIRST, weekday NULLS FIRST""".stripMargin,
    "corr_report" ->
      """WITH m AS (
        |  -- decimal -> double goes VIA VARCHAR: DuckDB's direct cast
        |  -- double-rounds (int128 -> double, then /10^scale) and can be
        |  -- 1 ulp off the correctly-rounded value Spark's BigDecimal cast
        |  -- produces once the unscaled value exceeds 2^53 (the scale-4
        |  -- moments do); strtod of the exact decimal string rounds once.
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |              AS VARCHAR) AS DOUBLE) AS sx,
        |         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |              AS VARCHAR) AS DOUBLE) AS sy,
        |         CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
        |                       CAST(l_extendedprice AS DECIMAL(18,2))
        |                       AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS sxy,
        |         CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
        |                       CAST(l_quantity AS DECIMAL(18,2))
        |                       AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS sxx,
        |         CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                       CAST(l_extendedprice AS DECIMAL(18,2))
        |                       AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |       (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |         (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
        |          sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qty_price,
        |       (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |         (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope_price_per_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "corr_matrix" -> {
      val ms = Seq("qty" -> "l_quantity", "price" -> "l_extendedprice",
        "disc" -> "l_discount", "tax" -> "l_tax")
      def mom(col: String, as: String) =
        s"""CAST(CAST(sum(CAST($col AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS $as"""
      def cross(a: String, b: String, as: String) =
        s"""CAST(CAST(sum(CAST(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2))
           | AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS $as""".stripMargin.replace("\n", "")
      val sums = ms.map { case (n, c) => mom(c, s"s_$n") }
      val squares = ms.map { case (n, c) => cross(c, c, s"q_$n") }
      val pairs = ms.combinations(2).toSeq.map { case Seq((na, ca), (nb, cb)) =>
        (na, nb, ca, cb)
      }
      val crosses = pairs.map { case (na, nb, ca, cb) => cross(ca, cb, s"x_${na}_$nb") }
      def corr(a: String, b: String) =
        s"""(CAST(n AS DOUBLE) * x_${a}_$b - s_$a * s_$b) /
           | (sqrt(CAST(n AS DOUBLE) * q_$a - s_$a * s_$a) *
           |  sqrt(CAST(n AS DOUBLE) * q_$b - s_$b * s_$b))""".stripMargin.replace("\n", "")
      val arms = pairs.map { case (a, b, _, _) =>
        s"SELECT l_returnflag, n, '${a}_$b' AS pair, ${corr(a, b)} AS corr FROM m"
      }
      s"""WITH m AS (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |         ${(sums ++ squares ++ crosses).mkString(",\n         ")}
         |  FROM lineitem GROUP BY l_returnflag)
         |${arms.mkString("\nUNION ALL\n")}
         |ORDER BY l_returnflag, pair""".stripMargin
    },
    "attribution_report" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us, value
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS t_user_id, epoch_ns(ts)//1000 AS t_ts_us,
        |             max(event_type) AS t_type
        |      FROM events WHERE event_type <> 'purchase'
        |      GROUP BY user_id, epoch_ns(ts)//1000)
        |SELECT COALESCE(t_type, 'none') AS touch,
        |       CAST(count(*) AS BIGINT) AS n_purchases,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM p ASOF LEFT JOIN t
        |  ON p.user_id = t.t_user_id AND p.ts_us >= t.t_ts_us
        |GROUP BY COALESCE(t_type, 'none')
        |ORDER BY touch""".stripMargin,
    "topk_sort" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 10""".stripMargin,
    "grouped_topk" ->
      """SELECT user_id, CAST(rnk AS INTEGER) AS rnk, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY value DESC, event_id) AS rnk
        |  FROM events WHERE event_type = 'purchase') t
        |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin,
    "revenue_share" ->
      """WITH per AS (SELECT l_returnflag,
        |                    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rd
        |             FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(rd) AS td FROM per)
        |SELECT l_returnflag, CAST(rd AS DOUBLE) AS revenue,
        |       CAST(rd AS DOUBLE) / CAST(td AS DOUBLE) AS share
        |FROM per, tot ORDER BY l_returnflag""".stripMargin,
    "json_field_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |         AS sum_k,
        |       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |         AS min_k,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |         AS max_k
        |FROM events
        |WHERE length(props) >= 5 AND substr(props, 1, 1) = '{'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "set_ops_all" ->
      """SELECT 'intersect_all' AS op, user_id, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT user_id FROM events WHERE event_type = 'purchase'
        |      INTERSECT ALL
        |      SELECT user_id FROM events WHERE event_type = 'view') t
        |GROUP BY user_id
        |UNION ALL
        |SELECT 'except_all' AS op, user_id, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT user_id FROM events WHERE event_type = 'purchase'
        |      EXCEPT ALL
        |      SELECT user_id FROM events WHERE event_type = 'view') t
        |GROUP BY user_id
        |ORDER BY op, user_id""".stripMargin,
    "set_ops" ->
      """SELECT user_id, 'both' AS status FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'view')
        |UNION ALL
        |SELECT user_id, 'purchase_only' AS status FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'view')
        |UNION ALL
        |SELECT user_id, 'view_only' AS status FROM (
        |  SELECT user_id FROM events WHERE event_type = 'view'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY status, user_id""".stripMargin,
    "distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "distinct_users_approx" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(DISTINCT event_id) AS n_events_distinct,
        |       true AS users_within_band, true AS events_within_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "rollup_report" ->
      """SELECT event_type, d, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT event_type, CAST(ts AS DATE) AS d, value FROM events)
        |GROUP BY ROLLUP(event_type, d)
        |ORDER BY event_type NULLS FIRST, d NULLS FIRST""".stripMargin,
    "cube_report" ->
      """SELECT event_type, weekday, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT event_type,
        |             CAST(dayofweek(ts) + 1 AS INTEGER) AS weekday, value
        |      FROM events)
        |GROUP BY CUBE(event_type, weekday)
        |ORDER BY event_type NULLS FIRST, weekday NULLS FIRST""".stripMargin,
    "pivot_report" ->
      """SELECT CAST(ts AS DATE) AS d,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY 1 ORDER BY d""".stripMargin,
    "vocab_topk" ->
      """SELECT t AS token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |GROUP BY t ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "quantile_report" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS q25,
        |       quantile_cont(l_quantity, 0.5) AS q50,
        |       quantile_cont(l_quantity, 0.75) AS q75,
        |       min(l_quantity) AS q_min, max(l_quantity) AS q_max,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "loglin_quantiles" ->
      """WITH v AS (SELECT l_returnflag,
        |             greatest(CAST(floor(l_extendedprice * 100) AS BIGINT), 1)
        |               AS v FROM lineitem),
        |b AS (SELECT l_returnflag, v, CAST(length(bin(v)) - 1 AS BIGINT) AS e,
        |        greatest(CAST(length(bin(v)) - 1 - 3 AS BIGINT), 0) AS sh
        |      FROM v),
        |h AS (SELECT l_returnflag, e * 16 + (v >> sh) AS bucket,
        |        (v >> sh) << sh AS lo_cents,
        |        (((v >> sh) + 1) << sh) - 1 AS hi_cents,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM b GROUP BY 1, 2, 3, 4),
        |c AS (SELECT *,
        |        CAST(sum(n) OVER (PARTITION BY l_returnflag ORDER BY bucket)
        |             AS BIGINT) AS cum_n,
        |        CAST(sum(n) OVER (PARTITION BY l_returnflag) AS BIGINT)
        |          AS total_n
        |      FROM h),
        |q AS (SELECT c.*, CAST(q_pct AS BIGINT) AS q_pct
        |      FROM c, (SELECT unnest([50, 95, 99]) AS q_pct) qq
        |      WHERE cum_n >= (q_pct * total_n + 99) // 100),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag, q_pct
        |        ORDER BY bucket) AS rnk FROM q)
        |SELECT l_returnflag, q_pct, bucket, lo_cents, hi_cents,
        |       n AS bucket_n, cum_n, total_n
        |FROM r WHERE rnk = 1 ORDER BY l_returnflag, q_pct""".stripMargin,
    "scd2_build" ->
      """WITH e AS (SELECT user_id, event_type AS state,
        |             epoch_ns(ts) // 1000 AS ts_us, event_id FROM events)
        |SELECT user_id, CAST(row_number() OVER w AS INT) AS version, state,
        |       ts_us AS valid_from_us,
        |       lead(ts_us) OVER w - 1 AS valid_to_us,
        |       lead(ts_us) OVER w IS NULL AS is_current,
        |       event_id
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "scd2_slice" ->
      """WITH e AS (SELECT user_id, event_type AS state,
        |             epoch_ns(ts) // 1000 AS ts_us, event_id FROM events),
        |v AS (SELECT user_id, CAST(row_number() OVER w AS INT) AS version, state,
        |        ts_us AS valid_from_us,
        |        lead(ts_us) OVER w - 1 AS valid_to_us, event_id
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |t AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS t_us FROM e)
        |SELECT user_id, version, state, valid_from_us, event_id
        |FROM v, t
        |WHERE valid_from_us <= t_us AND (valid_to_us IS NULL OR t_us <= valid_to_us)
        |ORDER BY user_id""".stripMargin,
    "anomaly_zscore" ->
      """WITH s AS (SELECT event_type,
        |             CAST(count(*) AS BIGINT) AS n,
        |             CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
        |                  AS VARCHAR) AS DOUBLE) AS sv,
        |             CAST(CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
        |                    * CAST(value AS DECIMAL(18,2)) AS DECIMAL(30,4)))
        |                  AS VARCHAR) AS DOUBLE) AS svv
        |           FROM events GROUP BY event_type),
        |m AS (SELECT event_type, sv / CAST(n AS DOUBLE) AS mean,
        |        sqrt((svv - sv * sv / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
        |          AS std
        |      FROM s)
        |SELECT e.event_type, e.event_id, e.value, m.mean, m.std,
        |       (e.value - m.mean) / m.std AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE abs((e.value - m.mean) / m.std) > 3.0
        |ORDER BY e.event_id""".stripMargin,
    // Counts are integers so Σn/Σn² are exact longs; mean/σ/z are single
    // correctly-rounded IEEE expressions — boundary-exact without quantizing
    "burst_detection" ->
      """WITH c AS (SELECT event_type,
        |             (epoch_ns(ts)//1000) // 3600000000 AS hr FROM events),
        |h AS (SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n
        |      FROM c GROUP BY event_type, hr),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
        |        CAST(sum(n) AS BIGINT) AS sv,
        |        CAST(sum(n * n) AS BIGINT) AS svv
        |      FROM h GROUP BY event_type),
        |z AS (SELECT h.event_type, h.hr, h.n,
        |        CAST(s.sv AS DOUBLE) / s.n_hours AS mean,
        |        sqrt((CAST(s.svv AS DOUBLE)
        |              - CAST(s.sv AS DOUBLE) * s.sv / s.n_hours) / s.n_hours)
        |          AS std
        |      FROM h JOIN s USING (event_type))
        |SELECT event_type, hr, n, mean, std, (n - mean) / std AS z
        |FROM z WHERE abs((n - mean) / std) > 2.5
        |ORDER BY event_type, hr""".stripMargin,
    // Per-event decay terms quantized to 2^-20 before the integer sum —
    // order-free, and libm exp's 1-ulp cross-engine divergence is absorbed
    "decayed_counts" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events),
        |a AS (SELECT CAST(max(us) AS BIGINT) AS t_max FROM ev)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(floor(exp(CAST(ev.us - a.t_max AS DOUBLE) / 3.6e9)
        |                * 1048576.0 + 0.5) AS BIGINT)) AS BIGINT) AS decayed_u20
        |FROM ev, a GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Discrete medians (rank ⌈n/2⌉ in the (value, event_id) total order) —
    // interpolated median arithmetic differs between engines, a picked
    // data element cannot. The outlier test is division-free on both
    // sides: 0.6745·dev > 3.5·MAD, pure IEEE multiply/compare.
    "mad_outliers" ->
      """WITH ev AS (SELECT event_type, event_id, value FROM events),
        |r AS (SELECT event_type, event_id, value,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY value, event_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n
        |      FROM ev),
        |med AS (SELECT event_type, value AS med
        |        FROM r WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)),
        |dv AS (SELECT ev.event_type, ev.event_id, med.med,
        |              abs(ev.value - med.med) AS dev
        |       FROM ev JOIN med USING (event_type)),
        |r2 AS (SELECT event_type, event_id, dev,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY dev, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |       FROM dv),
        |mad AS (SELECT event_type, dev AS mad
        |        FROM r2 WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT))
        |SELECT dv.event_type, CAST(count(*) AS BIGINT) AS n,
        |       min(dv.med) AS med, min(mad.mad) AS mad,
        |       CAST(sum(CASE WHEN CAST(0.6745 AS DOUBLE) * dv.dev
        |                          > CAST(3.5 AS DOUBLE) * mad.mad
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dv JOIN mad USING (event_type)
        |GROUP BY dv.event_type ORDER BY dv.event_type""".stripMargin,
    "data_profile" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us,
        |                  event_type FROM events),
        |p AS (SELECT user_id AS p_user_id, epoch_ns(ts)//1000 AS p_ts_us,
        |             event_id AS p_event_id, value AS p_value
        |      FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT e.event_id, e.user_id, e.ts_us, e.event_type,
        |             p.p_event_id, p.p_ts_us, p.p_value
        |      FROM e ASOF LEFT JOIN p
        |        ON e.user_id = p.p_user_id AND e.ts_us >= p.p_ts_us),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM a),
        |u AS (
        |  SELECT 'event_id' AS column_name, CAST(count(event_id) AS BIGINT) AS nn,
        |         CAST(count(DISTINCT event_id) AS BIGINT) AS nd FROM a
        |  UNION ALL SELECT 'user_id', CAST(count(user_id) AS BIGINT),
        |         CAST(count(DISTINCT user_id) AS BIGINT) FROM a
        |  UNION ALL SELECT 'ts_us', CAST(count(ts_us) AS BIGINT),
        |         CAST(count(DISTINCT ts_us) AS BIGINT) FROM a
        |  UNION ALL SELECT 'event_type', CAST(count(event_type) AS BIGINT),
        |         CAST(count(DISTINCT event_type) AS BIGINT) FROM a
        |  UNION ALL SELECT 'p_event_id', CAST(count(p_event_id) AS BIGINT),
        |         CAST(count(DISTINCT p_event_id) AS BIGINT) FROM a
        |  UNION ALL SELECT 'p_ts_us', CAST(count(p_ts_us) AS BIGINT),
        |         CAST(count(DISTINCT p_ts_us) AS BIGINT) FROM a
        |  UNION ALL SELECT 'p_value', CAST(count(p_value) AS BIGINT),
        |         CAST(count(DISTINCT p_value) AS BIGINT) FROM a)
        |SELECT u.column_name, t.n_rows, t.n_rows - u.nn AS n_null,
        |       u.nd AS n_distinct,
        |       CAST(u.nn AS DOUBLE) / CAST(t.n_rows AS DOUBLE) AS completeness
        |FROM u, t ORDER BY u.column_name""".stripMargin,
    "skew_profile" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY user_id),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
        |SELECT user_id, n, n / CAST(tot AS DOUBLE) AS share
        |FROM c, t ORDER BY n DESC, user_id LIMIT 16""".stripMargin,
    "range_join" ->
      """WITH b AS (SELECT user_id, event_id, event_type,
        |                  epoch_ns(ts)//1000 AS t, value FROM events),
        |p AS (SELECT user_id AS p_user, event_id AS p_event_id, t AS p_t
        |      FROM b WHERE event_type = 'purchase')
        |SELECT p.p_event_id, p.p_user, count(*) AS n_follow,
        |       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS follow_value
        |FROM p JOIN b e ON p.p_user = e.user_id
        |  AND e.t > p.p_t AND e.t <= p.p_t + 3600000000
        |GROUP BY 1, 2 ORDER BY p_event_id""".stripMargin,
    "kmv_distinct" ->
      """WITH h AS (SELECT event_type,
        |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) AS h
        |  FROM events),
        |s AS (SELECT event_type, list_sort(list(DISTINCT h))[1:8] AS kmv,
        |             count(*) AS n_events FROM h GROUP BY event_type)
        |SELECT event_type, array_to_string(kmv, ',') AS kmv_csv,
        |  CASE WHEN len(kmv) < 8 THEN CAST(len(kmv) AS DOUBLE)
        |       ELSE 8070450532247928832.0 / CAST(kmv[8] AS DOUBLE) END AS est_users,
        |  n_events
        |FROM s ORDER BY event_type""".stripMargin,
    "salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "dedup" ->
      """SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS ts_us FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_ns(ts) // 1000, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    // KMV set algebra: the k=64 sketches replayed bit-exactly (same md5
    // 60-bit hash as kmv_distinct), combined with the standard union/
    // Jaccard/intersection estimators, next to the exact answers
    "kmv_set_ops" ->
      """WITH h AS (SELECT event_type,
        |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) AS h
        |  FROM events),
        |s AS (SELECT event_type, list_sort(list(DISTINCT h))[1:64] AS kmv
        |      FROM h GROUP BY event_type),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |             a.kmv AS ka, b.kmv AS kb
        |      FROM s a JOIN s b ON a.event_type < b.event_type),
        |u AS (SELECT type_a, type_b, ka, kb,
        |        list_sort(list_distinct(list_concat(ka, kb)))[1:64] AS un FROM p),
        |m AS (SELECT type_a, type_b, len(un) AS ul,
        |        len(list_filter(un,
        |          x -> list_contains(ka, x) AND list_contains(kb, x))) AS ov,
        |        CASE WHEN len(un) < 64 THEN CAST(len(un) AS DOUBLE)
        |             ELSE 72634054790231359488.0 / CAST(un[64] AS DOUBLE)
        |        END AS union_est
        |      FROM u),
        |ue AS (SELECT DISTINCT event_type, user_id FROM events),
        |cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |        FROM ue GROUP BY event_type),
        |ex AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |         CAST(count(*) AS BIGINT) AS exact_inter
        |       FROM ue x JOIN ue y
        |         ON x.user_id = y.user_id AND x.event_type < y.event_type
        |       GROUP BY 1, 2)
        |SELECT m.type_a, m.type_b,
        |  ca.n + cb.n - COALESCE(ex.exact_inter, 0) AS exact_union,
        |  COALESCE(ex.exact_inter, 0) AS exact_inter,
        |  m.union_est,
        |  CAST(m.ov AS DOUBLE) / m.ul AS jaccard_est,
        |  (CAST(m.ov AS DOUBLE) / m.ul) * m.union_est AS inter_est
        |FROM m JOIN cnt ca ON ca.event_type = m.type_a
        |       JOIN cnt cb ON cb.event_type = m.type_b
        |       LEFT JOIN ex ON ex.type_a = m.type_a AND ex.type_b = m.type_b
        |ORDER BY m.type_a, m.type_b""".stripMargin,
    // ACF of daily revenue: whole-dollar series centered on the integer
    // floor-mean, exact DECIMAL moment sums, one double division per lag
    "autocorr_daily" ->
      """WITH o AS (SELECT epoch_ns(o_orderdate)//1000 // 86400000000 AS day,
        |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |           FROM orders),
        |pd AS (SELECT day, CAST(sum(cents) AS BIGINT) // 100 AS x
        |       FROM o GROUP BY day),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(x) AS BIGINT) AS s FROM pd),
        |cen AS (SELECT day, n, CAST(x - (s // n) AS DECIMAL(18,0)) AS d
        |        FROM pd, tot),
        |ld AS (SELECT n, d,
        |         lead(d, 1) OVER (ORDER BY day) AS d1,
        |         lead(d, 2) OVER (ORDER BY day) AS d2,
        |         lead(d, 3) OVER (ORDER BY day) AS d3,
        |         lead(d, 4) OVER (ORDER BY day) AS d4,
        |         lead(d, 5) OVER (ORDER BY day) AS d5,
        |         lead(d, 6) OVER (ORDER BY day) AS d6,
        |         lead(d, 7) OVER (ORDER BY day) AS d7
        |       FROM cen),
        |st AS (SELECT max(n) AS n, sum(d*d) AS den,
        |         sum(d*d1) AS num1, sum(d*d2) AS num2, sum(d*d3) AS num3,
        |         sum(d*d4) AS num4, sum(d*d5) AS num5, sum(d*d6) AS num6,
        |         sum(d*d7) AS num7
        |       FROM ld),
        |l AS (SELECT unnest([1,2,3,4,5,6,7]) AS lag)
        |SELECT l.lag, st.n - l.lag AS n_pairs,
        |  CASE WHEN st.den = 0 THEN 0.0
        |       ELSE CAST(CASE l.lag WHEN 1 THEN num1 WHEN 2 THEN num2
        |                 WHEN 3 THEN num3 WHEN 4 THEN num4 WHEN 5 THEN num5
        |                 WHEN 6 THEN num6 ELSE num7 END AS DOUBLE)
        |            / CAST(st.den AS DOUBLE)
        |  END AS acf
        |FROM l, st ORDER BY lag""".stripMargin,
    // first-order Markov chain over per-user event sequences; probability
    // is an exact integer ratio cast to double
    "markov_transitions" ->
      """WITH seq AS (SELECT event_type AS from_type,
        |        lead(event_type, 1) OVER (PARTITION BY user_id
        |          ORDER BY epoch_ns(ts) // 1000, event_id) AS to_type
        |      FROM events),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, to_type, n,
        |        CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from
        |      FROM c)
        |SELECT from_type, to_type, n, n_from,
        |       CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS prob
        |FROM f ORDER BY from_type, to_type""".stripMargin,
    // format_roundtrip: the engine writes+reads JSONL/CSV copies and
    // reconciles; the oracle states the reconciliation target (parquet
    // truth, both format checks expected green)
    "format_roundtrip" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       true AS json_ok, true AS csv_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // TPC-H Q19 shape: disjunctive (brand, size, quantity) brackets;
    // brand-disjoint so the CASE order is immaterial
    "bracket_revenue" ->
      """WITH j AS (SELECT
        |    CASE WHEN p_brand IN ('Brand#1','Brand#2','Brand#3')
        |           AND p_size <= 10 AND l_quantity <= 15 THEN 'small'
        |         WHEN p_brand IN ('Brand#11','Brand#12','Brand#13')
        |           AND p_size BETWEEN 11 AND 30
        |           AND l_quantity BETWEEN 10 AND 30 THEN 'medium'
        |         WHEN p_brand IN ('Brand#21','Brand#22','Brand#23')
        |           AND p_size BETWEEN 25 AND 50
        |           AND l_quantity BETWEEN 25 AND 50 THEN 'large'
        |    END AS bracket,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT bracket, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(rev) AS DOUBLE) AS revenue
        |FROM j WHERE bracket IS NOT NULL
        |GROUP BY bracket ORDER BY bracket""".stripMargin,
    // yearly acquisition cohorts x age with the cumulative LTV curve;
    // exact integer cents, one double division at the edge
    "cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
        |             CAST(year(o_orderdate) AS INTEGER) AS yr,
        |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |           FROM orders),
        |f AS (SELECT o_custkey, min(yr) AS cohort_year FROM o GROUP BY o_custkey),
        |g AS (SELECT cohort_year, yr - cohort_year AS age,
        |        CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
        |        CAST(sum(cents) AS BIGINT) AS cents
        |      FROM o JOIN f ON o.o_custkey = f.o_custkey
        |      GROUP BY cohort_year, yr - cohort_year)
        |SELECT cohort_year, age, n_active,
        |       CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       CAST(CAST(sum(cents) OVER (PARTITION BY cohort_year ORDER BY age
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS DOUBLE) / 100.0 AS cum_revenue
        |FROM g ORDER BY cohort_year, age""".stripMargin,
    // csv_malformed_audit: the engine corrupts value on event_id % 7 = 0,
    // writes CSV, reads PERMISSIVE; the oracle replays the mod-7 rule
    "csv_malformed_audit" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN event_id % 7 <> 0 THEN 1 END) AS BIGINT)
        |    AS n_good,
        |  CAST(count(CASE WHEN event_id % 7 = 0 THEN 1 END) AS BIGINT)
        |    AS n_quarantined
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
