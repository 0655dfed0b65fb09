package graft

import graft.intel.IntelDb
import graft.pipeline.{Fixtures, ScanJob}
import graft.queries.{OracleDefs, QueryDefs}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one `queries` entry per operator family from
  * SURVEY.md §2 (+ the training-data ops), each with a DuckDB oracle in
  * `oracleSql`. Column names are aligned between the Spark queries and the
  * oracle SQL (the driver compares by sorted column name).
  */
object SparkEntry {

  /** Flagship: the full IoC scan pipeline (extract -> enrich -> match) over
    * the deterministic transcript fixture, enriched against two intel
    * databases. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val turns = spark.createDataFrame(Fixtures.turns(2000))
    val dbs = Seq(
      IntelDb.build("threats", Fixtures.intelThreats),
      IntelDb.build("allowlist", Fixtures.intelAllowlist))
    ScanJob.matched(turns, dbs, spark)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E1-E8 extraction (SURVEY.md §2.2)
    "q01_extract_ipv4" -> (QueryDefs.qExtractIpv4 _),
    "q02_extract_ipv6" -> (QueryDefs.qExtractIpv6 _),
    "q03_extract_domain" -> (QueryDefs.qExtractDomain _),
    "q04_extract_email" -> (QueryDefs.qExtractEmail _),
    "q05_extract_hashes" -> (QueryDefs.qExtractHashes _),
    "q06_extract_bitcoin" -> (QueryDefs.qExtractBitcoin _),
    "q07_extract_ethereum" -> (QueryDefs.qExtractEthereum _),
    "q08_extract_monero" -> (QueryDefs.qExtractMonero _),
    // intel build/classify (§1.4, §3.3)
    "q09_intel_classify" -> (QueryDefs.qIntelClassify _),
    // lookups (§2.3)
    "q10_lookup_literal" -> (QueryDefs.qLookupLiteral _),
    "q11_lookup_lpm" -> (QueryDefs.qLookupLpm _),
    "q12_lookup_glob" -> (QueryDefs.qLookupGlob _),
    "q13_lookup_multidb" -> (QueryDefs.qLookupMultiDb _),
    // e2e match + routing + stats (§2.4-2.6)
    "q14_match_gold" -> (QueryDefs.qMatchGold _),
    "q15_route_counts" -> (QueryDefs.qRouteCounts _),
    "q16_scan_stats" -> (QueryDefs.qScanStats _),
    // dedup family (training-data ops)
    "q17_dedup_exact" -> (QueryDefs.qDedupExact _),
    "q18_dedup_minhash" -> (QueryDefs.qDedupMinhash _),
    "q19_dedup_simhash" -> (QueryDefs.qDedupSimhash _),
    "q20_dedup_ngram" -> (QueryDefs.qDedupNgram _),
    "q21_dedup_embedding" -> (QueryDefs.qDedupEmbedding _),
    // similarity search
    "q22_sim_topk" -> (QueryDefs.qSimTopk _),
    "q23_sim_lsh" -> (QueryDefs.qSimLsh _),
    // text analysis
    "q24_text_lang" -> (QueryDefs.qTextLang _),
    "q25_text_quality" -> (QueryDefs.qTextQuality _),
    "q26_text_fingerprint" -> (QueryDefs.qTextFingerprint _),
    // relational/core engine
    "q27_tpch_agg" -> (QueryDefs.qTpchAgg _),
    "q28_join_broadcast" -> (QueryDefs.qJoinBroadcast _),
    "q29_window_first_order" -> (QueryDefs.qWindowFirstOrder _),
    "q30_events_hourly" -> (QueryDefs.qEventsHourly _),
    // skew-hardened variants (round 2)
    "q31_dedup_ngram_capped" -> (QueryDefs.qDedupNgramCapped _),
    "q32_sim_lsh_multi" -> (QueryDefs.qSimLshMulti _),
    "q33_dedup_embedding_lsh" -> (QueryDefs.qDedupEmbeddingLsh _),
    "q34_lookup_case" -> (QueryDefs.qLookupCase _),
    "q35_dedup_simhash_near" -> (QueryDefs.qDedupSimhashNear _),
    "q36_match_gold_prescreen" -> (QueryDefs.qMatchGoldPrescreen _),
    "q37_text_tokens" -> (QueryDefs.qTextTokens _),
    // band-bucket skew guards (round 3): identical-doc flood, bounded pairs
    "q38_dedup_minhash_capped" -> (QueryDefs.qDedupMinhashCapped _),
    "q39_dedup_simhash_capped" -> (QueryDefs.qDedupSimhashCapped _),
    // IVF ANN (round 3): the inverted-file scale path next to LSH
    "q40_sim_ivf" -> (QueryDefs.qSimIvf _),
    // connected-components dedup clustering (round 3)
    "q41_dedup_clusters" -> (QueryDefs.qDedupClusters _),
    // Gopher-style keep/drop quality filter (round 3)
    "q42_text_quality_filter" -> (QueryDefs.qTextQualityFilter _),
    // dynamic per-entry metadata passthrough (round 4)
    "q43_lookup_extras" -> (QueryDefs.qLookupExtras _),
    // IVF with seeded Lloyd centroid refinement (round 4)
    "q44_sim_ivf_lloyd" -> (QueryDefs.qSimIvfLloyd _),
    // IoC/PII redaction expression (round 4)
    "q45_redact" -> (QueryDefs.qRedact _),
    // defang normalization + extraction (round 4)
    "q46_extract_defanged" -> (QueryDefs.qExtractDefanged _),
    // benchmark decontamination by shared word n-grams (round 4)
    "q47_decontaminate" -> (QueryDefs.qDecontaminate _),
    // Gopher repetition rules: dup-line fractions + top word-2-gram (round 4)
    "q48_text_repetition" -> (QueryDefs.qTextRepetition _),
    // conversation-level rollups over the transcript table (round 4)
    "q49_conv_stats" -> (QueryDefs.qConvStats _),
    "q50_conv_dedup" -> (QueryDefs.qConvDedup _),
    // SemDeDup: semantic near-dup pruning inside k-means clusters (round 4)
    "q51_sem_dedup" -> (QueryDefs.qSemDedup _),
    "q52_curate" -> (QueryDefs.qCurate _),
    "q53_split" -> (QueryDefs.qSplit _),
    "q54_sample" -> (QueryDefs.qSample _),
    // conversation→curation bridge: transcript reconstruction feeding the
    // composed curation audit (round 5)
    "q55_conv_curate" -> (QueryDefs.qConvCurate _),
    // JSON-feed per-VALUE DataValue typing through the lookup flow (round 5)
    "q56_lookup_extras_json" -> (QueryDefs.qLookupExtrasJson _),
    // ExactSubstr duplicate-span statistics (round 5): the verbatim-run
    // half of the dedup family, distributed via positional n-gram windows
    "q57_dedup_substr" -> (QueryDefs.qDedupSubstr _),
    // deterministic per-key quota cap under skew: domain balancing (round 5)
    "q58_sample_cap_key" -> (QueryDefs.qSampleCapKey _),
    // corpus-level line dedup: boilerplate removal + ordered reassembly
    // (round 5)
    "q59_text_line_dedup" -> (QueryDefs.qTextLineDedup _),
    // gap-based batch sessionization of the telemetry table (round 5)
    "q60_sessionize" -> (QueryDefs.qSessionize _),
    // nearest-rank percentiles per group: the SLA rollup (round 5)
    "q61_percentiles" -> (QueryDefs.qPercentiles _),
    // sliding-window event rates: the overlapping-window telemetry rollup
    // (round 5)
    "q62_sliding_rates" -> (QueryDefs.qSlidingRates _),
    // MAD-based robust anomaly flags per event type (round 5)
    "q63_anomaly_mad" -> (QueryDefs.qAnomalyMad _),
    // TF-IDF distinctive terms per document (round 5)
    "q64_tfidf_terms" -> (QueryDefs.qTfidfTerms _),
    // grok-parse of a structured-log stream + dead-letter rollup (round 5)
    "q65_grok_parse" -> (QueryDefs.qGrokParse _),
    // stratified per-language downsample: the training-mix rebalance
    // (round 5)
    "q66_stratified_sample" -> (QueryDefs.qStratifiedSample _),
    // the composed parse -> enrich -> route -> aggregate bridge over
    // structured logs (round 5)
    "q67_grok_enrich" -> (QueryDefs.qGrokEnrich _),
    // greedy ordered-funnel conversion counts (round 5)
    "q68_funnel" -> (QueryDefs.qFunnel _),
    // cohort retention matrix over integer weeks (round 5)
    "q69_retention" -> (QueryDefs.qRetention _),
    // importance-weighted downsample: the data-mixing sampler (round 5)
    "q70_weighted_sample" -> (QueryDefs.qWeightedSample _),
    // as-of join: temporal state enrichment, one-shuffle union+window
    // form (round 5)
    "q71_asof_join" -> (QueryDefs.qAsofJoin _),
    // event-type transition bigrams per user (round 5)
    "q72_transitions" -> (QueryDefs.qTransitions _),
    // expand-free distinct rollup per (event_type, day) (round 5)
    "q73_distinct_rollup" -> (QueryDefs.qDistinctRollup _),
    // top-3 users by cents per event_type, aggregate-then-rank (round 5)
    "q74_topk_per_group" -> (QueryDefs.qTopkPerGroup _),
    // point-in-interval join via time-bucket explode + hash equi-join
    // (round 5)
    "q75_interval_join" -> (QueryDefs.qIntervalJoin _),
    // growth accounting: new vs returning users per day (round 5)
    "q76_growth" -> (QueryDefs.qGrowth _),
    // incident-impact bridge: interval join + as-of tier + rollup
    // (round 5)
    "q77_incident_impact" -> (QueryDefs.qIncidentImpact _),
    // edit-distance-1 fuzzy watchlist join, deletion neighborhoods
    // (round 5)
    "q78_fuzzy_domains" -> (QueryDefs.qFuzzyDomains _),
    // item co-occurrence lift over user-day entities (round 5)
    "q79_cooccurrence" -> (QueryDefs.qCooccurrence _),
    // log template mining: signature partition + wildcard collapse
    // (round 5)
    "q80_log_templates" -> (QueryDefs.qLogTemplates _),
    // campaign clustering: co-occurrence lift edges -> connected
    // components (round 5)
    "q81_campaign_clusters" -> (QueryDefs.qCampaignClusters _),
    // beaconing detection: integer median/MAD gap regularity (round 5)
    "q82_beaconing" -> (QueryDefs.qBeaconing _),
    // indicator timeline + rarity triage over the match stream (round 5)
    "q83_indicator_timeline" -> (QueryDefs.qIndicatorTimeline _),
    // allowlist suppression: negative-db veto of matched values (round 5)
    "q84_suppressed_counts" -> (QueryDefs.qSuppressedCounts _),
    // routed-output reconciliation: order-independent digest folds
    // (round 5)
    "q85_reconcile" -> (QueryDefs.qReconcile _),
    // DGA-suspect lexical scoring: integer feature rules (round 5)
    "q86_dga_score" -> (QueryDefs.qDgaScore _),
    // new-vs-returning indicators per day over the match stream
    // (round 5)
    "q87_indicator_growth" -> (QueryDefs.qIndicatorGrowth _),
    // conversation risk scoring + triage tiers (round 5)
    "q88_conversation_risk" -> (QueryDefs.qConversationRisk _),
    // transcript structural audit: dup indices, role runs, empty turns
    // (round 5)
    "q89_conv_audit" -> (QueryDefs.qConvAudit _),
    // first-fit sequence packing into token-budget bins (round 5)
    "q90_pack_docs" -> (QueryDefs.qPackDocs _),
    // context-window truncation: newest turns within budget (round 5)
    "q91_conv_truncate" -> (QueryDefs.qConvTruncate _),
    // leet-skeleton typosquat matching against a watchlist (round 5)
    "q92_confusables" -> (QueryDefs.qConfusables _),
    // Page's CUSUM drift detection over daily count series (round 5)
    "q93_drift_cusum" -> (QueryDefs.qDriftCusum _),
    // capped inverted index: term -> df + posting prefix (round 5)
    "q94_inverted_index" -> (QueryDefs.qInvertedIndex _),
    // exact heavy hitters via bounded-state candidates (round 5)
    "q95_heavy_hitters" -> (QueryDefs.qHeavyHitters _),
    // sliding token-window chunking (round 5)
    "q96_chunk_docs" -> (QueryDefs.qChunkDocs _),
    // per-source token-budget quota (round 5)
    "q97_budget_per_source" -> (QueryDefs.qBudgetPerSource _),
    // exact prefix-filter Jaccard set-similarity join (round 5)
    "q98_set_join" -> (QueryDefs.qSetJoin _),
    // BPE merge-pair counts: tokenizer-training stats (round 5)
    "q99_bpe_merges" -> (QueryDefs.qBpeMerges _),
    // text normalization: control strip + whitespace normal form (round 5)
    "q100_text_clean" -> (QueryDefs.qTextClean _),
    // bounded-state exact quantiles: two-pass bucket refinement (round 5)
    "q101_quantiles_bucketed" -> (QueryDefs.qQuantiles _),
    // exact triangle count via degree-ordered orientation (round 5)
    "q102_triangles" -> (QueryDefs.qTriangles _),
    // salted skew join: result-invariant hot-key splitting (round 5)
    "q103_skew_join" -> (QueryDefs.qSkewJoin _),
    // URL canonicalization: explicit-grammar normalizer (round 5)
    "q104_url_normalize" -> (QueryDefs.qUrlNormalize _),
    // Z-order interleave keys: the multi-dim layout primitive (round 5)
    "q105_zorder" -> (QueryDefs.qZorder _),
    // hierarchical rollup: every prefix granularity in one pass (round 5)
    "q106_rollup_hierarchy" -> (QueryDefs.qRollupHierarchy _),
    // co-bucketed catalog-table join: zero-exchange layout (round 5)
    "q107_bucketed_join" -> (QueryDefs.qBucketedJoin _),
    // algebraic partial-aggregate merge: incremental rollups (round 5)
    "q108_merge_partials" -> (QueryDefs.qMergePartials _),
    // single-pass per-column table profile (round 5)
    "q109_profile" -> (QueryDefs.qProfile _),
    // per-key interval union via the running-max sweep (round 5)
    "q110_merge_intervals" -> (QueryDefs.qMergeIntervals _),
    // exact-k proportional allocation via largest remainder (round 5)
    "q111_allocate_proportional" -> (QueryDefs.qAllocateProportional _),
    // keyed snapshot diff with per-column attribution (round 5)
    "q112_snapshot_diff" -> (QueryDefs.qSnapshotDiff _),
    // deterministic pseudonymization + collision accounting (round 5)
    "q113_anonymize" -> (QueryDefs.qAnonymize _),
    // equi-depth range-partition boundaries (round 5)
    "q114_range_boundaries" -> (QueryDefs.qRangeBoundaries _),
    // trailing-window exact distinct actors, dedup-before-expand (round 5)
    "q115_rolling_active" -> (QueryDefs.qRollingActive _),
    // zone-map pruning audit across two bucket layouts (round 5)
    "q116_zonemap_audit" -> (QueryDefs.qZoneMapAudit _),
    // equi-depth boundaries applied as shuffle-free range assignment
    "q117_range_assign" -> (QueryDefs.qRangeAssign _),
    // referential-integrity orphan audit at key level (round 5)
    "q118_fk_audit" -> (QueryDefs.qFkAudit _),
    // join-skew diagnosis feeding the saltedJoin parameter (round 5)
    "q119_skew_diagnose" -> (QueryDefs.qSkewDiagnose _),
    // feed-freshness max-gap audit, bucket-bounded sort (round 5)
    "q120_feed_freshness" -> (QueryDefs.qFeedFreshness _),
    // functional-dependency audit (round 5)
    "q121_fd_audit" -> (QueryDefs.qFdAudit _),
    // quality-ranked canonical selection, sort-free argmax (round 5)
    "q122_keep_best" -> (QueryDefs.qKeepBest _),
    // SCD-2 state timeline, bucket-bounded run build + stitch (round 5)
    "q123_state_intervals" -> (QueryDefs.qStateIntervals _),
    // top session journey prefixes over 30-min sessions (round 5)
    "q124_top_paths" -> (QueryDefs.qTopPaths _),
    // TTL retention plan: drop/rewrite/keep bucket verdicts (round 5)
    "q125_ttl_plan" -> (QueryDefs.qTtlPlan _),
    // exact join-size forecast from key histograms (round 5)
    "q126_join_forecast" -> (QueryDefs.qJoinForecast _),
    // quota/throttle admission replay (round 5)
    "q127_throttle_audit" -> (QueryDefs.qThrottleAudit _),
    // diversified top-k with per-group quotas (round 5)
    "q128_diversified_topk" -> (QueryDefs.qDiversifiedTopK _),
    // weighted exact quantiles, bounded-sort two-pass (round 5)
    "q129_weighted_quantiles" -> (QueryDefs.qWeightedQuantiles _),
    // as-of state snapshot over the SCD interval table (round 5)
    "q130_scd_snapshot" -> (QueryDefs.qScdSnapshot _),
    // exact categorical TVD between corpus halves (round 5)
    "q131_dist_compare" -> (QueryDefs.qDistCompare _),
    // vocabulary coverage / OOV audit per lang (round 5)
    "q132_oov_rate" -> (QueryDefs.qOovRate _),
    // per-user consecutive-day activity streaks (round 5)
    "q133_streaks" -> (QueryDefs.qStreaks _),
    // day-of-week seasonality deviation (round 5)
    "q134_dow_deviation" -> (QueryDefs.qDowDeviation _),
    // asymmetric containment join, lossless prefix filter (round 5)
    "q135_containment" -> (QueryDefs.qContainment _),
    // exact Gini actor-concentration audit (round 5)
    "q136_concentration" -> (QueryDefs.qConcentration _)
  )

  def oracleSql: Map[String, String] = Map(
    "q01_extract_ipv4" -> OracleDefs.extractIpv4,
    "q02_extract_ipv6" -> OracleDefs.extractIpv6,
    "q03_extract_domain" -> OracleDefs.extractDomain,
    "q04_extract_email" -> OracleDefs.extractEmail,
    "q05_extract_hashes" -> OracleDefs.extractHashes,
    "q06_extract_bitcoin" -> OracleDefs.extractBitcoin,
    "q07_extract_ethereum" -> OracleDefs.extractEthereum,
    "q08_extract_monero" -> OracleDefs.extractMonero,
    "q09_intel_classify" -> OracleDefs.intelClassify,
    "q10_lookup_literal" -> OracleDefs.lookupLiteral,
    "q11_lookup_lpm" -> OracleDefs.lookupLpm,
    "q12_lookup_glob" -> OracleDefs.lookupGlob,
    "q13_lookup_multidb" -> OracleDefs.lookupMultiDb,
    "q14_match_gold" -> OracleDefs.matchGold,
    "q15_route_counts" -> OracleDefs.routeCounts,
    "q16_scan_stats" -> OracleDefs.scanStats,
    "q17_dedup_exact" -> OracleDefs.dedupExact,
    "q18_dedup_minhash" -> OracleDefs.dedupMinhash,
    "q19_dedup_simhash" -> OracleDefs.dedupSimhash,
    "q20_dedup_ngram" -> OracleDefs.dedupNgram,
    "q21_dedup_embedding" -> OracleDefs.dedupEmbedding,
    "q22_sim_topk" -> OracleDefs.simTopk,
    "q23_sim_lsh" -> OracleDefs.simLsh,
    "q24_text_lang" -> OracleDefs.textLang,
    "q25_text_quality" -> OracleDefs.textQuality,
    "q26_text_fingerprint" -> OracleDefs.textFingerprint,
    "q27_tpch_agg" -> OracleDefs.tpchAgg,
    "q28_join_broadcast" -> OracleDefs.joinBroadcast,
    "q29_window_first_order" -> OracleDefs.windowFirstOrder,
    "q30_events_hourly" -> OracleDefs.eventsHourly,
    "q31_dedup_ngram_capped" -> OracleDefs.dedupNgramCapped,
    "q32_sim_lsh_multi" -> OracleDefs.simLshMulti,
    "q33_dedup_embedding_lsh" -> OracleDefs.dedupEmbeddingLsh,
    "q34_lookup_case" -> OracleDefs.lookupCase,
    "q35_dedup_simhash_near" -> OracleDefs.dedupSimhashNear,
    "q36_match_gold_prescreen" -> OracleDefs.matchGold,
    "q37_text_tokens" -> OracleDefs.textTokens,
    "q38_dedup_minhash_capped" -> OracleDefs.dedupMinhashCapped,
    "q39_dedup_simhash_capped" -> OracleDefs.dedupSimhashCapped,
    "q40_sim_ivf" -> OracleDefs.simIvf,
    "q41_dedup_clusters" -> OracleDefs.dedupClusters,
    "q42_text_quality_filter" -> OracleDefs.textQualityFilter,
    "q43_lookup_extras" -> OracleDefs.lookupExtras,
    "q44_sim_ivf_lloyd" -> OracleDefs.simIvfLloyd,
    "q45_redact" -> OracleDefs.redactIocs,
    "q46_extract_defanged" -> OracleDefs.extractDefanged,
    "q47_decontaminate" -> OracleDefs.decontaminate,
    "q48_text_repetition" -> OracleDefs.textRepetition,
    "q49_conv_stats" -> OracleDefs.convStats,
    "q50_conv_dedup" -> OracleDefs.convDedup,
    "q51_sem_dedup" -> OracleDefs.semDedup,
    "q52_curate" -> OracleDefs.curate,
    "q53_split" -> OracleDefs.split,
    "q54_sample" -> OracleDefs.sample,
    "q55_conv_curate" -> OracleDefs.convCurate,
    "q56_lookup_extras_json" -> OracleDefs.lookupExtrasJson,
    "q57_dedup_substr" -> OracleDefs.dedupSubstr,
    "q58_sample_cap_key" -> OracleDefs.sampleCapKey,
    "q59_text_line_dedup" -> OracleDefs.textLineDedup,
    "q60_sessionize" -> OracleDefs.sessionize,
    "q61_percentiles" -> OracleDefs.percentiles,
    "q62_sliding_rates" -> OracleDefs.slidingRates,
    "q63_anomaly_mad" -> OracleDefs.anomalyMad,
    "q64_tfidf_terms" -> OracleDefs.tfidfTerms,
    "q65_grok_parse" -> OracleDefs.grokParse,
    "q66_stratified_sample" -> OracleDefs.stratifiedSample,
    "q67_grok_enrich" -> OracleDefs.grokEnrich,
    "q68_funnel" -> OracleDefs.funnel,
    "q69_retention" -> OracleDefs.retention,
    "q70_weighted_sample" -> OracleDefs.weightedSample,
    "q71_asof_join" -> OracleDefs.asofJoin,
    "q72_transitions" -> OracleDefs.transitions,
    "q73_distinct_rollup" -> OracleDefs.distinctRollup,
    "q74_topk_per_group" -> OracleDefs.topkPerGroup,
    "q75_interval_join" -> OracleDefs.intervalJoin,
    "q76_growth" -> OracleDefs.growth,
    "q77_incident_impact" -> OracleDefs.incidentImpact,
    "q78_fuzzy_domains" -> OracleDefs.fuzzyDomains,
    "q79_cooccurrence" -> OracleDefs.cooccurrence,
    "q80_log_templates" -> OracleDefs.logTemplates,
    "q81_campaign_clusters" -> OracleDefs.campaignClusters,
    "q82_beaconing" -> OracleDefs.beaconing,
    "q83_indicator_timeline" -> OracleDefs.indicatorTimeline,
    "q84_suppressed_counts" -> OracleDefs.suppressedCounts,
    "q85_reconcile" -> OracleDefs.reconcile,
    "q86_dga_score" -> OracleDefs.dgaScore,
    "q87_indicator_growth" -> OracleDefs.indicatorGrowth,
    "q88_conversation_risk" -> OracleDefs.conversationRisk,
    "q89_conv_audit" -> OracleDefs.convAudit,
    "q90_pack_docs" -> OracleDefs.packDocs,
    "q91_conv_truncate" -> OracleDefs.convTruncate,
    "q92_confusables" -> OracleDefs.confusables,
    "q93_drift_cusum" -> OracleDefs.driftCusum,
    "q94_inverted_index" -> OracleDefs.invertedIndex,
    "q95_heavy_hitters" -> OracleDefs.heavyHitters,
    "q96_chunk_docs" -> OracleDefs.chunkDocs,
    "q97_budget_per_source" -> OracleDefs.budgetPerSource,
    "q98_set_join" -> OracleDefs.setJoin,
    "q99_bpe_merges" -> OracleDefs.bpeMerges,
    "q100_text_clean" -> OracleDefs.textClean,
    "q101_quantiles_bucketed" -> OracleDefs.quantiles,
    "q102_triangles" -> OracleDefs.triangles,
    "q103_skew_join" -> OracleDefs.skewJoin,
    "q104_url_normalize" -> OracleDefs.urlNormalize,
    "q105_zorder" -> OracleDefs.zorder,
    "q106_rollup_hierarchy" -> OracleDefs.rollupHierarchy,
    "q107_bucketed_join" -> OracleDefs.bucketedJoin,
    "q108_merge_partials" -> OracleDefs.mergePartials,
    "q109_profile" -> OracleDefs.profile,
    "q110_merge_intervals" -> OracleDefs.mergeIntervals,
    "q111_allocate_proportional" -> OracleDefs.allocateProportional,
    "q112_snapshot_diff" -> OracleDefs.snapshotDiff,
    "q113_anonymize" -> OracleDefs.anonymize,
    "q114_range_boundaries" -> OracleDefs.rangeBoundaries,
    "q115_rolling_active" -> OracleDefs.rollingActive,
    "q116_zonemap_audit" -> OracleDefs.zoneMapAudit,
    "q117_range_assign" -> OracleDefs.rangeAssign,
    "q118_fk_audit" -> OracleDefs.fkAudit,
    "q119_skew_diagnose" -> OracleDefs.skewDiagnose,
    "q120_feed_freshness" -> OracleDefs.feedFreshness,
    "q121_fd_audit" -> OracleDefs.fdAudit2,
    "q122_keep_best" -> OracleDefs.keepBest,
    "q123_state_intervals" -> OracleDefs.stateIntervals,
    "q124_top_paths" -> OracleDefs.topPaths,
    "q125_ttl_plan" -> OracleDefs.ttlPlan,
    "q126_join_forecast" -> OracleDefs.joinForecast,
    "q127_throttle_audit" -> OracleDefs.throttleAudit,
    "q128_diversified_topk" -> OracleDefs.diversifiedTopK,
    "q129_weighted_quantiles" -> OracleDefs.weightedQuantiles,
    "q130_scd_snapshot" -> OracleDefs.scdSnapshot,
    "q131_dist_compare" -> OracleDefs.distCompare,
    "q132_oov_rate" -> OracleDefs.oovRate,
    "q133_streaks" -> OracleDefs.streaks,
    "q134_dow_deviation" -> OracleDefs.dowDeviation,
    "q135_containment" -> OracleDefs.containment,
    "q136_concentration" -> OracleDefs.concentration
  )
}
