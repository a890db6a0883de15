package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. event-log surface
    "q_evt_parse" -> (EventLogOps.parse _),
    "q_evt_since" -> ((s: SparkSession, d: String) => EventLogOps.since(s, d)),
    "q_evt_nearest_offset" -> (EventLogOps.nearestOffset _),
    "q_evt_retention_capacity" -> ((s: SparkSession, d: String) => EventLogOps.retentionCapacity(s, d)),
    "q_evt_retention_age" -> ((s: SparkSession, d: String) => EventLogOps.retentionAge(s, d)),
    "q_evt_sse_frames" -> (EventLogOps.sseFrames _),
    "q_evt_routes" -> (EventLogOps.routes _),
    "q_evt_start_position" -> ((s: SparkSession, d: String) => EventLogOps.startPosition(s, d)),
    "q_evt_skip_audit" -> (EventLogOps.skipAudit _),
    // B. relational core
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier" -> (Relational.q5LocalSupplier _),
    "q_window_running" -> (Relational.qWindowRunning _),
    "q_distinct_users" -> (Relational.qDistinctUsers _),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_rollup" -> (Relational.qRollup _),
    "q_topk_per_group" -> (Relational.qTopkPerGroup _),
    "q_sessionize" -> (Relational.qSessionize _),
    "q_tumbling_window" -> (Relational.qTumblingWindow _),
    "q_json_extract" -> (Relational.qJsonExtract _),
    "q_above_avg" -> (Relational.qAboveAvg _),
    "q_percentiles" -> (Relational.qPercentiles _),
    "q_pivot_event_counts" -> (Relational.qPivotEventCounts _),
    // E. text analysis + C1 exact dedup
    "q_text_langid" -> (TextAnalysis.langId _),
    "q_langid_trained" -> (LangId.langidTrained _),
    "q_text_quality" -> (TextAnalysis.quality _),
    "q_text_tokens" -> (TextAnalysis.tokenCounts _),
    "q_text_fingerprint" -> (TextAnalysis.fingerprint _),
    "q_dedup_exact" -> (Dedup.exact _),
    // C2-C5 near-dup, D1-D2 ANN
    "q_dedup_minhash_lsh" -> (Dedup.minhashLsh _),
    "q_dedup_simhash" -> (Dedup.simhash _),
    "q_dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "q_dedup_containment" -> (Dedup.ngramContainment _),
    "q_dedup_embedding" -> (Dedup.embeddingNearDup _),
    "q_ann_brute_topk" -> (SimilaritySearch.bruteTopK _),
    "q_ann_ivf" -> (SimilaritySearch.ivfTopK _),
    // unsupervised IVF (k-means-trained centroids): the iterative
    // training is not SQL-expressible but its frozen RESULT is — the
    // run's centroids ride the oracle as a VALUES literal (the P1/P2
    // convention), so assignment + probe + top-k sit under the hash
    // gate; recall additionally gated by AnnRecallSpec
    "q_ann_ivf_trained" -> ((s: SparkSession, d: String) =>
      SimilaritySearch.ivfTopKTrained(s, d)),
    // product quantization + ADC + exact rescore: trained codebook +
    // query LUTs ride the oracle as literals; the encode argmin and
    // ADC sums are restated as identically-ordered IEEE ops, so the
    // hash gate covers the model end-to-end; recall gated by
    // AnnRecallSpec
    "q_ann_pq" -> (SimilaritySearch.pqTopK _),
    // IVF-PQ composition (coarse probe + residual ADC codes): both
    // trained structures as oracle literals, same gates
    "q_ann_ivfpq" -> ((s: SparkSession, d: String) =>
      SimilaritySearch.ivfPqTopK(s, d)),
    // A9: structured streaming ingest (AvailableNow, complete mode)
    "q_stream_window_counts" -> (graft.streaming.EventStreams.windowCounts _),
    // F1: multimodal binary + metadata pipeline (real PNG IHDR /
    // JPEG SOF header decode — Multimodal.scala)
    "q_mm_binary_meta" -> (Multimodal.binaryMeta _),
    // F2/F3: image-CONTENT dedup — real ImageIO PNG encode/decode;
    // exact layer hashes the PNG bytes, perceptual layer recovers a
    // dHash from decoded pixels and feeds C3's Manku hamming index
    "q_mm_dedup_exact" -> (ImageDedup.imageDedupExact _),
    "q_mm_dedup_near" -> (ImageDedup.imageNearDup _),
    "q_mm_dedup_clusters" -> (ImageDedup.imageDupClusters _),
    // F6/F7: audio limb — real RIFF/WAVE chunk walk + 16-bit PCM
    // decode; RMS-comparison perceptual fingerprint into the same
    // Manku hamming index
    "q_audio_meta" -> (AudioDedup.audioMeta _),
    "q_audio_dedup_near" -> (AudioDedup.audioNearDup _),
    // F8/F9: video limb — real animated-GIF container (ImageIO
    // sequence writer), frame-sampled per-frame dHash
    "q_video_meta" -> (VideoDedup.videoMeta _),
    "q_video_dedup_near" -> (VideoDedup.videoNearDup _),
    // G. sampling / profiling
    "q_dedup_clusters" -> (Dedup.dupClusters _),
    "q_asof_attribution" -> (AsofJoin.attribution _),
    "q_sample_hash" -> ((s: SparkSession, d: String) => Sampling.hashSample(s, d)),
    "q_source_profile" -> (Sampling.sourceProfile _),
    // H. training-data pipeline extensions
    "q_decontaminate" -> (Dedup.decontaminate _),
    "q_dedup_incremental" -> (Dedup.incrementalDedup _),
    "q_fuzzy_pairs" -> (Dedup.fuzzyPairs _),
    "q_text_repetition" -> (TextAnalysis.repetition _),
    "q_pii_scrub" -> (TextAnalysis.scrub _),
    "q_ann_quantized" -> (SimilaritySearch.quantizedTopK _),
    // sketch profiling under the hash gate: the AUDIT form — exact
    // stats + each engine's own sketch-within-bounds verdicts (raw
    // HLL/GK estimates stay engine-specific; their raw-value accuracy
    // is spec-gated in PipelineOpsSpec against exact answers)
    "q_profile_approx" -> (Sampling.approxProfileAudit _),
    "q_curate" -> (Curation.curate _),
    "q_mix_resample" -> ((s: SparkSession, d: String) => Sampling.mixResample(s, d)),
    "q_mix_unimax" -> ((s: SparkSession, d: String) => Sampling.mixUnimax(s, d)),
    "q_token_budget" -> ((s: SparkSession, d: String) => Sampling.tokenBudget(s, d)),
    // I. output shaping + corpus-global signals (round 8)
    "q_shard_pack" -> ((s: SparkSession, d: String) => Packing.shardPack(s, d)),
    "q_sample_stratified" -> ((s: SparkSession, d: String) => Packing.stratifiedSample(s, d)),
    "q_ngram_dupfrac" -> (CorpusStats.dupGramFrac _),
    "q_gram_topk" -> ((s: SparkSession, d: String) => CorpusStats.topGrams(s, d)),
    // semantic dedup reuses the k-means trainer: iterative training is
    // not SQL-expressible -> rows-only; properties + golden file gated
    // by PackingSpec / GoldenSpec
    "q_dedup_semantic" -> ((s: SparkSession, d: String) => SemanticDedup.semanticDedup(s, d)),
    "q_semantic_recall" -> (SemanticDedup.semanticRecall _),
    "q_dedup_source_matrix" -> (Dedup.sourceMatrix _),
    // J1: composed funnel (curate -> semantic survivors -> mix
    // resample -> shard pack); oracle nests the stages' own SQL with
    // the semantic stage's golden-pinned drop-set
    "q_pipeline_pack" -> (Pipeline.pipelinePack _),
    // J4-J8: compaction, holdout split, bloom-pruned join, manifest
    // file skipping, embedding near-dup clusters
    "q_compact_latest" -> (Compaction.compactLatest _),
    "q_split_assign" -> ((s: SparkSession, d: String) => Sampling.splitAssign(s, d)),
    "q_bloom_join" -> (BloomJoin.qBloomJoin _),
    "q_skipscan" -> (graft.sources.SkipIndex.skipScan _),
    "q_embed_clusters" -> (Dedup.embedClusters _),
    // K1/K2/K5/K6: chunking, weighted sampling, tf-idf terms, drift
    "q_chunks" -> (Chunking.qChunks _),
    "q_sample_weighted" -> ((s: SparkSession, d: String) => Sampling.weightedSample(s, d)),
    "q_sample_soft" -> ((s: SparkSession, d: String) => Sampling.softWeightedSample(s, d)),
    "q_tfidf_topterms" -> ((s: SparkSession, d: String) => CorpusStats.tfidfTopTerms(s, d)),
    "q_source_drift" -> (CorpusStats.sourceDrift _),
    // K9: snapshot CDC diff (old snapshot synthesized hash-deterministically)
    "q_snapshot_diff" -> (SnapshotDiff.qSnapshotDiff _),
    // U8: CDC snapshot apply (the MERGE half of K9)
    "q_snapshot_apply" -> (SnapshotDiff.qSnapshotApply _),
    // L-series: survivor selection + in-place boilerplate scrubbing
    "q_quality_topfrac" -> (Selection.qualityTopFrac _),
    "q_cluster_rep" -> (Selection.clusterRepresentatives _),
    "q_boilerplate_scrub" -> (Boilerplate.scrub _),
    // M-series: pipeline observability
    "q_corpus_report" -> (Reporting.corpusReport _),
    "q_drop_ledger" -> (Reporting.dropLedger _),
    // N-series: audits + table maintenance
    "q_split_leakage" -> (Dedup.splitLeakage _),
    "q_split_leakage_semantic" -> (Dedup.splitLeakageSemantic _),
    "q_lang_confusion" -> (TextAnalysis.langConfusion _),
    "q_decontaminate_semantic" -> (Dedup.decontaminateSemantic _),
    "q_compaction_plan" -> (Maintenance.compactionPlan _),
    // O-series: retrieval + training-order + LM-quality + soft dedup
    "q_bm25_topk" -> (Retrieval.bm25TopK _),
    "q_rrf_fusion" -> (Retrieval.rrfFusion _),
    "q_dedup_soft" -> (Dedup.softDedup _),
    "q_curriculum_order" -> (Curriculum.curriculumOrder _),
    "q_lm_quality" -> (CharLm.lmScore _),
    // P1: in-engine-trained BPE tokenizer; the frozen (word -> count)
    // model rides the oracle SQL as a VALUES literal, so the learned
    // model is itself under the oracle gate
    "q_text_tokens_bpe" -> (Bpe.tokenCountsBpe _),
    "q_bpe_oov_drift" -> (Bpe.oovDrift _),
    // U1: tokenizer fertility / compression monitor (frozen P1 model)
    "q_tokenizer_fertility" -> (Bpe.fertility _),
    // U2: context-window truncation-loss report (frozen P1 model)
    "q_truncation_loss" -> (Bpe.truncationLoss _),
    // U10: tokenize-to-ids export under the frozen BPE model
    "q_tokenize_export" -> (Bpe.tokenizeExport _),
    // U3: pairwise source-distribution TV distance matrix
    "q_source_divergence" -> (CorpusStats.sourceDivergence _),
    // U4: banded hard-negative mining for contrastive training
    "q_hard_negatives" -> (SimilaritySearch.hardNegatives _),
    // U5: per-source Zipf-slope + type-token audit
    "q_zipf_audit" -> (CorpusStats.zipfAudit _),
    // U9: vocabulary-coverage ladder (tokenizer sizing study)
    "q_vocab_coverage" -> (CorpusStats.vocabCoverage _),
    // U6: split-balance chi-square audit over the J5 assignment
    "q_split_balance" -> (Sampling.splitBalance _),
    // P2: in-engine-trained logistic quality classifier (weak labels
    // from E2 bands); frozen weights ride the oracle as a literal list
    "q_quality_classifier" -> (QualityClassifier.classify _),
    // R-series: importance resampling weights (DSIR), fixed-length
    // sequence packing with boundary spans, excess-loss domain
    // reweighting (DoReMi objective, fixed-proxy form)
    "q_dsir_weights" -> (Dsir.dsirWeights _),
    "q_seq_pack" -> ((s: SparkSession, d: String) => Packing.seqPack(s, d)),
    "q_domain_reweight" -> (DomainMix.domainReweight _),
    // S1: exact duplicated-substring span removal (suffix-array dedup
    // restated as K-gram witness runs)
    "q_span_dedup" -> (SpanDedup.spanDedup _),
    // S2: CCNet-style per-language perplexity terciles over the O4 LM
    "q_ppl_buckets" -> (CharLm.pplBuckets _),
    // S3: epoch-capped token-budget allocation (weighted waterfill
    // over the R3 weights — the data-constrained scaling allocator)
    "q_epoch_alloc" -> (DomainMix.epochAlloc _),
    // S4: reliability bins for the trained P2 classifier (ECE report)
    "q_qc_calibration" -> (QualityClassifier.calibration _),
    // T1: incremental span dedup (new batch vs the corpus gram index)
    "q_span_dedup_incremental" -> (SpanDedup.spanDedupIncremental _),
    // T2: span-level decontamination (GPT-3 Appendix-C protocol —
    // cut colliding spans out of otherwise-keepable documents)
    "q_decontaminate_spans" -> (SpanDedup.spanDecontaminate _),
    // S6: the S3 allocation materialized into per-doc draw counts
    "q_epoch_alloc_materialize" -> (DomainMix.epochAllocMaterialize _),
    // S5: duplicated-passage report (maximal extents, mass-ranked)
    "q_span_report" -> (SpanDedup.spanReport _),
    // O8: retrieval-quality metrics (RR/DCG/nDCG/P@k) for the O1 ranking
    "q_retrieval_eval" -> (Retrieval.retrievalEval _),
    // R5: RHO-1-style excess-loss selection (target-band reference LM
    // vs corpus self-LM, top-fraction by excess logp)
    "q_excess_loss_select" -> ((s: SparkSession, d: String) =>
      CharLm.excessLossSelect(s, d)),
    // T4: decontamination width-sensitivity curve over n in {5, 8, 13}
    "q_decontaminate_widths" -> (SpanDedup.decontaminateWidths _),
    // H12: temperature-scaled source mixing (n^alpha sampling law,
    // exact integer largest-remainder allocation)
    "q_mix_temperature" -> ((s: SparkSession, d: String) =>
      DomainMix.mixTemperature(s, d)),
    // V1: Gopher rule-based quality filter report
    "q_gopher_rules" -> ((s: SparkSession, d: String) =>
      RuleFilters.gopherRules(s, d)),
    // V2: C4 line-level cleaning (cleaned text hash-gated via md5)
    "q_c4_clean" -> ((s: SparkSession, d: String) =>
      RuleFilters.c4Clean(s, d)),
    // V3: prototypicality pruning over D3's trained centroids
    "q_proto_prune" -> ((s: SparkSession, d: String) =>
      SimilaritySearch.protoPrune(s, d)),
    // W1: GPT-3 Pareto quality-score sampling
    "q_sample_pareto" -> ((s: SparkSession, d: String) =>
      Sampling.paretoSample(s, d)),
    // W2: LSH dedup-quality eval (measured S-curve on a fixed probe)
    "q_lsh_recall" -> (Dedup.lshRecall _),
    "q_lsh_tune" -> (LshTune.lshTune _),
    "q_lsh_tuned_check" -> (LshTune.lshTunedCheck _),
    // W5: the tuned family through C2's FULL candidate->verify path,
    // pair-set diffed against the fixed (4,3) family
    "q_lsh_reband" -> (LshTune.lshReband _),
    "q_removal_audit" -> (Removal.removalAudit _),
    // M6: the vector-side standing artifacts (C2 band index, X2 chunk
    // index, O5 IVF assignments) through the same governed removal
    "q_removal_audit_v2" -> (Removal.removalAuditV2 _),
    // M11: the third removal ring — Z1/Z5 packed BQ index (vec-keyed
    // anti-join) + O1's persisted BM25 serving state (postings
    // anti-join, df count-subtraction, integer corpus-stat rescale)
    "q_removal_audit_v3" -> (Removal.removalAuditV3 _),
    // X1: content-defined chunk dedup (FastCDC at token grain)
    "q_cdc_dedup" -> (Chunking.cdcDedup _),
    "q_winnow_fp" -> (Winnowing.qFingerprints _),
    "q_winnow_pairs" -> (Winnowing.winnowPairs _),
    "q_psi_drift" -> (PsiDrift.psiDrift _),
    "q_winnow_incremental" -> (Winnowing.winnowIncremental _),
    // X2: incremental CDC dedup (new batch vs corpus chunk index)
    "q_cdc_dedup_incremental" -> (Chunking.cdcDedupIncremental _),
    // Z1: binary-quantized ANN (sign-bit pack -> hamming shortlist ->
    // exact rescore; the shortlist stage is integer end-to-end)
    "q_ann_bq" -> (BinaryAnn.bqTopK _),
    // Z2: per-source quantile normalization of the quality score
    // (histogram midrank -- no per-source corpus sort)
    "q_quality_qnorm" -> (Selection.qualityQnorm _),
    // Z3: cluster-balanced quota sample over the trained D3 centroids
    "q_sample_cluster_cap" -> (SimilaritySearch.clusterCapSample _),
    // Z4: FineWeb's three custom line-grain filters
    "q_fineweb_filters" -> (RuleFilters.fineWebFilters _),
    // Z5: IVF-BQ (trained coarse probe -> integer hamming in-bucket ->
    // exact rescore; the quantization matrix's last cell)
    "q_ann_ivf_bq" -> ((s: SparkSession, d: String) =>
      SimilaritySearch.ivfBqTopK(s, d))
  ) ++
    // The 24 `from_*` steady-state production forms (FromStages): the
    // plans a deployment runs per refresh once stage outputs persist.
    // Each builds its stages into a shared memoized temp dir (the
    // untimed refresh-cadence cost), then runs the steady-state
    // composition the bench prices — under the same DuckDB hash gate
    // as everything else (oracle = the self-contained twin's SQL,
    // because the composition must equal the one-shot query exactly).
    FromStages.names.map(n =>
      n -> ((s: SparkSession, d: String) => FromStages.of(s, d).run(n)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_evt_parse" -> EventLogOps.parseSql,
    "q_evt_since" -> EventLogOps.sinceSql,
    "q_evt_nearest_offset" -> EventLogOps.nearestOffsetSql,
    "q_evt_retention_capacity" -> EventLogOps.retentionCapacitySql,
    "q_evt_retention_age" -> EventLogOps.retentionAgeSql,
    "q_evt_sse_frames" -> EventLogOps.sseFramesSql,
    "q_evt_routes" -> EventLogOps.routesSql,
    "q_evt_start_position" -> EventLogOps.startPositionSql,
    "q_evt_skip_audit" -> EventLogOps.skipAuditSql,
    "q1_pricing_summary" -> Relational.q1PricingSummarySql,
    "q3_shipping_priority" -> Relational.q3ShippingPrioritySql,
    "q5_local_supplier" -> Relational.q5LocalSupplierSql,
    "q_window_running" -> Relational.qWindowRunningSql,
    "q_distinct_users" -> Relational.qDistinctUsersSql,
    "q_semi_join" -> Relational.qSemiJoinSql,
    "q_anti_join" -> Relational.qAntiJoinSql,
    "q_rollup" -> Relational.qRollupSql,
    "q_topk_per_group" -> Relational.qTopkPerGroupSql,
    "q_sessionize" -> Relational.qSessionizeSql,
    "q_tumbling_window" -> Relational.qTumblingWindowSql,
    "q_json_extract" -> Relational.qJsonExtractSql,
    "q_above_avg" -> Relational.qAboveAvgSql,
    "q_percentiles" -> Relational.qPercentilesSql,
    "q_pivot_event_counts" -> Relational.qPivotEventCountsSql,
    "q_text_langid" -> TextAnalysis.langIdSql,
    "q_langid_trained" -> LangId.langidTrainedSql,
    "q_text_quality" -> TextAnalysis.qualitySql,
    "q_text_tokens" -> TextAnalysis.tokenCountsSql,
    "q_text_fingerprint" -> TextAnalysis.fingerprintSql,
    "q_dedup_exact" -> Dedup.exactSql,
    "q_dedup_minhash_lsh" -> Dedup.minhashLshSql,
    "q_dedup_simhash" -> Dedup.simhashSql,
    "q_dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "q_dedup_containment" -> Dedup.ngramContainmentSql,
    "q_dedup_embedding" -> Dedup.embeddingNearDupSql,
    "q_ann_brute_topk" -> SimilaritySearch.bruteTopKSql,
    "q_ann_ivf" -> SimilaritySearch.ivfTopKSql,
    "q_ann_ivf_trained" -> SimilaritySearch.ivfTopKTrainedSql,
    "q_ann_pq" -> SimilaritySearch.pqTopKSql,
    "q_ann_ivfpq" -> SimilaritySearch.ivfPqTopKSql,
    "q_stream_window_counts" -> graft.streaming.EventStreams.windowCountsSql,
    "q_mm_binary_meta" -> Multimodal.binaryMetaSql,
    "q_mm_dedup_exact" -> ImageDedup.imageDedupExactSql,
    "q_mm_dedup_near" -> ImageDedup.imageNearDupSql,
    "q_mm_dedup_clusters" -> ImageDedup.imageDupClustersSql,
    "q_audio_meta" -> AudioDedup.audioMetaSql,
    "q_audio_dedup_near" -> AudioDedup.audioNearDupSql,
    "q_video_meta" -> VideoDedup.videoMetaSql,
    "q_video_dedup_near" -> VideoDedup.videoNearDupSql,
    "q_dedup_clusters" -> Dedup.dupClustersSql,
    "q_asof_attribution" -> AsofJoin.attributionSql,
    "q_sample_hash" -> Sampling.hashSampleSql(),
    "q_profile_approx" -> Sampling.approxProfileAuditSql,
    "q_source_profile" -> Sampling.sourceProfileSql,
    "q_decontaminate" -> Dedup.decontaminateSql,
    "q_dedup_incremental" -> Dedup.incrementalDedupSql,
    "q_fuzzy_pairs" -> Dedup.fuzzyPairsSql,
    "q_text_repetition" -> TextAnalysis.repetitionSql,
    "q_pii_scrub" -> TextAnalysis.scrubSql,
    "q_ann_quantized" -> SimilaritySearch.quantizedTopKSql,
    "q_curate" -> Curation.curateSql,
    "q_mix_resample" -> Sampling.mixResampleSql(),
    "q_mix_unimax" -> Sampling.mixUnimaxSql(),
    "q_token_budget" -> Sampling.tokenBudgetSql(),
    "q_shard_pack" -> Packing.shardPackSql(),
    "q_sample_stratified" -> Packing.stratifiedSampleSql(),
    "q_ngram_dupfrac" -> CorpusStats.dupGramFracSql,
    "q_gram_topk" -> CorpusStats.topGramsSql(),
    "q_dedup_source_matrix" -> Dedup.sourceMatrixSql,
    "q_pipeline_pack" -> Pipeline.pipelinePackSql(),
    "q_compact_latest" -> Compaction.compactLatestSql,
    "q_split_assign" -> Sampling.splitAssignSql(),
    "q_bloom_join" -> BloomJoin.qBloomJoinSql,
    "q_skipscan" -> graft.sources.SkipIndex.skipScanSql,
    "q_embed_clusters" -> Dedup.embedClustersSql,
    "q_chunks" -> Chunking.chunksSql(),
    "q_sample_weighted" -> Sampling.weightedSampleSql(),
    "q_sample_soft" -> Sampling.softWeightedSampleSql(),
    "q_tfidf_topterms" -> CorpusStats.tfidfTopTermsSql(),
    "q_source_drift" -> CorpusStats.sourceDriftSql,
    "q_snapshot_diff" -> SnapshotDiff.qSnapshotDiffSql,
    "q_snapshot_apply" -> SnapshotDiff.qSnapshotApplySql,
    "q_quality_topfrac" -> Selection.qualityTopFracSql,
    "q_cluster_rep" -> Selection.clusterRepresentativesSql,
    "q_boilerplate_scrub" -> Boilerplate.scrubSql,
    "q_corpus_report" -> Reporting.corpusReportSql,
    "q_drop_ledger" -> Reporting.dropLedgerSql,
    "q_split_leakage" -> Dedup.splitLeakageSql,
    "q_split_leakage_semantic" -> Dedup.splitLeakageSemanticSql,
    "q_lang_confusion" -> TextAnalysis.langConfusionSql,
    "q_decontaminate_semantic" -> Dedup.decontaminateSemanticSql,
    "q_compaction_plan" -> Maintenance.compactionPlanSql,
    "q_bm25_topk" -> Retrieval.bm25TopKSql,
    "q_rrf_fusion" -> Retrieval.rrfFusionSql,
    "q_dedup_soft" -> Dedup.softDedupSql,
    "q_curriculum_order" -> Curriculum.curriculumOrderSql,
    "q_lm_quality" -> CharLm.lmScoreSql,
    "q_text_tokens_bpe" -> Bpe.tokenCountsBpeSql,
    "q_bpe_oov_drift" -> Bpe.oovDriftSql,
    "q_tokenizer_fertility" -> Bpe.fertilitySql,
    "q_truncation_loss" -> Bpe.truncationLossSql,
    "q_tokenize_export" -> Bpe.tokenizeExportSql,
    "q_source_divergence" -> CorpusStats.sourceDivergenceSql,
    "q_hard_negatives" -> SimilaritySearch.hardNegativesSql,
    "q_zipf_audit" -> CorpusStats.zipfAuditSql,
    "q_vocab_coverage" -> CorpusStats.vocabCoverageSql,
    "q_split_balance" -> Sampling.splitBalanceSql,
    "q_quality_classifier" -> QualityClassifier.classifySql,
    "q_dsir_weights" -> Dsir.dsirWeightsSql,
    "q_seq_pack" -> Packing.seqPackSql(),
    "q_domain_reweight" -> DomainMix.domainReweightSql,
    "q_span_dedup" -> SpanDedup.spanDedupSql,
    "q_ppl_buckets" -> CharLm.pplBucketsSql,
    "q_epoch_alloc" -> DomainMix.epochAllocSql,
    "q_qc_calibration" -> QualityClassifier.calibrationSql,
    "q_span_dedup_incremental" -> SpanDedup.spanDedupIncrementalSql,
    "q_decontaminate_spans" -> SpanDedup.spanDecontaminateSql,
    "q_epoch_alloc_materialize" -> DomainMix.epochAllocMaterializeSql,
    "q_span_report" -> SpanDedup.spanReportSql,
    "q_retrieval_eval" -> Retrieval.retrievalEvalSql,
    "q_excess_loss_select" -> CharLm.excessLossSelectSql,
    "q_decontaminate_widths" -> SpanDedup.decontaminateWidthsSql,
    "q_mix_temperature" -> DomainMix.mixTemperatureSql,
    "q_gopher_rules" -> RuleFilters.gopherRulesSql,
    "q_c4_clean" -> RuleFilters.c4CleanSql,
    "q_proto_prune" -> SimilaritySearch.protoPruneSql,
    "q_sample_pareto" -> Sampling.paretoSampleSql,
    "q_lsh_recall" -> Dedup.lshRecallSql,
    "q_lsh_tune" -> LshTune.lshTuneSql,
    "q_lsh_tuned_check" -> LshTune.lshTunedCheckSql,
    "q_lsh_reband" -> LshTune.lshRebandSql,
    "q_removal_audit" -> Removal.removalAuditSql,
    "q_removal_audit_v2" -> Removal.removalAuditV2Sql,
    "q_removal_audit_v3" -> Removal.removalAuditV3Sql,
    // I4 joins the oracle through its frozen-centroid literal (the D3
    // convention) — formerly rows-only
    "q_dedup_semantic" -> SemanticDedup.semanticDedupSql,
    "q_semantic_recall" -> SemanticDedup.semanticRecallSql,
    "q_cdc_dedup" -> Chunking.cdcDedupSql,
    "q_winnow_fp" -> Winnowing.qFingerprintsSql,
    "q_winnow_pairs" -> Winnowing.winnowPairsSql,
    "q_psi_drift" -> PsiDrift.psiDriftSql,
    "q_winnow_incremental" -> Winnowing.winnowIncrementalSql,
    "q_cdc_dedup_incremental" -> Chunking.cdcDedupIncrementalSql,
    "q_ann_bq" -> BinaryAnn.bqTopKSql,
    "q_quality_qnorm" -> Selection.qualityQnormSql,
    "q_sample_cluster_cap" -> SimilaritySearch.clusterCapSampleSql,
    "q_fineweb_filters" -> RuleFilters.fineWebFiltersSql,
    "q_ann_ivf_bq" -> SimilaritySearch.ivfBqTopKSql,
    // `from_*` steady-state forms: each oracle is the self-contained
    // twin's SQL — the staged composition is required to equal the
    // one-shot query bit-for-bit (spec-pinned AND now hash-gated).
    // from_profile_sketch stays rows-only (raw HLL/GK estimates are
    // engine-specific; its audit twin q_profile_approx is hash-gated).
    // from_ann_ivf_index / from_hard_negatives probe the D7 on-disk
    // index built from the FROZEN TrainedK centroids, so their
    // oracles are the trained-literal probe restatements.
    "from_curate" -> Curation.curateSql,
    "from_pipeline_pack" -> Pipeline.pipelinePackSql(),
    "from_corpus_report" -> Reporting.corpusReportSql,
    "from_drop_ledger" -> Reporting.dropLedgerSql,
    "from_quality_classifier" -> QualityClassifier.classifySql,
    "from_text_tokens_bpe" -> Bpe.tokenCountsBpeSql,
    "from_ann_ivf_index" -> SimilaritySearch.ivfTopKTrainedSql,
    "from_hard_negatives" -> SimilaritySearch.hardNegativesFromIndexSql,
    "from_dedup_semantic" -> SemanticDedup.semanticDedupSql,
    "from_domain_reweight" -> DomainMix.domainReweightSql,
    "from_ppl_buckets" -> CharLm.pplBucketsSql,
    "from_lm_quality" -> CharLm.lmScoreSql,
    "from_winnow_incremental" -> Winnowing.winnowIncrementalSql,
    "from_qc_calibration" -> QualityClassifier.calibrationSql,
    "from_span_incremental" -> SpanDedup.spanDedupIncrementalSql,
    "from_alloc_materialize" -> DomainMix.epochAllocMaterializeSql,
    "from_epoch_alloc" -> DomainMix.epochAllocSql,
    "from_ann_bq" -> BinaryAnn.bqTopKSql,
    "from_langid_trained" -> LangId.langidTrainedSql,
    "from_removal_audit" -> Removal.removalAuditSql,
    "from_removal_audit_v2" -> Removal.removalAuditV2Sql,
    "from_removal_audit_v3" -> Removal.removalAuditV3Sql,
    "from_video_meta" -> VideoDedup.videoMetaSql
  )
}
