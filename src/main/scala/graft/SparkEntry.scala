package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator has a `queries` entry; SQL-expressible ones
  * also have a DuckDB oracle in `oracleSql` with identical column names
  * (the driver sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the end-to-end curation pipeline — dedup, quality gate, language
    * ID, deterministic split — composed from the library's operators. */
  def entry(spark: SparkSession): DataFrame =
    TextOps.curationPipeline(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) => Relational.q1Agg(Tables.lineitem(s, d))),
    "q2_filter_project" -> ((s, d) => Relational.q2FilterProject(Tables.lineitem(s, d))),
    "q3_join_broadcast" -> ((s, d) =>
      Relational.q3JoinBroadcast(Tables.orders(s, d), Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "q4_join_shuffle" -> ((s, d) => Relational.q4JoinShuffle(Tables.lineitem(s, d), Tables.orders(s, d))),
    "q5_topk" -> ((s, d) => Relational.q5TopK(Tables.orders(s, d))),
    "q6_distinct" -> ((s, d) => Relational.q6Distinct(Tables.lineitem(s, d))),
    "q7_window" -> ((s, d) => Relational.q7Window(Tables.orders(s, d))),
    "q8_semi_anti" -> ((s, d) => Relational.q8SemiAnti(Tables.customer(s, d), Tables.orders(s, d))),
    "q9_rollup" -> ((s, d) => Relational.q9Rollup(Tables.lineitem(s, d))),
    "q10_conditional_agg" -> ((s, d) => Relational.q10ConditionalAgg(Tables.lineitem(s, d))),
    "q11_string_funcs" -> ((s, d) => Relational.q11StringFuncs(Tables.part(s, d))),
    "q12_time_series" -> ((s, d) => Relational.q12TimeSeries(Tables.orders(s, d))),
    "q13_union" -> ((s, d) => Relational.q13Union(Tables.orders(s, d))),
    "q14_exists_subquery" -> ((s, d) => Relational.q14ExistsSubquery(Tables.customer(s, d))),
    "q15_asof_join" -> ((s, d) => Relational.q15AsofJoin(Tables.events(s, d))),
    "q16_range_join" -> ((s, d) => Relational.q16RangeJoin(Tables.lineitem(s, d), Tables.orders(s, d))),
    "q24_funnel" -> ((s, d) => Relational.q24Funnel(Tables.events(s, d))),
    "q25_cohort" -> ((s, d) => Relational.q25Cohort(Tables.events(s, d))),
    "q26_rolling_active" -> ((s, d) => Relational.q26RollingActive(Tables.events(s, d))),
    "q27_regression" -> ((s, d) => Relational.q27Regression(Tables.orders(s, d))),
    "q28_market_basket" -> ((s, d) => Relational.q28MarketBasket(Tables.lineitem(s, d))),
    "q29_transitions" -> ((s, d) => Relational.q29Transitions(Tables.events(s, d))),
    "q30_pivot" -> ((s, d) => Relational.q30Pivot(Tables.events(s, d))),
    "q31_streaks" -> ((s, d) => Relational.q31Streaks(Tables.events(s, d))),
    "q32_sessions" -> ((s, d) => Relational.q32Sessions(Tables.events(s, d))),
    "q33_attribution" -> ((s, d) => Relational.q33Attribution(Tables.events(s, d))),
    "q34_window_suite" -> ((s, d) => Relational.q34WindowSuite(Tables.orders(s, d))),
    "q35_anomaly" -> ((s, d) => Relational.q35Anomaly(Tables.events(s, d))),
    "q36_tpch_q5" -> ((s, d) => Relational.q36TpchQ5(Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d),
      Tables.nation(s, d), Tables.region(s, d))),
    "q37_tpch_q10" -> ((s, d) => Relational.q37TpchQ10(Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d), Tables.nation(s, d))),
    "q38_journeys" -> ((s, d) => Relational.q38Journeys(Tables.events(s, d))),
    "q39_tpch_q3" -> ((s, d) => Relational.q39TpchQ3(Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d))),
    "q40_tpch_q6" -> ((s, d) => Relational.q40TpchQ6(Tables.lineitem(s, d))),
    "q41_tpch_q7" -> ((s, d) => Relational.q41TpchQ7(Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d),
      Tables.nation(s, d))),
    "q42_tpch_q13" -> ((s, d) => Relational.q42TpchQ13(Tables.customer(s, d),
      Tables.orders(s, d))),
    "q43_tpch_q14" -> ((s, d) => Relational.q43TpchQ14(Tables.lineitem(s, d),
      Tables.part(s, d))),
    "q44_tpch_q15" -> ((s, d) => Relational.q44TpchQ15(Tables.supplier(s, d),
      Tables.lineitem(s, d))),
    "q45_tpch_q17" -> ((s, d) => Relational.q45TpchQ17(Tables.lineitem(s, d),
      Tables.part(s, d))),
    "q46_tpch_q18" -> ((s, d) => Relational.q46TpchQ18(Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d))),
    "q47_tpch_q4" -> ((s, d) => Relational.q47TpchQ4(Tables.orders(s, d),
      Tables.lineitem(s, d))),
    "q48_tpch_q8" -> ((s, d) => Relational.q48TpchQ8(Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d),
      Tables.nation(s, d), Tables.region(s, d), Tables.part(s, d))),
    "q49_tpch_q19" -> ((s, d) => Relational.q49TpchQ19(Tables.lineitem(s, d),
      Tables.part(s, d))),
    "q50_tpch_q22" -> ((s, d) => Relational.q50TpchQ22(Tables.customer(s, d),
      Tables.orders(s, d))),
    "q58_scd2" -> ((s, d) => Relational.q58Scd2(Tables.events(s, d))),
    "q59_gapfill" -> ((s, d) => Relational.q59Gapfill(Tables.events(s, d))),
    "q60_scd2_pit" -> ((s, d) => Relational.q60Scd2Pit(Tables.events(s, d))),
    "q61_merge_upsert" -> ((s, d) =>
      Relational.q61MergeUpsert(Tables.customer(s, d), Tables.orders(s, d))),
    "pipeline_feature_matrix" -> ((s, d) =>
      Relational.pipelineFeatureMatrix(Tables.events(s, d))),
    "q62_ab_test" -> ((s, d) => Relational.q62AbTest(Tables.events(s, d))),
    "q51_tpch_q2" -> ((s, d) => Relational.q51TpchQ2(Tables.lineitem(s, d),
      Tables.part(s, d), Tables.supplier(s, d), Tables.nation(s, d),
      Tables.region(s, d))),
    "q52_tpch_q9" -> ((s, d) => Relational.q52TpchQ9(Tables.lineitem(s, d),
      Tables.orders(s, d), Tables.part(s, d), Tables.supplier(s, d),
      Tables.nation(s, d))),
    "q53_tpch_q11" -> ((s, d) => Relational.q53TpchQ11(Tables.lineitem(s, d),
      Tables.supplier(s, d), Tables.nation(s, d))),
    "q54_tpch_q12" -> ((s, d) => Relational.q54TpchQ12(Tables.lineitem(s, d),
      Tables.orders(s, d))),
    "q55_tpch_q16" -> ((s, d) => Relational.q55TpchQ16(Tables.lineitem(s, d),
      Tables.part(s, d), Tables.supplier(s, d))),
    "q56_tpch_q20" -> ((s, d) => Relational.q56TpchQ20(Tables.lineitem(s, d),
      Tables.part(s, d), Tables.supplier(s, d), Tables.nation(s, d))),
    "q57_tpch_q21" -> ((s, d) => Relational.q57TpchQ21(Tables.lineitem(s, d),
      Tables.orders(s, d), Tables.supplier(s, d))),
    "pipeline_curation" -> ((s, d) => TextOps.curationPipeline(Tables.documents(s, d))),
    "text_tokens" -> ((s, d) => TextOps.textTokens(Tables.documents(s, d))),
    "text_token_spectrum" -> ((s, d) => TextOps.tokenSpectrum(Tables.documents(s, d))),
    "text_vocab_growth" -> ((s, d) => TextOps.vocabGrowth(Tables.documents(s, d))),
    "text_phrase_search" -> ((s, d) => TextOps.phraseSearch(Tables.documents(s, d))),
    "text_phrase_search_stored" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.phraseSearchStored(s,
        TextOps.ensurePosIndex(docs, TextOps.defaultPosIndexDir(docs, d)))
    }),
    "text_phrase_search_ngram" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.phraseSearchNgramStored(s,
        TextOps.ensurePosIndex(docs, TextOps.defaultPosIndexDir(docs, d)))
    }),
    "text_proximity_search" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.proximitySearchStored(s,
        TextOps.ensurePosIndex(docs, TextOps.defaultPosIndexDir(docs, d)))
    }),
    "text_collocation" -> ((s, d) => TextOps.textCollocation(Tables.documents(s, d))),
    "text_collocation_stored" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.textCollocationStored(s,
        TextOps.ensurePosIndex(docs, TextOps.defaultPosIndexDir(docs, d)))
    }),
    "text_phrase_search_incremental" -> ((s, d) => {
      TextOps.phraseSearchIncremental(s, posIndexIncDir(s, d))
    }),
    "text_proximity_incremental" -> ((s, d) => {
      TextOps.proximitySearchIncremental(s, posIndexIncDir(s, d))
    }),
    "text_collocation_incremental" -> ((s, d) => {
      TextOps.textCollocationIncremental(s, posIndexIncDir(s, d))
    }),
    "text_quality" -> ((s, d) => TextOps.textQuality(Tables.documents(s, d))),
    "text_langid" -> ((s, d) => TextOps.textLangid(Tables.documents(s, d))),
    "text_pii_redact" -> ((s, d) => TextOps.piiRedact(Tables.documents(s, d))),
    "text_repetition" -> ((s, d) => TextOps.textRepetition(Tables.documents(s, d))),
    "text_fingerprint" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Tables.documents(s, d).select(col("doc_id"),
          graft.functions.F.fingerprint(col("text"), 8, 4, portable = true).as("fp"))
        .select(col("doc_id"), size(col("fp")).cast("long").as("n_fp"),
          element_at(col("fp"), 1).as("fp_head"))
        .orderBy(col("doc_id"))
    }),
    "dedup_exact" -> ((s, d) => Dedup.dedupExact(Tables.documents(s, d))),
    "dedup_edit_distance" -> ((s, d) => Dedup.dedupEditDistance(Tables.documents(s, d))),
    "dedup_edit_distance_multipass" -> ((s, d) =>
      Dedup.dedupEditDistanceMultipass(Tables.documents(s, d))),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.dedupMinhashLsh(Tables.documents(s, d))),
    "dedup_minhash_fast" -> ((s, d) => Dedup.dedupMinhashLshFast(Tables.documents(s, d))),
    "dedup_incremental" -> ((s, d) => Dedup.dedupIncremental(Tables.documents(s, d))),
    "dedup_cross_corpus" -> ((s, d) => Dedup.dedupCrossCorpus(Tables.documents(s, d))),
    "dedup_threshold_curve" -> ((s, d) => Dedup.dedupThresholdCurve(Tables.documents(s, d))),
    "dedup_semantic" -> ((s, d) => Dedup.dedupSemantic(Tables.embeddings(s, d))),
    "dedup_simhash" -> ((s, d) => Dedup.dedupSimhash(Tables.documents(s, d), portable = true)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.dedupNgramJaccardBlocked(Tables.documents(s, d))),
    "dedup_ngram_composed" -> ((s, d) => Dedup.dedupNgramJaccardComposed(Tables.documents(s, d))),
    "dedup_containment" -> ((s, d) => Dedup.dedupContainment(Tables.documents(s, d))),
    "dedup_embedding" -> ((s, d) => Dedup.dedupEmbedding(Tables.embeddings(s, d))),
    "ann_bruteforce" -> ((s, d) => Ann.annBruteforce(Tables.embeddings(s, d))),
    "ann_dim_ablation" -> ((s, d) => Ann.annDimAblation(Tables.embeddings(s, d))),
    "ann_lsh" -> ((s, d) => Ann.annLsh(Tables.embeddings(s, d), portable = true)),
    "ann_mmr" -> ((s, d) => Ann.annMmr(Tables.embeddings(s, d))),
    "ann_binary_rerank" -> ((s, d) => Ann.annBinaryRerank(Tables.embeddings(s, d))),
    "ann_graph" -> ((s, d) => Ann.annGraph(Tables.embeddings(s, d))),
    // stored-index faces: build-if-absent under tmpdir (content-keyed),
    // then probe/rank only — the index is written once per corpus and
    // shared by both queries, like a production deployment
    "ann_graph_probe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.annGraphProbe(e, Ann.ensureAnnIndex(e, Ann.defaultIndexDir(e, d)))
    }),
    "graph_pagerank" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.graphPagerankStored(e, Ann.ensureAnnIndex(e, Ann.defaultIndexDir(e, d)))
    }),
    "graph_communities" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.graphCommunities(e, Ann.ensureAnnIndex(e, Ann.defaultIndexDir(e, d)))
    }),
    "graph_triangles" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.graphTriangles(e, Ann.ensureAnnIndex(e, Ann.defaultIndexDir(e, d)))
    }),
    "embedding_hard_negatives" -> ((s, d) => Ann.hardNegatives(Tables.embeddings(s, d))),
    "embedding_pca" -> ((s, d) => Ann.embeddingPca(Tables.embeddings(s, d))),
    "embedding_kmeans" -> ((s, d) => Ann.embeddingKmeans(Tables.embeddings(s, d))),
    "embedding_kmeans_assign" -> ((s, d) => {
      val vecs = Tables.embeddings(s, d)
      Ann.kmeansAssignStored(vecs,
        Ann.ensureKmeansModel(vecs, Ann.defaultKmeansModelDir(vecs, d)))
    }),
    "pipeline_cluster_balance" -> ((s, d) => {
      val vecs = Tables.embeddings(s, d)
      Ann.clusterBalance(vecs,
        Ann.ensureKmeansModel(vecs, Ann.defaultKmeansModelDir(vecs, d)))
    }),
    "embedding_project" -> ((s, d) => Ann.embeddingProject(Tables.embeddings(s, d))),
    "embedding_stratified_sample" -> ((s, d) => Ann.embeddingStratifiedSample(Tables.embeddings(s, d))),
    "embedding_pca2" -> ((s, d) => Ann.embeddingPca2(Tables.embeddings(s, d))),
    "embedding_norm_hist" -> ((s, d) => Ann.embeddingNormHist(Tables.embeddings(s, d))),
    "embedding_quantize_int8" -> ((s, d) => Ann.embeddingQuantizeInt8(Tables.embeddings(s, d))),
    "sink_batch_assign" -> ((s, d) => SinkOps.batchAssign(Tables.events(s, d))),
    "sink_batch_bytes" -> ((s, d) => SinkOps.batchBytes(Tables.events(s, d))),
    "sink_rows_batch" -> ((s, d) => SinkOps.rowsBatch(Tables.events(s, d))),
    "sink_stream_offsets" -> ((s, d) => SinkOps.streamOffsets(Tables.events(s, d))),
    "serialize_json" -> ((s, d) => SinkOps.serializeJson(Tables.events(s, d))),
    "serialize_proto" -> ((s, d) => SinkOps.serializeProto(Tables.events(s, d))),
    "stream_window_agg" -> ((s, d) => graft.streaming.Streams.windowAgg(Tables.events(s, d))),
    "stream_session" -> ((s, d) => graft.streaming.Streams.sessionize(Tables.events(s, d))),
    "stream_interval_join" -> ((s, d) => graft.streaming.Streams.intervalJoinCounts(Tables.events(s, d))),
    "mm_features" -> ((s, d) => Multimodal.mmFeatures(Tables.documents(s, d))),
    "mm_decode" -> ((s, d) => Multimodal.mmDecode(Tables.documents(s, d))),
    "mm_png" -> ((s, d) => Multimodal.mmPng(Tables.documents(s, d))),
    "mm_phash" -> ((s, d) => Multimodal.mmPhash(Tables.documents(s, d))),
    "mm_phash_curve" -> ((s, d) => Multimodal.mmPhashCurve(Tables.documents(s, d))),
    "pipeline_mm_curation" -> ((s, d) => Multimodal.mmCuration(Tables.documents(s, d))),
    "mm_phash_incremental" -> ((s, d) => Multimodal.mmPhashIncremental(Tables.documents(s, d))),
    "mm_mulaw" -> ((s, d) => Multimodal.mmMulaw(Tables.documents(s, d))),
    "mm_alaw" -> ((s, d) => Multimodal.mmAlaw(Tables.documents(s, d))),
    "mm_jpeg" -> ((s, d) => Multimodal.mmJpeg(Tables.documents(s, d))),
    "mm_gif" -> ((s, d) => Multimodal.mmGif(Tables.documents(s, d))),
    "mm_resize" -> ((s, d) => Multimodal.mmResize(Tables.documents(s, d))),
    "mm_resample" -> ((s, d) => Multimodal.mmResample(Tables.documents(s, d))),
    "text_span_dedup" -> ((s, d) => TextOps.spanDedup(Tables.documents(s, d))),
    "text_span_removal" -> ((s, d) => TextOps.spanRemoval(Tables.documents(s, d))),
    "pipeline_pack" -> ((s, d) => TextOps.packSequences(Tables.documents(s, d))),
    "pipeline_pack_split" -> ((s, d) => TextOps.packSequencesSplit(Tables.documents(s, d))),
    "text_unigram_lp" -> ((s, d) => TextOps.textUnigramLp(Tables.documents(s, d))),
    "text_bigram_lp" -> ((s, d) => TextOps.textBigramLp(Tables.documents(s, d))),
    "tokenizer_bpe" -> ((s, d) => TextOps.tokenizerBpe(Tables.documents(s, d))),
    "tokenizer_bpe_batched" -> ((s, d) =>
      TextOps.tokenizerBpeBatched(Tables.documents(s, d))),
    "tokenizer_apply" -> ((s, d) => TextOps.tokenizerApply(Tables.documents(s, d))),
    "tokenizer_apply_stored" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.tokenizerApplyStored(docs,
        TextOps.ensureVocabIndex(docs, TextOps.defaultVocabDir(docs, d)))
    }),
    "text_tfidf" -> ((s, d) => TextOps.textTfidf(Tables.documents(s, d))),
    "text_bm25" -> ((s, d) => TextOps.textBm25(Tables.documents(s, d))),
    "text_bm25_stored" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.textBm25Stored(s,
        TextOps.ensureLexIndex(docs, TextOps.defaultLexIndexDir(docs, d)))
    }),
    "pipeline_mix" -> ((s, d) => TextOps.mixDomains(Tables.documents(s, d))),
    "pipeline_shuffle" -> ((s, d) => TextOps.shuffleOrder(Tables.documents(s, d))),
    "text_langid_confusion" -> ((s, d) => TextOps.langidConfusion(Tables.documents(s, d))),
    "text_quality_lr" -> ((s, d) => TextOps.textQualityLr(Tables.documents(s, d))),
    "text_entropy" -> ((s, d) => TextOps.textEntropy(Tables.documents(s, d))),
    "text_lang_balance" -> ((s, d) => TextOps.textLangBalance(Tables.documents(s, d))),
    "pipeline_dedup_impact" -> ((s, d) => TextOps.dedupImpact(Tables.documents(s, d))),
    "text_quality_train" -> ((s, d) => TextOps.textQualityTrain(Tables.documents(s, d))),
    "text_quality_trained_score" -> ((s, d) => TextOps.textQualityLrTrained(Tables.documents(s, d))),
    "text_quality_score_stored" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.textQualityScoreStored(docs,
        TextOps.ensureQualityModel(docs, TextOps.defaultQualityModelDir(docs, d)))
    }),
    "text_gopher" -> ((s, d) => TextOps.textGopher(Tables.documents(s, d))),
    "text_ccnet_bucket" -> ((s, d) => TextOps.textCcnetBucket(Tables.documents(s, d))),
    "pipeline_budget" -> ((s, d) => TextOps.budgetDomains(Tables.documents(s, d))),
    "pipeline_dsir" -> ((s, d) => TextOps.pipelineDsir(Tables.documents(s, d))),
    "embedding_diversity" -> ((s, d) => Ann.embeddingDiversity(Tables.embeddings(s, d))),
    "ann_pq" -> ((s, d) => Ann.annPq(Tables.embeddings(s, d))),
    "ann_ivf_pq" -> ((s, d) => Ann.annIvfPq(Tables.embeddings(s, d))),
    "ann_ivf_sampled" -> ((s, d) => Ann.annIvfSampled(Tables.embeddings(s, d))),
    "ann_recall_audit" -> ((s, d) => Ann.annRecallAudit(Tables.embeddings(s, d))),
    "embedding_outliers" -> ((s, d) => Ann.embeddingOutliers(Tables.embeddings(s, d))),
    "embedding_drift" -> ((s, d) => Ann.embeddingDrift(Tables.embeddings(s, d))),
    "embedding_centroid_shift" -> ((s, d) =>
      Ann.embeddingCentroidShift(Tables.embeddings(s, d))),
    "text_quality_calibration" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.textQualityCalibration(docs, Some(
        TextOps.ensureQualityModel(docs, TextOps.defaultQualityModelDir(docs, d))))
    }),
    "pipeline_epoch_diff" -> ((s, d) => TextOps.pipelineEpochDiff(Tables.documents(s, d))),
    "ann_ivf_probe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.annIvfProbe(e, Ann.ensureIvfIndex(e, Ann.defaultIvfIndexDir(e, d)))
    }),
    "ann_pq_probe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.annPqProbe(e, Ann.ensurePqIndex(e, Ann.defaultPqIndexDir(e, d)))
    }),
    "ann_binary_probe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.annBinaryProbe(e, Ann.ensureBinaryIndex(e, Ann.defaultBinaryIndexDir(e, d)))
    }),
    "pipeline_retrieval" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.pipelineRetrieval(e, Tables.documents(s, d),
        Ann.ensureIvfIndex(e, Ann.defaultIvfIndexDir(e, d)))
    }),
    "pipeline_hybrid_retrieval" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val docs = Tables.documents(s, d)
      Ann.pipelineHybridRetrieval(e, docs,
        Ann.ensureIvfIndex(e, Ann.defaultIvfIndexDir(e, d)),
        lexIndexDir = Some(TextOps.ensureLexIndex(docs,
          TextOps.defaultLexIndexDir(docs, d))))
    }),
    "pipeline_assembly" -> ((s, d) => TextOps.assemblyPipeline(Tables.documents(s, d))),
    "embedding_cluster_hist" -> ((s, d) => Ann.embeddingClusterHist(Tables.embeddings(s, d))),
    "pipeline_decontaminate" -> ((s, d) => TextOps.decontaminate(Tables.documents(s, d))),
    "mm_video" -> ((s, d) => Multimodal.mmVideo(Tables.documents(s, d))),
    "scale_salted_agg" -> ((s, d) => ScaleOps.saltedAgg(Tables.events(s, d))),
    "scale_salted_join" -> ((s, d) => ScaleOps.saltedJoin(Tables.events(s, d))),
    "scale_approx_distinct" -> ((s, d) => ScaleOps.approxDistinct(Tables.lineitem(s, d))),
    "scale_countmin" -> ((s, d) => ScaleOps.countMin(Tables.events(s, d))),
    "scale_countmin_stored" -> ((s, d) =>
      ScaleOps.countMinStoredFace(Tables.events(s, d), d)),
    "scale_hll" -> ((s, d) => ScaleOps.hllDistinct(Tables.events(s, d))),
    "scale_hll_stored" -> ((s, d) =>
      ScaleOps.hllStoredFace(Tables.events(s, d), d)),
    "scale_profile" -> ((s, d) => ScaleOps.profile(Tables.documents(s, d))),
    "scale_histogram" -> ((s, d) => ScaleOps.histQuantiles(Tables.orders(s, d))),
    "scale_skew_report" -> ((s, d) => ScaleOps.skewReport(Tables.events(s, d))),
    "scale_bloom" -> ((s, d) => ScaleOps.bloomAudit(Tables.customer(s, d))),
    "scale_quantile_bins" -> ((s, d) => ScaleOps.quantileBins(Tables.orders(s, d))),
    "scale_quantile_sketch" -> ((s, d) => ScaleOps.quantileSketch(Tables.orders(s, d))),
    "scale_quantile_grouped" -> ((s, d) => ScaleOps.quantileSketchGrouped(Tables.orders(s, d))),
    "scale_quantile_sliding" -> ((s, d) => ScaleOps.quantileSliding(Tables.events(s, d))),
    "scale_quantile_double" -> ((s, d) => ScaleOps.quantileSketchDouble(Tables.events(s, d))),
    "scale_quantile_stored" -> ((s, d) =>
      ScaleOps.quantileStoredFace(Tables.orders(s, d), d)),
    "scale_join_estimate" -> ((s, d) => ScaleOps.joinEstimate(Tables.orders(s, d), Tables.lineitem(s, d))),
    "scale_join_estimate_stored" -> ((s, d) =>
      ScaleOps.joinEstimateStoredFace(Tables.orders(s, d), Tables.lineitem(s, d), d)),
    "scale_join_admission" -> ((s, d) =>
      ScaleOps.joinAdmissionFace(Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.customer(s, d), Tables.part(s, d), d)),
    "scale_join_admission_fast" -> ((s, d) =>
      ScaleOps.joinAdmissionFastFace(Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.customer(s, d), Tables.part(s, d), d)),
    // broadcastMax 5000 is a demo budget chosen so the three pairs
    // split across verdicts at the gate SFs
    "scale_join_route" -> ((s, d) =>
      ScaleOps.joinRouteFace(Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.customer(s, d), Tables.part(s, d), d, broadcastMax = 5000L)),
    "scale_hll_grouped" -> ((s, d) => ScaleOps.hllGrouped(Tables.events(s, d))),
    "scale_integrity" -> ((s, d) => ScaleOps.integrityAudit(
      Tables.orders(s, d), Tables.lineitem(s, d), Tables.customer(s, d))),
    "scale_bucketed_join" -> ((s, d) => { ScaleOps.writeBucketed(s, d); ScaleOps.bucketedJoin(s) }),
    "scale_partition_prune" -> ((s, d) =>
      ScaleOps.partitionPrunedScan(s, ScaleOps.writePartitionedLayout(s, d))),
    "scale_zorder_box" -> ((s, d) =>
      ScaleOps.zorderBoxScan(s, ScaleOps.writeZorderLayout(s, d))),
    "q17_cube" -> ((s, d) => Relational.q17Cube(Tables.orders(s, d))),
    "q18_percentiles" -> ((s, d) => Relational.q18Percentiles(Tables.lineitem(s, d))),
    "q18b_percentiles_approx" -> ((s, d) => Relational.q18bPercentilesApprox(Tables.lineitem(s, d))),
    "q20_outer_join" -> ((s, d) => Relational.q20OuterJoin(Tables.customer(s, d), Tables.orders(s, d))),
    "q22_upsert" -> ((s, d) => Relational.q22Upsert(Tables.orders(s, d))),
    "q21_json_extract" -> ((s, d) => Relational.q21JsonExtract(Tables.events(s, d))),
    "q19_stats" -> ((s, d) => Relational.q19Stats(Tables.lineitem(s, d))),
    "q23_supplier_rank" -> ((s, d) => Relational.q23SupplierRank(
      Tables.lineitem(s, d), Tables.supplier(s, d), Tables.nation(s, d))),
    "text_ngram_freq" -> ((s, d) => TextOps.ngramFreq(Tables.documents(s, d))),
    "dedup_fingerprint" -> ((s, d) => Dedup.dedupFingerprint(Tables.documents(s, d), portable = true)),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(Tables.documents(s, d))),
    "mm_frames" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Multimodal.frameSample(Multimodal.mediaTable(Tables.documents(s, d))).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }),
    "scale_hash_split" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      ScaleOps.hashSplit(Tables.documents(s, d))
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .orderBy(col("split"))
    }),
    "q63_asof_join" -> ((s, d) =>
      Relational.q63AsofJoin(Tables.events(s, d), Tables.orders(s, d))),
    "embedding_label_prop" -> ((s, d) =>
      Ann.embeddingLabelProp(Tables.embeddings(s, d))),
    "dedup_best_keeper" -> ((s, d) =>
      Dedup.dedupBestKeeper(Tables.documents(s, d))),
    "scale_join_preflight" -> ((s, d) => ScaleOps.joinPreflight(
      Tables.lineitem(s, d), "l_orderkey",
      Tables.orders(s, d), "o_orderkey", broadcastMax = 100000L)),
    "scale_profile_diff" -> ((s, d) => ScaleOps.profileDiff(Tables.documents(s, d))),
    "scale_keyed_sample" -> ((s, d) => ScaleOps.sampleKeyed(Tables.events(s, d))),
    "scale_hll_sliding" -> ((s, d) => ScaleOps.hllSliding(Tables.events(s, d))),
    "scale_agg_delta" -> ((s, d) => ScaleOps.aggDelta(Tables.orders(s, d))),
    "scale_join_delta" -> ((s, d) =>
      ScaleOps.joinDelta(Tables.orders(s, d), Tables.lineitem(s, d))),
    "scale_cdc_apply" -> ((s, d) =>
      ScaleOps.cdcApply(ScaleOps.cdcLog(Tables.orders(s, d)))),
    "scale_pps_sample" -> ((s, d) => ScaleOps.ppsSample(Tables.documents(s, d))),
    "scale_pps_salted" -> ((s, d) => ScaleOps.ppsSampleSalted(Tables.documents(s, d))),
    "scale_kmv_setops" -> ((s, d) => ScaleOps.kmvSetOps(Tables.orders(s, d))),
    "scale_kmv_matrix" -> ((s, d) => ScaleOps.kmvMatrix(Tables.orders(s, d))),
    "scale_kmv_matrix_stored" -> ((s, d) => {
      val o = Tables.orders(s, d)
      ScaleOps.kmvMatrixStored(o,
        ScaleOps.ensureKmvSketches(o, ScaleOps.defaultKmvSketchDir(o, d)))
    }),
    "scale_heavy_hitters" -> ((s, d) =>
      ScaleOps.heavyHitters(Tables.documents(s, d))),
    "scale_heavy_earners" -> ((s, d) =>
      ScaleOps.heavyEarners(Tables.documents(s, d))),
    "scale_topk_certified" -> ((s, d) =>
      ScaleOps.topkCertified(Tables.documents(s, d))),
    "scale_heavy_hitters_grouped" -> ((s, d) =>
      ScaleOps.heavyHittersGrouped(Tables.documents(s, d))),
    "scale_m4_downsample" -> ((s, d) =>
      ScaleOps.m4Downsample(Tables.events(s, d))),
    "scale_zonemap_prune" -> ((s, d) =>
      ScaleOps.zonemapPrune(Tables.lineitem(s, d))),
    "scale_k_anonymity" -> ((s, d) => ScaleOps.kAnonymity(Tables.customer(s, d))),
    // threshold 80 sits below this dataset's hottest user at every SF
    // (max 86–99 events/user), so the verdict exercises the salt path
    "scale_window_preflight" -> ((s, d) =>
      ScaleOps.windowPreflight(Tables.events(s, d), "user_id", hotThreshold = 80L)),
    "scale_sessions_salted" -> ((s, d) =>
      ScaleOps.sessionsSalted(Tables.events(s, d))),
    "scale_asof_salted" -> ((s, d) =>
      ScaleOps.asofSalted(Tables.events(s, d), Tables.orders(s, d))),
    "pipeline_leakage_safe_split" -> ((s, d) =>
      Dedup.leakageSafeSplit(Tables.documents(s, d))),
    "q64_hierarchy_rollup" -> ((s, d) =>
      Relational.q64HierarchyRollup(Tables.part(s, d))),
    "text_chunk" -> ((s, d) => TextOps.textChunk(Tables.documents(s, d))),
    "dedup_chunk_exact" -> ((s, d) => TextOps.dedupChunkExact(Tables.documents(s, d))),
  )

  /** Oracle for embedding_pca: the integer power iteration UNROLLED —
    * one (w, mx, v) CTE triple per iteration. Everything is exact
    * BIGINT arithmetic (bp quantization → Gram fold by `//` → per-step
    * milli renormalization), so the loadings hash-match bit-for-bit.
    * DuckDB sums BIGINT into HUGEINT; all values stay ≪ 2^63 (|x| ≤
    * 0.6 → |xb| ≤ 6e3, Gram sums ≤ ~1e11), so casting back is safe. */
  /** The ONE incremental positional-index family shared by the three
    * incremental text faces (phrase/proximity/collocation): ensure-
    * built once per (corpus content, params), then each face reads
    * the same epoch family — the registry mirrors production, where
    * one maintained index serves every IR question. */
  private def posIndexIncDir(s: SparkSession, d: String): String = {
    val docs = Tables.documents(s, d)
    // -e3: the slice count is part of the key (the ensure sentinel is
    // delta-b{n-1}, so different slice counts must never share a dir)
    val dir = StoredArtifacts.contentKeyedDirOn("graft-pos-index-inc",
      docs, "text", d, "-b64s3-e3")
    TextOps.ensurePosIndexIncremental(docs, dir)
    dir
  }

  /** One pair's CTE chain of the multi-pair admission oracle — the
    * scale_join_estimate oracle parameterized by (table, key) per
    * side, CTEs suffixed `$i` so three pairs share one WITH. */
  private def jeCtes(i: Int, aT: String, aC: String, bT: String,
                     bC: String): String =
    s"""a$i AS (SELECT CAST($aC AS VARCHAR) AS k FROM $aT
       |        WHERE $aC IS NOT NULL),
       |b$i AS (SELECT CAST($bC AS VARCHAR) AS k FROM $bT
       |        WHERE $bC IS NOT NULL),
       |ca$i AS (
       |  SELECT r.r AS row,
       |    CAST(('0x' || substr(md5(k || ':cm' || r.r), 1, 15)) AS BIGINT) % 512 AS cell,
       |    count(*) AS cnt
       |  FROM a$i, (SELECT unnest(range(4)) AS r) r GROUP BY 1, 2
       |), cb$i AS (
       |  SELECT r.r AS row,
       |    CAST(('0x' || substr(md5(k || ':cm' || r.r), 1, 15)) AS BIGINT) % 512 AS cell,
       |    count(*) AS cnt
       |  FROM b$i, (SELECT unnest(range(4)) AS r) r GROUP BY 1, 2
       |), ip$i AS (
       |  SELECT ca$i.row, CAST(sum(CAST(ca$i.cnt AS HUGEINT) * cb$i.cnt) AS BIGINT) AS ip
       |  FROM ca$i JOIN cb$i ON ca$i.row = cb$i.row AND ca$i.cell = cb$i.cell
       |  GROUP BY 1
       |), est$i AS (
       |  SELECT min(COALESCE(ip$i.ip, 0)) AS est_join_rows
       |  FROM (SELECT unnest(range(4)) AS row) d LEFT JOIN ip$i ON ip$i.row = d.row
       |), ex$i AS (
       |  SELECT CAST(COALESCE(sum(CAST(x.ca AS HUGEINT) * y.cb), 0) AS BIGINT)
       |    AS exact_join_rows
       |  FROM (SELECT k, count(*) AS ca FROM a$i GROUP BY 1) x
       |  JOIN (SELECT k, count(*) AS cb FROM b$i GROUP BY 1) y USING (k)
       |), sz$i AS (
       |  SELECT (SELECT count(*) FROM a$i) AS n_a,
       |         (SELECT count(*) FROM b$i) AS n_b
       |)""".stripMargin

  private def jeSelect(i: Int, label: String): String =
    s"""SELECT '$label' AS pair, sz$i.n_a, sz$i.n_b,
       |  ex$i.exact_join_rows, est$i.est_join_rows,
       |  est$i.est_join_rows >= ex$i.exact_join_rows AS never_underestimates,
       |  CASE WHEN ex$i.exact_join_rows > 0 THEN
       |    CAST(CAST(est$i.est_join_rows - ex$i.exact_join_rows AS HUGEINT)
       |      * 10000 // ex$i.exact_join_rows AS BIGINT)
       |  END AS overshoot_bp,
       |  CAST(CAST(sz$i.n_a AS HUGEINT) * sz$i.n_b // 512 AS BIGINT) AS noise_budget,
       |  est$i.est_join_rows - ex$i.exact_join_rows
       |    <= 3 * (CAST(sz$i.n_a AS HUGEINT) * sz$i.n_b // 512) AS within_noise
       |FROM sz$i, ex$i, est$i""".stripMargin

  /** The estimate-only projection of [[jeSelect]] — the
    * scale_join_admission_fast oracle's tail: no exact/audit columns,
    * mirroring the Spark face that reads sketches alone. */
  private def jeSelectFast(i: Int, label: String): String =
    s"""SELECT '$label' AS pair, sz$i.n_a, sz$i.n_b, est$i.est_join_rows,
       |  CAST(CAST(sz$i.n_a AS HUGEINT) * sz$i.n_b // 512 AS BIGINT) AS noise_budget
       |FROM sz$i, est$i""".stripMargin

  /** The route projection of the admission oracle — 47j's advice
    * rules over sketch-served inputs, mirrored exactly. */
  private def jeSelectRoute(i: Int, label: String): String =
    s"""SELECT '$label' AS pair, sz$i.n_a, sz$i.n_b, est$i.est_join_rows,
       |  CAST(CAST(sz$i.n_a AS HUGEINT) * sz$i.n_b // 512 AS BIGINT) AS noise_budget,
       |  CASE WHEN least(sz$i.n_a, sz$i.n_b) <= 5000 THEN 'broadcast'
       |       WHEN CAST(est$i.est_join_rows AS HUGEINT)
       |              - 3 * (CAST(sz$i.n_a AS HUGEINT) * sz$i.n_b // 512)
       |            > 4 * (CAST(sz$i.n_a AS HUGEINT) + sz$i.n_b) THEN 'salt'
       |       ELSE 'shuffle' END AS route
       |FROM sz$i, est$i""".stripMargin

  private val admissionPairTables = Seq(
    ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"))

  private def admissionOracle(select: (Int, String) => String): String =
    "WITH " + admissionPairTables.zipWithIndex.map { case ((_, aT, aC, bT, bC), i) =>
      jeCtes(i, aT, aC, bT, bC) }.mkString(",\n") + "\n" +
      admissionPairTables.zipWithIndex.map { case ((label, _, _, _, _), i) =>
        select(i, label) }.mkString("\nUNION ALL\n") +
      "\nORDER BY pair"

  private def joinAdmissionOracleSql: String = admissionOracle(jeSelect)
  private def joinAdmissionFastOracleSql: String = admissionOracle(jeSelectFast)
  private def joinRouteOracleSql: String = admissionOracle(jeSelectRoute)

  private def pcaCtes(iters: Int, dims: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""w$t AS (
         |  SELECT m.i, CAST(sum(m.m * v${t - 1}.v) AS BIGINT) AS w
         |  FROM m JOIN v${t - 1} ON v${t - 1}.i = m.j GROUP BY m.i
         |), x$t AS (SELECT max(abs(w)) AS mx FROM w$t),
         |v$t AS (SELECT w$t.i, CAST((w$t.w * 1000) // x$t.mx AS BIGINT) AS v
         |        FROM w$t, x$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c AS MATERIALIZED (
       |  SELECT vec_id, i.i AS i, CAST(round(v[i.i + 1] * 1e4) AS BIGINT) AS xb
       |  FROM e, range(0, $dims) i(i)
       |), m AS MATERIALIZED (
       |  SELECT a.i AS i, b.i AS j, CAST(sum(a.xb * b.xb) // 1000000 AS BIGINT) AS m
       |  FROM c a JOIN c b USING (vec_id) GROUP BY a.i, b.i
       |), v0 AS (SELECT i.i AS i, CAST(1000 AS BIGINT) AS v FROM range(0, $dims) i(i)),
       |$steps""".stripMargin
  }

  private def pcaOracleSql(iters: Int = 8, dims: Int = 64): String =
    pcaCtes(iters, dims) +
      s"""
         |SELECT CAST(i AS BIGINT) AS dim, v AS loading_milli,
         |  CAST(v AS DOUBLE) / 1e3 AS loading
         |FROM v$iters ORDER BY i""".stripMargin

  /** Oracle for embedding_kmeans: every Lloyd iteration unrolled —
    * assignment is the exact-integer argmin over bp coords (row_number
    * with the (dist, list_id) tie order), the centroid update is the
    * all-integer half-away-from-zero mean (2s ± n) // 2n, and clusters
    * that lose all members keep their previous centroid via the LEFT
    * JOIN coalesce. a/cent CTEs are MATERIALIZED — each is referenced
    * by the next round and the quality_train lesson applies (DuckDB's
    * default inlining re-expands the chain exponentially). */
  private def kmeansOracleSql(nlist: Int = 8, iters: Int = 3, dims: Int = 64): String =
    kmeansCtes(nlist, iters, dims) + """
      |SELECT vec_id, CAST(list_id AS BIGINT) AS list_id, dist AS dist_sq
      |FROM af ORDER BY vec_id""".stripMargin

  /** Oracle for pipeline_cluster_balance: the kmeans chain's final
    * assignment, then the stratified-sample quota/threshold audit
    * keyed by learned cluster instead of projection band. */
  private def clusterBalanceOracleSql(nlist: Int = 8, iters: Int = 3,
                                      dims: Int = 64): String =
    kmeansCtes(nlist, iters, dims) + s""",
      |cnt AS (SELECT list_id, count(*) AS n_vecs FROM af GROUP BY list_id),
      |q AS (SELECT (sum(n_vecs) // ${2L * nlist}) AS quota FROM cnt),
      |th AS (SELECT list_id, n_vecs,
      |  CAST(least(1000, (q.quota * 1000) // n_vecs) AS BIGINT) AS thresh_permille FROM cnt, q)
      |SELECT CAST(a.list_id AS BIGINT) AS list_id, th.n_vecs, th.thresh_permille,
      |  CAST(sum(CASE WHEN CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR) || ':cbal'), 1, 8)) AS BIGINT) % 1000
      |    < th.thresh_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  min(a.dist) AS min_dist_sq, max(a.dist) AS max_dist_sq
      |FROM af a JOIN th USING (list_id)
      |GROUP BY 1, 2, 3 ORDER BY list_id""".stripMargin

  private def kmeansCtes(nlist: Int = 8, iters: Int = 3, dims: Int = 64): String = {
    val steps = (1 to iters).map { t =>
      s"""d$t AS (
         |  SELECT c.vec_id, k.list_id,
         |    CAST(sum((c.xb - k.cb) * (c.xb - k.cb)) AS BIGINT) AS dist
         |  FROM c JOIN cent${t - 1} k ON k.i = c.i GROUP BY 1, 2
         |), a$t AS MATERIALIZED (
         |  SELECT vec_id, list_id FROM (
         |    SELECT vec_id, list_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rk
         |    FROM d$t) WHERE rk = 1
         |), u$t AS (
         |  SELECT a.list_id, c.i,
         |    CAST((2 * sum(c.xb) + CASE WHEN sum(c.xb) >= 0 THEN count(*) ELSE -count(*) END)
         |      // (2 * count(*)) AS BIGINT) AS cb
         |  FROM a$t a JOIN c USING (vec_id) GROUP BY 1, 2
         |), cent$t AS MATERIALIZED (
         |  SELECT p.list_id, p.i, CAST(coalesce(u.cb, p.cb) AS BIGINT) AS cb
         |  FROM cent${t - 1} p LEFT JOIN u$t u ON u.list_id = p.list_id AND u.i = p.i
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c AS MATERIALIZED (
       |  SELECT vec_id, i.i AS i, CAST(round(v[i.i + 1] * 1e4) AS BIGINT) AS xb
       |  FROM e, range(0, $dims) i(i)
       |), s0 AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY h, vec_id) - 1 AS list_id
       |  FROM (SELECT vec_id, ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |        FROM embeddings ORDER BY h, vec_id LIMIT $nlist)
       |), cent0 AS MATERIALIZED (
       |  SELECT s0.list_id, c.i, c.xb AS cb FROM s0 JOIN c USING (vec_id)
       |),
       |$steps,
       |df AS (
       |  SELECT c.vec_id, k.list_id,
       |    CAST(sum((c.xb - k.cb) * (c.xb - k.cb)) AS BIGINT) AS dist
       |  FROM c JOIN cent$iters k ON k.i = c.i GROUP BY 1, 2
       |), af AS MATERIALIZED (
       |  SELECT vec_id, list_id, dist FROM (
       |    SELECT vec_id, list_id, dist,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rk
       |    FROM df) WHERE rk = 1
       |)""".stripMargin
  }

  /** Oracle for embedding_pca2: the pca chain, then integer Hotelling
    * deflation (λ̂ = v·Mv // v·v, M₂ = M − (λ̂·v_i·v_j) // v·v — every
    * quantity exact BIGINT, `//` truncation mirrored by Scala `/`),
    * then a second 8-step power iteration over M₂ with `b`-prefixed
    * CTEs. v8 is re-materialized first: it is referenced five times
    * below, and each reference re-expands the 2^8 step chain. */
  private def pca2OracleSql(iters: Int = 8, dims: Int = 64): String = {
    val steps2 = (1 to iters).map { t =>
      s"""bw$t AS (
         |  SELECT m.i, CAST(sum(m.m * bv${t - 1}.v) AS BIGINT) AS w
         |  FROM m2 m JOIN bv${t - 1} ON bv${t - 1}.i = m.j GROUP BY m.i
         |), bx$t AS (SELECT max(abs(w)) AS mx FROM bw$t),
         |bv$t AS (SELECT bw$t.i, CAST((bw$t.w * 1000) // bx$t.mx AS BIGINT) AS v
         |        FROM bw$t, bx$t)""".stripMargin
    }.mkString(",\n")
    pcaCtes(iters, dims) + s""",
       |vf AS MATERIALIZED (SELECT i, v FROM v$iters),
       |mv AS (SELECT m.i, CAST(sum(m.m * vf.v) AS BIGINT) AS w
       |       FROM m JOIN vf ON vf.i = m.j GROUP BY m.i),
       |nm AS (SELECT CAST(sum(vf.v * mv.w) AS BIGINT) AS n
       |       FROM vf JOIN mv USING (i)),
       |dn AS (SELECT CAST(sum(v * v) AS BIGINT) AS d FROM vf),
       |lam AS (SELECT nm.n // dn.d AS l FROM nm, dn),
       |m2 AS MATERIALIZED (
       |  SELECT m.i, m.j,
       |    CAST(m.m - (lam.l * va.v * vb.v) // dn.d AS BIGINT) AS m
       |  FROM m, lam, dn, vf va, vf vb WHERE va.i = m.i AND vb.i = m.j
       |),
       |bv0 AS (SELECT i.i AS i, CAST(1000 AS BIGINT) AS v FROM range(0, $dims) i(i)),
       |$steps2
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS component, CAST(i AS BIGINT) AS dim,
       |    v AS loading_milli, CAST(v AS DOUBLE) / 1e3 AS loading FROM vf
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), CAST(i AS BIGINT), v, CAST(v AS DOUBLE) / 1e3
       |  FROM bv$iters
       |) ORDER BY component, dim""".stripMargin
  }

  /** Oracle for embedding_project: the pca chain composed with one
    * exact integer dot product per vector (xb · loading_milli, folded
    * back to basis points by truncating division). */
  private def projectOracleSql(iters: Int = 8, dims: Int = 64): String =
    pcaCtes(iters, dims) +
      s"""
         |SELECT c.vec_id,
         |  CAST(sum(c.xb * v.v) // 1000 AS BIGINT) AS proj_bp,
         |  CAST(CAST(sum(c.xb * v.v) // 1000 AS BIGINT) AS DOUBLE) / 1e4 AS proj
         |FROM c JOIN v$iters v ON v.i = c.i
         |GROUP BY c.vec_id ORDER BY c.vec_id""".stripMargin

  /** Oracle for embedding_stratified_sample: the pca chain + exact
    * integer projection, fixed-width banding over [min, max], equal
    * quota, and the md5-permille acceptance — all integer except the
    * IEEE-exact projection products. */
  private def stratOracleSql(bands: Int = 8, iters: Int = 8, dims: Int = 64): String =
    pcaCtes(iters, dims) + s""",
       |proj AS MATERIALIZED (
       |  SELECT c.vec_id, CAST(sum(c.xb * v.v) // 1000 AS BIGINT) AS proj_bp
       |  FROM c JOIN v$iters v ON v.i = c.i GROUP BY c.vec_id
       |), rng AS (SELECT min(proj_bp) AS mn, max(proj_bp) AS mx FROM proj),
       |bnd AS MATERIALIZED (
       |  SELECT vec_id, proj_bp,
       |    least(${bands - 1}, ((proj_bp - rng.mn) * $bands) // (rng.mx - rng.mn + 1)) AS band
       |  FROM proj, rng
       |), cnt AS (SELECT band, count(*) AS n_vecs FROM bnd GROUP BY band),
       |q AS (SELECT (sum(n_vecs) // ${2L * bands}) AS quota FROM cnt),
       |th AS (SELECT band, n_vecs,
       |  CAST(least(1000, (q.quota * 1000) // n_vecs) AS BIGINT) AS thresh_permille FROM cnt, q)
       |SELECT b.band, th.n_vecs, th.thresh_permille,
       |  CAST(sum(CASE WHEN CAST(('0x' || substr(md5(CAST(b.vec_id AS VARCHAR) || ':strat'), 1, 8)) AS BIGINT) % 1000
       |    < th.thresh_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  min(b.proj_bp) AS min_proj_bp, max(b.proj_bp) AS max_proj_bp
       |FROM bnd b JOIN th USING (band)
       |GROUP BY b.band, th.n_vecs, th.thresh_permille ORDER BY b.band""".stripMargin

  /** Shared CTEs for the text_quality_train family: quantized LR
    * features (exact per-row count divisions rounded to basis points —
    * IEEE division is exactly rounded, so both engines quantize
    * identically), the planted conjunctive label, and the `iters`
    * full-batch gradient steps UNROLLED (one (e, g, w) CTE triple per
    * step — the embedding_pca idiom applied to model training). All
    * integer: hard-sigmoid probabilities, truncating `//` updates. */
  private def lrTrainCtes(iters: Int, lrDen: Long): String = {
    val zSql = "(l.x0*w.w0 + l.x1*w.w1 + l.x2*w.w2 + l.x3*w.w3 + l.x4*w.w4)"
    val steps = (1 to iters).map { t =>
      val gCols = (0 to 4).map(j => s"CAST(sum(e * x$j) AS BIGINT) AS g$j").mkString(", ")
      val wCols = (0 to 4).map(j =>
        s"CAST(w.w$j - g.g$j // (nn.n * $lrDen) AS BIGINT) AS w$j").mkString(", ")
      s"""e$t AS (
         |  SELECT l.*, least(greatest(5000 + (($zSql // 10000) // 400), 0), 10000)
         |    - 10000 * l.y AS e
         |  FROM lab l, w${t - 1} w
         |), g$t AS (SELECT $gCols FROM e$t),
         |w$t AS MATERIALIZED (SELECT $wCols FROM w${t - 1} w, g$t g, nn)""".stripMargin
    }.mkString(",\n")
    val w0Cols = (0 to 4).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")
    s"""WITH tq AS (
       |  SELECT doc_id,
       |    regexp_split_to_array(trim(lower(text)), '\\s+') AS toks,
       |    length(text) AS n_chars,
       |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
       |    length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonws
       |  FROM documents
       |), feat AS (
       |  SELECT doc_id, CAST(10000 AS BIGINT) AS x0,
       |    CAST(round(least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 1e4) AS BIGINT) AS x1,
       |    CAST(round(CAST(len(list_filter(toks, x ->
       |      x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks) * 1e5) AS BIGINT) AS x2,
       |    CAST(round(CAST(n_punct AS DOUBLE) / n_chars * 1e4) AS BIGINT) AS x3,
       |    CAST(round(CAST(n_nonws AS DOUBLE) / len(toks) / 10.0 * 1e4) AS BIGINT) AS x4
       |  FROM tq
       |), lab AS MATERIALIZED (
       |  SELECT *, CAST((x1 >= 8000 AND x2 >= 5000) AS BIGINT) AS y
       |  FROM feat
       |), nn AS (SELECT count(*) AS n FROM lab),
       |w0 AS MATERIALIZED (SELECT $w0Cols),
       |$steps""".stripMargin
  }

  private def lrTrainOracleSql(iters: Int = 32, lrDen: Long = 40L): String = {
    val names = Seq("bias", "len", "stop", "punct", "wordlen")
    val rows = names.zipWithIndex.map { case (nm, j) =>
      s"""SELECT CAST($j AS BIGINT) AS feature_id, '$nm' AS feature,
         |    w$j AS w_micro, CAST(w$j AS DOUBLE) / 1e6 AS weight FROM w$iters""".stripMargin
    }.mkString("\n  UNION ALL ")
    lrTrainCtes(iters, lrDen) + s"""
       |SELECT * FROM (
       |  $rows
       |) ORDER BY feature_id""".stripMargin
  }

  private def lrTrainedScoreOracleSql(iters: Int = 32, lrDen: Long = 40L): String =
    lrTrainCtes(iters, lrDen) + s"""
       |SELECT l.doc_id, l.y AS label,
       |  CAST(least(greatest(5000 + (((l.x0*w.w0 + l.x1*w.w1 + l.x2*w.w2
       |      + l.x3*w.w3 + l.x4*w.w4) // 10000) // 400), 0), 10000) AS BIGINT) AS p_bp,
       |  CAST(least(greatest(5000 + (((l.x0*w.w0 + l.x1*w.w1 + l.x2*w.w2
       |      + l.x3*w.w3 + l.x4*w.w4) // 10000) // 400), 0), 10000) AS DOUBLE) / 1e4 AS p,
       |  least(greatest(5000 + (((l.x0*w.w0 + l.x1*w.w1 + l.x2*w.w2
       |      + l.x3*w.w3 + l.x4*w.w4) // 10000) // 400), 0), 10000) >= 5000 AS keep
       |FROM lab l, w$iters w ORDER BY l.doc_id""".stripMargin

  /** Shared k-NN-graph build CTEs (coef/buckets/pairs/adjacency) for
    * the ann_graph and graph_pagerank oracles — mirrors
    * Ann.knnGraph. */
  private def graphCtes(numPlanes: Int, tables: Int, degree: Int): String = {
    val bucketCols = (0 until tables).map { t =>
      s"""    CAST(sum(CASE WHEN p >= ${t * numPlanes} AND p < ${(t + 1) * numPlanes}
         |      AND dot >= 0 THEN 1 << (p - ${t * numPlanes}) ELSE 0 END) AS INT) AS b$t""".stripMargin
    }.mkString(",\n")
    val pairUnion = (0 until tables).map { t =>
      s"""  SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM bkt a JOIN bkt b ON a.b$t = b.b$t AND a.vec_id <> b.vec_id""".stripMargin
    }.mkString("\n  UNION\n")
    s"""WITH coef AS (
       |  SELECT p.p, j.j,
       |    (CAST(('0x' || substr(md5(p.p || ':' || j.j), 1, 15)) AS BIGINT)
       |      - 576460752303423488) / 576460752303423488.0 AS c
       |  FROM range(0, ${tables * numPlanes}) p(p), range(0, 64) j(j)
       |), e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |dots AS (
       |  SELECT e.vec_id, c.p, sum(e.v[c.j + 1] * c.c) AS dot
       |  FROM e, coef c GROUP BY e.vec_id, c.p
       |), bkt AS MATERIALIZED (
       |  SELECT vec_id,
       |$bucketCols
       |  FROM dots GROUP BY vec_id
       |), pairs AS MATERIALIZED (
       |$pairUnion
       |), scored AS MATERIALIZED (
       |  SELECT p.a, p.b,
       |    CAST(round(list_cosine_similarity(ea.v, eb.v) * 1e4) AS BIGINT) AS s
       |  FROM pairs p JOIN e ea ON ea.vec_id = p.a JOIN e eb ON eb.vec_id = p.b
       |), adj AS MATERIALIZED (
       |  SELECT a AS node, b AS nbr FROM (
       |    SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY s DESC, b) AS rn
       |    FROM scored) WHERE rn <= $degree
       |)""".stripMargin
  }

  /** Oracle for ann_graph: graph construction AND the greedy beam
    * search UNROLLED — one CTE block per hop (the tokenizer_bpe
    * idiom). Buckets come from the same md5-derived hyperplane
    * formula as ann_lsh (tables stacked in one coef relation); all
    * similarities are integer basis points so every frontier and the
    * final ranking are exact integer comparisons. */
  private def graphOracleSql(k: Int, stride: Int = 50, numPlanes: Int = 5,
                             tables: Int = 2, degree: Int = 6,
                             beam: Int = 8, hops: Int = 3): String = {
    val hopCtes = (1 to hops).map { h =>
      val prev = s"f${h - 1}"
      s"""x$h AS (
         |  SELECT q_id, vec_id FROM $prev
         |  UNION
         |  SELECT f.q_id, a.nbr AS vec_id FROM $prev f JOIN adj a ON a.node = f.vec_id
         |), s$h AS (
         |  SELECT x.q_id, x.vec_id,
         |    CAST(round(list_cosine_similarity(q.qv, e.v) * 1e4) AS BIGINT) AS s
         |  FROM x$h x JOIN q ON q.q_id = x.q_id JOIN e ON e.vec_id = x.vec_id
         |), f$h AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY s DESC, vec_id) AS rn
         |    FROM s$h) WHERE rn <= $beam
         |)""".stripMargin
    }.mkString(",\n")
    graphCtes(numPlanes, tables, degree) + s""",
       |q AS MATERIALIZED (
       |  SELECT e.vec_id AS q_id, e.v AS qv, b.b0
       |  FROM e JOIN bkt b USING (vec_id) WHERE e.vec_id % $stride = 0
       |), ent AS (SELECT b0, min(vec_id) AS entry FROM bkt GROUP BY b0),
       |f0 AS (SELECT q.q_id, ent.entry AS vec_id FROM q JOIN ent USING (b0)),
       |$hopCtes
       |SELECT q_id, CAST(rn AS BIGINT) AS rank, vec_id, CAST(s AS DOUBLE) / 1e4 AS cosine
       |FROM (
       |  SELECT x.q_id, x.vec_id,
       |    CAST(round(list_cosine_similarity(q.qv, e.v) * 1e4) AS BIGINT) AS s,
       |    row_number() OVER (PARTITION BY x.q_id ORDER BY
       |      CAST(round(list_cosine_similarity(q.qv, e.v) * 1e4) AS BIGINT) DESC,
       |      x.vec_id) AS rn
       |  FROM f$hops x JOIN q ON q.q_id = x.q_id JOIN e ON e.vec_id = x.vec_id
       |  WHERE x.vec_id <> x.q_id)
       |WHERE rn <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** Oracle for graph_pagerank: the shared graph CTEs + the exact
    * integer rank iterations UNROLLED (contribution = (r·17 // 20) //
    * outdeg, base 150000 micro-units), then the top-N by (rank desc,
    * node). All HUGEINT-exact; every iteration replays bit-for-bit. */
  private def pagerankOracleSql(iters: Int = 3, topN: Int = 20,
                                numPlanes: Int = 5, tables: Int = 2,
                                degree: Int = 6): String = {
    val steps = (1 to iters).map { t =>
      s"""c$t AS (
         |  SELECT r.node, ((r.r * 17) // 20) // od.deg AS c
         |  FROM r${t - 1} r JOIN od USING (node)
         |), r$t AS (
         |  SELECT e.vec_id AS node,
         |    CAST(150000 + coalesce(sum(cf.c), 0) AS BIGINT) AS r
         |  FROM e LEFT JOIN (
         |    SELECT a.nbr, c.c FROM c$t c JOIN adj a ON a.node = c.node) cf
         |    ON cf.nbr = e.vec_id
         |  GROUP BY e.vec_id
         |)""".stripMargin
    }.mkString(",\n")
    graphCtes(numPlanes, tables, degree) + s""",
       |od AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
       |r0 AS (SELECT vec_id AS node, CAST(1000000 AS BIGINT) AS r FROM e),
       |$steps
       |SELECT CAST(rn AS BIGINT) AS rank, node AS vec_id, r AS r_micro
       |FROM (
       |  SELECT node, r, row_number() OVER (ORDER BY r DESC, node) AS rn
       |  FROM r$iters)
       |WHERE rn <= $topN ORDER BY rank""".stripMargin
  }

  /** Oracle for graph_communities: the shared graph CTEs + N unrolled
    * synchronous label-propagation rounds (most frequent neighbor
    * label, ties to the smallest, isolated nodes keep their label) —
    * all integer labels, every round replays bit-for-bit. */
  private def communitiesOracleSql(rounds: Int = 3, numPlanes: Int = 5,
                                   tables: Int = 2, degree: Int = 6): String = {
    val steps = (1 to rounds).map { t =>
      s"""v$t AS (
         |  SELECT a.node, l.label, count(*) AS c
         |  FROM adj a JOIN l${t - 1} l ON l.node = a.nbr
         |  GROUP BY 1, 2
         |), w$t AS (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (
         |      PARTITION BY node ORDER BY c DESC, label ASC) AS rn
         |    FROM v$t) WHERE rn = 1
         |), l$t AS (
         |  SELECT p.node, COALESCE(w.label, p.label) AS label
         |  FROM l${t - 1} p LEFT JOIN w$t w USING (node)
         |)""".stripMargin
    }.mkString(",\n")
    graphCtes(numPlanes, tables, degree) + s""",
       |l0 AS (SELECT vec_id AS node, vec_id AS label FROM e),
       |$steps,
       |sz AS (SELECT label, count(*) AS community_size FROM l$rounds GROUP BY 1)
       |SELECT l.node AS vec_id, l.label AS community, sz.community_size
       |FROM l$rounds l JOIN sz USING (label)
       |ORDER BY vec_id""".stripMargin
  }

  /** Oracle for graph_triangles: the shared graph CTEs + undirected
    * dedup (least/greatest + DISTINCT), wedge self-join on the middle
    * node with a<b<c canonical ordering, EXISTS closure of the third
    * edge, and the 3-way per-node unroll — every triangle counts once
    * per corner in both engines. */
  private def trianglesOracleSql(topN: Int = 50, numPlanes: Int = 5,
                                 tables: Int = 2, degree: Int = 6): String =
    graphCtes(numPlanes, tables, degree) + s""",
       |und AS MATERIALIZED (
       |  SELECT DISTINCT least(node, nbr) AS a, greatest(node, nbr) AS b
       |  FROM adj WHERE node <> nbr
       |), tri AS (
       |  SELECT w.a, w.b, w.c
       |  FROM (SELECT e1.a, e1.b, e2.b AS c
       |        FROM und e1 JOIN und e2 ON e2.a = e1.b) w
       |  WHERE EXISTS (SELECT 1 FROM und u WHERE u.a = w.a AND u.b = w.c)
       |)
       |SELECT vec_id, count(*) AS n_triangles FROM (
       |  SELECT a AS vec_id FROM tri
       |  UNION ALL SELECT b FROM tri
       |  UNION ALL SELECT c FROM tri)
       |GROUP BY 1 ORDER BY n_triangles DESC, vec_id LIMIT $topN""".stripMargin

  /** Oracle for ann_mmr: the greedy MMR loop UNROLLED — one generated
    * CTE block per pick (the tokenizer_bpe idiom; a recursive CTE
    * can't carry the per-pick argmax + growing selected set). All
    * scores are integer basis points (score2 = rel_bp − max_sim_bp =
    * 2 × the λ=1/2 MMR score × 1e4), so every argmax is exact integer
    * comparison in both engines; `round(cos * 1e4)` is the same
    * C-style half-away-from-zero the kernel applies. */
  private def mmrOracleSql(k: Int, pool: Int = 20, stride: Int = 50): String = {
    val steps = (2 to k).map { t =>
      s"""cand$t AS (
         |  SELECT p.q_id, p.vec_id, p.rel_bp - max(ps.sim_bp) AS score2
         |  FROM pool p
         |  LEFT JOIN selall${t - 1} d ON d.q_id = p.q_id AND d.vec_id = p.vec_id
         |  JOIN ps ON ps.q_id = p.q_id AND ps.ai = p.vec_id
         |  JOIN selall${t - 1} s ON s.q_id = ps.q_id AND s.vec_id = ps.bi
         |  WHERE d.vec_id IS NULL
         |  GROUP BY p.q_id, p.vec_id, p.rel_bp
         |), sel$t AS (
         |  SELECT q_id, vec_id, $t AS sel_rank, score2 FROM (
         |    SELECT q_id, vec_id, score2,
         |      row_number() OVER (PARTITION BY q_id ORDER BY score2 DESC, vec_id) AS rn
         |    FROM cand$t) WHERE rn = 1
         |), selall$t AS (
         |  SELECT q_id, vec_id FROM selall${t - 1}
         |  UNION ALL SELECT q_id, vec_id FROM sel$t
         |)""".stripMargin
    }.mkString(",\n")
    val union = (1 to k).map(t => s"SELECT * FROM sel$t").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id % $stride = 0),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s0 AS (SELECT q.q_id, e.vec_id, list_cosine_similarity(q.qv, e.v) AS cos
       |       FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
       |pool AS MATERIALIZED (
       |  SELECT q_id, vec_id, CAST(round(cos * 1e4) AS BIGINT) AS rel_bp
       |  FROM (SELECT q_id, vec_id, cos,
       |          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
       |        FROM s0)
       |  WHERE rnk <= $pool
       |),
       |ps AS MATERIALIZED (
       |  SELECT a.q_id, a.vec_id AS ai, b.vec_id AS bi,
       |    CAST(round(list_cosine_similarity(ea.v, eb.v) * 1e4) AS BIGINT) AS sim_bp
       |  FROM pool a JOIN pool b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id
       |),
       |sel1 AS (
       |  SELECT q_id, vec_id, 1 AS sel_rank, rel_bp AS score2 FROM (
       |    SELECT q_id, vec_id, rel_bp,
       |      row_number() OVER (PARTITION BY q_id ORDER BY rel_bp DESC, vec_id) AS rn
       |    FROM pool) WHERE rn = 1
       |), selall1 AS (SELECT q_id, vec_id FROM sel1),
       |$steps
       |SELECT q_id, CAST(sel_rank AS BIGINT) AS sel_rank, vec_id,
       |  CAST(score2 AS DOUBLE) / 2e4 AS mmr_score
       |FROM ($union) ORDER BY q_id, sel_rank""".stripMargin
  }

  /** Oracle for tokenizer_bpe: BPE merge training UNROLLED — one
    * generated CTE block per merge round (a recursive CTE can't
    * express the per-round argmax: DuckDB allows only one
    * self-reference in the recursive term). Per round: pair counts →
    * best pair (count desc, pair asc) → greedy left-to-right apply.
    * Greedy overlap rule: consecutive candidate positions only arise
    * for l=r runs; within each run-chain keep every other position
    * (the chain/offset window trick). MATERIALIZED is load-bearing:
    * inlined CTEs re-evaluate the whole prior-round chain
    * exponentially. */
  private def bpeOracleSql(merges: Int): String =
    bpeCtes(merges) +
      "\nSELECT * FROM (" +
      (1 to merges).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ") +
      ") ORDER BY merge_idx"

  /** Oracle for tokenizer_apply: the trained word table w_N IS the
    * tokenizer — re-explode the corpus words and join their final
    * segmentations. */
  private def bpeApplyOracleSql(merges: Int): String =
    bpeCtes(merges) + s""",
dw AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS word FROM documents
)
SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(len(w.syms)) AS BIGINT) AS n_subtokens,
  round(CAST(sum(len(w.syms)) AS DOUBLE) / count(*), 4) AS avg_word_subtokens
FROM dw JOIN w$merges w USING (word)
GROUP BY dw.doc_id ORDER BY dw.doc_id"""

  /** Oracle for tokenizer_bpe_batched: replicates the batch-B
    * disjoint-greedy selection EXACTLY — per static round, rank the
    * snapshot's pairs (count desc, pair asc) into a `pool`-row
    * candidate table, then an unrolled greedy chain (sb/ub CTEs) keeps
    * up to `want` candidates whose {lhs, rhs, merged} symbol sets
    * avoid everything already kept; the rewrite CTEs are the
    * sequential oracle's, generalized from one pair to the selected
    * set (candidate positions via EXISTS; the chain/alternation trick
    * is unchanged because disjoint rules cannot produce adjacent
    * candidate positions except equal-symbol runs). vocab_size is
    * round-grain by contract. */
  private def bpeBatchedOracleSql(merges: Int, batchB: Int, pool: Int): String = {
    val rounds = (merges + batchB - 1) / batchB
    def round(n: Int): String = {
      val p = if (n == 1) "w0" else s"wb${n - 1}"
      val want = math.min(batchB, merges - (n - 1) * batchB)
      val selection = (1 to want).map { j =>
        val guard = if (j == 1) ""
          else s"""
  WHERE l NOT IN (SELECT s FROM ub${n}_${j - 1})
    AND r NOT IN (SELECT s FROM ub${n}_${j - 1})
    AND l || r NOT IN (SELECT s FROM ub${n}_${j - 1})"""
        val used = if (j == 1)
          s"SELECT l AS s FROM sb${n}_1 UNION SELECT r FROM sb${n}_1 UNION SELECT l || r FROM sb${n}_1"
        else
          s"SELECT s FROM ub${n}_${j - 1} UNION SELECT l FROM sb${n}_$j UNION SELECT r FROM sb${n}_$j UNION SELECT l || r FROM sb${n}_$j"
        s"""
sb${n}_$j AS MATERIALIZED (
  SELECT l, r, c, $j AS sj FROM tb$n$guard
  ORDER BY c DESC, l ASC, r ASC LIMIT 1
),
ub${n}_$j AS MATERIALIZED ($used)"""
      }.mkString(",")
      val selUnion = (1 to want).map(j => s"SELECT * FROM sb${n}_$j").mkString(" UNION ALL ")
      s"""
pb$n AS MATERIALIZED (
  SELECT syms[k] AS l, syms[k+1] AS r, sum(cnt) AS c
  FROM $p, LATERAL unnest(range(1, len(syms))) AS u(k)
  GROUP BY 1, 2
),
tb$n AS MATERIALIZED (SELECT l, r, c FROM pb$n ORDER BY c DESC, l ASC, r ASC LIMIT $pool),$selection,
selb$n AS MATERIALIZED ($selUnion),
cb$n AS MATERIALIZED (
  SELECT word, k, k - row_number() OVER (PARTITION BY word ORDER BY k) AS chain
  FROM (
    SELECT w.word, u.k
    FROM $p w, LATERAL unnest(range(1, len(w.syms))) AS u(k)
    WHERE EXISTS (SELECT 1 FROM selb$n s
                  WHERE s.l = w.syms[u.k] AND s.r = w.syms[u.k+1])
  )
),
gb$n AS MATERIALIZED (
  SELECT word, k FROM (
    SELECT word, k, k - min(k) OVER (PARTITION BY word, chain) AS off FROM cb$n
  ) WHERE off % 2 = 0
),
wb$n AS MATERIALIZED (
  SELECT word, cnt, list(CASE WHEN gk IS NOT NULL THEN s || s2 ELSE s END ORDER BY k) AS syms
  FROM (
    SELECT e.word, e.cnt, e.k, e.s, e.s2, g.k AS gk
    FROM (
      SELECT w.word, w.cnt, u.k, w.syms[u.k] AS s, w.syms[u.k+1] AS s2
      FROM $p w, LATERAL unnest(range(1, len(w.syms)+1)) AS u(k)
    ) e
    LEFT JOIN gb$n g ON g.word = e.word AND g.k = e.k
    LEFT JOIN gb$n g2 ON g2.word = e.word AND g2.k = e.k - 1
    WHERE g2.k IS NULL
  ) GROUP BY word, cnt
),
vb$n AS MATERIALIZED (SELECT count(DISTINCT s) AS vs FROM wb$n, LATERAL unnest(syms) AS t(s)),
mb$n AS MATERIALIZED (
  SELECT $n AS rnd, sj, l AS lhs, r AS rhs, l || r AS merged,
    CAST(c AS BIGINT) AS pair_count,
    CAST((SELECT vs FROM vb$n) AS BIGINT) AS vocab_size
  FROM selb$n
)"""
    }
    """WITH w0 AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
      |    list_transform(range(1, length(word)+1), i -> word[i:i]) AS syms
      |  FROM (SELECT unnest(string_split(trim(lower(text)), ' ')) AS word FROM documents)
      |  GROUP BY word
      |),""".stripMargin +
      (1 to rounds).map(round).mkString(",") +
      "\nSELECT CAST(row_number() OVER (ORDER BY rnd, sj) AS BIGINT) AS merge_idx," +
      "\n  lhs, rhs, merged, pair_count, CAST(rnd AS BIGINT) AS merge_round, vocab_size" +
      "\nFROM (" +
      (1 to rounds).map(n => s"SELECT * FROM mb$n").mkString(" UNION ALL ") +
      ")\nORDER BY merge_idx"
  }

  private def bpeCtes(merges: Int): String = {
    def round(i: Int): String = {
      val p = s"w${i - 1}"
      s"""
p$i AS MATERIALIZED (
  SELECT syms[k] AS l, syms[k+1] AS r, sum(cnt) AS c
  FROM $p, LATERAL unnest(range(1, len(syms))) AS u(k)
  GROUP BY 1, 2
),
b$i AS MATERIALIZED (SELECT l, r, c FROM p$i ORDER BY c DESC, l ASC, r ASC LIMIT 1),
c$i AS MATERIALIZED (
  SELECT word, k, k - row_number() OVER (PARTITION BY word ORDER BY k) AS chain
  FROM (
    SELECT w.word, u.k
    FROM $p w, LATERAL unnest(range(1, len(w.syms))) AS u(k)
    WHERE w.syms[u.k] = (SELECT l FROM b$i) AND w.syms[u.k+1] = (SELECT r FROM b$i)
  )
),
g$i AS MATERIALIZED (
  SELECT word, k FROM (
    SELECT word, k, k - min(k) OVER (PARTITION BY word, chain) AS off FROM c$i
  ) WHERE off % 2 = 0
),
w$i AS MATERIALIZED (
  SELECT word, cnt, list(CASE WHEN gk IS NOT NULL THEN s || s2 ELSE s END ORDER BY k) AS syms
  FROM (
    SELECT e.word, e.cnt, e.k, e.s, e.s2, g.k AS gk
    FROM (
      SELECT w.word, w.cnt, u.k, w.syms[u.k] AS s, w.syms[u.k+1] AS s2
      FROM $p w, LATERAL unnest(range(1, len(w.syms)+1)) AS u(k)
    ) e
    LEFT JOIN g$i g ON g.word = e.word AND g.k = e.k
    LEFT JOIN g$i g2 ON g2.word = e.word AND g2.k = e.k - 1
    WHERE g2.k IS NULL
  ) GROUP BY word, cnt
),
v$i AS MATERIALIZED (SELECT count(DISTINCT s) AS vs FROM w$i, LATERAL unnest(syms) AS t(s)),
m$i AS MATERIALIZED (SELECT $i AS merge_idx, l AS lhs, r AS rhs, l || r AS merged,
  CAST(c AS BIGINT) AS pair_count, (SELECT vs FROM v$i) AS vocab_size FROM b$i)"""
    }
    """WITH w0 AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
      |    list_transform(range(1, length(word)+1), i -> word[i:i]) AS syms
      |  FROM (SELECT unnest(string_split(trim(lower(text)), ' ')) AS word FROM documents)
      |  GROUP BY word
      |),""".stripMargin +
      (1 to merges).map(round).mkString(",")
  }

  /** DuckDB-dialect oracle SQL, column names matched to `queries`. */
  def oracleSql: Map[String, String] = oracleSqlBase
    // stored-index probe faces return bit-identical results to their
    // self-contained builds (deterministic index content), so each
    // gates against the same oracle
    .updated("ann_ivf_probe", oracleSqlBase("ann_ivf_sampled"))
    .updated("ann_pq_probe", oracleSqlBase("ann_ivf_pq"))
    .updated("ann_binary_probe", oracleSqlBase("ann_binary_rerank"))
    .updated("scale_kmv_matrix_stored", oracleSqlBase("scale_kmv_matrix"))
    // the salted two-phase operators are hot-key re-plans of their
    // single-window originals — identical output, gated by the SAME
    // oracle (the strongest possible equivalence evidence)
    .updated("scale_sessions_salted", oracleSqlBase("q32_sessions"))
    .updated("scale_asof_salted", oracleSqlBase("q63_asof_join"))
    .updated("tokenizer_apply_stored", oracleSqlBase("tokenizer_apply"))
    // identical result by construction: the stored lexical index holds
    // exactly the tables the self-contained face derives in-query
    .updated("text_bm25_stored", oracleSqlBase("text_bm25"))
    // CM merge is cell-wise sum, so sketches assembled from stored
    // epoch slices ARE the whole-corpus sketches — the stored
    // admission face estimates identically to the in-query face and
    // gates on its oracle
    .updated("scale_join_estimate_stored", oracleSqlBase("scale_join_estimate"))
    .updated("scale_countmin_stored", oracleSqlBase("scale_countmin"))
    .updated("scale_join_admission", joinAdmissionOracleSql)
    .updated("scale_join_admission_fast", joinAdmissionFastOracleSql)
    .updated("scale_join_route", joinRouteOracleSql)
    // HLL merge is per-register max: merged stored registers ARE the
    // whole-corpus register table, so the stored face estimates
    // identically and gates on scale_hll's oracle
    .updated("scale_hll_stored", oracleSqlBase("scale_hll"))
    // every gated column of the KLL report is summary-independent
    // (exact order stats, n, the bound formula) or certified for any
    // epoch union (within_bound) — the in-query oracle gates the
    // stored face through the theorem
    .updated("scale_quantile_stored", oracleSqlBase("scale_quantile_sketch"))
    // the stored positional index holds exactly the (doc_id, pos,
    // term) frame the in-query face tokenizes, and a phrase's
    // verified-occurrence set is seek-word-independent — identical
    // output, one oracle
    .updated("text_phrase_search_stored", oracleSqlBase("text_phrase_search"))
    // the incremental index's doc-disjoint epochs union to exactly the
    // corpus tokenization — third face, same oracle
    .updated("text_phrase_search_incremental", oracleSqlBase("text_phrase_search"))
    // the stored stats tables hold exactly the unigram/bigram counts
    // the in-query face derives — identical lift, one oracle
    .updated("text_collocation_stored", oracleSqlBase("text_collocation"))
    .updated("text_collocation_incremental", oracleSqlBase("text_collocation"))
    .updated("text_proximity_incremental", oracleSqlBase("text_proximity_search"))
    // the hamming tuning curve aggregates the mm_phash oracle's own
    // pair chain — same banded candidate space by construction
    .updated("mm_phash_curve",
      s"SELECT hamming, count(*) AS n_pairs FROM (\n${oracleSqlBase("mm_phash")}\n) GROUP BY 1 ORDER BY 1")
    // label propagation votes over ann_bruteforce's own gated ballots
    .updated("embedding_label_prop",
      s"""WITH nn AS (
         |  SELECT * FROM (
         |${oracleSqlBase("ann_bruteforce")}
         |  )
         |), v AS (
         |  SELECT nn.q_id, emb.label AS nbr_label,
         |    CAST(count(*) AS BIGINT) AS votes, min(nn.rank) AS best_rank
         |  FROM nn JOIN embeddings emb ON emb.vec_id = nn.neighbor_id
         |  GROUP BY 1, 2
         |), pick AS (
         |  SELECT q_id, nbr_label, votes,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY votes DESC, best_rank ASC, nbr_label ASC) AS rk
         |  FROM v
         |)
         |SELECT p.q_id, CAST(p.nbr_label AS BIGINT) AS predicted_label,
         |  p.votes,
         |  CAST(t.label AS BIGINT) AS true_label,
         |  p.nbr_label = t.label AS correct
         |FROM pick p JOIN embeddings t ON t.vec_id = p.q_id
         |WHERE p.rk = 1 ORDER BY p.q_id""".stripMargin)
    // calibration buckets the trained scorer's own (p_bp, label) chain
    .updated("text_quality_calibration",
      s"""SELECT CAST(p_bp // 1000 AS BIGINT) AS decile, count(*) AS n,
         |  CAST(sum(label) AS BIGINT) AS n_pos,
         |  CAST((10000 * sum(label)) // count(*) AS BIGINT) AS pos_rate_bp
         |FROM (
         |${lrTrainedScoreOracleSql()}
         |) GROUP BY 1 ORDER BY 1""".stripMargin)
    .updated("text_quality_score_stored", lrTrainedScoreOracleSql())

  /** Oracle for scale_profile: one UNION ALL block per profiled
    * column — counts/nulls/distincts exact, native-typed min/max
    * rendered to VARCHAR, total string length. */
  private def profileOracleSql(
      cols: Seq[String] = Seq("doc_id", "lang", "n_chars", "source", "text"),
      where: String = ""): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count($c) AS n_values,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_str,
         |  CAST(max($c) AS VARCHAR) AS max_str,
         |  CAST(sum(len(CAST($c AS VARCHAR))) AS BIGINT) AS total_strlen
         |FROM documents$where""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Oracle for scale_profile_diff: two epoch-half profile chains
    * joined per column; shifts divide non-negative operands only. */
  private def profileDiffOracleSql(driftBp: Long = 500L): String =
    s"""WITH a AS (
       |${profileOracleSql(where = " WHERE doc_id % 2 = 0")}
       |), b AS (
       |${profileOracleSql(where = " WHERE doc_id % 2 <> 0")}
       |)
       |SELECT a.col_name, a.n_values AS n_a, b.n_values AS n_b,
       |  a.n_distinct AS d_a, b.n_distinct AS d_b,
       |  a.n_null AS null_a, b.n_null AS null_b,
       |  CAST((10000 * b.n_distinct) // b.n_values
       |    - (10000 * a.n_distinct) // a.n_values AS BIGINT) AS distinct_shift_bp,
       |  CAST((10000 * b.total_strlen) // b.n_values
       |    - (10000 * a.total_strlen) // a.n_values AS BIGINT) AS strlen_shift_bp,
       |  (a.min_str <> b.min_str OR a.max_str <> b.max_str) AS minmax_moved,
       |  abs((10000 * b.n_distinct) // b.n_values
       |    - (10000 * a.n_distinct) // a.n_values) > $driftBp AS drifted
       |FROM a JOIN b USING (col_name) ORDER BY col_name""".stripMargin

  /** Shared IVF-sampled CTE chain (centroids/assignment/probes/rank)
    * for the ann_ivf_sampled, ann_ivf_probe and pipeline_retrieval
    * oracles — mirrors Ann.annIvfSampled / the stored-index probe. */
  private val ivfSampledCtes: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |hs AS (
        |  SELECT vec_id,
        |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM e
        |), sel AS (SELECT vec_id FROM hs ORDER BY h, vec_id LIMIT 16),
        |cent AS (
        |  SELECT row_number() OVER (ORDER BY s.vec_id) - 1 AS list_id, e.v AS cv
        |  FROM sel s JOIN e ON e.vec_id = s.vec_id
        |), ac AS (
        |  SELECT e.vec_id, c.list_id, list_cosine_similarity(e.v, c.cv) AS ccos
        |  FROM e CROSS JOIN cent c
        |), asgn AS (
        |  SELECT vec_id, list_id FROM (
        |    SELECT vec_id, list_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, list_id ASC) AS rn
        |    FROM ac) WHERE rn = 1
        |), q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
        |qp AS (
        |  SELECT q_id, list_id FROM (
        |    SELECT q.q_id, c.list_id,
        |      row_number() OVER (PARTITION BY q.q_id
        |        ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.list_id ASC) AS rn
        |    FROM q CROSS JOIN cent c) WHERE rn <= 4
        |), s AS (
        |  SELECT q.q_id, e.vec_id AS neighbor_id, list_cosine_similarity(q.qv, e.v) AS cos
        |  FROM q JOIN qp USING (q_id)
        |  JOIN asgn a ON a.list_id = qp.list_id
        |  JOIN e ON e.vec_id = a.vec_id
        |  WHERE e.vec_id <> q.q_id
        |), r AS (
        |  SELECT q_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM s
        |)""".stripMargin

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "tokenizer_bpe" -> bpeOracleSql(8),
    "tokenizer_bpe_batched" -> bpeBatchedOracleSql(8, 4, 128),
    "tokenizer_apply" -> bpeApplyOracleSql(8),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(sum(CAST(round((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        | CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
        | CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 24.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_broadcast" ->
      """SELECT n_name, CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_join_shuffle" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q6_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q7_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | row_number() OVER w AS rnk,
        | round(sum(o_totalprice) OVER w, 2) AS run_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |QUALIFY rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q8_semi_anti" ->
      """WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0)
        |SELECT c_custkey, 'has_big_order' AS kind FROM customer
        | WHERE EXISTS (SELECT 1 FROM hi WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_big_order' AS kind FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM hi WHERE o_custkey = c_custkey)
        |ORDER BY kind, c_custkey""".stripMargin,
    "q9_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q10_conditional_agg" ->
      """SELECT l_linestatus,
        | round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0.0 END), 2) AS qty_a,
        | round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0.0 END), 2) AS qty_n,
        | round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END), 2) AS qty_r,
        | count(*) AS n
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q11_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, length(p_name) AS name_len,
        | substr(p_type, 1, 5) AS type5,
        | concat_ws('#', p_brand, p_type) AS brand_type,
        | replace(p_name, ' ', '_') AS name_snake
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q12_time_series" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        | CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "q13_union" ->
      """SELECT bucket, count(*) AS n, CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |FROM (
        |  SELECT 'hi' AS bucket, o_totalprice FROM orders WHERE o_totalprice > 100000.0
        |  UNION ALL
        |  SELECT 'lo' AS bucket, o_totalprice FROM orders WHERE o_totalprice <= 100000.0
        |) GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q14_exists_subquery" ->
      """SELECT c_mktsegment, count(*) AS n_above, round(min(c_acctbal), 2) AS min_above
        |FROM customer WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q15_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, 0 AS tag, event_id AS view_id, CAST(NULL AS BIGINT) AS purchase_id
        |    FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, 1 AS tag, CAST(NULL AS BIGINT) AS view_id, event_id AS purchase_id
        |    FROM events WHERE event_type = 'purchase'
        |)
        |SELECT purchase_id, user_id,
        |  last_value(view_id IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, tag ASC, view_id ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_view_id
        |FROM u QUALIFY purchase_id IS NOT NULL ORDER BY purchase_id""".stripMargin,
    "q16_range_join" ->
      """SELECT o_orderpriority, count(*) AS n_in_window,
        | round(avg(l_quantity), 4) AS avg_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "pipeline_curation" ->
      """WITH t AS (
        |  SELECT doc_id, text, length(text) AS n_chars,
        |   regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |   length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        |   strlen(text) - length(text) AS zh_score,
        |   row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS copy_rank,
        |   CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 100 AS split_bucket
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, copy_rank, split_bucket, zh_score,
        |   CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
        |   CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |   len(toks) AS n_tokens,
        |   len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS en_score,
        |   len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) AS de_score,
        |   len(list_filter(toks, x -> x IN ('le','la','les','et','est','un'))) AS fr_score,
        |   len(list_filter(toks, x -> x IN ('el','la','los','y','es','un'))) AS es_score
        |  FROM t
        |), s AS (
        |  SELECT doc_id, copy_rank, split_bucket,
        |   least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.5
        |     + least(stop_ratio * 5.0, 1.0) * 0.3
        |     + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2 AS quality_score,
        |   CASE WHEN zh_score > 0 THEN 'zh'
        |        WHEN en_score >= de_score AND en_score >= fr_score AND en_score >= es_score THEN 'en'
        |        WHEN de_score >= fr_score AND de_score >= es_score THEN 'de'
        |        WHEN fr_score >= es_score THEN 'fr'
        |        ELSE 'es' END AS lang_pred
        |  FROM q
        |)
        |SELECT lang_pred,
        | CASE WHEN split_bucket < 10 THEN 'val'
        |      WHEN split_bucket < 20 THEN 'test' ELSE 'train' END AS split,
        | count(*) AS n_docs, round(avg(quality_score) + 1e-9, 4) AS avg_quality
        |FROM s WHERE copy_rank = 1 AND quality_score >= 0.5
        |GROUP BY 1, 2 ORDER BY lang_pred, split""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, length(text) AS n_chars,
        | len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_ws_tokens,
        | len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_token_spectrum" ->
      // count-of-counts by power-of-two frequency band; the band is an
      // exact integer range join (no float log2 on either side)
      """WITH t AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents
        |), f AS (
        |  SELECT tok, count(*) AS f FROM t WHERE tok <> '' GROUP BY tok
        |), b AS (
        |  SELECT s.p AS band, count(*) AS n_types, sum(f.f) AS n_occ,
        |    min(f.f) AS min_f, max(f.f) AS max_f
        |  FROM f JOIN generate_series(0, 62) s(p)
        |    ON f.f >= (CAST(1 AS BIGINT) << s.p)
        |   AND (f.f >> 1) < (CAST(1 AS BIGINT) << s.p)
        |  GROUP BY s.p
        |), tot AS (SELECT sum(n_types) AS v_total, sum(n_occ) AS t_total FROM b)
        |SELECT CAST(b.band AS BIGINT) AS band, b.n_types,
        |  CAST(b.n_occ AS BIGINT) AS n_occ,
        |  b.min_f, b.max_f,
        |  CAST((10000 * b.n_types) // tot.v_total AS BIGINT) AS type_share_bp,
        |  CAST((10000 * b.n_occ) // tot.t_total AS BIGINT) AS occ_share_bp
        |FROM b, tot ORDER BY band""".stripMargin,
    "text_vocab_growth" ->
      // Heaps-law growth at 10 doc_id thresholds t_i = i*max_id//10:
      // per-prefix docs, running tokens, vocabulary and hapax counts —
      // all exact integers (FILTER-ed counts, no order statistics)
      """WITH m AS (SELECT max(doc_id) AS m FROM documents),
        |steps AS (
        |  SELECT s.i AS step, (s.i * m.m) // 10 AS t
        |  FROM generate_series(1, 10) s(i), m
        |), tk AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents
        |), tk2 AS (SELECT * FROM tk WHERE tok <> ''),
        |pt AS (
        |  SELECT s.step, s.t, tk2.tok,
        |    count(*) FILTER (WHERE tk2.doc_id <= s.t) AS c
        |  FROM steps s CROSS JOIN tk2 GROUP BY 1, 2, 3
        |), folded AS (
        |  SELECT step, t,
        |    count(*) FILTER (WHERE c >= 1) AS vocab_size,
        |    count(*) FILTER (WHERE c = 1) AS n_hapax,
        |    CAST(sum(c) AS BIGINT) AS n_tokens
        |  FROM pt GROUP BY 1, 2
        |), dc AS (
        |  SELECT s.step, count(*) FILTER (WHERE d.doc_id <= s.t) AS n_docs
        |  FROM steps s CROSS JOIN documents d GROUP BY 1
        |)
        |SELECT CAST(f.step AS BIGINT) AS step, CAST(f.t AS BIGINT) AS doc_threshold,
        |  dc.n_docs, f.n_tokens, f.vocab_size, f.n_hapax
        |FROM folded f JOIN dc ON dc.step = f.step
        |ORDER BY step""".stripMargin,
    "text_phrase_search" ->
      // top-5 corpus trigrams, then the positional probe: seek word 1,
      // verify words 2/3 at pos+1/pos+2 — all exact integers
      """WITH t0 AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), tk0 AS (
        |  SELECT doc_id, unnest(toks) AS term,
        |    unnest(generate_series(1, len(toks))) AS pos
        |  FROM t0
        |), tk AS (SELECT * FROM tk0 WHERE term <> ''), tri AS (
        |  SELECT a.term AS p1, b.term AS p2, c.term AS p3, count(*) AS f
        |  FROM tk a
        |  JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN tk c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |  GROUP BY 1, 2, 3
        |), phrases AS (
        |  SELECT p1, p2, p3 FROM tri
        |  ORDER BY f DESC, p1, p2, p3 LIMIT 5
        |), hits AS (
        |  SELECT p.p1, p.p2, p.p3, a.doc_id
        |  FROM tk a JOIN phrases p ON a.term = p.p1
        |  JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |    AND b.term = p.p2
        |  JOIN tk c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |    AND c.term = p.p3
        |)
        |SELECT p1 || ' ' || p2 || ' ' || p3 AS phrase,
        |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |FROM hits GROUP BY 1
        |ORDER BY n_occ DESC, phrase""".stripMargin,
    "text_phrase_search_ngram" ->
      // variable-length phrase search: top-3 bigrams and top-3
      // quadgrams (freq desc, phrase asc), each verified positionally
      // — the same consecutive-word semantics at every length
      """WITH t0 AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), tk0 AS (
        |  SELECT doc_id, unnest(toks) AS term,
        |    unnest(generate_series(1, len(toks))) AS pos
        |  FROM t0
        |), tk AS (SELECT * FROM tk0 WHERE term <> ''),
        |g2 AS (
        |  SELECT a.term || ' ' || b.term AS phrase, count(*) AS f
        |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  GROUP BY 1
        |), p2 AS (SELECT phrase FROM g2 ORDER BY f DESC, phrase LIMIT 3),
        |h2 AS (
        |  SELECT p.phrase, a.doc_id
        |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN p2 p ON p.phrase = a.term || ' ' || b.term
        |), r2 AS (
        |  SELECT CAST(2 AS BIGINT) AS phrase_len, phrase,
        |    count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |  FROM h2 GROUP BY 2
        |),
        |g4 AS (
        |  SELECT a.term || ' ' || b.term || ' ' || c.term || ' ' || d.term
        |    AS phrase, count(*) AS f
        |  FROM tk a
        |  JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN tk c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |  JOIN tk d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
        |  GROUP BY 1
        |), p4 AS (SELECT phrase FROM g4 ORDER BY f DESC, phrase LIMIT 3),
        |h4 AS (
        |  SELECT p.phrase, a.doc_id
        |  FROM tk a
        |  JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN tk c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |  JOIN tk d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
        |  JOIN p4 p
        |    ON p.phrase = a.term || ' ' || b.term || ' ' || c.term || ' ' || d.term
        |), r4 AS (
        |  SELECT CAST(4 AS BIGINT) AS phrase_len, phrase,
        |    count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |  FROM h4 GROUP BY 2
        |)
        |SELECT * FROM (SELECT * FROM r2 UNION ALL SELECT * FROM r4)
        |ORDER BY phrase_len, n_occ DESC, phrase""".stripMargin,
    "text_collocation" ->
      // top multiword expressions by exact-integer lift: observed
      // bigram frequency over independence, in basis points — the
      // PMI exponential with no float log anywhere
      """WITH t0 AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), tk0 AS (
        |  SELECT doc_id, unnest(toks) AS term,
        |    unnest(generate_series(1, len(toks))) AS pos
        |  FROM t0
        |), tk AS (SELECT * FROM tk0 WHERE term <> ''),
        |uni AS (SELECT term, CAST(count(*) AS BIGINT) AS f FROM tk GROUP BY 1),
        |bi AS (
        |  SELECT a.term AS t1, b.term AS t2, CAST(count(*) AS BIGINT) AS f_pair
        |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  GROUP BY 1, 2
        |), tot AS (SELECT CAST(sum(f_pair) AS BIGINT) AS n_windows FROM bi)
        |SELECT bi.t1 || ' ' || bi.t2 AS pair, bi.f_pair,
        |  u1.f AS f1, u2.f AS f2, tot.n_windows,
        |  CAST((CAST(bi.f_pair AS HUGEINT) * 10000 * tot.n_windows)
        |    // (CAST(u1.f AS HUGEINT) * u2.f) AS BIGINT)
        |    AS lift_bp
        |FROM bi
        |JOIN uni u1 ON u1.term = bi.t1
        |JOIN uni u2 ON u2.term = bi.t2, tot
        |WHERE bi.f_pair >= 5
        |ORDER BY lift_bp DESC, pair LIMIT 10""".stripMargin,
    "text_proximity_search" ->
      // ordered proximity ("t1 NEAR t2" within 5 positions) for the
      // corpus's top-4 bigram pairs — one posting-list join per pair,
      // row-local gap filter; adjacency guarantees n_occ > 0
      """WITH t0 AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), tk0 AS (
        |  SELECT doc_id, unnest(toks) AS term,
        |    unnest(generate_series(1, len(toks))) AS pos
        |  FROM t0
        |), tk AS (SELECT * FROM tk0 WHERE term <> ''),
        |gp AS (
        |  SELECT a.term AS t1, b.term AS t2, count(*) AS f
        |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  GROUP BY 1, 2
        |), pr AS (
        |  SELECT t1, t2 FROM gp ORDER BY f DESC, t1 || ' ' || t2 LIMIT 4
        |), h AS (
        |  SELECT pr.t1, pr.t2, a.doc_id
        |  FROM tk a JOIN pr ON a.term = pr.t1
        |  JOIN tk b ON b.doc_id = a.doc_id AND b.term = pr.t2
        |    AND b.pos > a.pos AND b.pos <= a.pos + 5
        |)
        |SELECT t1 || ' ' || t2 AS pair, CAST(5 AS BIGINT) AS "window",
        |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |FROM h GROUP BY t1, t2
        |ORDER BY n_occ DESC, pair""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |   regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |   length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        |   length(regexp_replace(text, '\s+', '', 'g')) AS n_nonws
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, n_chars, len(toks) AS n_tokens,
        |   CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
        |   CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |   CAST(n_nonws AS DOUBLE) / len(toks) AS mean_word_len
        |  FROM t
        |)
        |SELECT doc_id, n_chars, n_tokens,
        | round(punct_ratio + 1e-9, 4) AS punct_ratio, round(stop_ratio + 1e-9, 4) AS stop_ratio,
        | round(mean_word_len + 1e-9, 4) AS mean_word_len,
        | round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.5
        |   + least(stop_ratio * 5.0, 1.0) * 0.3
        |   + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2 + 1e-9, 4) AS quality_score
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |   strlen(text) - length(text) AS zh_score
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang, zh_score,
        |   len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS en_score,
        |   len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) AS de_score,
        |   len(list_filter(toks, x -> x IN ('le','la','les','et','est','un'))) AS fr_score,
        |   len(list_filter(toks, x -> x IN ('el','la','los','y','es','un'))) AS es_score
        |  FROM t
        |)
        |SELECT doc_id, lang, en_score, de_score, fr_score, es_score, zh_score,
        | CASE WHEN zh_score > 0 THEN 'zh'
        |      WHEN en_score >= de_score AND en_score >= fr_score AND en_score >= es_score THEN 'en'
        |      WHEN de_score >= fr_score AND de_score >= es_score THEN 'de'
        |      WHEN fr_score >= es_score THEN 'fr'
        |      ELSE 'es' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_langid_confusion" ->
      // the same langid CASE as text_langid, rolled into a gold-vs-
      // predicted confusion matrix with per-gold-row fractions
      """WITH t AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |   strlen(text) - length(text) AS zh_score
        |  FROM documents
        |), s AS (
        |  SELECT lang,
        |   CASE WHEN zh_score > 0 THEN 'zh'
        |        WHEN len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) >= len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein')))
        |         AND len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) >= len(list_filter(toks, x -> x IN ('le','la','les','et','est','un')))
        |         AND len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) >= len(list_filter(toks, x -> x IN ('el','la','los','y','es','un'))) THEN 'en'
        |        WHEN len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) >= len(list_filter(toks, x -> x IN ('le','la','les','et','est','un')))
        |         AND len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) >= len(list_filter(toks, x -> x IN ('el','la','los','y','es','un'))) THEN 'de'
        |        WHEN len(list_filter(toks, x -> x IN ('le','la','les','et','est','un'))) >= len(list_filter(toks, x -> x IN ('el','la','los','y','es','un'))) THEN 'fr'
        |        ELSE 'es' END AS lang_pred
        |  FROM t
        |), m AS (
        |  SELECT lang, lang_pred, count(*) AS n FROM s GROUP BY lang, lang_pred
        |)
        |SELECT lang, lang_pred, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang) + 1e-9, 4) AS frac
        |FROM m ORDER BY lang, lang_pred""".stripMargin,
    "q24_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
        |), s AS (
        |  SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM v) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
        |)
        |SELECT CAST(step AS BIGINT) AS step, event_type, CAST(users AS BIGINT) AS users,
        |  round(CAST(users AS DOUBLE) / lag(users) OVER (ORDER BY step), 4) AS conv_from_prev
        |FROM s ORDER BY step""".stripMargin,
    "q25_cohort" ->
      """WITH f AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY user_id
        |), a AS (
        |  SELECT DISTINCT e.user_id, f.cohort_week,
        |    date_diff('day', f.cohort_week,
        |      CAST(date_trunc('week', e.ts) AS TIMESTAMP)) // 7 AS week_offset
        |  FROM events e JOIN f USING (user_id)
        |), g AS (
        |  SELECT cohort_week, week_offset, count(*) AS n_users FROM a GROUP BY 1, 2
        |), s AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1)
        |SELECT g.cohort_week, CAST(g.week_offset AS BIGINT) AS week_offset,
        |  CAST(g.n_users AS BIGINT) AS n_users, CAST(s.cohort_size AS BIGINT) AS cohort_size,
        |  round(CAST(g.n_users AS DOUBLE) / s.cohort_size, 4) AS retention
        |FROM g JOIN s USING (cohort_week) ORDER BY g.cohort_week, g.week_offset""".stripMargin,
    "q26_rolling_active" ->
      """WITH grid AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |), d AS (SELECT DISTINCT day AS anchor FROM grid),
        |dau AS (SELECT day AS anchor, count(*) AS dau FROM grid GROUP BY day),
        |wau AS (
        |  SELECT d.anchor, count(DISTINCT g.user_id) AS wau
        |  FROM grid g JOIN d ON g.day <= d.anchor AND g.day >= d.anchor - 6
        |  GROUP BY d.anchor
        |)
        |SELECT dau.anchor AS day, CAST(dau.dau AS BIGINT) AS dau,
        |  CAST(wau.wau AS BIGINT) AS wau
        |FROM dau JOIN wau USING (anchor) ORDER BY day""".stripMargin,
    "q27_regression" ->
      // exact-integer regression moments (HUGEINT sums mirror Spark's
      // DECIMAL(38,0)); only the final division runs in double, from
      // identical exact operands in both engines
      """WITH p AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS HUGEINT) AS x,
        |    CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT) AS y
        |  FROM orders
        |), m AS (
        |  SELECT pri, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM p GROUP BY pri
        |)
        |SELECT pri, CAST(n AS BIGINT) AS n_orders,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6) AS slope_per_day
        |FROM m ORDER BY pri""".stripMargin,
    "q28_market_basket" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2
        |)
        |SELECT p1, p2, CAST(n_orders AS BIGINT) AS n_orders
        |FROM p ORDER BY n_orders DESC, p1, p2 LIMIT 20""".stripMargin,
    "q29_transitions" ->
      """WITH s AS (
        |  SELECT event_type AS src_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS dst_type
        |  FROM events
        |), m AS (
        |  SELECT src_type, dst_type, count(*) AS n
        |  FROM s WHERE dst_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT src_type, dst_type, CAST(n AS BIGINT) AS n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src_type) + 1e-9, 4)
        |    AS frac
        |FROM m ORDER BY src_type, dst_type""".stripMargin,
    "q30_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'view') AS n_view,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (event_type = 'signup') AS n_signup,
        |  count(*) FILTER (event_type = 'error') AS n_error,
        |  count(*) FILTER (event_type IN ('click','view','purchase','signup','error'))
        |    AS n_total
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q31_streaks" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |      AS grp
        |  FROM events
        |), runs AS (
        |  SELECT user_id, event_type, count(*) AS run_len,
        |    min(event_id) AS min_event_id
        |  FROM r GROUP BY user_id, event_type, grp
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY run_len DESC, min_event_id) AS rk
        |  FROM runs
        |)
        |SELECT user_id, event_type, run_len, min_event_id
        |FROM ranked WHERE rk = 1 ORDER BY user_id""".stripMargin,
    "q32_sessions" ->
      // gaps-and-islands sessionization on exact epoch-us integers;
      // epoch_us truncates ns layouts the same way Tables.events' div
      // does, so ordering and gap tests agree at either precision
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |), o AS (
        |  SELECT user_id, event_id, us,
        |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
        |  FROM e
        |), m AS (
        |  SELECT user_id, us,
        |    CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM o
        |)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us,
        |  (max(us) - min(us)) // 1000000 AS duration_sec
        |FROM m GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q33_attribution" ->
      // last-touch attribution: IGNORE-NULLS last_value over the
      // preceding rows per user, 'direct' when no prior touch
      """WITH t AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events
        |), p AS (
        |  SELECT coalesce(touch, 'direct') AS touch_type FROM t
        |  WHERE event_type = 'purchase'
        |), c AS (SELECT touch_type, count(*) AS n_purchases FROM p GROUP BY touch_type)
        |SELECT touch_type, n_purchases,
        |  round(CAST(n_purchases AS DOUBLE) / (SELECT sum(n_purchases) FROM c) + 1e-9, 4) AS share
        |FROM c ORDER BY touch_type""".stripMargin,
    "text_ccnet_bucket" ->
      // the unigram_lp chain + exact tercile cutoffs, both rounded at
      // 4dp before the bucket comparison (q18 percentile parity)
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents
        |), f AS (
        |  SELECT tok, count(*) AS tf FROM tk GROUP BY tok
        |), n AS (
        |  SELECT count(*) AS n_total FROM tk
        |), lp AS (
        |  SELECT tk.doc_id,
        |    round(avg(-ln(CAST(f.tf AS DOUBLE) / n.n_total)), 4) AS lp
        |  FROM tk JOIN f USING (tok) CROSS JOIN n
        |  GROUP BY tk.doc_id
        |), c AS (
        |  SELECT round(quantile_cont(lp, 1.0/3), 4) AS c1,
        |         round(quantile_cont(lp, 2.0/3), 4) AS c2
        |  FROM lp
        |)
        |SELECT doc_id, lp,
        |  CASE WHEN lp <= c.c1 THEN 'head'
        |       WHEN lp <= c.c2 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM lp CROSS JOIN c ORDER BY doc_id""".stripMargin,
    "text_gopher" ->
      // the published Gopher rule set; stop_hits counts DISTINCT stop
      // words present (array_intersect dedups on the Spark side)
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks FROM documents
        |), w AS (
        |  SELECT doc_id, unnest(toks) AS w FROM t
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_words,
        |    sum(length(w)) AS sum_len,
        |    sum(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0 END) AS alpha_words,
        |    sum(CASE WHEN w LIKE '%#%' OR w LIKE '%...%' THEN 1 ELSE 0 END) AS symbol_words,
        |    count(DISTINCT CASE WHEN w IN ('the','be','to','of','and','that','have','with')
        |                        THEN w END) AS stop_hits
        |  FROM w GROUP BY doc_id
        |)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(CAST(sum_len AS DOUBLE) / n_words + 1e-9, 4) AS mean_word_len,
        |  round(CAST(alpha_words AS DOUBLE) / n_words + 1e-9, 4) AS alpha_frac,
        |  CAST(stop_hits AS BIGINT) AS stop_hits,
        |  (n_words BETWEEN 50 AND 100000) AS word_count_ok,
        |  (CAST(sum_len AS DOUBLE) / n_words BETWEEN 3 AND 10) AS word_len_ok,
        |  (CAST(symbol_words AS DOUBLE) / n_words <= 0.1) AS symbol_ok,
        |  (CAST(alpha_words AS DOUBLE) / n_words >= 0.8) AS alpha_ok,
        |  (stop_hits >= 2) AS stops_ok,
        |  ((n_words BETWEEN 50 AND 100000)
        |    AND (CAST(sum_len AS DOUBLE) / n_words BETWEEN 3 AND 10)
        |    AND (CAST(symbol_words AS DOUBLE) / n_words <= 0.1)
        |    AND (CAST(alpha_words AS DOUBLE) / n_words >= 0.8)
        |    AND stop_hits >= 2) AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,
    "text_quality_lr" ->
      // fixed-weight logistic scoring over the same per-row features
      // as text_quality; p rounds at 4dp BEFORE the keep threshold so
      // the decision is engine-independent
      """WITH t AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |   regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |   length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        |   length(regexp_replace(text, '\s+', '', 'g')) AS n_nonws
        |  FROM documents
        |), z AS (
        |  SELECT doc_id,
        |   -1.5
        |   + least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 2.0
        |   + (CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks)) * 4.0
        |   + (CAST(n_punct AS DOUBLE) / n_chars) * (-6.0)
        |   + ((CAST(n_nonws AS DOUBLE) / len(toks)) / 10.0) * 1.0 AS logit
        |  FROM t
        |), s AS (
        |  SELECT doc_id, round(logit + 1e-9, 4) AS logit_r,
        |    round(1.0 / (1.0 + exp(-logit)) + 1e-9, 4) AS p_keep
        |  FROM z
        |)
        |SELECT doc_id, logit_r AS logit, p_keep, p_keep >= 0.5 AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q38_journeys" ->
      // trigram journeys via two leads over the same user ordering
      """WITH t AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS s2,
        |    lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_type || ' > ' || s2 || ' > ' || s3 AS journey,
        |  count(*) AS n
        |FROM t WHERE s3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, journey LIMIT 15""".stripMargin,
    "q47_tpch_q4" ->
      // canonical TPC-H Q4 adapted ("late" stood in by "has a
      // returned line" — no commit/receipt dates): EXISTS -> semi join
      """SELECT o.o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q48_tpch_q8" ->
      // canonical TPC-H Q8: one nation's market share of a region's
      // part-type revenue by year; one IEEE division of exact cents
      """WITH j AS (
        |  SELECT year(o.o_orderdate) AS o_year,
        |    CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT) AS cents,
        |    sn.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'MEDIUM'
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |  WHERE o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1997-01-01'
        |)
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS DOUBLE)
        |    / sum(cents), 6) AS mkt_share,
        |  CAST(sum(cents) AS DOUBLE) / 100.0 AS total_revenue
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q49_tpch_q19" ->
      // canonical TPC-H Q19 adapted (no shipmode/container): the
      // disjunctive brand/size/quantity predicate over the part join
      """SELECT
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 20)
        |   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 10 AND 30
        |       AND l.l_quantity BETWEEN 10 AND 35)""".stripMargin,
    "q50_tpch_q22" ->
      // canonical TPC-H Q22 adapted (every customer has SOME order in
      // this dataset -> LAPSED high-balance customers); the
      // above-average cut is the exact inequality cents*n > sum_cents
      """WITH s AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |    count(*) AS n_pos
        |  FROM customer WHERE c_acctbal > 0.0
        |)
        |SELECT c.c_nationkey, count(*) AS n_custs,
        |  CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_acctbal
        |FROM customer c, s
        |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * s.n_pos > s.sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q59_gapfill" ->
      // gap fill + LOCF: global day grid x users, zero-filled counts,
      // last event type carried forward; per-day last state picked by
      // (ts, event_id) descending row_number
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), daily AS (
        |  SELECT user_id, day, count(*) AS n_events,
        |    CAST(sum(cents) AS BIGINT) AS value_cents,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS day_last_type
        |  FROM (SELECT *, row_number() OVER (
        |          PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM e)
        |  GROUP BY 1, 2
        |), span AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
        |grid AS (
        |  SELECT u.user_id, CAST(g.day AS DATE) AS day
        |  FROM (SELECT DISTINCT user_id FROM events) u,
        |    (SELECT unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS day FROM span s) g
        |)
        |SELECT g.user_id, g.day,
        |  COALESCE(d.n_events, 0) AS n_events,
        |  COALESCE(d.value_cents, 0) AS value_cents,
        |  last_value(d.day_last_type IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_type
        |FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
        |ORDER BY g.user_id, g.day""".stripMargin,
    "q60_scd2_pit" ->
      // point-in-time lookup against the SCD2 ledger: exact quartile
      // probe instants (integer-us div), half-open interval probe,
      // LEFT join keeps pre-first-event probes as NULL state
      """WITH e AS (
        |  SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS us
        |  FROM events
        |), m AS (
        |  SELECT user_id, event_id, state, us,
        |    CASE WHEN lag(state) OVER w IS NULL OR lag(state) OVER w <> state
        |      THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), v AS (
        |  SELECT user_id, state, us,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        |  FROM m
        |), g AS (
        |  SELECT user_id, version, min(state) AS state,
        |    min(us) AS valid_from_us
        |  FROM v GROUP BY 1, 2
        |), ledger AS (
        |  SELECT user_id, version, state, valid_from_us,
        |    lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us
        |  FROM g
        |), span AS (
        |  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
        |), probes AS (
        |  SELECT CAST(k AS BIGINT) AS k, s.lo + ((s.hi - s.lo) * k) // 4 AS probe_us
        |  FROM (SELECT unnest([1, 2, 3]) AS k), span s
        |), grid AS (
        |  SELECT u.user_id, p.k, p.probe_us
        |  FROM (SELECT DISTINCT user_id FROM events) u, probes p
        |)
        |SELECT g.user_id, g.k, g.probe_us, l.version, l.state
        |FROM grid g LEFT JOIN ledger l
        |  ON l.user_id = g.user_id AND l.valid_from_us <= g.probe_us
        |  AND (l.valid_to_us IS NULL OR g.probe_us < l.valid_to_us)
        |ORDER BY g.user_id, g.k""".stripMargin,
    "q61_merge_upsert" ->
      // full MERGE INTO semantics over one full-outer join: matched
      // upserts add the delta, matched tombstones drop the row,
      // unmatched upserts insert, unmatched tombstones no-op,
      // untouched snapshot rows pass through; exact integer cents
      """WITH snap AS (
        |  SELECT c_custkey AS k, CAST(round(c_acctbal * 100) AS BIGINT) AS bal
        |  FROM customer WHERE c_custkey % 2 = 0
        |), chg AS (
        |  SELECT o_custkey AS ck,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS delta,
        |    CASE WHEN o_custkey % 17 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |  FROM orders
        |  WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
        |  GROUP BY 1
        |)
        |SELECT COALESCE(s.k, c.ck) AS c_custkey,
        |  COALESCE(s.bal, 0) + COALESCE(c.delta, 0) AS bal_cents,
        |  CASE WHEN s.k IS NOT NULL AND c.ck IS NOT NULL THEN 'updated'
        |       WHEN s.k IS NOT NULL THEN 'kept'
        |       ELSE 'inserted' END AS action
        |FROM snap s FULL JOIN chg c ON s.k = c.ck
        |WHERE c.op IS NULL OR c.op <> 'delete'
        |ORDER BY c_custkey""".stripMargin,
    "q62_ab_test" ->
      // hash-assigned arms, conversion = any purchase; two-proportion
      // z^2 > 3.8416 as one cross-multiplied integer inequality
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 15))
        |      AS BIGINT) % 2 AS arm
        |  FROM events GROUP BY user_id
        |), arms AS (
        |  SELECT arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c
        |  FROM u GROUP BY arm
        |), a AS (SELECT n AS n_a, c AS conv_a FROM arms WHERE arm = 0),
        |b AS (SELECT n AS n_b, c AS conv_b FROM arms WHERE arm = 1)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  (10000 * conv_a) // n_a AS conv_a_bp,
        |  (10000 * conv_b) // n_b AS conv_b_bp,
        |  abs((10000 * conv_a) // n_a - (10000 * conv_b) // n_b) AS diff_bp,
        |  (CAST(conv_a * n_b - conv_b * n_a AS DECIMAL(38,0))
        |     * CAST(conv_a * n_b - conv_b * n_a AS DECIMAL(38,0))
        |     * CAST((n_a + n_b) * 10000 AS DECIMAL(38,0)) >
        |   CAST(38416 * (conv_a + conv_b) AS DECIMAL(38,0))
        |     * CAST(n_a * n_b AS DECIMAL(38,0))
        |     * CAST(n_a + n_b - conv_a - conv_b AS DECIMAL(38,0))) AS significant
        |FROM a, b""".stripMargin,
    "text_chunk" ->
      // fixed-window chunking with stride: chunk k covers tokens
      // [k*24, k*24+32); content replayed as md5 of the joined window
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |)
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
        |  CAST(k * 24 AS BIGINT) AS start_tok,
        |  CAST(least(32, len(toks) - k * 24) AS BIGINT) AS chunk_len,
        |  md5(array_to_string(toks[k * 24 + 1 : k * 24 + 32], ' ')) AS chunk_md5
        |FROM t, LATERAL unnest(range(0, (len(toks) + 23) // 24)) AS u(k)
        |WHERE k * 24 < len(toks)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "dedup_chunk_exact" ->
      // per-doc duplicated-chunk share over the text_chunk windows;
      // chunks repeated ANYWHERE (across or within docs) count
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    md5(array_to_string(toks[k * 24 + 1 : k * 24 + 32], ' ')) AS chunk_md5
        |  FROM t, LATERAL unnest(range(0, (len(toks) + 23) // 24)) AS u(k)
        |  WHERE k * 24 < len(toks)
        |), occ AS (
        |  SELECT chunk_md5, count(*) AS n_occ FROM c GROUP BY chunk_md5
        |)
        |SELECT c.doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN occ.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  CAST((10000 * sum(CASE WHEN occ.n_occ > 1 THEN 1 ELSE 0 END))
        |    // count(*) AS BIGINT) AS dup_share_bp
        |FROM c JOIN occ USING (chunk_md5)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "q64_hierarchy_rollup" ->
      // recursive ancestor closure on the decimal-trie hierarchy with
      // GRAPH semantics: an edge exists only FROM a PRESENT key >= 10
      // (a real BOM links existing rows; a chain broken by an absent
      // intermediate ends there — the recursion joins the edge
      // relation, never raw arithmetic, mirroring the Spark doubling
      // closure exactly on sparse key sets too). Outputs CAST to
      // BIGINT (HUGEINT rule).
      """WITH RECURSIVE n AS (
        |  SELECT p_partkey AS node,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        |  FROM part
        |), e AS (
        |  SELECT node AS child, node // 10 AS parent FROM n WHERE node >= 10
        |), paths AS (
        |  SELECT node, node AS anc, 0 AS dist FROM n
        |  UNION ALL
        |  SELECT p.node, e.parent AS anc, p.dist + 1 AS dist
        |  FROM paths p JOIN e ON e.child = p.anc
        |), d AS (
        |  SELECT node, CAST(max(dist) AS BIGINT) AS depth FROM paths GROUP BY node
        |), r AS (
        |  SELECT p.anc AS node,
        |    CAST(sum(c.cents) AS BIGINT) AS subtree_cents,
        |    count(*) AS subtree_n,
        |    CAST(max(p.dist) AS BIGINT) AS height
        |  FROM paths p JOIN n c ON c.node = p.node GROUP BY p.anc
        |)
        |SELECT n.node, d.depth, r.height, r.subtree_cents, r.subtree_n
        |FROM n JOIN d USING (node) JOIN r USING (node)
        |ORDER BY n.node""".stripMargin,
    "q63_asof_join" ->
      // as-of join via the union-window shape: running event count per
      // key (grp) gives every probe the sequence number of its latest
      // at-or-before event; event rows carry unique (k, grp), so one
      // equi-join recovers the event payload. Events sort before
      // probes at equal instants (inclusive at-or-before); event_id
      // breaks equal-instant event ties.
      """WITH u AS (
        |  SELECT user_id AS k, epoch_us(ts) AS us, 0 AS is_probe,
        |    event_id, event_type, CAST(NULL AS BIGINT) AS o_orderkey
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey, epoch_us(o_orderdate), 1,
        |    NULL, NULL, o_orderkey
        |  FROM orders
        |), w AS (
        |  SELECT *, CAST(sum(CASE WHEN is_probe = 0 THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY k ORDER BY us, is_probe, COALESCE(event_id, o_orderkey)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
        |  FROM u
        |)
        |SELECT p.o_orderkey, p.k AS o_custkey, p.us AS order_us,
        |  e.event_id AS last_event_id, e.event_type AS last_event_type,
        |  p.us - e.us AS staleness_us
        |FROM (SELECT * FROM w WHERE is_probe = 1) p
        |LEFT JOIN (SELECT * FROM w WHERE is_probe = 0) e
        |  ON e.k = p.k AND e.grp = p.grp
        |ORDER BY p.o_orderkey""".stripMargin,
    "dedup_best_keeper" ->
      // the dedup_clusters pair/component chain composed with the
      // fixed-weight LR quality score: keeper = argmax (p_keep, then
      // min doc_id) per cluster
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100) AS INT) AS lb,
        |    list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |  FROM documents
        |), pr AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
        |    AND x.lb = y.lb AND x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
        |     / (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))) >= 0.8
        |), e AS (
        |  SELECT a_id, b_id FROM pr UNION ALL SELECT b_id AS a_id, a_id AS b_id FROM pr
        |), walk(id, reach) AS (
        |  SELECT a_id, a_id FROM e
        |  UNION
        |  SELECT w.id, e.b_id FROM walk w JOIN e ON e.a_id = w.reach
        |), lab AS (SELECT id AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY id),
        |t AS (
        |  SELECT doc_id, length(text) AS n_chars,
        |   regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |   length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        |   length(regexp_replace(text, '\s+', '', 'g')) AS n_nonws
        |  FROM documents
        |), z AS (
        |  SELECT doc_id,
        |   -1.5
        |   + least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 2.0
        |   + (CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks)) * 4.0
        |   + (CAST(n_punct AS DOUBLE) / n_chars) * (-6.0)
        |   + ((CAST(n_nonws AS DOUBLE) / len(toks)) / 10.0) * 1.0 AS logit
        |  FROM t
        |), s AS (
        |  SELECT doc_id, round(1.0 / (1.0 + exp(-logit)) + 1e-9, 4) AS p_keep FROM z
        |), m AS (
        |  SELECT lab.cluster_id, lab.doc_id, s.p_keep
        |  FROM lab JOIN s USING (doc_id)
        |), r AS (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY cluster_id ORDER BY p_keep DESC, doc_id ASC) AS rk,
        |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |  FROM m
        |)
        |SELECT cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
        |  doc_id AS keep_id, p_keep AS keep_quality
        |FROM r WHERE rk = 1 ORDER BY cluster_id""".stripMargin,
    "pipeline_leakage_safe_split" ->
      // cluster-granular train/eval split: the dedup_clusters chain,
      // singletons as their own cluster, split by md5 of the CLUSTER
      // id; spanning_clusters gates the no-leak guarantee at 0
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100) AS INT) AS lb,
        |    list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |  FROM documents
        |), pr AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
        |    AND x.lb = y.lb AND x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
        |     / (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))) >= 0.8
        |), e AS (
        |  SELECT a_id, b_id FROM pr UNION ALL SELECT b_id AS a_id, a_id AS b_id FROM pr
        |), walk(id, reach) AS (
        |  SELECT a_id, a_id FROM e
        |  UNION
        |  SELECT w.id, e.b_id FROM walk w JOIN e ON e.a_id = w.reach
        |), lab AS (SELECT id AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY id),
        |a AS (
        |  SELECT doc.doc_id, COALESCE(lab.cluster_id, doc.doc_id) AS cluster_id,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(COALESCE(lab.cluster_id, doc.doc_id)
        |        AS VARCHAR) || ':split'), 1, 15)) AS BIGINT) % 1000 < 800
        |      THEN 'train' ELSE 'eval' END AS split
        |  FROM documents doc LEFT JOIN lab ON lab.doc_id = doc.doc_id
        |), sp AS (
        |  SELECT CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS spanning_clusters
        |  FROM (SELECT cluster_id, count(DISTINCT split) AS ns FROM a GROUP BY 1)
        |)
        |SELECT a.split, count(*) AS n_docs,
        |  CAST(count(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
        |  sp.spanning_clusters
        |FROM a, sp GROUP BY a.split, sp.spanning_clusters
        |ORDER BY a.split""".stripMargin,
    "scale_join_preflight" ->
      // exact join cardinality + skew pre-flight from per-key counts:
      // |A join B| = sum over matched keys of ca*cb; advice from exact
      // integer inequalities (thresholds mirror the Spark defaults)
      """WITH a AS (SELECT l_orderkey AS key, count(*) AS ca FROM lineitem GROUP BY 1),
        |b AS (SELECT o_orderkey AS key, count(*) AS cb FROM orders GROUP BY 1),
        |j AS (SELECT a.ca, b.cb FROM a FULL JOIN b ON a.key = b.key),
        |g AS (
        |  SELECT
        |    CAST(sum(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL THEN CAST(ca AS HUGEINT) * cb ELSE 0 END) AS BIGINT) AS join_rows,
        |    CAST(sum(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched_keys,
        |    CAST(sum(CASE WHEN cb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS left_only_keys,
        |    CAST(sum(CASE WHEN ca IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS right_only_keys,
        |    CAST(COALESCE(max(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL THEN CAST(ca AS HUGEINT) * cb END), 0) AS BIGINT) AS hot_key_rows,
        |    CAST(sum(COALESCE(cb, 0)) AS BIGINT) AS right_rows
        |  FROM j
        |)
        |SELECT join_rows, matched_keys, left_only_keys, right_only_keys,
        |  hot_key_rows,
        |  CASE WHEN join_rows > 0 THEN CAST((CAST(hot_key_rows AS HUGEINT) * 10000) // join_rows AS BIGINT)
        |       ELSE 0 END AS hot_share_bp,
        |  CASE WHEN right_rows <= 100000 THEN 'broadcast'
        |       WHEN CAST(hot_key_rows AS HUGEINT) * 5 > join_rows THEN 'salt'
        |       ELSE 'shuffle' END AS advice
        |FROM g""".stripMargin,
    "scale_window_preflight" ->
      // keyed-window serialization pre-flight: exact per-key counts,
      // hottest key (smallest id on ties), salt/window verdict at
      // threshold 80 (below this dataset's hottest user at every SF)
      """WITH c AS (
        |  SELECT CAST(user_id AS BIGINT) AS key, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1
        |), a AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(cnt) AS BIGINT) AS max_key_rows,
        |    CAST(sum(CASE WHEN cnt >= 80 THEN 1 ELSE 0 END) AS BIGINT) AS hot_keys
        |  FROM c
        |)
        |SELECT n_rows, n_keys, max_key_rows,
        |  (SELECT key FROM c ORDER BY cnt DESC, key ASC LIMIT 1) AS hot_key,
        |  hot_keys,
        |  CAST((10000 * max_key_rows) // n_rows AS BIGINT) AS hot_share_bp,
        |  CASE WHEN max_key_rows >= 80 THEN 'salt' ELSE 'window' END AS advice
        |FROM a""".stripMargin,
    "pipeline_feature_matrix" ->
      // PIT training snapshot: features strictly <= T (SCD2 state,
      // trailing-7d count, LTV cents), label strictly > T (acted
      // within (T, T+7d]) — the leakage-proof feature-store join
      """WITH e AS (
        |  SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS us
        |  FROM events
        |), m AS (
        |  SELECT user_id, event_id, state, us,
        |    CASE WHEN lag(state) OVER w IS NULL OR lag(state) OVER w <> state
        |      THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), v AS (
        |  SELECT user_id, state, us,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        |  FROM m
        |), g AS (
        |  SELECT user_id, version, min(state) AS state,
        |    min(us) AS valid_from_us
        |  FROM v GROUP BY 1, 2
        |), ledger AS (
        |  SELECT user_id, version, state, valid_from_us,
        |    lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us
        |  FROM g
        |), span AS (
        |  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
        |), probes AS (
        |  SELECT CAST(k AS BIGINT) AS k, s.lo + ((s.hi - s.lo) * k) // 4 AS probe_us
        |  FROM (SELECT unnest([1, 2, 3]) AS k), span s
        |), ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), feats AS (
        |  SELECT ev.user_id, p.k, p.probe_us,
        |    CAST(sum(CASE WHEN ev.us > p.probe_us - 604800000000
        |      AND ev.us <= p.probe_us THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
        |    CAST(sum(CASE WHEN ev.us <= p.probe_us THEN ev.cents ELSE 0 END)
        |      AS BIGINT) AS ltv_cents,
        |    CAST(max(CASE WHEN ev.us > p.probe_us
        |      AND ev.us <= p.probe_us + 604800000000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS label
        |  FROM ev CROSS JOIN probes p GROUP BY 1, 2, 3
        |)
        |SELECT f.user_id, f.k, f.probe_us, l.state, f.n_7d, f.ltv_cents, f.label
        |FROM feats f LEFT JOIN ledger l
        |  ON l.user_id = f.user_id AND l.valid_from_us <= f.probe_us
        |  AND (l.valid_to_us IS NULL OR f.probe_us < l.valid_to_us)
        |ORDER BY f.user_id, f.k""".stripMargin,
    "q58_scd2" ->
      // SCD2 dimension versioning: maximal same-state runs with
      // half-open [valid_from, valid_to) intervals in exact epoch-us
      """WITH e AS (
        |  SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS us
        |  FROM events
        |), m AS (
        |  SELECT user_id, event_id, state, us,
        |    CASE WHEN lag(state) OVER w IS NULL OR lag(state) OVER w <> state
        |      THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), v AS (
        |  SELECT user_id, state, us,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        |  FROM m
        |), g AS (
        |  SELECT user_id, version, min(state) AS state,
        |    min(us) AS valid_from_us, count(*) AS n_events
        |  FROM v GROUP BY 1, 2
        |)
        |SELECT user_id, version, state, valid_from_us,
        |  lead(valid_from_us) OVER w2 AS valid_to_us, n_events,
        |  lead(valid_from_us) OVER w2 IS NULL AS is_current
        |FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
        |ORDER BY user_id, version""".stripMargin,
    "q51_tpch_q2" ->
      // canonical TPC-H Q2 adapted (no partsupp: supply cost stood in
      // by min unit price ever charged, exact integer milli-cents)
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min((CAST(round(l_extendedprice * 100) AS BIGINT) * 1000)
        |        // CAST(l_quantity AS BIGINT)) AS cost_mc
        |  FROM lineitem GROUP BY 1, 2
        |), j AS (
        |  SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name, c.cost_mc,
        |    min(c.cost_mc) OVER (PARTITION BY p.p_partkey) AS min_mc
        |  FROM cost c
        |  JOIN part p ON p.p_partkey = c.l_partkey
        |    AND p.p_type = 'SMALL' AND p.p_size <= 10
        |  JOIN supplier s ON s.s_suppkey = c.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_mc
        |FROM j WHERE cost_mc = min_mc
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q52_tpch_q9" ->
      // canonical TPC-H Q9 adapted (no ps_supplycost: unit cost stood
      // in by 80% of retail price, exact as (retail_cents*4) div 5)
      """SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
        |    - CAST(l.l_quantity AS BIGINT)
        |      * ((CAST(round(p.p_retailprice * 100) AS BIGINT) * 4) // 5)) AS DOUBLE) / 100.0
        |    AS sum_profit
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'red%'
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
    "q53_tpch_q11" ->
      // canonical TPC-H Q11 adapted (inventory value stood in by
      // shipped revenue from one nation's suppliers; the canonical
      // fixed share empties at scale, so the cut is 3x the average);
      // HAVING is the exact integer inequality value*n > 3*total
      """WITH pp AS (
        |  SELECT l.l_partkey AS p_partkey,
        |    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM lineitem l
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
        |  GROUP BY 1
        |), t AS (SELECT sum(value_cents) AS total_cents, count(*) AS n_parts FROM pp)
        |SELECT pp.p_partkey, pp.value_cents
        |FROM pp, t WHERE pp.value_cents * t.n_parts > 3 * t.total_cents
        |ORDER BY pp.value_cents DESC, pp.p_partkey""".stripMargin,
    "q54_tpch_q12" ->
      // canonical TPC-H Q12 adapted (no shipmode/commit/receipt:
      // lines bucket by whole-day ship lag from order date)
      """SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 0 THEN 'early'
        |  WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN 'fast'
        |  WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90 THEN 'normal'
        |  ELSE 'late' END AS lag_bucket,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q55_tpch_q16" ->
      // canonical TPC-H Q16 adapted (partsupp stood in by "shipped at
      // least one line"; complaints exclusion by negative acctbal)
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |  AND p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
        |WHERE NOT EXISTS (SELECT 1 FROM supplier s
        |                  WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q56_tpch_q20" ->
      // canonical TPC-H Q20 adapted (excess availability stood in by
      // dominance: shipped more than half a part's year quantity)
      """WITH ps AS (
        |  SELECT l.l_partkey, l.l_suppkey,
        |    sum(CAST(l.l_quantity AS BIGINT)) AS s_qty,
        |    sum(sum(CAST(l.l_quantity AS BIGINT)))
        |      OVER (PARTITION BY l.l_partkey) AS tot_qty
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'blue%'
        |  WHERE l.l_shipdate >= '1997-01-01' AND l.l_shipdate < '1998-01-01'
        |  GROUP BY 1, 2
        |)
        |SELECT s.s_suppkey, s.s_name, n.n_name, d.n_parts
        |FROM (SELECT l_suppkey, count(*) AS n_parts
        |      FROM ps WHERE s_qty * 2 > tot_qty GROUP BY 1) d
        |JOIN supplier s ON s.s_suppkey = d.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |ORDER BY s.s_suppkey""".stripMargin,
    "q57_tpch_q21" ->
      // canonical TPC-H Q21 adapted (late = ship lag > 90 days); the
      // EXISTS/NOT-EXISTS pair collapses into one per-order aggregate
      """WITH po AS (
        |  SELECT l.l_orderkey,
        |    count(DISTINCT l.l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
        |      THEN l.l_suppkey END) AS n_late_supp,
        |    max(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
        |      THEN l.l_suppkey END) AS late_supp
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
        |  GROUP BY 1
        |)
        |SELECT s.s_name, count(*) AS numwait
        |FROM po JOIN supplier s ON s.s_suppkey = po.late_supp
        |WHERE po.n_supp >= 2 AND po.n_late_supp = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q39_tpch_q3" ->
      // canonical TPC-H Q3 adapted (no o_shippriority column): top-10
      // unshipped-order revenue for one market segment; cents-exact
      """SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < '1996-07-01' AND l.l_shipdate > '1996-07-01'
        |GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q40_tpch_q6" ->
      // canonical TPC-H Q6: the pure-scan forecast query; open-bound
      // discount band avoids any float-equality edge
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount > 0.045 AND l_discount < 0.075
        |  AND l_quantity < 24""".stripMargin,
    "q41_tpch_q7" ->
      // canonical TPC-H Q7: bilateral nation trade volume by ship year
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |WHERE l.l_shipdate >= '1995-01-01' AND l.l_shipdate < '1997-01-01'
        |  AND ((sn.n_name = 'NATION_20' AND cn.n_name = 'NATION_11')
        |    OR (sn.n_name = 'NATION_11' AND cn.n_name = 'NATION_20'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q42_tpch_q13" ->
      // canonical TPC-H Q13: customer order-count distribution; the
      // LEFT join keeps zero-order customers in the c_count=0 bucket
      """WITH c AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority <> '5-LOW'
        |  GROUP BY c.c_custkey
        |)
        |SELECT c_count, count(*) AS custdist
        |FROM c GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q43_tpch_q14" ->
      // canonical TPC-H Q14: promo revenue share — one IEEE division
      // of two exact integer cents sums, rounded at 6 dp
      """WITH j AS (
        |  SELECT CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT) AS cents,
        |    p.p_type = 'PROMO' AS is_promo
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l.l_shipdate >= '1996-03-01' AND l.l_shipdate < '1996-04-01'
        |)
        |SELECT
        |  round(CAST(sum(CASE WHEN is_promo THEN cents ELSE 0 END) AS DOUBLE) * 100.0
        |    / sum(cents), 6) AS promo_revenue_pct,
        |  CAST(sum(cents) AS DOUBLE) / 100.0 AS total_revenue
        |FROM j""".stripMargin,
    "q44_tpch_q15" ->
      // canonical TPC-H Q15: supplier(s) at max quarterly revenue,
      // all ties kept; cents-exact max can't split on float ulp
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS cents
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s.s_suppkey, s.s_name, CAST(r.cents AS DOUBLE) / 100.0 AS total_revenue
        |FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |WHERE r.cents = (SELECT max(cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q45_tpch_q17" ->
      // canonical TPC-H Q17: small-quantity revenue for one brand; the
      // qty < avg/5 cut is the exact inequality 5*qty*cnt < sum(qty)
      """WITH li AS (
        |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
        |    count(*) OVER (PARTITION BY l.l_partkey) AS cnt,
        |    sum(CAST(l.l_quantity AS BIGINT)) OVER (PARTITION BY l.l_partkey) AS sum_qty
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_brand = 'Brand#19'
        |)
        |SELECT round(CAST(sum(cents) AS DOUBLE) / 700.0, 2) AS avg_yearly,
        |  count(*) AS n_items
        |FROM li WHERE qty * 5 * cnt < sum_qty""".stripMargin,
    "q46_tpch_q18" ->
      // canonical TPC-H Q18: large-volume customers, top 20 by
      // (totalprice desc, orderkey); integral-quantity threshold.
      // NB: every output column that passes through a DuckDB sum() is
      // CAST back to BIGINT — sum(BIGINT) returns HUGEINT (int128),
      // which the driver's fetch path canonicalizes differently from
      // Spark's int64 (the r6 hash-mismatch root cause: the 8 red rows
      // were exactly the 8 oracles with un-CAST HUGEINT outputs).
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300
        |)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice, b.total_qty
        |FROM orders o
        |JOIN big b ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20""".stripMargin,
    "q37_tpch_q10" ->
      // canonical TPC-H Q10: returned-item revenue per customer, top
      // 20 by (revenue desc, custkey); cents-exact
      """WITH per_order AS (
        |  SELECT o.o_custkey,
        |    CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE l.l_returnflag = 'R'
        |    AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
        |  GROUP BY o.o_custkey
        |)
        |SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
        |  CAST(sum(p.cents) AS DOUBLE) / 100.0 AS revenue
        |FROM customer c
        |JOIN per_order p ON p.o_custkey = c.c_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q36_tpch_q5" ->
      // canonical TPC-H Q5 with the local-supplier nation equality;
      // revenue in exact integer cents
      """SELECT n.n_name,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1997-01-01'
        |GROUP BY n.n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q35_anomaly" ->
      // the anomaly verdict is an exact integer inequality; z is
      // single IEEE-exact divisions of the same integers
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1
        |), t AS (
        |  SELECT day, n_events,
        |    count(*) OVER () AS n,
        |    sum(n_events) OVER () AS s,
        |    sum(n_events * n_events) OVER () AS ss
        |  FROM d
        |)
        |SELECT day, n_events,
        |  round((CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / n) /
        |    sqrt(CAST(n * ss - s * s AS DOUBLE) / (n * (n - 1))) + 1e-9, 4) AS z,
        |  (n * n_events - s) * (n * n_events - s) * (n - 1) > 4 * n * (n * ss - s * s)
        |    AS is_anomaly
        |FROM t ORDER BY day""".stripMargin,
    "q34_window_suite" ->
      // unique total order (totalprice desc, orderkey) makes every
      // ratio an exact integer division - no rounding needed
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS tile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(o_orderkey) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS top_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, pct_rank, o_orderkey""".stripMargin,
    "text_entropy" ->
      // row-local char-distribution entropy; the fold order differs
      // across engines (list_distinct reorders) but negated float sums
      // commute under round-to-nearest, and 4dp+1e-9 absorbs the
      // association drift of <= alphabet-size terms
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '.', 0, 's') AS chs
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(chs) AS BIGINT) AS n_chars_total,
        |  CAST(len(list_distinct(chs)) AS BIGINT) AS n_distinct_chars,
        |  round(-list_sum(list_transform(list_distinct(chs), c ->
        |    (CAST(len(list_filter(chs, x -> x = c)) AS DOUBLE) / len(chs)) *
        |    log2(CAST(len(list_filter(chs, x -> x = c)) AS DOUBLE) / len(chs))))
        |    + 1e-9, 4) AS entropy_bits
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_quality_train" -> lrTrainOracleSql(),
    "text_quality_trained_score" -> lrTrainedScoreOracleSql(),
    "pipeline_budget" ->
      // greedy per-domain budget fill in md5 order: keep while the
      // PRECEDING cumulative token total is under 2000 (the crossing
      // doc lands, Batcher close-on-crossing semantics)
      """WITH sized AS (
        |  SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR) || ':budget') AS key
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY key, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM sized
        |), t AS (
        |  SELECT source, n_tokens,
        |    CASE WHEN cum - n_tokens < 2000 THEN 1 ELSE 0 END AS kept
        |  FROM c
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS n_docs_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN kept = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
        |  round(CAST(sum(CASE WHEN kept = 1 THEN n_tokens ELSE 0 END) AS DOUBLE) / 2000, 4) AS fill_ratio
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_dsir" ->
      // DSIR importance weights: hashed unigram+bigram bag-of-words,
      // Laplace-smoothed target (src0) vs raw log-ratio per bucket,
      // fixed-pointed to integer micro-units at the ratio table so the
      // per-doc sum (and hence rank) is exact in both engines
      """WITH t AS (
        |  SELECT doc_id, source, string_split(trim(lower(text)), ' ') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, source, toks[i] AS gram
        |  FROM t, LATERAL unnest(range(1, len(toks) + 1)) AS u(i)
        |  UNION ALL
        |  SELECT doc_id, source, toks[i] || ' ' || toks[i + 1] AS gram
        |  FROM t, LATERAL unnest(range(1, len(toks))) AS u(i)
        |), f AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) % 1024 AS bucket
        |  FROM g
        |), cr AS (
        |  SELECT bucket, count(*) AS cr FROM f GROUP BY bucket
        |), ct AS (
        |  SELECT bucket, count(*) AS ct FROM f WHERE source = 'src0' GROUP BY bucket
        |), tot AS (
        |  SELECT (SELECT sum(cr) FROM cr) AS nr,
        |         (SELECT coalesce(sum(ct), 0) FROM ct) AS nt
        |), ratio AS (
        |  SELECT cr.bucket,
        |    CAST(round((ln((coalesce(ct.ct, 0) + 1.0) / (tot.nt + 1024)) -
        |                ln((cr.cr + 1.0) / (tot.nr + 1024))) * 1e6) AS BIGINT)
        |      AS lr_micro
        |  FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN tot
        |), scored AS (
        |  SELECT f.doc_id, count(*) AS n_feats, sum(r.lr_micro) AS lw_micro
        |  FROM f JOIN ratio r USING (bucket) GROUP BY f.doc_id
        |)
        |SELECT CAST(row_number() OVER (ORDER BY lw_micro DESC, doc_id) AS BIGINT)
        |    AS rank,
        |  doc_id, n_feats, CAST(lw_micro AS DOUBLE) / 1e6 AS logw
        |FROM scored ORDER BY lw_micro DESC, doc_id LIMIT 50""".stripMargin,
    "pipeline_shuffle" ->
      // md5-keyed deterministic permutation; shard = top 16 key bits
      // scaled by 8 (a fixed uniform range partition), pos = key rank
      // within the shard
      """WITH k AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':shuf') AS key
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST((CAST(('0x' || substr(key, 1, 4)) AS BIGINT) * 8) >> 16 AS INT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY (CAST(('0x' || substr(key, 1, 4)) AS BIGINT) * 8) >> 16
        |    ORDER BY key) AS INT) AS pos
        |FROM k
        |ORDER BY shard, pos""".stripMargin,
    "embedding_diversity" ->
      // deterministic md5-ordered sample of 64 vectors, all C(64,2)
      // pairwise cosines aggregated to one diversity row
      """WITH s AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR) || ':div') LIMIT 64
        |), p AS (
        |  SELECT list_cosine_similarity(a.v, b.v) AS cos
        |  FROM s a JOIN s b ON a.vec_id < b.vec_id
        |)
        |SELECT count(*) AS n_pairs, round(avg(cos), 4) AS mean_cos,
        |  round(min(cos), 4) AS min_cos, round(max(cos), 4) AS max_cos
        |FROM p""".stripMargin,
    "ann_pq" ->
      // product quantization end to end: md5-sampled 16-codeword
      // codebook (index by vec_id order), per-subspace encode by
      // argmin of the 6dp-ROUNDED distance (ties -> lowest c — both
      // engines consume only rounded values so ulp-order differences
      // cannot flip an argmin), ADC = sum of the 4 rounded lookups,
      // ranked at 4dp with vec_id tiebreak. (x)*(x) not pow: DuckDB's
      // ^ is pow() and may differ from multiplication in the last ulp
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), cb AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
        |  FROM (SELECT vec_id, v FROM e
        |        ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':pq'), 1, 15)) AS BIGINT), vec_id
        |        LIMIT 16)
        |), sd AS (
        |  SELECT e.vec_id, cb.c, j.j,
        |    round(sum((e.v[j.j*16 + d.d] - cb.v[j.j*16 + d.d]) * (e.v[j.j*16 + d.d] - cb.v[j.j*16 + d.d])) + 1e-9, 6) AS dist
        |  FROM e, cb, (SELECT unnest(range(0, 4)) AS j) j, (SELECT unnest(range(1, 17)) AS d) d
        |  GROUP BY e.vec_id, cb.c, j.j
        |), codes AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
        |    FROM sd) WHERE rn = 1
        |), lut AS (
        |  SELECT q.vec_id AS q_id, cb.c, j.j,
        |    round(sum((q.v[j.j*16 + d.d] - cb.v[j.j*16 + d.d]) * (q.v[j.j*16 + d.d] - cb.v[j.j*16 + d.d])) + 1e-9, 6) AS dist
        |  FROM (SELECT vec_id, v FROM e WHERE vec_id % 50 = 0) q, cb,
        |       (SELECT unnest(range(0, 4)) AS j) j, (SELECT unnest(range(1, 17)) AS d) d
        |  GROUP BY q.vec_id, cb.c, j.j
        |), adc AS (
        |  SELECT l.q_id, codes.vec_id, round(sum(l.dist) + 1e-9, 4) AS adc
        |  FROM codes JOIN lut l ON codes.j = l.j AND codes.c = l.c
        |  WHERE codes.vec_id <> l.q_id
        |  GROUP BY l.q_id, codes.vec_id
        |), r AS (
        |  SELECT q_id, vec_id AS neighbor_id, adc,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
        |  FROM adc
        |)
        |SELECT q_id, neighbor_id, adc, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "ann_ivf_pq" ->
      // FAISS-style IVFPQ composition: the ann_ivf_sampled centroid/
      // assignment/probe CTEs prune to 4 lists per query, the ann_pq
      // codebook/codes/LUT CTEs score only those lists' vectors by
      // summed rounded subspace distances
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |hs AS (
        |  SELECT vec_id,
        |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM e
        |), sel AS (SELECT vec_id FROM hs ORDER BY h, vec_id LIMIT 16),
        |cent AS (
        |  SELECT row_number() OVER (ORDER BY s.vec_id) - 1 AS list_id, e.v AS cv
        |  FROM sel s JOIN e ON e.vec_id = s.vec_id
        |), asgn AS (
        |  SELECT vec_id, list_id FROM (
        |    SELECT e.vec_id, c.list_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.list_id ASC) AS rn
        |    FROM e CROSS JOIN cent c) WHERE rn = 1
        |), q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
        |qp AS (
        |  SELECT q_id, list_id FROM (
        |    SELECT q.q_id, c.list_id,
        |      row_number() OVER (PARTITION BY q.q_id
        |        ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.list_id ASC) AS rn
        |    FROM q CROSS JOIN cent c) WHERE rn <= 4
        |), cb AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
        |  FROM (SELECT vec_id, v FROM e
        |        ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':pq'), 1, 15)) AS BIGINT), vec_id
        |        LIMIT 16)
        |), sd AS (
        |  SELECT e.vec_id, cb.c, j.j,
        |    round(sum((e.v[j.j*16 + d.d] - cb.v[j.j*16 + d.d]) * (e.v[j.j*16 + d.d] - cb.v[j.j*16 + d.d])) + 1e-9, 6) AS dist
        |  FROM e, cb, (SELECT unnest(range(0, 4)) AS j) j, (SELECT unnest(range(1, 17)) AS d) d
        |  GROUP BY e.vec_id, cb.c, j.j
        |), codes AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
        |    FROM sd) WHERE rn = 1
        |), lut AS (
        |  SELECT q.q_id, cb.c, j.j,
        |    round(sum((q.qv[j.j*16 + d.d] - cb.v[j.j*16 + d.d]) * (q.qv[j.j*16 + d.d] - cb.v[j.j*16 + d.d])) + 1e-9, 6) AS dist
        |  FROM q, cb, (SELECT unnest(range(0, 4)) AS j) j, (SELECT unnest(range(1, 17)) AS d) d
        |  GROUP BY q.q_id, cb.c, j.j
        |), adc AS (
        |  SELECT l.q_id, codes.vec_id, round(sum(l.dist) + 1e-9, 4) AS adc
        |  FROM qp
        |  JOIN asgn a ON a.list_id = qp.list_id
        |  JOIN codes ON codes.vec_id = a.vec_id
        |  JOIN lut l ON l.q_id = qp.q_id AND l.j = codes.j AND l.c = codes.c
        |  WHERE a.vec_id <> qp.q_id
        |  GROUP BY l.q_id, codes.vec_id
        |), r AS (
        |  SELECT q_id, vec_id AS neighbor_id, adc,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
        |  FROM adc
        |)
        |SELECT q_id, neighbor_id, adc, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "text_pii_redact" ->
      """WITH r AS (
        |  SELECT doc_id, length(text) AS orig_len,
        |   regexp_replace(regexp_replace(regexp_replace(text,
        |     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |     'https?://[^ ]+', '<URL>', 'g'),
        |     '\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
        |   regexp_replace(regexp_replace(regexp_replace(text,
        |     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '', 'g'),
        |     'https?://[^ ]+', '', 'g'),
        |     '\+?[0-9][0-9 ()-]{7,}[0-9]', '', 'g') AS stripped
        |  FROM documents
        |)
        |SELECT doc_id, length(redacted) AS redacted_len,
        | orig_len - length(stripped) > 0 AS had_pii
        |FROM r ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100) AS INT) AS lb,
        |   list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |  FROM documents
        |)
        |SELECT x.doc_id AS a_id, y.doc_id AS b_id,
        | round(CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
        |   / (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))), 4) AS jaccard
        |FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
        |  AND x.lb = y.lb AND x.doc_id < y.doc_id
        |WHERE CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
        |   / (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_containment" ->
      // same blocked candidates as dedup_ngram_jaccard; containment =
      // inter / min(|A|,|B|) — the quote-inclusion signal
      """WITH d AS (
        |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100) AS INT) AS lb,
        |   list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |  FROM documents
        |)
        |SELECT x.doc_id AS a_id, y.doc_id AS b_id,
        | round(CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
        |   / least(len(x.ts), len(y.ts)), 4) AS containment,
        | round(CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
        |   / (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))), 4) AS jaccard
        |FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
        |  AND x.lb = y.lb AND x.doc_id < y.doc_id
        |WHERE CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
        |   / least(len(x.ts), len(y.ts)) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    "scale_hash_split" ->
      """WITH b AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 10 THEN 'val'
        |            WHEN bucket < 20 THEN 'test' ELSE 'train' END AS split,
        | count(*) AS n
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "text_repetition" ->
      """WITH e AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, tok, count(*) AS c FROM e WHERE length(tok) > 0 GROUP BY doc_id, tok
        |)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
        | round(CAST(count(*) AS DOUBLE) / sum(c) + 1e-9, 4) AS distinct_ratio,
        | round(CAST(max(c) AS DOUBLE) / sum(c) + 1e-9, 4) AS top_token_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin,
    "dedup_edit_distance" ->
      // same blocked candidate generation (lang : length-band :
      // 2-char prefix, block capped at 64 by doc_id rank), exact
      // Levenshtein verify — the gate mirrors the blocking, so it is
      // exact rather than recall-fuzzy
      """WITH t0 AS (
        |  SELECT doc_id, lang, lower(trim(substr(text, 1, 40))) AS title
        |  FROM documents WHERE lang IS NOT NULL
        |), t1 AS (
        |  SELECT doc_id, title,
        |    lang || ':' || CAST(length(title) // 8 AS VARCHAR) || ':' ||
        |      substr(title, 1, 2) AS blk,
        |    row_number() OVER (
        |      PARTITION BY lang || ':' || CAST(length(title) // 8 AS VARCHAR)
        |        || ':' || substr(title, 1, 2)
        |      ORDER BY doc_id) AS rn
        |  FROM t0 WHERE title <> ''
        |), t AS (SELECT * FROM t1 WHERE rn <= 64)
        |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
        |FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.title, b.title) <= 3
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,
    "dedup_edit_distance_multipass" ->
      // the SAME three-pass rotated blocking: pass 1 = (lang :
      // length-band : 2-char prefix), pass 2 = (lang : offset
      // length-band : 2-char SUFFIX), pass 3 = (lang : length-band :
      // fixed mid-anchor chars 20-21), each capped at 64 by doc_id
      // rank within its own block, candidates UNION + pair-dedup,
      // then the exact Levenshtein verify — the gate mirrors all
      // passes, so it stays exact rather than recall-fuzzy
      """WITH t0 AS (
        |  SELECT doc_id, lang, lower(trim(substr(text, 1, 40))) AS title
        |  FROM documents WHERE lang IS NOT NULL
        |), tt AS (SELECT * FROM t0 WHERE title <> ''),
        |p1 AS (
        |  SELECT doc_id, title,
        |    lang || ':' || CAST(length(title) // 8 AS VARCHAR) || ':' ||
        |      substr(title, 1, 2) AS blk
        |  FROM tt
        |), r1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY blk ORDER BY doc_id) AS rn
        |  FROM p1
        |), p2 AS (
        |  SELECT doc_id, title,
        |    lang || ':' || CAST((length(title) + 4) // 8 AS VARCHAR) || ':' ||
        |      right(title, 2) AS blk
        |  FROM tt
        |), r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY blk ORDER BY doc_id) AS rn
        |  FROM p2
        |), p3 AS (
        |  SELECT doc_id, title,
        |    lang || ':' || CAST(length(title) // 8 AS VARCHAR) || ':' ||
        |      substr(title, 20, 2) AS blk
        |  FROM tt
        |), r3 AS (
        |  SELECT *, row_number() OVER (PARTITION BY blk ORDER BY doc_id) AS rn
        |  FROM p3
        |), cand AS (
        |  SELECT DISTINCT a_id, b_id, ta, tb FROM (
        |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |      a.title AS ta, b.title AS tb
        |    FROM (SELECT * FROM r1 WHERE rn <= 64) a
        |    JOIN (SELECT * FROM r1 WHERE rn <= 64) b
        |      ON a.blk = b.blk AND a.doc_id < b.doc_id
        |    UNION ALL
        |    SELECT a.doc_id, b.doc_id, a.title, b.title
        |    FROM (SELECT * FROM r2 WHERE rn <= 64) a
        |    JOIN (SELECT * FROM r2 WHERE rn <= 64) b
        |      ON a.blk = b.blk AND a.doc_id < b.doc_id
        |    UNION ALL
        |    SELECT a.doc_id, b.doc_id, a.title, b.title
        |    FROM (SELECT * FROM r3 WHERE rn <= 64) a
        |    JOIN (SELECT * FROM r3 WHERE rn <= 64) b
        |      ON a.blk = b.blk AND a.doc_id < b.doc_id
        |  )
        |)
        |SELECT a_id AS doc_id_a, b_id AS doc_id_b,
        |  CAST(levenshtein(ta, tb) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(ta, tb) <= 3
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,
    "sink_batch_assign" ->
      """SELECT event_id, user_id,
        | CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1) / 100) AS BIGINT) AS batch_id
        |FROM events ORDER BY event_id""".stripMargin,
    "sink_batch_bytes" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, event_id, strlen(props) + 24 AS sz,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_id, rn, sz,
        |         CAST(0 AS BIGINT) AS batch_id, sz AS acc,
        |         CASE WHEN sz >= 4096 THEN 1 ELSE 0 END AS fired
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.event_id, o.rn, o.sz,
        |         CASE WHEN r.fired = 1 THEN r.batch_id + 1 ELSE r.batch_id END,
        |         CASE WHEN r.fired = 1 THEN o.sz ELSE r.acc + o.sz END,
        |         CASE WHEN (CASE WHEN r.fired = 1 THEN o.sz ELSE r.acc + o.sz END) >= 4096 THEN 1 ELSE 0 END
        |  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
        |)
        |SELECT event_id, user_id, batch_id FROM r ORDER BY event_id""".stripMargin,
    "sink_rows_batch" ->
      """WITH b AS (
        |  SELECT event_id, user_id, strlen(props) + 24 AS rec_size,
        |   CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1) / 100) AS BIGINT) AS batch_id
        |  FROM events
        |)
        |SELECT user_id, batch_id, count(*) AS n_rows, CAST(sum(rec_size) AS BIGINT) AS batch_bytes,
        | min(event_id) AS first_event, max(event_id) AS last_event,
        | concat('projects/p/datasets/d/tables/events_u', user_id, '/streams/_default') AS stream
        |FROM b GROUP BY user_id, batch_id ORDER BY user_id, batch_id""".stripMargin,
    "sink_stream_offsets" ->
      """WITH b AS (
        |  SELECT user_id,
        |   CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1) / 100) AS BIGINT) AS batch_id
        |  FROM events
        |), g AS (
        |  SELECT user_id, batch_id, count(*) AS n_rows FROM b GROUP BY user_id, batch_id
        |)
        |SELECT user_id, batch_id,
        | CAST(sum(n_rows) OVER (PARTITION BY user_id ORDER BY batch_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_rows AS BIGINT) AS offset_start,
        | n_rows
        |FROM g ORDER BY user_id, batch_id""".stripMargin,
    "serialize_json" ->
      """SELECT event_id,
        | to_json(struct_pack(event_id := event_id, event_type := event_type, user_id := user_id)) AS payload,
        | strlen(to_json(struct_pack(event_id := event_id, event_type := event_type, user_id := user_id))) AS payload_bytes
        |FROM events ORDER BY event_id""".stripMargin,
    "serialize_proto" ->
      """WITH v AS (
        |  SELECT event_id, user_id, strlen(event_type) AS sl,
        |    CAST((length(format('{:b}', event_id)) + 6) // 7 AS BIGINT) AS vl_id,
        |    CAST((length(format('{:b}', user_id)) + 6) // 7 AS BIGINT) AS vl_uid,
        |    CAST((length(format('{:b}', strlen(event_type))) + 6) // 7 AS BIGINT) AS vl_sl
        |  FROM events
        |)
        |SELECT event_id,
        |  (1 + vl_id) + (1 + vl_sl + sl) + (1 + vl_uid) AS payload_bytes
        |FROM v ORDER BY event_id""".stripMargin,
    "stream_window_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        | count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events
        |), m AS (
        |  SELECT user_id, ts, value,
        |   CAST(sum(CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM o
        |)
        |SELECT user_id, session_id, CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS session_start,
        | count(*) AS n_events, round(sum(value), 2) AS session_value
        |FROM m GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "stream_interval_join" ->
      """WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
        |     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id, count(*) AS n_views
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 60 MINUTE
        |GROUP BY p.event_id, p.user_id ORDER BY purchase_id""".stripMargin,
    "scale_salted_agg" ->
      """SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "scale_salted_join" ->
      """WITH dim(event_type, weight) AS (VALUES
        |  ('view', 1.0), ('click', 2.0), ('purchase', 10.0), ('signup', 5.0), ('error', 0.0))
        |SELECT e.event_type, count(*) AS n, round(sum(e.value * d.weight), 2) AS weighted
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q17_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q18_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q18b_percentiles_approx" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
        | TRUE AS p50_ok, TRUE AS p95_ok, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q20_outer_join" ->
      """WITH stats AS (
        |  SELECT o_custkey, count(*) AS cnt, CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT c_custkey, c_mktsegment,
        | coalesce(cnt, 0) AS n_orders, coalesce(total, 0.0) AS order_total
        |FROM customer LEFT JOIN stats ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q22_upsert" ->
      """WITH updates AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |   round(round(o_totalprice * 100) * 1.1) / 100.0 AS o_totalprice,
        |   o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 = 0
        |), merged AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |   WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM updates
        |)
        |SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q21_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q19_stats" ->
      """SELECT l_linestatus,
        | round(stddev_samp(l_extendedprice), 4) AS sd_price,
        | round(var_samp(l_quantity), 4) AS var_qty,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        | round(skewness(l_discount) + 1e-9, 4) AS skew_disc
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q23_supplier_rank" ->
      """WITH bysupp AS (
        |  SELECT l_suppkey, CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |   count(*) AS n_items
        |  FROM lineitem GROUP BY l_suppkey
        |)
        |SELECT n_name, rnk, s_suppkey, s_name, revenue, n_items FROM (
        |  SELECT n_name, s_suppkey, s_name, revenue, n_items,
        |    row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey ASC) AS rnk
        |  FROM bysupp
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |) WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin,
    "text_ngram_freq" ->
      """SELECT token, count(*) AS freq FROM (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents
        |) WHERE length(token) > 0
        |GROUP BY token ORDER BY freq DESC, token ASC LIMIT 100""".stripMargin,
    "scale_bucketed_join" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "scale_partition_prune" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        | CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue, count(*) AS n_orders
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-12'
        |GROUP BY 1 ORDER BY o_month""".stripMargin,
    "scale_zorder_box" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |FROM orders
        |WHERE o_custkey >= 1000 AND o_custkey < 2000
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "scale_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        | count(DISTINCT l_suppkey) AS exact_supps,
        | TRUE AS parts_within_tol, TRUE AS supps_within_tol
        |FROM lineitem""".stripMargin,
    "scale_countmin" ->
      // relational count-min sketch: the depth-4 x width-512 counter
      // array as a sparse (row, cell, cnt) table on the portable md5
      // hash; estimate = min over a key's 4 cells. CMS only ever
      // overestimates, so never_underestimates re-checks the theorem.
      """WITH keyed AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
        |cells AS (
        |  SELECT k, r.r AS row,
        |    CAST(('0x' || substr(md5(k || ':cm' || r.r), 1, 15)) AS BIGINT) % 512 AS cell
        |  FROM keyed, (SELECT unnest(range(4)) AS r) r
        |),
        |cms AS (SELECT row, cell, count(*) AS cnt FROM cells GROUP BY 1, 2),
        |top AS (
        |  SELECT k, count(*) AS exact_cnt FROM keyed GROUP BY 1
        |  ORDER BY exact_cnt DESC, k LIMIT 20
        |),
        |tc AS (
        |  SELECT t.k, t.exact_cnt, r.r AS row,
        |    CAST(('0x' || substr(md5(t.k || ':cm' || r.r), 1, 15)) AS BIGINT) % 512 AS cell
        |  FROM top t, (SELECT unnest(range(4)) AS r) r
        |)
        |SELECT tc.k AS user_id, tc.exact_cnt, min(cms.cnt) AS est_cnt,
        |  min(cms.cnt) >= tc.exact_cnt AS never_underestimates
        |FROM tc JOIN cms ON cms.row = tc.row AND cms.cell = tc.cell
        |GROUP BY 1, 2 ORDER BY exact_cnt DESC, user_id""".stripMargin,
    "scale_hll" ->
      // relational HyperLogLog: 512 registers on the portable md5
      // hash, rank = trailing zeros of (h div 512) + 1 via the exact
      // lowest-set-bit log2; every integer (S2, zero regs, exact
      // distinct) hash-matches, the double estimate (raw harmonic or
      // linear-counting correction) feeds only the tolerance boolean
      """WITH h AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':hll'), 1, 15))
        |    AS BIGINT) AS h
        |  FROM events WHERE user_id IS NOT NULL
        |), rr AS (
        |  SELECT h % 512 AS reg, h // 512 AS rest FROM h
        |), rho AS (
        |  SELECT reg, CASE WHEN rest = 0 THEN 49
        |    ELSE CAST(round(log2(rest & (-rest))) AS BIGINT) + 1 END AS rho
        |  FROM rr
        |), regs AS (
        |  SELECT reg, max(rho) AS m_reg FROM rho GROUP BY reg
        |), st AS (
        |  SELECT count(*) AS n_hit,
        |    CAST(sum(1::BIGINT << CAST(49 - m_reg AS INTEGER)) AS BIGINT) AS s2_hit
        |  FROM regs
        |), ex AS (
        |  SELECT count(DISTINCT user_id) AS exact_distinct FROM events
        |), fin AS (
        |  SELECT CAST(512 AS BIGINT) AS m,
        |    CAST(512 - st.n_hit AS BIGINT) AS n_zero_regs,
        |    CAST(st.s2_hit + (512 - st.n_hit) * (1::BIGINT << 49) AS BIGINT) AS s2,
        |    ex.exact_distinct
        |  FROM st, ex
        |), est AS (
        |  SELECT *,
        |    (0.7213 / (1.0 + 1.079 / 512)) * 512 * 512 * 562949953421312.0 / s2 AS raw_est,
        |    (n_zero_regs > 0 AND (0.7213 / (1.0 + 1.079 / 512)) * 512 * 512
        |      * 562949953421312.0 / s2 <= 1280.0) AS used_linear_counting
        |  FROM fin
        |)
        |SELECT m, n_zero_regs, s2, exact_distinct, used_linear_counting,
        |  abs(CASE WHEN used_linear_counting
        |        THEN 512.0 * ln(512.0 / n_zero_regs) ELSE raw_est END
        |      - exact_distinct) / exact_distinct <= 0.15 AS within_tol
        |FROM est""".stripMargin,
    "scale_hll_grouped" ->
      // per-group HLL: registers keyed by (event_type, reg), same
      // audit shape as scale_hll with one row per group
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':hll'), 1, 15))
        |      AS BIGINT) AS h
        |  FROM events WHERE user_id IS NOT NULL
        |), rr AS (
        |  SELECT event_type, h % 512 AS reg, h // 512 AS rest FROM h
        |), rho AS (
        |  SELECT event_type, reg, CASE WHEN rest = 0 THEN 49
        |    ELSE CAST(round(log2(rest & (-rest))) AS BIGINT) + 1 END AS rho
        |  FROM rr
        |), regs AS (
        |  SELECT event_type, reg, max(rho) AS m_reg FROM rho GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type, count(*) AS n_hit,
        |    CAST(sum(1::BIGINT << CAST(49 - m_reg AS INTEGER)) AS BIGINT) AS s2_hit
        |  FROM regs GROUP BY 1
        |), ex AS (
        |  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        |  FROM events GROUP BY 1
        |), fin AS (
        |  SELECT st.event_type,
        |    CAST(512 - st.n_hit AS BIGINT) AS n_zero_regs,
        |    CAST(st.s2_hit + (512 - st.n_hit) * (1::BIGINT << 49) AS BIGINT) AS s2,
        |    ex.exact_distinct
        |  FROM st JOIN ex USING (event_type)
        |), est AS (
        |  SELECT *,
        |    (0.7213 / (1.0 + 1.079 / 512)) * 512 * 512 * 562949953421312.0 / s2 AS raw_est,
        |    (n_zero_regs > 0 AND (0.7213 / (1.0 + 1.079 / 512)) * 512 * 512
        |      * 562949953421312.0 / s2 <= 1280.0) AS used_linear_counting
        |  FROM fin
        |)
        |SELECT event_type, n_zero_regs, s2, exact_distinct, used_linear_counting,
        |  abs(CASE WHEN used_linear_counting
        |        THEN 512.0 * ln(512.0 / n_zero_regs) ELSE raw_est END
        |      - exact_distinct) / exact_distinct <= 0.15 AS within_tol
        |FROM est ORDER BY event_type""".stripMargin,
    "scale_profile" -> profileOracleSql(),
    "scale_profile_diff" -> profileDiffOracleSql(),
    "scale_keyed_sample" ->
      // deterministic per-key sample: 48-bit portable md5 rank, k=3,
      // ties by event_id (the graft_topk tie order)
      """WITH h AS (
        |  SELECT user_id, event_id,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':ks'), 1, 12))
        |      AS BIGINT) AS h
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY h ASC, event_id ASC)
        |      AS sample_rank
        |  FROM h
        |)
        |SELECT user_id, CAST(sample_rank AS BIGINT) AS sample_rank, event_id
        |FROM r WHERE sample_rank <= 3 ORDER BY user_id, sample_rank""".stripMargin,
    "scale_agg_delta" ->
      // incremental aggregate maintenance: the merged (base ⊕ batch)
      // part-aggregates must equal the full recompute — so the oracle
      // IS the full recompute, a plain GROUP BY over all orders
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS min_us,
        |  CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS max_us
        |FROM orders GROUP BY 1 ORDER BY o_custkey""".stripMargin,
    "scale_join_delta" ->
      // incremental join-view maintenance: base ⊕ key-pruned-delta
      // part-views must equal the full recompute — so the oracle IS
      // the full recompute, a plain join + GROUP BY over everything
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "scale_cdc_apply" ->
      // CDC fold: latest full-row image per key by seq, tombstones
      // drop — the oracle replays the same deterministic synthesized
      // log through a window instead of Spark's max_by aggregate
      """WITH log AS (
        |  SELECT o_orderkey AS pk, 1 AS seq, 'I' AS op,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U',
        |    CAST(round(o_totalprice * 100) AS BIGINT) + 1000
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'D', NULL FROM orders WHERE o_orderkey % 7 = 0
        |), last AS (
        |  SELECT pk, seq, op, cents,
        |    row_number() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
        |  FROM log
        |)
        |SELECT pk AS o_orderkey, CAST(seq AS BIGINT) AS last_seq, cents
        |FROM last WHERE rn = 1 AND op <> 'D' ORDER BY o_orderkey""".stripMargin,
    "scale_pps_sample" ->
      // PPS systematic sample: integer arrow counts — floor division
      // on positive operands, so DuckDB // and Spark div agree
      """WITH b AS (
        |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
        |    sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang
        |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang) AS tw
        |  FROM documents WHERE n_chars > 0
        |)
        |SELECT lang, doc_id, w,
        |  CAST((cw * 10) // tw - ((cw - w) * 10) // tw AS BIGINT) AS picks
        |FROM b
        |WHERE (cw * 10) // tw - ((cw - w) * 10) // tw >= 1
        |ORDER BY lang, doc_id""".stripMargin,
    "scale_pps_salted" ->
      // two-phase prefix-sum face: output-identical to scale_pps_sample
      // (split running sums telescope), so it gates on the SAME SQL
      """WITH b AS (
        |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
        |    sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang
        |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang) AS tw
        |  FROM documents WHERE n_chars > 0
        |)
        |SELECT lang, doc_id, w,
        |  CAST((cw * 10) // tw - ((cw - w) * 10) // tw AS BIGINT) AS picks
        |FROM b
        |WHERE (cw * 10) // tw - ((cw - w) * 10) // tw >= 1
        |ORDER BY lang, doc_id""".stripMargin,
    "scale_m4_downsample" ->
      // M4: first/last by time, min/max by value per (series, day) —
      // selection-only (bp values, micro instants), struct-lexicographic
      // tie order mirrored by the row_number sorts here
      """WITH b AS (
        |  SELECT event_type AS series, CAST(ts AS DATE) AS bucket,
        |    epoch_us(ts) AS us, event_id,
        |    CAST(round(value * 1e4) AS BIGINT) AS v_bp
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
        |), a AS (
        |  SELECT series, bucket, CAST(count(*) AS BIGINT) AS n_points,
        |    min({'us': us, 'id': event_id, 'v': v_bp}) AS f,
        |    max({'us': us, 'id': event_id, 'v': v_bp}) AS l,
        |    min({'v': v_bp, 'us': us, 'id': event_id}) AS mn,
        |    max({'v': v_bp, 'us': us, 'id': event_id}) AS mx
        |  FROM b GROUP BY series, bucket
        |)
        |SELECT series, bucket, n_points,
        |  CAST(f.us AS BIGINT) AS first_us, CAST(f.id AS BIGINT) AS first_id,
        |  CAST(f.v AS BIGINT) AS first_bp,
        |  CAST(l.us AS BIGINT) AS last_us, CAST(l.id AS BIGINT) AS last_id,
        |  CAST(l.v AS BIGINT) AS last_bp,
        |  CAST(mn.v AS BIGINT) AS min_bp, CAST(mn.us AS BIGINT) AS min_us,
        |  CAST(mn.id AS BIGINT) AS min_id,
        |  CAST(mx.v AS BIGINT) AS max_bp, CAST(mx.us AS BIGINT) AS max_us,
        |  CAST(mx.id AS BIGINT) AS max_id
        |FROM a ORDER BY series, bucket""".stripMargin,
    "scale_heavy_hitters_grouped" ->
      // per-language heavy tokens: the graft_mg mergeable aggregate
      // only prunes — output is the exact per-lang GROUP BY/HAVING
      // over within-language share > 1/(s+1), s = 30
      """WITH t AS (
        |  SELECT lang, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        |), tt AS (
        |  SELECT lang, tok FROM t WHERE tok <> ''
        |), n AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_total FROM tt GROUP BY lang
        |), c AS (
        |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tt GROUP BY lang, tok
        |)
        |SELECT c.lang, c.tok, c.cnt,
        |  CAST((10000 * c.cnt) // n.n_total AS BIGINT) AS share_bp
        |FROM c JOIN n ON n.lang = c.lang
        |WHERE c.cnt * 31 > n.n_total
        |ORDER BY c.lang, c.tok""".stripMargin,
    "scale_topk_certified" ->
      // certified top-k: when the k-th count clears N/(s+1), the MG
      // candidate pass provably contains the true top-k — so the
      // oracle IS the exact top-k over all tokens, certificate
      // recomputed from the full counts (ties: cnt desc, tok asc)
      """WITH t AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE text IS NOT NULL
        |), tt AS (
        |  SELECT tok FROM t WHERE tok <> ''
        |), n AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total FROM tt
        |), c AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tt GROUP BY tok
        |), r AS (
        |  SELECT tok, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT) AS rank
        |  FROM c
        |), kept AS (
        |  SELECT * FROM r WHERE rank <= 10
        |), kth AS (
        |  SELECT min(cnt) AS kth_cnt FROM kept
        |)
        |SELECT kept.rank, kept.tok, kept.cnt,
        |  CAST((10000 * kept.cnt) // (SELECT n_total FROM n) AS BIGINT) AS share_bp,
        |  (SELECT kth_cnt FROM kth) * 31 > (SELECT n_total FROM n) AS certified
        |FROM kept ORDER BY rank""".stripMargin,
    "scale_heavy_earners" ->
      // weighted heavy hitters: the weighted-MG candidate pass only
      // prunes — output is the exact GROUP BY/HAVING over character
      // share > 1/(s+1), s = 6, so the oracle IS that recompute
      """WITH r AS (
        |  SELECT lang, CAST(n_chars AS BIGINT) AS w FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
        |), n AS (
        |  SELECT CAST(sum(w) AS BIGINT) AS w_total FROM r
        |)
        |SELECT lang, CAST(sum(w) AS BIGINT) AS w,
        |  CAST((10000 * sum(w)) // (SELECT w_total FROM n) AS BIGINT) AS share_bp
        |FROM r GROUP BY lang
        |HAVING sum(w) * 7 > (SELECT w_total FROM n)
        |ORDER BY lang""".stripMargin,
    "scale_zonemap_prune" ->
      // block-level min/max zonemap over 30-day shipdate tiles with
      // skip verdicts for a clustered-column and an uncorrelated-
      // column predicate; exact integers and dates only
      """WITH b AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d, l_orderkey,
        |    datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) // 30
        |      AS block_id
        |  FROM lineitem
        |)
        |SELECT CAST(block_id AS BIGINT) AS block_id,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(d) AS min_ship, max(d) AS max_ship,
        |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey,
        |  (max(d) < DATE '1996-01-01' OR min(d) >= DATE '1996-07-01') AS skip_date,
        |  (max(l_orderkey) < 1000 OR min(l_orderkey) >= 2000) AS skip_okey
        |FROM b GROUP BY block_id ORDER BY block_id""".stripMargin,
    "scale_heavy_hitters" ->
      // exact heavy hitters: the Misra–Gries candidate pass only
      // PRUNES — the output is the plain exact GROUP BY/HAVING over
      // share > 1/(s+1), s = 30, so the oracle IS that recompute
      """WITH t AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents WHERE text IS NOT NULL
        |), tt AS (
        |  SELECT tok FROM t WHERE tok <> ''
        |), n AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total FROM tt
        |)
        |SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST((10000 * count(*)) // (SELECT n_total FROM n) AS BIGINT) AS share_bp
        |FROM tt GROUP BY tok
        |HAVING count(*) * 31 > (SELECT n_total FROM n)
        |ORDER BY tok""".stripMargin,
    "scale_kmv_setops" ->
      // KMV bottom-k set operations: every integer (sketch sizes,
      // k-th min hashes, sketch overlap, exact distincts)
      // hash-matches; the (k-1)·2^48/kth double estimates feed only
      // the within-tolerance booleans, computed with identical
      // arithmetic (same constant, same operation order)
      """WITH base AS (
        |  SELECT DISTINCT
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS side,
        |    o_custkey AS key
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_custkey IS NOT NULL
        |), hashed AS (
        |  SELECT side,
        |    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || ':kmv'), 1, 12))
        |      AS BIGINT) AS h
        |  FROM base
        |), sk AS (
        |  SELECT side, h FROM (
        |    SELECT side, h, row_number() OVER (PARTITION BY side ORDER BY h ASC) AS r
        |    FROM hashed) t
        |  WHERE r <= 512
        |), usk AS (
        |  SELECT h FROM (
        |    SELECT h, row_number() OVER (ORDER BY h ASC) AS r
        |    FROM (SELECT DISTINCT h FROM sk) d) t
        |  WHERE r <= 512
        |), sstats AS (
        |  SELECT side, CAST(count(*) AS BIGINT) AS n_sk, max(h) AS kth
        |  FROM sk GROUP BY side
        |), ustats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sk_union, max(h) AS kth_union FROM usk
        |), ov AS (
        |  SELECT CAST(count(*) AS BIGINT) AS overlap_k FROM usk u
        |  WHERE EXISTS (SELECT 1 FROM sk WHERE side = 'a' AND h = u.h)
        |    AND EXISTS (SELECT 1 FROM sk WHERE side = 'b' AND h = u.h)
        |), ex AS (
        |  SELECT CAST(count(*) AS BIGINT) AS exact_union,
        |    CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
        |  FROM (SELECT key, count(DISTINCT side) AS ns FROM base GROUP BY key) c
        |), exs AS (
        |  SELECT CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS exact_a,
        |    CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS exact_b
        |  FROM base
        |), wide AS (
        |  SELECT
        |    (SELECT n_sk FROM sstats WHERE side = 'a') AS n_sk_a,
        |    (SELECT n_sk FROM sstats WHERE side = 'b') AS n_sk_b,
        |    u.n_sk_union,
        |    (SELECT kth FROM sstats WHERE side = 'a') AS kth_a,
        |    (SELECT kth FROM sstats WHERE side = 'b') AS kth_b,
        |    u.kth_union, o.overlap_k, s.exact_a, s.exact_b,
        |    e.exact_union, e.exact_inter
        |  FROM ustats u, ov o, exs s, ex e
        |), est1 AS (
        |  SELECT *,
        |    CASE WHEN n_sk_a < 512 THEN CAST(n_sk_a AS DOUBLE)
        |      ELSE CAST(143833713099145216 AS DOUBLE) / kth_a END AS est_a,
        |    CASE WHEN n_sk_b < 512 THEN CAST(n_sk_b AS DOUBLE)
        |      ELSE CAST(143833713099145216 AS DOUBLE) / kth_b END AS est_b,
        |    CASE WHEN n_sk_union < 512 THEN CAST(n_sk_union AS DOUBLE)
        |      ELSE CAST(143833713099145216 AS DOUBLE) / kth_union END AS est_union
        |  FROM wide
        |), est2 AS (
        |  SELECT *,
        |    CASE WHEN n_sk_union < 512 THEN CAST(overlap_k AS DOUBLE)
        |      ELSE (CAST(overlap_k AS DOUBLE) * est_union) / n_sk_union END AS est_inter
        |  FROM est1
        |)
        |SELECT CAST(512 AS BIGINT) AS k,
        |  n_sk_a, n_sk_b, n_sk_union, kth_a, kth_b, kth_union, overlap_k,
        |  exact_a, exact_b, exact_union, exact_inter,
        |  CASE WHEN exact_a = 0 THEN est_a = 0.0
        |    ELSE abs(est_a - exact_a) / exact_a <= 0.12 END AS a_within_tol,
        |  CASE WHEN exact_b = 0 THEN est_b = 0.0
        |    ELSE abs(est_b - exact_b) / exact_b <= 0.12 END AS b_within_tol,
        |  CASE WHEN exact_union = 0 THEN est_union = 0.0
        |    ELSE abs(est_union - exact_union) / exact_union <= 0.12 END AS union_within_tol,
        |  CASE WHEN exact_inter = 0 THEN est_inter = 0.0
        |    ELSE abs(est_inter - exact_inter) / exact_inter <= 0.12 END AS inter_within_tol
        |FROM est2""".stripMargin,
    "scale_kmv_matrix" ->
      // all-pairs segment overlap from per-side bottom-k sketches
      // built once; exact unions by inclusion–exclusion; same
      // integer/boolean determinism contract as scale_kmv_setops
      """WITH base AS (
        |  SELECT DISTINCT o_orderpriority AS side, o_custkey AS key
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
        |), hashed AS (
        |  SELECT side,
        |    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || ':kmv'), 1, 12))
        |      AS BIGINT) AS h
        |  FROM base
        |), sk AS (
        |  SELECT side, h FROM (
        |    SELECT side, h, row_number() OVER (PARTITION BY side ORDER BY h ASC) AS r
        |    FROM hashed) t
        |  WHERE r <= 512
        |), stats AS (
        |  SELECT side, CAST(count(*) AS BIGINT) AS n_sk, max(h) AS kth
        |  FROM sk GROUP BY side
        |), pairs AS (
        |  SELECT a.side AS side_a, b.side AS side_b
        |  FROM stats a, stats b WHERE a.side < b.side
        |), uni AS (
        |  SELECT DISTINCT p.side_a, p.side_b, s.h
        |  FROM pairs p JOIN sk s ON s.side IN (p.side_a, p.side_b)
        |), usk AS (
        |  SELECT side_a, side_b, h FROM (
        |    SELECT side_a, side_b, h,
        |      row_number() OVER (PARTITION BY side_a, side_b ORDER BY h ASC) AS r
        |    FROM uni) t
        |  WHERE r <= 512
        |), ustats AS (
        |  SELECT side_a, side_b, CAST(count(*) AS BIGINT) AS n_sk_union,
        |    max(h) AS kth_union
        |  FROM usk GROUP BY side_a, side_b
        |), ov AS (
        |  SELECT u.side_a, u.side_b, CAST(count(*) AS BIGINT) AS overlap_k
        |  FROM usk u
        |  WHERE EXISTS (SELECT 1 FROM sk WHERE side = u.side_a AND h = u.h)
        |    AND EXISTS (SELECT 1 FROM sk WHERE side = u.side_b AND h = u.h)
        |  GROUP BY u.side_a, u.side_b
        |), cnt AS (
        |  SELECT side, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY side
        |), inter AS (
        |  SELECT p.side AS side_a, q.side AS side_b,
        |    CAST(count(*) AS BIGINT) AS exact_inter
        |  FROM base p JOIN base q ON p.key = q.key AND p.side < q.side
        |  GROUP BY p.side, q.side
        |), wide AS (
        |  SELECT pr.side_a, pr.side_b, sa.n_sk AS n_sk_a, sb.n_sk AS n_sk_b,
        |    u.n_sk_union, u.kth_union,
        |    COALESCE(o.overlap_k, 0) AS overlap_k,
        |    ca.n AS exact_a, cb.n AS exact_b,
        |    ca.n + cb.n - COALESCE(i.exact_inter, 0) AS exact_union,
        |    COALESCE(i.exact_inter, 0) AS exact_inter
        |  FROM pairs pr
        |  JOIN stats sa ON sa.side = pr.side_a
        |  JOIN stats sb ON sb.side = pr.side_b
        |  JOIN ustats u ON u.side_a = pr.side_a AND u.side_b = pr.side_b
        |  LEFT JOIN ov o ON o.side_a = pr.side_a AND o.side_b = pr.side_b
        |  JOIN cnt ca ON ca.side = pr.side_a
        |  JOIN cnt cb ON cb.side = pr.side_b
        |  LEFT JOIN inter i ON i.side_a = pr.side_a AND i.side_b = pr.side_b
        |), est1 AS (
        |  SELECT *,
        |    CASE WHEN n_sk_union < 512 THEN CAST(n_sk_union AS DOUBLE)
        |      ELSE CAST(143833713099145216 AS DOUBLE) / kth_union END AS est_union
        |  FROM wide
        |), est2 AS (
        |  SELECT *,
        |    CASE WHEN n_sk_union < 512 THEN CAST(overlap_k AS DOUBLE)
        |      ELSE (CAST(overlap_k AS DOUBLE) * est_union) / n_sk_union END AS est_inter
        |  FROM est1
        |)
        |SELECT side_a, side_b, n_sk_a, n_sk_b, n_sk_union, kth_union, overlap_k,
        |  exact_a, exact_b, exact_union, exact_inter,
        |  CASE WHEN exact_union = 0 THEN est_union = 0.0
        |    ELSE abs(est_union - exact_union) / exact_union <= 0.12 END
        |    AS union_within_tol,
        |  CASE WHEN exact_inter = 0 THEN est_inter = 0.0
        |    ELSE abs(est_inter - exact_inter) / exact_inter <= 0.12 END
        |    AS inter_within_tol
        |FROM est2 ORDER BY side_a, side_b""".stripMargin,
    "scale_hll_sliding" ->
      // rolling 7-day HLL from daily register sketches (scale_hll's
      // register math per trailing window, q26's exact-WAU audit
      // side): every integer (n_zero_regs, S2, exact WAU)
      // hash-matches, the double estimate feeds only within_tol
      """WITH h AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':hll'), 1, 15))
        |      AS BIGINT) AS h
        |  FROM events WHERE user_id IS NOT NULL
        |), rr AS (
        |  SELECT day, h % 512 AS reg, h // 512 AS rest FROM h
        |), rho AS (
        |  SELECT day, reg, CASE WHEN rest = 0 THEN 49
        |    ELSE CAST(round(log2(rest & (-rest))) AS BIGINT) + 1 END AS rho
        |  FROM rr
        |), daily AS (
        |  SELECT day, reg, max(rho) AS m_reg FROM rho GROUP BY 1, 2
        |), anchors AS (SELECT DISTINCT day AS anchor FROM daily),
        |win AS (
        |  SELECT a.anchor, d.reg, max(d.m_reg) AS m_reg
        |  FROM daily d JOIN anchors a
        |    ON d.day <= a.anchor AND d.day >= a.anchor - 6
        |  GROUP BY 1, 2
        |), st AS (
        |  SELECT anchor, count(*) AS n_hit,
        |    CAST(sum(1::BIGINT << CAST(49 - m_reg AS INTEGER)) AS BIGINT) AS s2_hit
        |  FROM win GROUP BY 1
        |), grid AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events WHERE user_id IS NOT NULL
        |), ex AS (
        |  SELECT a.anchor, count(DISTINCT g.user_id) AS exact_wau
        |  FROM grid g JOIN anchors a
        |    ON g.day <= a.anchor AND g.day >= a.anchor - 6
        |  GROUP BY 1
        |), fin AS (
        |  SELECT st.anchor AS day,
        |    CAST(512 - st.n_hit AS BIGINT) AS n_zero_regs,
        |    CAST(st.s2_hit + (512 - st.n_hit) * (1::BIGINT << 49) AS BIGINT) AS s2,
        |    CAST(ex.exact_wau AS BIGINT) AS exact_wau
        |  FROM st JOIN ex ON ex.anchor = st.anchor
        |), est AS (
        |  SELECT *,
        |    (0.7213 / (1.0 + 1.079 / 512)) * 512 * 512 * 562949953421312.0 / s2 AS raw_est,
        |    (n_zero_regs > 0 AND (0.7213 / (1.0 + 1.079 / 512)) * 512 * 512
        |      * 562949953421312.0 / s2 <= 1280.0) AS used_linear_counting
        |  FROM fin
        |)
        |SELECT day, n_zero_regs, s2, exact_wau, used_linear_counting,
        |  abs(CASE WHEN used_linear_counting
        |        THEN 512.0 * ln(512.0 / n_zero_regs) ELSE raw_est END
        |      - exact_wau) / exact_wau <= 0.15 AS within_tol
        |FROM est ORDER BY day""".stripMargin,
    "scale_k_anonymity" ->
      // k-anonymity audit: quasi-identifier equivalence classes
      // (nation, segment, 2000-unit balance band), flag classes under
      // k=10, rows-at-risk share in exact basis points
      """WITH classes AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |    c_mktsegment AS mktsegment,
        |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS acctbal_band,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM customer GROUP BY 1, 2, 3
        |), tot AS (
        |  SELECT CAST(sum(CASE WHEN n_rows < 10 THEN n_rows ELSE 0 END) AS BIGINT)
        |      AS at_risk,
        |    CAST(sum(n_rows) AS BIGINT) AS total
        |  FROM classes
        |)
        |SELECT c.nationkey, c.mktsegment, c.acctbal_band, c.n_rows,
        |  c.n_rows >= 10 AS k_anonymous,
        |  (10000 * t.at_risk) // t.total AS at_risk_share_bp
        |FROM classes c, tot t
        |ORDER BY nationkey, mktsegment, acctbal_band""".stripMargin,
    "scale_histogram" ->
      // equi-width histogram quantile sketch: exact-integer buckets,
      // ceil-rank targets, estimate = first bucket whose cumulative
      // count reaches the rank; contains_exact re-checks the theorem
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        |), hist AS (
        |  SELECT cents // 200000 AS bucket, count(*) AS cnt FROM c GROUP BY 1
        |), cum AS (
        |  SELECT bucket, cnt, CAST(sum(cnt) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM hist
        |), n AS (SELECT count(*) AS n FROM c),
        |quants AS (
        |  SELECT CAST(q AS BIGINT) AS q_pct, (q * n.n + 99) // 100 AS rank
        |  FROM (SELECT unnest([25, 50, 75, 95, 99]) AS q), n
        |), est AS (
        |  SELECT q.q_pct, q.rank, min(cum.bucket) AS b
        |  FROM quants q JOIN cum ON cum.cum >= q.rank
        |  GROUP BY 1, 2
        |), sorted AS (
        |  SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c
        |)
        |SELECT e.q_pct, e.rank, e.b * 200000 AS est_lo_cents,
        |  e.b * 200000 + 200000 AS est_hi_cents, s.cents AS exact_cents,
        |  (s.cents >= e.b * 200000 AND s.cents < e.b * 200000 + 200000) AS contains_exact
        |FROM est e JOIN sorted s ON s.rn = e.rank
        |ORDER BY e.q_pct""".stripMargin,
    "scale_skew_report" ->
      // key-skew pre-flight: exact integer distribution stats over the
      // reduced per-key count table; ceil-rank order statistics,
      // max/avg ratio x100 and top-10 share in basis points
      """WITH pk AS (
        |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
        |), base AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys, max(cnt) AS max_cnt
        |  FROM pk
        |), top AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS top10_rows
        |  FROM (SELECT cnt FROM pk ORDER BY cnt DESC, user_id ASC LIMIT 10)
        |), ranked AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS rn FROM pk
        |), rk AS (
        |  SELECT (50 * n_keys + 99) // 100 AS r50,
        |         (99 * n_keys + 99) // 100 AS r99 FROM base
        |)
        |SELECT b.n_rows, b.n_keys, b.max_cnt,
        |  (SELECT cnt FROM ranked, rk WHERE rn = r50) AS p50_cnt,
        |  (SELECT cnt FROM ranked, rk WHERE rn = r99) AS p99_cnt,
        |  (100 * b.max_cnt * b.n_keys) // b.n_rows AS maxavg_x100,
        |  (10000 * t.top10_rows) // b.n_rows AS top10_share_bp
        |FROM base b, top t""".stripMargin,
    "scale_bloom" ->
      // relational Bloom filter: sparse set-cell table on the portable
      // md5 hash; no-false-negatives theorem re-checked, measured fp
      // count gated by 2x the (1-e^{-kn/m})^k expectation + 10
      """WITH keys AS (SELECT c_custkey AS key FROM customer),
        |cells AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || ':bf' || r.r), 1, 15))
        |      AS BIGINT) % 131072 AS cell
        |  FROM keys, (SELECT unnest(range(3)) AS r) r
        |), probe_in AS (
        |  SELECT key,
        |    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || ':bf' || r.r), 1, 15))
        |      AS BIGINT) % 131072 AS cell
        |  FROM keys, (SELECT unnest(range(3)) AS r) r
        |), in_m AS (
        |  SELECT p.key,
        |    CASE WHEN count(c.cell) = 3 THEN 1 ELSE 0 END AS member
        |  FROM probe_in p LEFT JOIN cells c ON c.cell = p.cell
        |  GROUP BY p.key
        |), probe_out AS (
        |  SELECT key + (SELECT max(key) FROM keys) + 1 AS key FROM keys
        |), out_c AS (
        |  SELECT key,
        |    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || ':bf' || r.r), 1, 15))
        |      AS BIGINT) % 131072 AS cell
        |  FROM probe_out, (SELECT unnest(range(3)) AS r) r
        |), out_m AS (
        |  SELECT p.key,
        |    CASE WHEN count(c.cell) = 3 THEN 1 ELSE 0 END AS member
        |  FROM out_c p LEFT JOIN cells c ON c.cell = p.cell
        |  GROUP BY p.key
        |), agg AS (
        |  SELECT
        |    (SELECT count(*) FROM keys) AS n_set,
        |    (SELECT count(*) FROM cells) AS n_cells_set,
        |    (SELECT CAST(sum(member) AS BIGINT) FROM in_m) AS n_in_found,
        |    (SELECT count(*) FROM out_m) AS n_out,
        |    (SELECT CAST(sum(member) AS BIGINT) FROM out_m) AS n_false_pos
        |)
        |SELECT CAST(131072 AS BIGINT) AS m_bits, CAST(3 AS BIGINT) AS k,
        |  n_set, n_cells_set, n_in_found,
        |  (n_in_found = n_set) AS no_false_negatives,
        |  n_out, n_false_pos,
        |  (CAST(n_false_pos AS DOUBLE) <=
        |    2.0 * pow(1.0 - exp(-3.0 * n_set / 131072.0), 3.0) * n_out + 10.0)
        |    AS fp_within_tol
        |FROM agg""".stripMargin,
    "scale_integrity" ->
      // referential-integrity audit: exact violation counts per check
      """SELECT 'childless_order' AS "check", count(*) AS n_bad
        |FROM orders o WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |UNION ALL
        |SELECT 'nonpositive_qty', count(*) FROM lineitem WHERE l_quantity <= 0
        |UNION ALL
        |SELECT 'null_lineitem_key', count(*) FROM lineitem WHERE l_orderkey IS NULL
        |UNION ALL
        |SELECT 'orphan_lineitem', count(*)
        |FROM lineitem l WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orphan_order_customer', count(*)
        |FROM orders o WHERE NOT EXISTS (
        |  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |ORDER BY "check"""".stripMargin,
    "scale_quantile_bins" ->
      // histogram-driven quartile binning: ceil-rank bucket-edge
      // thresholds, each row bins row-locally; all exact integers
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        |), hist AS (
        |  SELECT cents // 200000 AS bucket, count(*) AS cnt FROM c GROUP BY 1
        |), cum AS (
        |  SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM hist
        |), n AS (SELECT count(*) AS n FROM c),
        |quants AS (
        |  SELECT q, (q * n.n + 3) // 4 AS rank
        |  FROM (SELECT unnest([1, 2, 3]) AS q), n
        |), thr AS (
        |  SELECT q.q, min(cum.bucket) * 200000 + 200000 AS thr
        |  FROM quants q JOIN cum ON cum.cum >= q.rank GROUP BY 1
        |), b AS (
        |  SELECT cents,
        |    1 + (SELECT count(*) FROM thr WHERE c2.cents >= thr.thr) AS bin
        |  FROM c c2
        |)
        |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_rows,
        |  min(cents) AS min_cents, max(cents) AS max_cents
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "scale_quantile_sketch" ->
      // deterministic scaffolding of the graft_kll certificate: exact
      // ceil-rank order statistics, the integer worst-case bound
      // (H+2)*n/(k-1) with H = floor(log2(max(n/(k-1),1))) via a
      // generate_series bit probe (no float log2), and within_bound
      // as a literal TRUE -- the Spark side PROVES it with an exact
      // audit scan; the sketch guarantee makes it unconditionally true
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        |), n AS (SELECT count(*) AS n FROM c),
        |h AS (
        |  SELECT max(p) AS hh FROM generate_series(0, 62) s(p), n
        |  WHERE (CAST(1 AS BIGINT) << p) <= greatest(n.n // 255, 1)
        |), r AS (
        |  SELECT cents, row_number() OVER (ORDER BY cents) AS rk FROM c
        |), t AS (
        |  SELECT q_label, (num * n.n + den - 1) // den AS target_rank, n.n
        |  FROM (VALUES ('p25', 1, 4), ('p50', 2, 4), ('p75', 3, 4),
        |               ('p90', 9, 10), ('p99', 99, 100)) v(q_label, num, den), n
        |)
        |SELECT t.q_label, t.n, t.target_rank,
        |  ((h.hh + 2) * t.n + 254) // 255 AS bound_rank,
        |  (SELECT r.cents FROM r WHERE r.rk = t.target_rank) AS exact_value,
        |  TRUE AS within_bound
        |FROM t, h ORDER BY t.q_label""".stripMargin,
    "scale_quantile_double" ->
      // the DOUBLE face: the same graft_kll certificate scaffolding,
      // but the ranked column is the raw double (Spark side rides the
      // order-preserving bits mapping, a monotone bijection — order
      // statistics commute, and exact_value maps back to the SELECTED
      // input double bit-for-bit, so selection-only float output)
      """WITH c AS (
        |  SELECT value AS v FROM events WHERE value IS NOT NULL
        |), n AS (SELECT count(*) AS n FROM c),
        |h AS (
        |  SELECT max(p) AS hh FROM generate_series(0, 62) s(p), n
        |  WHERE (CAST(1 AS BIGINT) << p) <= greatest(n.n // 255, 1)
        |), r AS (
        |  SELECT v, row_number() OVER (ORDER BY v) AS rk FROM c
        |), t AS (
        |  SELECT q_label, (num * n.n + den - 1) // den AS target_rank, n.n
        |  FROM (VALUES ('p25', 1, 4), ('p50', 2, 4), ('p75', 3, 4),
        |               ('p90', 9, 10), ('p99', 99, 100)) v(q_label, num, den), n
        |)
        |SELECT t.q_label, t.n, t.target_rank,
        |  ((h.hh + 2) * t.n + 254) // 255 AS bound_rank,
        |  (SELECT r.v FROM r WHERE r.rk = t.target_rank) AS exact_value,
        |  TRUE AS within_bound
        |FROM t, h ORDER BY t.q_label""".stripMargin,
    "scale_quantile_grouped" ->
      // per-group graft_kll certificate: the scale_quantile_sketch
      // scaffolding partitioned by o_orderpriority — per-group n,
      // ceil-rank order statistics (row_number PARTITION BY), the
      // integer bound on each group's own n, and literal-TRUE
      // within_bound (proven by the Spark-side exact audit)
      """WITH c AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        |), n AS (SELECT grp, count(*) AS n FROM c GROUP BY grp),
        |h AS (
        |  SELECT n.grp, max(p) AS hh FROM generate_series(0, 62) s(p), n
        |  WHERE (CAST(1 AS BIGINT) << p) <= greatest(n.n // 255, 1)
        |  GROUP BY n.grp
        |), r AS (
        |  SELECT grp, cents,
        |    row_number() OVER (PARTITION BY grp ORDER BY cents) AS rk FROM c
        |), t AS (
        |  SELECT n.grp, q_label, (num * n.n + den - 1) // den AS target_rank, n.n
        |  FROM (VALUES ('p25', 1, 4), ('p50', 2, 4), ('p75', 3, 4),
        |               ('p90', 9, 10), ('p99', 99, 100)) v(q_label, num, den), n
        |)
        |SELECT t.grp, t.q_label, t.n, t.target_rank,
        |  ((h.hh + 2) * t.n + 254) // 255 AS bound_rank,
        |  (SELECT r.cents FROM r
        |     WHERE r.grp = t.grp AND r.rk = t.target_rank) AS exact_value,
        |  TRUE AS within_bound
        |FROM t JOIN h ON h.grp = t.grp
        |ORDER BY t.grp, t.q_label""".stripMargin,
    "scale_quantile_sliding" ->
      // rolling 7-day quantile certificates per anchor day: the
      // grouped-KLL scaffolding with grp = window anchor; exact
      // per-window order statistics + per-window integer bounds
      """WITH v AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(round(value * 10000) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |), anchors AS (SELECT DISTINCT day AS anchor FROM v),
        |w AS (
        |  SELECT a.anchor, v.cents FROM v JOIN anchors a
        |    ON v.day <= a.anchor AND v.day >= a.anchor - 6
        |), n AS (SELECT anchor, count(*) AS n FROM w GROUP BY 1),
        |h AS (
        |  SELECT n.anchor, max(p) AS hh FROM generate_series(0, 62) s(p), n
        |  WHERE (CAST(1 AS BIGINT) << p) <= greatest(n.n // 127, 1)
        |  GROUP BY 1
        |), r AS (
        |  SELECT anchor, cents,
        |    row_number() OVER (PARTITION BY anchor ORDER BY cents) AS rk FROM w
        |), t AS (
        |  SELECT n.anchor, q_label, (num * n.n + den - 1) // den AS target_rank, n.n
        |  FROM (VALUES ('p25', 1, 4), ('p50', 2, 4), ('p75', 3, 4),
        |               ('p90', 9, 10), ('p99', 99, 100)) q(q_label, num, den), n
        |)
        |SELECT t.anchor AS day, t.q_label, t.n, t.target_rank,
        |  ((h.hh + 2) * t.n + 126) // 127 AS bound_rank,
        |  (SELECT r.cents FROM r
        |     WHERE r.anchor = t.anchor AND r.rk = t.target_rank) AS exact_value,
        |  TRUE AS within_bound
        |FROM t JOIN h ON h.anchor = t.anchor
        |ORDER BY day, q_label""".stripMargin,
    "scale_join_estimate" ->
      // CM inner-product join-size estimate vs the exact identity
      // sum_k cA(k)*cB(k) — all integers on the portable md5 hash;
      // the estimate provably never underestimates
      """WITH a AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders
        |           WHERE o_orderkey IS NOT NULL),
        |b AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
        |      WHERE l_orderkey IS NOT NULL),
        |ca AS (
        |  SELECT r.r AS row,
        |    CAST(('0x' || substr(md5(k || ':cm' || r.r), 1, 15)) AS BIGINT) % 512 AS cell,
        |    count(*) AS cnt
        |  FROM a, (SELECT unnest(range(4)) AS r) r GROUP BY 1, 2
        |), cb AS (
        |  SELECT r.r AS row,
        |    CAST(('0x' || substr(md5(k || ':cm' || r.r), 1, 15)) AS BIGINT) % 512 AS cell,
        |    count(*) AS cnt
        |  FROM b, (SELECT unnest(range(4)) AS r) r GROUP BY 1, 2
        |), ip AS (
        |  -- products widened (HUGEINT here, DECIMAL(38,0) on the
        |  -- Spark side): cell counts ~n/width make ca*cb pass 2^63 at
        |  -- the corpus sizes admission exists for
        |  SELECT ca.row, CAST(sum(CAST(ca.cnt AS HUGEINT) * cb.cnt) AS BIGINT) AS ip
        |  FROM ca JOIN cb ON ca.row = cb.row AND ca.cell = cb.cell GROUP BY 1
        |), est AS (
        |  -- full row domain: a sketch row with no matching cells has
        |  -- inner product 0 (key-disjoint inputs -> bound 0, not NULL)
        |  SELECT min(COALESCE(ip.ip, 0)) AS est_join_rows
        |  FROM (SELECT unnest(range(4)) AS row) d LEFT JOIN ip ON ip.row = d.row
        |),
        |ex AS (
        |  SELECT CAST(COALESCE(sum(CAST(x.ca AS HUGEINT) * y.cb), 0) AS BIGINT)
        |    AS exact_join_rows
        |  FROM (SELECT k, count(*) AS ca FROM a GROUP BY 1) x
        |  JOIN (SELECT k, count(*) AS cb FROM b GROUP BY 1) y USING (k)
        |), sz AS (
        |  -- sketched (non-NULL-key) row counts: the noise-budget
        |  -- denominator is what the sketches actually ingested
        |  SELECT (SELECT count(*) FROM a) AS n_a,
        |         (SELECT count(*) FROM b) AS n_b
        |)
        |SELECT sz.n_a, sz.n_b, ex.exact_join_rows, est.est_join_rows,
        |  est.est_join_rows >= ex.exact_join_rows AS never_underestimates,
        |  CAST(CAST(est.est_join_rows - ex.exact_join_rows AS HUGEINT) * 10000
        |    // ex.exact_join_rows AS BIGINT) AS overshoot_bp,
        |  CAST(CAST(sz.n_a AS HUGEINT) * sz.n_b // 512 AS BIGINT) AS noise_budget,
        |  est.est_join_rows - ex.exact_join_rows
        |    <= 3 * (CAST(sz.n_a AS HUGEINT) * sz.n_b // 512) AS within_noise
        |FROM sz, ex, est""".stripMargin,
    "ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT q.q_id, e.vec_id AS neighbor_id, list_cosine_similarity(q.qv, e.v) AS cos
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id
        |), r AS (
        |  SELECT q_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM s
        |)
        |SELECT q_id, neighbor_id, round(cos, 4) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "ann_dim_ablation" ->
      // prefix-dim recall curve vs full-dim truth — both rank chains
      // deterministic (cos DESC, id ASC), output pure integers
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |nq AS (SELECT count(*) AS n_queries FROM q),
        |dims AS (SELECT unnest([8, 16, 32, 64]) AS dim),
        |truth AS (
        |  SELECT q_id, neighbor_id FROM (
        |    SELECT q.q_id, e.vec_id AS neighbor_id, row_number() OVER (
        |      PARTITION BY q.q_id
        |      ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id ASC) AS rk
        |    FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id) WHERE rk <= 5
        |), pre AS (
        |  SELECT dim, q_id, neighbor_id FROM (
        |    SELECT d.dim, q.q_id, e.vec_id AS neighbor_id, row_number() OVER (
        |      PARTITION BY d.dim, q.q_id
        |      ORDER BY list_cosine_similarity(q.qv[1:d.dim], e.v[1:d.dim]) DESC,
        |        e.vec_id ASC) AS rk
        |    FROM e CROSS JOIN q CROSS JOIN dims d
        |    WHERE e.vec_id <> q.q_id) WHERE rk <= 5
        |), hits AS (
        |  SELECT pre.dim, count(*) AS hits
        |  FROM pre JOIN truth USING (q_id, neighbor_id) GROUP BY 1
        |)
        |SELECT CAST(d.dim AS BIGINT) AS dim, nq.n_queries,
        |  COALESCE(h.hits, 0) AS hits,
        |  10000 * COALESCE(h.hits, 0) // (nq.n_queries * 5) AS recall_bp
        |FROM dims d CROSS JOIN nq LEFT JOIN hits h ON h.dim = d.dim
        |ORDER BY dim""".stripMargin,
    "embedding_cluster_hist" ->
      // same sampled-quantizer assignment CTE as ann_ivf_sampled,
      // aggregated to the per-list histogram (integer-only output)
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |hs AS (
        |  SELECT vec_id,
        |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM e
        |), sel AS (SELECT vec_id FROM hs ORDER BY h, vec_id LIMIT 16),
        |cent AS (
        |  SELECT row_number() OVER (ORDER BY s.vec_id) - 1 AS list_id, e.v AS cv
        |  FROM sel s JOIN e ON e.vec_id = s.vec_id
        |), ac AS (
        |  SELECT e.vec_id, c.list_id, list_cosine_similarity(e.v, c.cv) AS ccos
        |  FROM e CROSS JOIN cent c
        |), asgn AS (
        |  SELECT vec_id, list_id FROM (
        |    SELECT vec_id, list_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, list_id ASC) AS rn
        |    FROM ac) WHERE rn = 1
        |)
        |SELECT list_id, count(*) AS n_vecs,
        |  min(vec_id) AS min_vec, max(vec_id) AS max_vec
        |FROM asgn GROUP BY list_id ORDER BY list_id""".stripMargin,
    "ann_ivf_sampled" ->
      // the full IVF pipeline rebuilt in SQL: sampled centroids (16
      // smallest portable md5 hashes of vec_id, list ids in vec_id
      // order), argmax-cosine list assignment, 4 probed lists per
      // query, exact cosine rank within probed lists
      (ivfSampledCtes + """
        |SELECT q_id, neighbor_id, round(cos, 4) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),
    "pipeline_retrieval" ->
      // end-to-end retrieval: the IVF rank chain joined back to the
      // document table for the payload a RAG consumer reads
      (ivfSampledCtes + """
        |SELECT r.q_id, r.rank, r.neighbor_id AS doc_id,
        |  round(r.cos, 4) AS cosine, substr(d.text, 1, 40) AS snippet
        |FROM r JOIN documents d ON d.doc_id = r.neighbor_id
        |WHERE r.rank <= 3 ORDER BY r.q_id, r.rank""".stripMargin),
    "embedding_outliers" ->
      // top ceil(n/100) vectors by exact-integer squared distance to
      // the bp-quantized corpus mean; (2S+n)//(2n) mean rounding and
      // truncating div agree across engines
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS MATERIALIZED (
        |  SELECT vec_id, i.i AS i, CAST(round(v[i.i + 1] * 1e4) AS BIGINT) AS xb
        |  FROM e, range(0, 64) i(i)
        |), mn AS (
        |  SELECT i, (2 * sum(xb) + count(*)) // (2 * count(*)) AS mb
        |  FROM c GROUP BY i
        |), d AS (
        |  SELECT c.vec_id,
        |    CAST(sum((c.xb - mn.mb) * (c.xb - mn.mb)) AS BIGINT) AS dist2
        |  FROM c JOIN mn USING (i) GROUP BY 1
        |), n AS (SELECT count(*) AS n FROM e),
        |r AS (
        |  SELECT vec_id, dist2,
        |    row_number() OVER (ORDER BY dist2 DESC, vec_id) AS rank
        |  FROM d
        |)
        |SELECT CAST(rank AS BIGINT) AS rank, vec_id, dist2
        |FROM r, n WHERE rank <= (n.n + 99) // 100 ORDER BY rank""".stripMargin,
    "embedding_centroid_shift" ->
      // per-dim means of the two epoch halves, rounded half-away-from-
      // zero as sign(S)*((2|S|+n)//(2n)) — `//` only sees non-negative
      // operands, where trunc and floor coincide (engine-portable);
      // shift in exact basis points. Outer CASTs: sum() returns
      // HUGEINT, which the driver's fetch path canonicalizes lossily.
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS MATERIALIZED (
        |  SELECT vec_id, i.i AS dim, CAST(round(v[i.i + 1] * 1e4) AS BIGINT) AS xb
        |  FROM e, range(0, 64) i(i)
        |), ma AS (
        |  SELECT dim, CAST(sign(sum(xb)) * ((2 * abs(sum(xb)) + count(*)) // (2 * count(*))) AS BIGINT) AS mean_a_bp
        |  FROM c WHERE vec_id % 2 = 0 GROUP BY dim
        |), mb AS (
        |  SELECT dim, CAST(sign(sum(xb)) * ((2 * abs(sum(xb)) + count(*)) // (2 * count(*))) AS BIGINT) AS mean_b_bp
        |  FROM c WHERE vec_id % 2 <> 0 GROUP BY dim
        |)
        |SELECT CAST(ma.dim AS BIGINT) AS dim, ma.mean_a_bp, mb.mean_b_bp,
        |  CAST(mb.mean_b_bp - ma.mean_a_bp AS BIGINT) AS shift_bp
        |FROM ma JOIN mb USING (dim) ORDER BY dim""".stripMargin,
    "embedding_drift" ->
      // two-sample norm-histogram drift: exact-integer total variation
      // TV_bp = sum|a_i*n_b - b_i*n_a| * 1e4 // (2*n_a*n_b)
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |nb AS (
        |  SELECT vec_id,
        |    CAST(round(sqrt(CAST((SELECT sum(xb * xb) FROM (
        |      SELECT CAST(round(x * 1e4) AS BIGINT) AS xb
        |      FROM unnest(v) AS u(x))) AS DOUBLE))) AS BIGINT) AS norm_bp
        |  FROM e
        |), ha AS (
        |  SELECT norm_bp // 500 AS bucket, count(*) AS na
        |  FROM nb WHERE vec_id % 2 = 0 GROUP BY 1
        |), hb AS (
        |  SELECT norm_bp // 500 AS bucket, count(*) AS nbc
        |  FROM nb WHERE vec_id % 2 <> 0 GROUP BY 1
        |), j AS (
        |  SELECT COALESCE(ha.na, 0) AS na, COALESCE(hb.nbc, 0) AS nbc
        |  FROM ha FULL JOIN hb ON ha.bucket = hb.bucket
        |), tot AS (
        |  SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nbc) AS BIGINT) AS n_b,
        |    count(*) AS n_buckets FROM j
        |)
        |SELECT t.n_a, t.n_b, CAST(t.n_buckets AS BIGINT) AS n_buckets,
        |  CAST((SELECT sum(abs(j.na * t.n_b - j.nbc * t.n_a)) FROM j) * 10000
        |    // (2 * t.n_a * t.n_b) AS BIGINT) AS tv_bp,
        |  (CAST((SELECT sum(abs(j.na * t.n_b - j.nbc * t.n_a)) FROM j) * 10000
        |    // (2 * t.n_a * t.n_b) AS BIGINT) > 500) AS drifted
        |FROM tot t""".stripMargin,
    "pipeline_epoch_diff" ->
      // snapshot diff on content hashes over ONE full-outer doc_id
      // join: added/removed/changed/unchanged counts
      """WITH a AS (
        |  SELECT doc_id, md5(text) AS ha FROM documents WHERE doc_id % 5 <> 4
        |), b AS (
        |  SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0
        |    THEN text || ' v2' ELSE text END) AS hb
        |  FROM documents WHERE doc_id % 5 <> 0
        |), d AS (
        |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |    CASE WHEN a.ha IS NULL THEN 'added'
        |         WHEN b.hb IS NULL THEN 'removed'
        |         WHEN a.ha <> b.hb THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM a FULL JOIN b ON a.doc_id = b.doc_id
        |)
        |SELECT status, count(*) AS n_docs, min(doc_id) AS min_doc,
        |  max(doc_id) AS max_doc
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_recall_audit" ->
      // recall@5 of the IVF probe vs exact bruteforce ground truth,
      // in basis points — both rank chains are deterministic so the
      // audit is pure integers
      (ivfSampledCtes + """,
        |bfs AS (
        |  SELECT q.q_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.qv, e.v) AS cos
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id
        |), bft AS (
        |  SELECT q_id, neighbor_id FROM (
        |    SELECT q_id, neighbor_id, row_number() OVER (
        |      PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rk
        |    FROM bfs) WHERE rk <= 5
        |), ivt AS (
        |  SELECT q_id, neighbor_id FROM r WHERE rank <= 5
        |), hits AS (
        |  SELECT q_id, count(*) AS h FROM ivt JOIN bft USING (q_id, neighbor_id)
        |  GROUP BY 1
        |)
        |SELECT q.q_id, COALESCE(h.h, 0) AS hits,
        |  10000 * COALESCE(h.h, 0) // 5 AS recall_bp
        |FROM q LEFT JOIN hits h ON h.q_id = q.q_id ORDER BY q.q_id""".stripMargin),
    "pipeline_hybrid_retrieval" ->
      // RRF fusion (K=60) of the IVF rank chain and doc-as-query BM25:
      // both sides' credits are exact integer micro-units
      // (1000000 // (60+rank)), fused over a FULL OUTER join
      (ivfSampledCtes + """,
        |vec AS (
        |  SELECT q_id, neighbor_id AS doc_id, 1000000 // (60 + rank) AS rrf_v
        |  FROM r WHERE rank <= 5
        |), tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tk
        |  WHERE len(term) > 0 GROUP BY doc_id, term
        |), dl AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM dt GROUP BY doc_id
        |), dfr AS (
        |  SELECT term, count(*) AS df FROM dt GROUP BY term
        |), g AS (
        |  SELECT (SELECT count(*) FROM documents) AS n_docs,
        |         (SELECT CAST(sum(tf) AS BIGINT) FROM dt) AS t_tokens
        |), qterms AS (
        |  SELECT doc_id AS q_id, term FROM (
        |    SELECT doc_id, term,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS rn
        |    FROM dt WHERE doc_id % 50 = 0) WHERE rn <= 3
        |), qt AS (
        |  SELECT qterms.q_id, qterms.term,
        |    CAST(round(ln((g.n_docs - dfr.df + 0.5) / (dfr.df + 0.5) + 1.0) * 1000000
        |      + 1e-9) AS BIGINT) AS idf_micro
        |  FROM qterms JOIN dfr USING (term), g
        |), sc AS (
        |  SELECT qt.q_id, dt.doc_id,
        |    CAST(sum((qt.idf_micro * dt.tf * 2200000)
        |      // (1000000*dt.tf + 300000 +
        |         (2*900000*dl.dl*g.n_docs + g.t_tokens) // (2*g.t_tokens))) AS BIGINT) AS s
        |  FROM dt JOIN qt USING (term) JOIN dl USING (doc_id), g
        |  WHERE dt.doc_id <> qt.q_id
        |  GROUP BY 1, 2
        |), lr AS (
        |  SELECT q_id, doc_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY s DESC, doc_id ASC) AS rank
        |  FROM sc
        |), lex AS (
        |  SELECT q_id, doc_id, 1000000 // (60 + rank) AS rrf_l
        |  FROM lr WHERE rank <= 5
        |), fused AS (
        |  SELECT COALESCE(v.q_id, l.q_id) AS q_id,
        |    COALESCE(v.doc_id, l.doc_id) AS doc_id,
        |    COALESCE(v.rrf_v, 0) + COALESCE(l.rrf_l, 0) AS rrf_micro
        |  FROM vec v FULL OUTER JOIN lex l
        |    ON v.q_id = l.q_id AND v.doc_id = l.doc_id
        |), fr AS (
        |  SELECT q_id, doc_id, rrf_micro,
        |    row_number() OVER (PARTITION BY q_id ORDER BY rrf_micro DESC, doc_id ASC) AS rank
        |  FROM fused
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id,
        |  CAST(rrf_micro AS BIGINT) AS rrf_micro
        |FROM fr WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),
    "ann_mmr" -> mmrOracleSql(5),
    "ann_binary_rerank" ->
      // 1-bit quantization vs per-dim sign-safe integer mean, codes
      // packed into two 32-bit words, Hamming shortlist (xor +
      // bit_count, ties → lowest vec_id), exact cosine rerank — the
      // bruteforce output shape
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS MATERIALIZED (
        |  SELECT vec_id, i.i AS i, CAST(round(v[i.i + 1] * 1e4) AS BIGINT) AS xb
        |  FROM e, range(0, 64) i(i)
        |), thr AS (
        |  SELECT i, CAST(CAST(sign(sum(xb)) AS BIGINT) *
        |    ((2 * abs(sum(xb)) + count(*)) // (2 * count(*))) AS BIGINT) AS thr
        |  FROM c GROUP BY i
        |), b AS (
        |  SELECT c.vec_id, c.i,
        |    CASE WHEN c.xb > thr.thr THEN 1::BIGINT ELSE 0::BIGINT END AS b
        |  FROM c JOIN thr USING (i)
        |), codes AS MATERIALIZED (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN i < 32 THEN b << i ELSE 0 END) AS BIGINT) AS w0,
        |    CAST(sum(CASE WHEN i >= 32 THEN b << (i - 32) ELSE 0 END) AS BIGINT) AS w1
        |  FROM b GROUP BY vec_id
        |), q AS (
        |  SELECT vec_id AS q_id, w0 AS qw0, w1 AS qw1 FROM codes WHERE vec_id % 50 = 0
        |), ham AS (
        |  SELECT q.q_id, c2.vec_id,
        |    bit_count(xor(c2.w0, q.qw0)) + bit_count(xor(c2.w1, q.qw1)) AS ham
        |  FROM codes c2 CROSS JOIN q WHERE c2.vec_id <> q.q_id
        |), sl AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id,
        |      row_number() OVER (PARTITION BY q_id ORDER BY ham ASC, vec_id ASC) AS r
        |    FROM ham) t
        |  WHERE r <= 50
        |), s AS (
        |  SELECT sl.q_id, sl.vec_id AS neighbor_id,
        |    list_cosine_similarity(qe.v, e2.v) AS cos
        |  FROM sl JOIN e e2 ON e2.vec_id = sl.vec_id JOIN e qe ON qe.vec_id = sl.q_id
        |), r AS (
        |  SELECT q_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM s
        |)
        |SELECT q_id, neighbor_id, round(cos, 4) AS cosine, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "ann_graph" -> graphOracleSql(5),
    // identical result by construction: the stored index's content is
    // deterministic, so the probe face gates against the same unrolled
    // build+search CTEs
    "ann_graph_probe" -> graphOracleSql(5),
    "graph_pagerank" -> pagerankOracleSql(),
    "graph_communities" -> communitiesOracleSql(),
    "graph_triangles" -> trianglesOracleSql(),
    "embedding_hard_negatives" ->
      // bruteforce scores in basis points; near-dup ceiling (9900 bp)
      // and rank order both integer-exact
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s0 AS (
        |  SELECT q.q_id, e.vec_id,
        |    CAST(round(list_cosine_similarity(q.qv, e.v) * 1e4) AS BIGINT) AS s
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id
        |), f AS (SELECT * FROM s0 WHERE s <= 9900)
        |SELECT q_id, CAST(rn AS BIGINT) AS rank, vec_id, CAST(s AS DOUBLE) / 1e4 AS cosine
        |FROM (SELECT q_id, vec_id, s,
        |        row_number() OVER (PARTITION BY q_id ORDER BY s DESC, vec_id) AS rn
        |      FROM f)
        |WHERE rn <= 5 ORDER BY q_id, rank""".stripMargin,
    "embedding_pca" -> pcaOracleSql(),
    "embedding_kmeans" -> kmeansOracleSql(),
    "embedding_kmeans_assign" -> kmeansOracleSql(),
    "pipeline_cluster_balance" -> clusterBalanceOracleSql(),
    "embedding_project" -> projectOracleSql(),
    "embedding_stratified_sample" -> stratOracleSql(),
    "embedding_pca2" -> pca2OracleSql(),
    "embedding_quantize_int8" ->
      // all-integer scalar quantization audit: bp coords, truncating
      // div codes/reconstructions, exact error sums
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS MATERIALIZED (
        |  SELECT vec_id, i.i AS i, CAST(round(v[i.i + 1] * 1e4) AS BIGINT) AS xb
        |  FROM e, range(0, 64) i(i)
        |), mm AS (
        |  SELECT i, min(xb) AS mn, max(xb) AS mx,
        |    greatest(max(xb) - min(xb), 1) AS sc
        |  FROM c GROUP BY i
        |), r AS (
        |  SELECT c.i, mm.mn, mm.mx,
        |    abs(mm.mn + ((((c.xb - mm.mn) * 255) // mm.sc) * mm.sc) // 255 - c.xb) AS err
        |  FROM c JOIN mm USING (i)
        |)
        |SELECT CAST(i AS BIGINT) AS dim, mn, mx, count(*) AS n,
        |  CAST(sum(err) AS BIGINT) AS sum_abs_err_bp, max(err) AS max_abs_err_bp
        |FROM r GROUP BY i, mn, mx ORDER BY dim""".stripMargin,
    "embedding_norm_hist" ->
      // norms on bp-quantized coords: sum of squares is an exact
      // integer (order-free), sqrt of the same integer is the same
      // double in both engines
      """WITH n AS (
        |  SELECT CAST(round(sqrt(CAST(list_sum(list_transform(
        |      CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(x * 1e4) AS BIGINT) * CAST(round(x * 1e4) AS BIGINT)))
        |    AS DOUBLE))) AS BIGINT) AS norm_bp
        |  FROM embeddings
        |)
        |SELECT norm_bp // 500 AS bucket, count(*) AS n_vecs,
        |  min(norm_bp) AS min_norm_bp, max(norm_bp) AS max_norm_bp
        |FROM n GROUP BY 1 ORDER BY bucket""".stripMargin,
    "ann_lsh" ->
      """WITH coef AS (
        |  SELECT p.p, j.j,
        |    (CAST(('0x' || substr(md5(p.p || ':' || j.j), 1, 15)) AS BIGINT)
        |      - 576460752303423488) / 576460752303423488.0 AS c
        |  FROM range(0, 6) p(p), range(0, 64) j(j)
        |), e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |dots AS (
        |  SELECT e.vec_id, c.p, sum(e.v[c.j + 1] * c.c) AS dot
        |  FROM e, coef c GROUP BY e.vec_id, c.p
        |), bkt AS (
        |  SELECT vec_id, CAST(sum(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) AS INT) AS bucket
        |  FROM dots GROUP BY vec_id
        |), q AS (
        |  SELECT e.vec_id AS q_id, e.v AS qv, b.bucket
        |  FROM e JOIN bkt b USING (vec_id) WHERE e.vec_id % 50 = 0
        |), c2 AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN bkt b USING (vec_id)),
        |s AS (
        |  SELECT q.q_id, c2.vec_id AS neighbor_id, list_cosine_similarity(q.qv, c2.v) AS cos
        |  FROM c2 JOIN q ON c2.bucket = q.bucket AND c2.vec_id <> q.q_id
        |), r AS (
        |  SELECT q_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM s
        |)
        |SELECT q_id, neighbor_id, round(cos, 4) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (
        |  SELECT x.vec_id AS a_id, y.vec_id AS b_id
        |  FROM e x JOIN e y ON x.vec_id < y.vec_id
        |  WHERE list_cosine_similarity(x.v, y.v) >= 0.95
        |), u AS (
        |  SELECT a_id AS vec_id, b_id AS partner FROM p
        |  UNION ALL SELECT b_id AS vec_id, a_id AS partner FROM p
        |), m AS (SELECT vec_id, min(partner) AS dup_partner FROM u GROUP BY vec_id)
        |SELECT e.vec_id, m.dup_partner, m.dup_partner IS NOT NULL AS is_dup
        |FROM e LEFT JOIN m USING (vec_id) ORDER BY vec_id""".stripMargin,
    "dedup_semantic" ->
      // SemDeDup replayed end to end: the ann_ivf_sampled quantizer CTE
      // (sampled centroids + argmax assignment, centroid cosine rounded
      // at creation), in-cluster pairs >= 0.95, keep-rule = the member
      // closer to the centroid loses (tie -> higher vec_id)
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |hs AS (
        |  SELECT vec_id,
        |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM e
        |), sel AS (SELECT vec_id FROM hs ORDER BY h, vec_id LIMIT 16),
        |cent AS (
        |  SELECT row_number() OVER (ORDER BY s.vec_id) - 1 AS list_id, e.v AS cv
        |  FROM sel s JOIN e ON e.vec_id = s.vec_id
        |), ac AS (
        |  SELECT e.vec_id, c.list_id, list_cosine_similarity(e.v, c.cv) AS ccos
        |  FROM e CROSS JOIN cent c
        |), asgn AS (
        |  SELECT vec_id, list_id, round(ccos, 6) AS cent_cos FROM (
        |    SELECT vec_id, list_id, ccos,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, list_id ASC) AS rn
        |    FROM ac) WHERE rn = 1
        |), p AS (
        |  SELECT x.vec_id AS a_id, y.vec_id AS b_id,
        |    x.cent_cos AS acc, y.cent_cos AS bcc
        |  FROM asgn x JOIN asgn y
        |    ON x.list_id = y.list_id AND x.vec_id < y.vec_id
        |  JOIN e ea ON ea.vec_id = x.vec_id
        |  JOIN e eb ON eb.vec_id = y.vec_id
        |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.95
        |), l AS (
        |  SELECT CASE WHEN acc > bcc THEN a_id ELSE b_id END AS vec_id,
        |         CASE WHEN acc > bcc THEN b_id ELSE a_id END AS partner
        |  FROM p
        |), m AS (SELECT vec_id, min(partner) AS dup_partner FROM l GROUP BY vec_id)
        |SELECT a.vec_id, a.list_id, a.cent_cos, m.dup_partner,
        |  m.dup_partner IS NOT NULL AS is_dup
        |FROM asgn a LEFT JOIN m USING (vec_id) ORDER BY a.vec_id""".stripMargin,
    "dedup_minhash_lsh" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
        |    ELSE [concat_ws(' ', toks)] END AS sh
        |  FROM t
        |), p AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
        |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |      / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS j
        |  FROM s x JOIN s y ON x.doc_id < y.doc_id
        |)
        |SELECT a_id, b_id, round(j, 4) AS jaccard FROM p WHERE j >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_minhash_fast" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
        |    ELSE [concat_ws(' ', toks)] END AS sh
        |  FROM t
        |), p AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
        |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |      / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS j
        |  FROM s x JOIN s y ON x.doc_id < y.doc_id
        |)
        |SELECT a_id, b_id, round(j, 4) AS jaccard FROM p WHERE j >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_incremental" ->
      // new batch (doc_id % 10 = 0) vs standing corpus ONLY — the
      // true pair space the incremental operator prunes with its LSH
      // bands; batch-internal pairs are out of scope by definition
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
        |    ELSE [concat_ws(' ', toks)] END AS sh
        |  FROM t
        |), nw AS (SELECT * FROM s WHERE doc_id % 10 = 0
        |), od AS (SELECT * FROM s WHERE doc_id % 10 <> 0
        |), p AS (
        |  SELECT n.doc_id, o.doc_id AS partner,
        |    CAST(len(list_intersect(n.sh, o.sh)) AS DOUBLE)
        |      / (len(n.sh) + len(o.sh) - len(list_intersect(n.sh, o.sh))) AS j
        |  FROM nw n CROSS JOIN od o
        |), m AS (
        |  SELECT doc_id, partner, j,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY partner) AS rn
        |  FROM p WHERE j >= 0.5
        |)
        |SELECT nw.doc_id, m.partner AS dup_of, round(m.j, 4) AS jaccard,
        |  (m.partner IS NULL) AS keep
        |FROM nw LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (doc_id)
        |ORDER BY nw.doc_id""".stripMargin,
    "dedup_cross_corpus" ->
      // held-out docs (doc_id % 7 = 3) vs the training corpus: the
      // doc-level train-test contamination audit over the true pair
      // space the LSH bands prune
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
        |    ELSE [concat_ws(' ', toks)] END AS sh
        |  FROM t
        |), hd AS (SELECT * FROM s WHERE doc_id % 7 = 3
        |), tr AS (SELECT * FROM s WHERE doc_id % 7 <> 3
        |), p AS (
        |  SELECT h.doc_id, r.doc_id AS partner,
        |    CAST(len(list_intersect(h.sh, r.sh)) AS DOUBLE)
        |      / (len(h.sh) + len(r.sh) - len(list_intersect(h.sh, r.sh))) AS j
        |  FROM hd h CROSS JOIN tr r
        |), m AS (
        |  SELECT doc_id, partner, j,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY partner) AS rn
        |  FROM p WHERE j >= 0.5
        |)
        |SELECT hd.doc_id, m.partner AS contaminated_by, round(m.j, 4) AS jaccard,
        |  (m.partner IS NOT NULL) AS contaminated
        |FROM hd LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (doc_id)
        |ORDER BY hd.doc_id""".stripMargin,
    "dedup_threshold_curve" ->
      // pair counts per rounded-jaccard decile over the true >= 0.5
      // pair space (the band floor); 1.0 folds into the top bucket
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
        |    ELSE [concat_ws(' ', toks)] END AS sh
        |  FROM t
        |), p AS (
        |  SELECT round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |      / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4) AS j
        |  FROM s x JOIN s y ON x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |      / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.5
        |)
        |SELECT least(CAST(floor(j * 10 + 1e-9) AS BIGINT), 9) * 1000 AS bucket_lo_bp,
        |  count(*) AS n_pairs
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_ngram_composed" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |  FROM documents
        |), p AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
        |    CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
        |      / (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))) AS j
        |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
        |)
        |SELECT a_id, b_id, round(j, 4) AS jaccard FROM p WHERE j >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents
        |), tc AS (
        |  SELECT doc_id, tok, count(*) AS cnt,
        |    CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |  FROM tok GROUP BY doc_id, tok
        |), bits AS (
        |  SELECT doc_id, bb.b,
        |    CASE WHEN sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN cnt ELSE -cnt END) > 0
        |         THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM tc, (SELECT unnest(range(0, 60)) AS b) bb
        |  GROUP BY doc_id, bb.b
        |), sig AS (
        |  SELECT doc_id, CAST(sum(bit << b) AS BIGINT) AS sim FROM bits GROUP BY doc_id
        |), banded AS (
        |  SELECT doc_id, sim, t.band_id, (sim >> (t.band_id * 15)) & 32767 AS band_val
        |  FROM sig, (SELECT unnest(range(0, 4)) AS band_id) t
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS a_id, x.sim AS sim_a, y.doc_id AS b_id, y.sim AS sim_b
        |  FROM banded x JOIN banded y
        |    ON x.band_id = y.band_id AND x.band_val = y.band_val AND x.doc_id < y.doc_id
        |), ver AS (
        |  SELECT a_id, b_id FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 6
        |), u AS (
        |  SELECT a_id AS doc_id, b_id AS partner FROM ver
        |  UNION ALL SELECT b_id AS doc_id, a_id AS partner FROM ver
        |), m AS (SELECT doc_id, min(partner) AS dup_partner FROM u GROUP BY doc_id)
        |SELECT s.doc_id, s.sim AS simhash, m.dup_partner
        |FROM sig s LEFT JOIN m USING (doc_id) ORDER BY s.doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |small AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp
        |  FROM d WHERE n > 0 AND n <= 8
        |), g AS (
        |  SELECT doc_id, i,
        |    CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 15)) AS BIGINT) AS h,
        |    n - 7 AS m
        |  FROM d, LATERAL unnest(range(1, n - 6)) AS t(i) WHERE n > 8
        |), wm_small AS (
        |  SELECT doc_id, min(h) AS fp FROM g WHERE m <= 4 GROUP BY doc_id
        |), win AS (
        |  SELECT doc_id, i, m,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        |  FROM g WHERE m > 4
        |), sel AS (
        |  SELECT DISTINCT doc_id, wmin AS fp FROM win WHERE i <= m - 3
        |), fps AS (
        |  SELECT * FROM small UNION ALL SELECT * FROM wm_small UNION ALL SELECT * FROM sel
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_fp, min(fp) AS fp_head FROM fps GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(agg.n_fp, 0) AS n_fp, agg.fp_head
        |FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "dedup_fingerprint" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |small AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp
        |  FROM d WHERE n > 0 AND n <= 20
        |), g AS (
        |  SELECT doc_id, i,
        |    CAST(('0x' || substr(md5(substr(text, i, 20)), 1, 15)) AS BIGINT) AS h,
        |    n - 19 AS m
        |  FROM d, LATERAL unnest(range(1, n - 18)) AS t(i) WHERE n > 20
        |), wm_small AS (
        |  SELECT doc_id, min(h) AS fp FROM g WHERE m <= 4 GROUP BY doc_id
        |), win AS (
        |  SELECT doc_id, i, m,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        |  FROM g WHERE m > 4
        |), sel AS (
        |  SELECT DISTINCT doc_id, wmin AS fp FROM win WHERE i <= m - 3
        |), fps AS (
        |  SELECT * FROM small UNION ALL SELECT * FROM wm_small UNION ALL SELECT * FROM sel
        |), sizes AS (SELECT doc_id, count(*) AS sz FROM fps GROUP BY doc_id),
        |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 20),
        |inv AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)),
        |cand AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS shared
        |  FROM inv x JOIN inv y ON x.fp = y.fp AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |)
        |SELECT c.a_id, c.b_id, c.shared,
        |  round(CAST(c.shared AS DOUBLE) / least(sa.sz, sb.sz), 4) AS overlap_ratio
        |FROM cand c JOIN sizes sa ON sa.doc_id = c.a_id
        |            JOIN sizes sb ON sb.doc_id = c.b_id
        |WHERE round(CAST(c.shared AS DOUBLE) / least(sa.sz, sb.sz), 4) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100) AS INT) AS lb,
        |    list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |  FROM documents
        |), pr AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
        |    AND x.lb = y.lb AND x.doc_id < y.doc_id
        |  WHERE CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
        |     / (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))) >= 0.8
        |), e AS (
        |  SELECT a_id, b_id FROM pr UNION ALL SELECT b_id AS a_id, a_id AS b_id FROM pr
        |), walk(id, reach) AS (
        |  SELECT a_id, a_id FROM e
        |  UNION
        |  SELECT w.id, e.b_id FROM walk w JOIN e ON e.a_id = w.reach
        |), lab AS (SELECT id AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY id)
        |SELECT cluster_id, count(*) AS cluster_size, min(doc_id) AS keep_id
        |FROM lab GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    "mm_features" ->
      """WITH d AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS nb FROM documents),
        |bytes AS (
        |  SELECT doc_id, CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS INT) AS bv
        |  FROM d, LATERAL unnest(range(1, nb + 1)) AS t(i) WHERE nb > 0
        |), mb AS (
        |  SELECT doc_id, CAST(sum(bv) AS DOUBLE) / count(*) AS mean FROM bytes GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS media_type,
        |  d.nb AS n_bytes,
        |  round(coalesce(mb.mean, 0.0), 4) AS mean_byte,
        |  CAST(32 + (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'w'), 1, 4)) AS BIGINT) % 8) * 16 AS INT) AS width,
        |  CAST(32 + (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'h'), 1, 4)) AS BIGINT) % 8) * 16 AS INT) AS height,
        |  CAST(CASE WHEN d.doc_id % 3 = 2 THEN d.nb // 64 + 1 ELSE 1 END AS INT) AS n_frames
        |FROM d LEFT JOIN mb USING (doc_id) ORDER BY doc_id""".stripMargin,
    "mm_decode" ->
      // regenerates the closed-form WAV samples / PPM pixels and
      // recomputes the decoded statistics arithmetically — a stub
      // (whole-file byte mean) would hash-mismatch every row
      """WITH ids AS (SELECT doc_id FROM documents),
        |a AS (
        |  SELECT d.doc_id, 200 + (d.doc_id % 5) * 100 AS n
        |  FROM ids d WHERE d.doc_id % 2 = 1
        |), asum AS (
        |  SELECT a.doc_id, a.n, sum(abs((a.doc_id * 31 + t.i * 17) % 2001 - 1000)) AS s
        |  FROM a, LATERAL unnest(range(0, a.n)) AS t(i)
        |  GROUP BY a.doc_id, a.n
        |), audio AS (
        |  SELECT doc_id, 'audio' AS media_type, CAST(44 + 2 * n AS BIGINT) AS n_bytes,
        |    round(CAST(s AS DOUBLE) / n, 4) AS mean_decoded,
        |    CAST(0 AS INT) AS width, CAST(0 AS INT) AS height, CAST(1 AS INT) AS n_frames
        |  FROM asum
        |), im AS (
        |  SELECT d.doc_id, 16 + (d.doc_id % 4) * 8 AS w, 16 + (d.doc_id % 3) * 8 AS h
        |  FROM ids d WHERE d.doc_id % 2 = 0
        |), isum AS (
        |  SELECT im.doc_id, im.w, im.h,
        |    sum(CASE WHEN t.j % 3 = 0 THEN (im.doc_id * 7 + t.j * 13) % 256 ELSE 0 END) AS sr,
        |    sum(CASE WHEN t.j % 3 = 1 THEN (im.doc_id * 7 + t.j * 13) % 256 ELSE 0 END) AS sg,
        |    sum(CASE WHEN t.j % 3 = 2 THEN (im.doc_id * 7 + t.j * 13) % 256 ELSE 0 END) AS sb
        |  FROM im, LATERAL unnest(range(0, 3 * im.w * im.h)) AS t(j)
        |  GROUP BY im.doc_id, im.w, im.h
        |), image AS (
        |  SELECT doc_id, 'image' AS media_type,
        |    CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3 * w * h AS BIGINT) AS n_bytes,
        |    round((CAST(sr AS DOUBLE) / (w * h) + CAST(sg AS DOUBLE) / (w * h)
        |           + CAST(sb AS DOUBLE) / (w * h)) / 3.0, 4) AS mean_decoded,
        |    CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(1 AS INT) AS n_frames
        |  FROM isum
        |)
        |SELECT * FROM audio UNION ALL SELECT * FROM image ORDER BY doc_id""".stripMargin,
    "text_span_dedup" ->
      // mirrors shingleStrings semantics: lowercase+trim, whitespace
      // tokens, k=10 spans joined by one space; docs shorter than k
      // tokens contribute their whole text as one span
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks FROM documents
        |), sp AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks, ' ') AS span
        |  FROM t WHERE len(toks) < 10
        |  UNION ALL
        |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+9], ' ') AS span
        |  FROM t, LATERAL unnest(range(1, len(toks) - 8)) AS u(i)
        |  WHERE len(toks) >= 10
        |), df AS (
        |  SELECT span, count(*) AS span_df FROM sp GROUP BY span
        |), agg AS (
        |  SELECT sp.doc_id, count(*) AS n_spans,
        |    sum(CASE WHEN df.span_df >= 2 THEN 1 ELSE 0 END) AS dup_spans
        |  FROM sp JOIN df USING (span) GROUP BY sp.doc_id
        |)
        |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
        |  CAST(dup_spans AS BIGINT) AS dup_spans,
        |  round(CAST(dup_spans AS DOUBLE) / n_spans, 4) AS dup_fraction
        |FROM agg ORDER BY doc_id""".stripMargin,
    "text_span_removal" ->
      // positional variant of the text_span_dedup span CTE (0-based
      // span starts, within-doc repeats kept), composed with interval
      // coverage: a token is removed iff ANY duplicated span (>= 2
      // distinct docs) starts within k-1 positions before it
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks FROM documents
        |), sp AS (
        |  SELECT doc_id, 0 AS pos, array_to_string(toks, ' ') AS span
        |  FROM t WHERE len(toks) < 10
        |  UNION ALL
        |  SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+9], ' ') AS span
        |  FROM t, LATERAL unnest(range(1, len(toks) - 8)) AS u(i)
        |  WHERE len(toks) >= 10
        |), dup AS (
        |  SELECT span FROM sp GROUP BY span HAVING count(DISTINCT doc_id) >= 2
        |), ds AS (
        |  SELECT sp.doc_id, sp.pos FROM sp JOIN dup USING (span)
        |), cov AS (
        |  SELECT DISTINCT ds.doc_id, ds.pos + u.o AS p
        |  FROM ds JOIN t USING (doc_id), LATERAL unnest(range(0, 10)) AS u(o)
        |  WHERE ds.pos + u.o < len(t.toks)
        |), tok AS (
        |  SELECT doc_id, i - 1 AS p, toks[i] AS tok, len(toks) AS n
        |  FROM t, LATERAL unnest(range(1, len(toks) + 1)) AS u(i)
        |), j AS (
        |  SELECT tok.doc_id, tok.p, tok.tok, tok.n, (cov.p IS NOT NULL) AS removed
        |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p
        |), agg AS (
        |  SELECT doc_id, max(n) AS n_tokens,
        |    sum(CASE WHEN removed THEN 0 ELSE 1 END) AS kept_tokens,
        |    sum(CASE WHEN removed THEN 1 ELSE 0 END) AS removed_cnt,
        |    coalesce(string_agg(tok, ' ' ORDER BY p) FILTER (WHERE NOT removed), '') AS clean_text
        |  FROM j GROUP BY doc_id
        |), dsc AS (
        |  SELECT doc_id, count(*) AS dup_starts FROM ds GROUP BY doc_id
        |)
        |SELECT a.doc_id, CAST(a.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(a.kept_tokens AS BIGINT) AS kept_tokens,
        |  CAST(coalesce(d.dup_starts, 0) AS BIGINT) AS dup_starts,
        |  round(CAST(a.removed_cnt AS DOUBLE) / a.n_tokens, 4) AS removed_fraction,
        |  a.clean_text
        |FROM agg a LEFT JOIN dsc d USING (doc_id) ORDER BY a.doc_id""".stripMargin,
    "pipeline_assembly" ->
      // the assembly line composed from the already-proven pieces:
      // decontaminate (13-token spans, bench = doc_id % 97 = 0) ->
      // exact dedup (first doc per md5(text)) -> quality gate (the
      // curation score) -> greedy 1024-token packing (recursive CTE)
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, text, string_split(trim(lower(text)), ' ') AS stoks FROM documents
        |), sp AS (
        |  SELECT DISTINCT doc_id, array_to_string(stoks, ' ') AS span
        |  FROM t WHERE len(stoks) < 13
        |  UNION ALL
        |  SELECT DISTINCT doc_id, array_to_string(stoks[i:i+12], ' ') AS span
        |  FROM t, LATERAL unnest(range(1, len(stoks) - 11)) AS u(i)
        |  WHERE len(stoks) >= 13
        |), b AS (
        |  SELECT DISTINCT span FROM sp WHERE doc_id % 97 = 0
        |), dirty AS (
        |  SELECT DISTINCT sp.doc_id FROM sp JOIN b USING (span) WHERE sp.doc_id % 97 <> 0
        |), clean AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM dirty)
        |), d AS (
        |  SELECT dd.doc_id, dd.text,
        |    row_number() OVER (PARTITION BY md5(dd.text) ORDER BY dd.doc_id) AS copy_rank
        |  FROM documents dd JOIN clean USING (doc_id)
        |), qd AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text, copy_rank,
        |      regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |      CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
        |        / length(text) AS punct_ratio
        |    FROM d)
        |  WHERE copy_rank = 1
        |    AND least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 0.5
        |      + least(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.3
        |      + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2 >= 0.5
        |), o AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
        |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM qd
        |), r AS (
        |  SELECT shard, doc_id, rn, n_tokens,
        |         CAST(0 AS BIGINT) AS pack_id, n_tokens AS acc,
        |         CASE WHEN n_tokens >= 1024 THEN 1 ELSE 0 END AS fired
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.doc_id, o.rn, o.n_tokens,
        |         CASE WHEN r.fired = 1 THEN r.pack_id + 1 ELSE r.pack_id END,
        |         CASE WHEN r.fired = 1 THEN o.n_tokens ELSE r.acc + o.n_tokens END,
        |         CASE WHEN (CASE WHEN r.fired = 1 THEN o.n_tokens ELSE r.acc + o.n_tokens END) >= 1024 THEN 1 ELSE 0 END
        |  FROM r JOIN o ON o.shard = r.shard AND o.rn = r.rn + 1
        |)
        |SELECT shard, pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  round(CAST(sum(n_tokens) AS DOUBLE) / 1024, 4) AS fill_ratio
        |FROM r GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,
    "text_unigram_lp" ->
      // unigram LM proxy: ln of exact integer ratios, averaged per doc
      // then rounded — tokens mirror the kernel's whitespace split
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents
        |), f AS (
        |  SELECT tok, count(*) AS tf FROM tk GROUP BY tok
        |), n AS (
        |  SELECT count(*) AS n_total FROM tk
        |)
        |SELECT tk.doc_id, count(*) AS n_tokens,
        |  round(avg(-ln(CAST(f.tf AS DOUBLE) / n.n_total)), 4) AS avg_neg_logprob
        |FROM tk JOIN f USING (tok) CROSS JOIN n
        |GROUP BY tk.doc_id ORDER BY tk.doc_id""".stripMargin,
    "text_bigram_lp" ->
      // held-out stupid backoff: train counts on doc_id % 10 <> 0,
      // score doc_id % 10 = 0; seen: -ln(C(w1w2)/C(w1)); unseen:
      // -ln(0.4*(C(w2)+1)/(N+V)). The Spark side joins on 64-bit
      // shingle hashes; the oracle joins the same token pairs as
      // strings — outputs agree unless a 2^-64 hash collision merges
      // two counts
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        |  FROM t, LATERAL unnest(range(1, len(toks))) AS r(i)
        |  WHERE len(toks) >= 2
        |), tr AS (
        |  SELECT doc_id, toks FROM t WHERE len(toks) >= 2 AND doc_id % 10 <> 0
        |), tu AS (
        |  SELECT tok, count(*) AS uc
        |  FROM (SELECT unnest(toks) AS tok FROM tr) GROUP BY tok
        |), tb AS (
        |  SELECT w1, w2, count(*) AS bc FROM bg WHERE doc_id % 10 <> 0 GROUP BY w1, w2
        |), nv AS (
        |  SELECT CAST(sum(uc) AS BIGINT) AS n_train, count(*) AS v_train FROM tu
        |), sc AS (
        |  SELECT bg.doc_id,
        |    CASE WHEN tb.bc IS NOT NULL AND u1.uc IS NOT NULL
        |         THEN -ln(CAST(tb.bc AS DOUBLE) / u1.uc)
        |         ELSE -ln(0.4 * (COALESCE(u2.uc, 0) + 1) / (nv.n_train + nv.v_train)) END AS s,
        |    CASE WHEN tb.bc IS NOT NULL AND u1.uc IS NOT NULL THEN 1.0 ELSE 0.0 END AS hit
        |  FROM bg
        |  LEFT JOIN tb ON bg.w1 = tb.w1 AND bg.w2 = tb.w2
        |  LEFT JOIN tu u1 ON bg.w1 = u1.tok
        |  LEFT JOIN tu u2 ON bg.w2 = u2.tok
        |  CROSS JOIN nv
        |  WHERE bg.doc_id % 10 = 0
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(s), 4) AS avg_neg_logprob,
        |  round(avg(hit), 4) AS seen_frac
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      // top-3 terms per doc by tf*ln(N/df); ranking compares the
      // ROUNDED score (+1e-9 guard) with term-string tiebreak so the
      // order is engine-independent (raw doubles would hinge on the
      // last ulp of ln)
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tk
        |  WHERE len(term) > 0 GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, count(*) AS df FROM dt GROUP BY term
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), j AS (
        |  SELECT dt.doc_id, dt.term, dt.tf, df.df,
        |    round(dt.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) + 1e-9, 4) AS tfidf
        |  FROM dt JOIN df USING (term) CROSS JOIN n
        |), r AS (
        |  SELECT doc_id, term, tf, df, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        |  FROM j
        |)
        |SELECT doc_id, rank, term, tf, df, tfidf
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "text_bm25" ->
      // BM25 k1=1.2 b=0.75: idf rounded to micro-units at the 12-row
      // query-term table; length normalizer + per-term contribution
      // are exact integer arithmetic (half-up via (2n+d)//(2d), then
      // truncating div) so scores hash-match with no tolerance
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tk
        |  WHERE len(term) > 0 GROUP BY doc_id, term
        |), dl AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM dt GROUP BY doc_id
        |), df AS (
        |  SELECT term, count(*) AS df FROM dt GROUP BY term
        |), g AS (
        |  SELECT (SELECT count(*) FROM documents) AS n_docs,
        |         (SELECT CAST(sum(tf) AS BIGINT) FROM dt) AS t_tokens
        |), qt AS (
        |  SELECT term, CAST((rn - 1) // 3 AS BIGINT) AS q_id,
        |    CAST(round(ln((g.n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1000000 + 1e-9)
        |      AS BIGINT) AS idf_micro
        |  FROM (SELECT term, df, row_number() OVER (ORDER BY df DESC, term ASC) AS rn
        |        FROM df) q, g
        |  WHERE rn <= 12
        |), sc AS (
        |  SELECT qt.q_id, dt.doc_id,
        |    CAST(sum((qt.idf_micro * dt.tf * 2200000)
        |      // (1000000*dt.tf + 300000 +
        |         (2*900000*dl.dl*g.n_docs + g.t_tokens) // (2*g.t_tokens))) AS BIGINT) AS s
        |  FROM dt JOIN qt USING (term) JOIN dl USING (doc_id), g
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT q_id, doc_id, s,
        |    row_number() OVER (PARTITION BY q_id ORDER BY s DESC, doc_id ASC) AS rank
        |  FROM sc
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, s AS bm25_micro
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "pipeline_mix" ->
      // temperature mixing: rate_d = tok_d^(-0.3) / max_d(tok_d^(-0.3)),
      // acceptance = md5 bucket (8 hex chars % 10000) under
      // round(rate*10000); the -0.3 literal matches the Spark
      // exponent bit-for-bit (alpha-1 computed in Scala would be
      // -0.30000000000000004)
      """WITH sized AS (
        |  SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens
        |  FROM documents
        |), dom AS (
        |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS dom_tokens
        |  FROM sized GROUP BY source
        |), mx AS (
        |  SELECT max(pow(CAST(dom_tokens AS DOUBLE), -0.3)) AS max_r FROM dom
        |), rates AS (
        |  SELECT source,
        |    pow(CAST(dom_tokens AS DOUBLE), -0.3) / mx.max_r AS rate,
        |    CAST(round(pow(CAST(dom_tokens AS DOUBLE), -0.3) / mx.max_r * 10000) AS BIGINT) AS thresh
        |  FROM dom CROSS JOIN mx
        |), tagged AS (
        |  SELECT s.source, s.n_tokens, r.rate,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(s.doc_id AS VARCHAR) || ':mix'), 1, 8)) AS BIGINT) % 10000 < r.thresh
        |         THEN 1 ELSE 0 END AS kept
        |  FROM sized s JOIN rates r USING (source)
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS n_docs_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN kept = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
        |  round(rate + 1e-9, 4) AS target_rate,
        |  round(CAST(sum(kept) AS DOUBLE) / count(*) + 1e-9, 4) AS achieved_rate
        |FROM tagged GROUP BY source, rate ORDER BY source""".stripMargin,
    "pipeline_dedup_impact" ->
      // quality deciles split by the exact-dedup keep verdict; cell
      // means sum exact integer basis points of the 4dp-rounded score
      """WITH t AS (
        |  SELECT doc_id, md5(text) AS h, length(text) AS n_chars,
        |   regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |   length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, h, len(toks) AS n_tokens,
        |   round(least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 0.5
        |     + least(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.3
        |     + (1.0 - least(CAST(n_punct AS DOUBLE) / n_chars * 10.0, 1.0)) * 0.2 + 1e-9, 4) AS qs
        |  FROM t
        |), k AS (
        |  SELECT doc_id = min(doc_id) OVER (PARTITION BY h) AS kept,
        |    least(9, CAST(floor(qs * 10) AS BIGINT)) AS bucket,
        |    n_tokens, CAST(round(qs * 1e4) AS BIGINT) AS qs_bp
        |  FROM s
        |)
        |SELECT kept, bucket, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(qs_bp) AS DOUBLE) / count(*) / 1e4 + 1e-9, 4) AS avg_quality
        |FROM k GROUP BY kept, bucket ORDER BY kept, bucket""".stripMargin,
    "text_lang_balance" ->
      // pipeline_mix's chain keyed by the language label column; same
      // md5 ':mix' acceptance, renamed output col
      """WITH sized AS (
        |  SELECT doc_id, lang,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens
        |  FROM documents
        |), dom AS (
        |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS dom_tokens
        |  FROM sized GROUP BY lang
        |), mx AS (
        |  SELECT max(pow(CAST(dom_tokens AS DOUBLE), -0.3)) AS max_r FROM dom
        |), rates AS (
        |  SELECT lang,
        |    pow(CAST(dom_tokens AS DOUBLE), -0.3) / mx.max_r AS rate,
        |    CAST(round(pow(CAST(dom_tokens AS DOUBLE), -0.3) / mx.max_r * 10000) AS BIGINT) AS thresh
        |  FROM dom CROSS JOIN mx
        |), tagged AS (
        |  SELECT s.lang, s.n_tokens, r.rate,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(s.doc_id AS VARCHAR) || ':mix'), 1, 8)) AS BIGINT) % 10000 < r.thresh
        |         THEN 1 ELSE 0 END AS kept
        |  FROM sized s JOIN rates r USING (lang)
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS n_docs_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN kept = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
        |  round(rate + 1e-9, 4) AS target_rate,
        |  round(CAST(sum(kept) AS DOUBLE) / count(*) + 1e-9, 4) AS achieved_rate
        |FROM tagged GROUP BY lang, rate ORDER BY lang""".stripMargin,
    "pipeline_pack" ->
      // mirrors the Batcher greedy semantics (same recursive-CTE shape
      // as sink_batch_bytes): a doc joins its pack, and the pack closes
      // when accumulated tokens reach the 1024 budget; 8 shard domains
      // pack independently in doc_id order
      """WITH RECURSIVE o AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
        |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents
        |), r AS (
        |  SELECT shard, doc_id, rn, n_tokens,
        |         CAST(0 AS BIGINT) AS pack_id, n_tokens AS acc,
        |         CASE WHEN n_tokens >= 1024 THEN 1 ELSE 0 END AS fired
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.doc_id, o.rn, o.n_tokens,
        |         CASE WHEN r.fired = 1 THEN r.pack_id + 1 ELSE r.pack_id END,
        |         CASE WHEN r.fired = 1 THEN o.n_tokens ELSE r.acc + o.n_tokens END,
        |         CASE WHEN (CASE WHEN r.fired = 1 THEN o.n_tokens ELSE r.acc + o.n_tokens END) >= 1024 THEN 1 ELSE 0 END
        |  FROM r JOIN o ON o.shard = r.shard AND o.rn = r.rn + 1
        |)
        |SELECT shard, pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  round(CAST(sum(n_tokens) AS DOUBLE) / 1024, 4) AS fill_ratio
        |FROM r GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,
    "pipeline_pack_split" ->
      // oversized docs split into ceil(n/1024) chunks (all but the
      // last exactly 1024 tokens), then the same greedy recursive CTE
      // packs chunks in (doc_id, chunk_idx) order per shard
      """WITH RECURSIVE sz AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens
        |  FROM documents
        |), ch AS (
        |  SELECT doc_id, shard, c.ci AS chunk_idx,
        |         least(1024, n_tokens - c.ci * 1024) AS chunk_tokens
        |  FROM sz, LATERAL unnest(range(0, (n_tokens - 1) // 1024 + 1)) AS c(ci)
        |), o AS (
        |  SELECT shard, chunk_tokens,
        |         row_number() OVER (PARTITION BY shard ORDER BY doc_id, chunk_idx) AS rn
        |  FROM ch
        |), r AS (
        |  SELECT shard, rn, chunk_tokens,
        |         CAST(0 AS BIGINT) AS pack_id, chunk_tokens AS acc,
        |         CASE WHEN chunk_tokens >= 1024 THEN 1 ELSE 0 END AS fired
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.rn, o.chunk_tokens,
        |         CASE WHEN r.fired = 1 THEN r.pack_id + 1 ELSE r.pack_id END,
        |         CASE WHEN r.fired = 1 THEN o.chunk_tokens ELSE r.acc + o.chunk_tokens END,
        |         CASE WHEN (CASE WHEN r.fired = 1 THEN o.chunk_tokens ELSE r.acc + o.chunk_tokens END) >= 1024 THEN 1 ELSE 0 END
        |  FROM r JOIN o ON o.shard = r.shard AND o.rn = r.rn + 1
        |)
        |SELECT shard, pack_id, count(*) AS n_chunks,
        |  CAST(sum(chunk_tokens) AS BIGINT) AS pack_tokens,
        |  round(CAST(sum(chunk_tokens) AS DOUBLE) / 1024, 4) AS fill_ratio
        |FROM r GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,
    "pipeline_decontaminate" ->
      // 13-token spans, same span semantics as text_span_dedup (docs
      // shorter than k contribute their whole text as one span);
      // benchmark set = doc_id % 97 = 0, excluded from the output
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks FROM documents
        |), sp AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks, ' ') AS span
        |  FROM t WHERE len(toks) < 13
        |  UNION ALL
        |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+12], ' ') AS span
        |  FROM t, LATERAL unnest(range(1, len(toks) - 11)) AS u(i)
        |  WHERE len(toks) >= 13
        |), b AS (
        |  SELECT DISTINCT span FROM sp WHERE doc_id % 97 = 0
        |), tr AS (
        |  SELECT doc_id, span FROM sp WHERE doc_id % 97 <> 0
        |)
        |SELECT tr.doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN b.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS contaminated,
        |  round(CAST(sum(CASE WHEN b.span IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS contamination
        |FROM tr LEFT JOIN b ON tr.span = b.span
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    "mm_gif" ->
      // GIF is lossless (LZW + grayscale palette), so decoded pixels
      // equal the generator (doc_id*19 + p*23) % 256 and the oracle
      // recomputes the mean arithmetically.
      """WITH ids AS (SELECT doc_id FROM documents),
        |im AS (
        |  SELECT doc_id, 10 + (doc_id % 6) * 5 AS w, 10 + (doc_id % 5) * 6 AS h
        |  FROM ids
        |), s AS (
        |  SELECT im.doc_id, im.w, im.h,
        |    sum((im.doc_id * 19 + t.p * 23) % 256) AS sg
        |  FROM im, LATERAL unnest(range(0, im.w * im.h)) AS t(p)
        |  GROUP BY im.doc_id, im.w, im.h
        |)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  round(CAST(sg AS DOUBLE) / (w * h), 4) AS mean_gray,
        |  CAST(w * h AS BIGINT) AS decoded_bytes
        |FROM s ORDER BY doc_id""".stripMargin,
    "mm_jpeg" ->
      // The tile images are constructed to survive lossy JPEG exactly
      // (solid 8x8 tiles, even offsets from 128: DC divides Q00=16 and
      // ACs vanish), so the decoded mean equals the mean of the
      // closed-form tile values 18 + ((doc_id*5 + b*11) % 12) * 20
      // over the (w/8)*(h/8) blocks.
      """WITH ids AS (SELECT doc_id FROM documents),
        |im AS (
        |  SELECT doc_id, 8 * (2 + doc_id % 3) AS w, 8 * (2 + doc_id % 4) AS h
        |  FROM ids
        |), s AS (
        |  SELECT im.doc_id, im.w, im.h,
        |    sum(18 + ((im.doc_id * 5 + t.b * 11) % 12) * 20) AS sg,
        |    count(*) AS nb
        |  FROM im, LATERAL unnest(range(0, (im.w // 8) * (im.h // 8))) AS t(b)
        |  GROUP BY im.doc_id, im.w, im.h
        |)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  round(CAST(sg AS DOUBLE) / nb, 4) AS mean_gray,
        |  CAST(w * h AS BIGINT) AS decoded_bytes
        |FROM s ORDER BY doc_id""".stripMargin,
    "mm_alaw" ->
      // A-law expansion: a = c XOR 85; exp 0 -> mant*16+8, else
      // (mant*16+264) << (exp-1). Codes are (doc_id*17 + i*11) % 256.
      """WITH ids AS (SELECT doc_id FROM documents),
        |a AS (SELECT doc_id, 250 + (doc_id % 5) * 60 AS n FROM ids),
        |m AS (
        |  SELECT a.doc_id, a.n,
        |    sum(CASE WHEN ((xor(((a.doc_id * 17 + t.i * 11) % 256), 85)) // 16) % 8 = 0
        |        THEN (xor(((a.doc_id * 17 + t.i * 11) % 256), 85) % 16) * 16 + 8
        |        ELSE ((xor(((a.doc_id * 17 + t.i * 11) % 256), 85) % 16) * 16 + 264)
        |             * CAST(power(2, ((xor(((a.doc_id * 17 + t.i * 11) % 256), 85)) // 16) % 8 - 1) AS BIGINT)
        |        END) AS s
        |  FROM a, LATERAL unnest(range(0, a.n)) AS t(i)
        |  GROUP BY a.doc_id, a.n
        |)
        |SELECT doc_id, CAST(44 + n AS BIGINT) AS n_bytes, CAST(n AS BIGINT) AS n_samples,
        |  round(CAST(s AS DOUBLE) / n, 4) AS mean_decoded
        |FROM m ORDER BY doc_id""".stripMargin,
    "mm_video" ->
      // every MJPEG frame is an exact-survival tile image (16x16, four
      // 8x8 blocks), so per-frame decoded means equal the average of
      // the four closed-form tile values and the oracle recomputes
      // frame count + means from the (doc_id, frame, block) generator.
      """WITH ids AS (SELECT doc_id FROM documents),
        |v AS (SELECT doc_id, 3 + doc_id % 4 AS nf FROM ids),
        |fm AS (
        |  SELECT v.doc_id, v.nf, t.f,
        |    avg(18 + ((v.doc_id * 5 + t.f * 13 + b.b * 11) % 12) * 20) AS fmean
        |  FROM v, LATERAL unnest(range(0, v.nf)) AS t(f),
        |       LATERAL unnest(range(0, 4)) AS b(b)
        |  GROUP BY v.doc_id, v.nf, t.f
        |)
        |SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(nf AS INT) AS n_frames,
        |  round(avg(fmean), 4) AS mean_gray,
        |  round(max(CASE WHEN f = 0 THEN fmean END), 4) AS first_frame_mean,
        |  round(max(CASE WHEN f = nf - 1 THEN fmean END), 4) AS last_frame_mean
        |FROM fm GROUP BY doc_id, nf ORDER BY doc_id""".stripMargin,
    "mm_mulaw" ->
      // G.711 mu-law expansion is closed-form: for transmitted code c,
      // u = 255 - c, |sample| = ((u%16)*8 + 132) << ((u//16)%8) - 132.
      // The oracle recomputes the decoded amplitude stats from the
      // code generator (doc_id*13 + i*7) % 256 arithmetically.
      """WITH ids AS (SELECT doc_id FROM documents),
        |a AS (SELECT doc_id, 300 + (doc_id % 7) * 50 AS n FROM ids),
        |m AS (
        |  SELECT a.doc_id, a.n,
        |    sum((((255 - ((a.doc_id * 13 + t.i * 7) % 256)) % 16) * 8 + 132)
        |        * CAST(power(2, ((255 - ((a.doc_id * 13 + t.i * 7) % 256)) // 16) % 8) AS BIGINT)
        |        - 132) AS s
        |  FROM a, LATERAL unnest(range(0, a.n)) AS t(i)
        |  GROUP BY a.doc_id, a.n
        |)
        |SELECT doc_id, CAST(44 + n AS BIGINT) AS n_bytes, CAST(n AS BIGINT) AS n_samples,
        |  round(CAST(s AS DOUBLE) / n, 4) AS mean_decoded
        |FROM m ORDER BY doc_id""".stripMargin,
    "mm_resample" ->
      // 2x linear-interpolation audio upsample through the real WAV
      // codec loop (decode -> interpolate -> re-encode -> decode):
      // out[2i] = s(i), out[2i+1] = (s(i) + s(i+1)) // 2 (truncating,
      // = the kernel's Java int division), length 2n-1; the oracle
      // replays the interpolation from the closed-form generator
      // s(i) = ((id*31 + i*17) % 2001) - 1000
      """WITH a AS (SELECT doc_id, 200 + (doc_id % 5) * 100 AS n FROM documents),
        |r AS (
        |  SELECT a.doc_id, a.n,
        |    CASE WHEN t.j % 2 = 0
        |      THEN ((a.doc_id * 31 + (t.j // 2) * 17) % 2001) - 1000
        |      ELSE ((((a.doc_id * 31 + ((t.j - 1) // 2) * 17) % 2001) - 1000)
        |          + (((a.doc_id * 31 + ((t.j + 1) // 2) * 17) % 2001) - 1000)) // 2
        |    END AS v
        |  FROM a, LATERAL unnest(range(0, 2 * a.n - 1)) AS t(j)
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_in, CAST(2 * n - 1 AS BIGINT) AS n_out,
        |  CAST(16000 AS BIGINT) AS rate_out,
        |  round(CAST(sum(abs(v)) AS DOUBLE) / (2 * n - 1), 4) AS mean_abs_out
        |FROM r GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      // nearest-neighbor resize through the real PNG codec loop
      // (decode -> resample -> encode -> decode): target pixel (x,y)
      // maps to source (sx, sy) with sy = (y*h)//h2, sx = (x*w)//w2 —
      // exactly Codecs.nnResample — so the oracle recomputes the
      // resized means from the generator without any codec
      """WITH ids AS (SELECT doc_id FROM documents),
        |im AS (
        |  SELECT doc_id, 12 + (doc_id % 5) * 4 AS w, 12 + (doc_id % 7) * 4 AS h,
        |         8 + (doc_id % 3) * 2 AS w2, 6 + (doc_id % 4) * 2 AS h2
        |  FROM ids
        |), px AS (
        |  SELECT doc_id, w2, h2,
        |    ((((p.p // w2) * h) // h2) * w + (((p.p % w2) * w) // w2)) * 3 AS base
        |  FROM im, LATERAL unnest(range(0, w2 * h2)) AS p(p)
        |), s AS (
        |  SELECT doc_id, w2, h2,
        |    sum((doc_id * 11 + (base + 0) * 29) % 256) AS sr,
        |    sum((doc_id * 11 + (base + 1) * 29) % 256) AS sg,
        |    sum((doc_id * 11 + (base + 2) * 29) % 256) AS sb
        |  FROM px GROUP BY doc_id, w2, h2
        |)
        |SELECT doc_id, CAST(w2 AS INT) AS width, CAST(h2 AS INT) AS height,
        |  round(CAST(sr AS DOUBLE) / (w2 * h2), 4) AS mean_r,
        |  round(CAST(sg AS DOUBLE) / (w2 * h2), 4) AS mean_g,
        |  round(CAST(sb AS DOUBLE) / (w2 * h2), 4) AS mean_b
        |FROM s ORDER BY doc_id""".stripMargin,
    "mm_png" ->
      // PNG is lossless: decoded pixels == the closed-form generator
      // rgb[j] = (doc_id*11 + j*29) % 256, so the oracle recomputes the
      // per-channel means arithmetically. Any decode defect (chunk
      // walk, CRC, inflate, unfiltering) shifts a mean and hash-fails.
      """WITH ids AS (SELECT doc_id FROM documents),
        |im AS (
        |  SELECT doc_id, 12 + (doc_id % 5) * 4 AS w, 12 + (doc_id % 7) * 4 AS h
        |  FROM ids
        |), s AS (
        |  SELECT im.doc_id, im.w, im.h,
        |    sum(CASE WHEN t.j % 3 = 0 THEN (im.doc_id * 11 + t.j * 29) % 256 ELSE 0 END) AS sr,
        |    sum(CASE WHEN t.j % 3 = 1 THEN (im.doc_id * 11 + t.j * 29) % 256 ELSE 0 END) AS sg,
        |    sum(CASE WHEN t.j % 3 = 2 THEN (im.doc_id * 11 + t.j * 29) % 256 ELSE 0 END) AS sb
        |  FROM im, LATERAL unnest(range(0, 3 * im.w * im.h)) AS t(j)
        |  GROUP BY im.doc_id, im.w, im.h
        |)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  round(CAST(sr AS DOUBLE) / (w * h), 4) AS mean_r,
        |  round(CAST(sg AS DOUBLE) / (w * h), 4) AS mean_g,
        |  round(CAST(sb AS DOUBLE) / (w * h), 4) AS mean_b,
        |  CAST(3 * w * h AS BIGINT) AS decoded_bytes
        |FROM s ORDER BY doc_id""".stripMargin,
    "mm_phash" ->
      // dHash perceptual near-dup: the oracle replays the WHOLE chain
      // closed-form — generator pixels -> 9x8 nn luma grid -> gradient
      // bits -> four 16-bit band keys -> sorted-neighborhood lead
      // pairing per band bucket -> bit_count hamming. Any defect in
      // the real decode, the grid sampling, or the banding hash-fails.
      """WITH im AS (
        |  SELECT doc_id, 12 + (doc_id % 5) * 4 AS w, 12 + (doc_id % 7) * 4 AS h
        |  FROM documents
        |), g AS (
        |  SELECT im.doc_id, t.i // 9 AS gy, t.i % 9 AS gx,
        |    299 * ((im.doc_id*11 + (3*((((t.i//9)*im.h)//8)*im.w + ((t.i%9)*im.w)//9))*29) % 256)
        |    + 587 * ((im.doc_id*11 + (3*((((t.i//9)*im.h)//8)*im.w + ((t.i%9)*im.w)//9)+1)*29) % 256)
        |    + 114 * ((im.doc_id*11 + (3*((((t.i//9)*im.h)//8)*im.w + ((t.i%9)*im.w)//9)+2)*29) % 256) AS l
        |  FROM im, LATERAL unnest(range(0, 72)) t(i)
        |), bits AS (
        |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit
        |  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND b.l > a.l
        |), sig AS (
        |  SELECT im.doc_id,
        |    COALESCE(sum(CASE WHEN bit < 16 THEN (CAST(1 AS BIGINT) << bit) END), 0) AS b0,
        |    COALESCE(sum(CASE WHEN bit >= 16 AND bit < 32 THEN (CAST(1 AS BIGINT) << (bit-16)) END), 0) AS b1,
        |    COALESCE(sum(CASE WHEN bit >= 32 AND bit < 48 THEN (CAST(1 AS BIGINT) << (bit-32)) END), 0) AS b2,
        |    COALESCE(sum(CASE WHEN bit >= 48 THEN (CAST(1 AS BIGINT) << (bit-48)) END), 0) AS b3
        |  FROM im LEFT JOIN bits ON bits.doc_id = im.doc_id
        |  GROUP BY im.doc_id
        |), bands AS (
        |  SELECT doc_id, b0, b1, b2, b3, t.band,
        |    CASE t.band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
        |  FROM sig, (SELECT unnest(range(4)) AS band) t
        |), nbr AS (
        |  SELECT doc_id AS doc_a, b0, b1, b2, b3,
        |    lead(doc_id) OVER w AS doc_b,
        |    lead(b0) OVER w AS nb0, lead(b1) OVER w AS nb1,
        |    lead(b2) OVER w AS nb2, lead(b3) OVER w AS nb3
        |  FROM bands WINDOW w AS (PARTITION BY band, key ORDER BY doc_id)
        |), p AS (
        |  SELECT DISTINCT doc_a, doc_b,
        |    bit_count(xor(b0, nb0)) + bit_count(xor(b1, nb1))
        |    + bit_count(xor(b2, nb2)) + bit_count(xor(b3, nb3)) AS hamming
        |  FROM nbr WHERE doc_b IS NOT NULL
        |)
        |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        |FROM p WHERE hamming <= 10 ORDER BY doc_a, doc_b""".stripMargin,
    "mm_phash_incremental" ->
      // incremental image dedup: batch docs (doc_id % 10 = 0) probe
      // the standing corpus signatures on shared band keys; nearest
      // partner by (hamming, old_id); the corpus never self-joins
      """WITH im AS (
        |  SELECT doc_id, 12 + (doc_id % 5) * 4 AS w, 12 + (doc_id % 7) * 4 AS h
        |  FROM documents
        |), g AS (
        |  SELECT im.doc_id, t.i // 9 AS gy, t.i % 9 AS gx,
        |    299 * ((im.doc_id*11 + (3*((((t.i//9)*im.h)//8)*im.w + ((t.i%9)*im.w)//9))*29) % 256)
        |    + 587 * ((im.doc_id*11 + (3*((((t.i//9)*im.h)//8)*im.w + ((t.i%9)*im.w)//9)+1)*29) % 256)
        |    + 114 * ((im.doc_id*11 + (3*((((t.i//9)*im.h)//8)*im.w + ((t.i%9)*im.w)//9)+2)*29) % 256) AS l
        |  FROM im, LATERAL unnest(range(0, 72)) t(i)
        |), bits AS (
        |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit
        |  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND b.l > a.l
        |), sig AS MATERIALIZED (
        |  SELECT im.doc_id,
        |    COALESCE(sum(CASE WHEN bit < 16 THEN (CAST(1 AS BIGINT) << bit) END), 0) AS b0,
        |    COALESCE(sum(CASE WHEN bit >= 16 AND bit < 32 THEN (CAST(1 AS BIGINT) << (bit-16)) END), 0) AS b1,
        |    COALESCE(sum(CASE WHEN bit >= 32 AND bit < 48 THEN (CAST(1 AS BIGINT) << (bit-32)) END), 0) AS b2,
        |    COALESCE(sum(CASE WHEN bit >= 48 THEN (CAST(1 AS BIGINT) << (bit-48)) END), 0) AS b3
        |  FROM im LEFT JOIN bits ON bits.doc_id = im.doc_id
        |  GROUP BY im.doc_id
        |), bands AS (
        |  SELECT doc_id, b0, b1, b2, b3, t.band,
        |    CASE t.band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
        |  FROM sig, (SELECT unnest(range(4)) AS band) t
        |), cand AS (
        |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id,
        |    n.b0 AS nb0, n.b1 AS nb1, n.b2 AS nb2, n.b3 AS nb3,
        |    o.b0 AS ob0, o.b1 AS ob1, o.b2 AS ob2, o.b3 AS ob3
        |  FROM bands n JOIN bands o ON o.band = n.band AND o.key = n.key
        |  WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0
        |), top AS (
        |  SELECT new_id, old_id, hamming,
        |    row_number() OVER (PARTITION BY new_id ORDER BY hamming, old_id) AS rn
        |  FROM (
        |    SELECT new_id, old_id,
        |      bit_count(xor(nb0, ob0)) + bit_count(xor(nb1, ob1))
        |      + bit_count(xor(nb2, ob2)) + bit_count(xor(nb3, ob3)) AS hamming
        |    FROM cand)
        |  WHERE hamming <= 10
        |)
        |SELECT d.doc_id, t.old_id AS dup_of, CAST(t.hamming AS BIGINT) AS hamming,
        |  t.old_id IS NULL AS keep
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
        |LEFT JOIN (SELECT * FROM top WHERE rn = 1) t ON t.new_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "pipeline_mm_curation" ->
      // the multimodal curation capstone: dHash near-dup drop (higher
      // doc_id of each near pair), text-quality gate, per-resolution
      // manifest — the ENTIRE cross-family chain replayed closed-form
      """WITH im AS (
        |  SELECT doc_id, 12 + (doc_id % 5) * 4 AS w, 12 + (doc_id % 7) * 4 AS h
        |  FROM documents
        |), g AS (
        |  SELECT im.doc_id, t.i // 9 AS gy, t.i % 9 AS gx,
        |    299 * ((im.doc_id*11 + (3*((((t.i//9)*im.h)//8)*im.w + ((t.i%9)*im.w)//9))*29) % 256)
        |    + 587 * ((im.doc_id*11 + (3*((((t.i//9)*im.h)//8)*im.w + ((t.i%9)*im.w)//9)+1)*29) % 256)
        |    + 114 * ((im.doc_id*11 + (3*((((t.i//9)*im.h)//8)*im.w + ((t.i%9)*im.w)//9)+2)*29) % 256) AS l
        |  FROM im, LATERAL unnest(range(0, 72)) t(i)
        |), bits AS (
        |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit
        |  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND b.l > a.l
        |), sig AS (
        |  SELECT im.doc_id,
        |    COALESCE(sum(CASE WHEN bit < 16 THEN (CAST(1 AS BIGINT) << bit) END), 0) AS b0,
        |    COALESCE(sum(CASE WHEN bit >= 16 AND bit < 32 THEN (CAST(1 AS BIGINT) << (bit-16)) END), 0) AS b1,
        |    COALESCE(sum(CASE WHEN bit >= 32 AND bit < 48 THEN (CAST(1 AS BIGINT) << (bit-32)) END), 0) AS b2,
        |    COALESCE(sum(CASE WHEN bit >= 48 THEN (CAST(1 AS BIGINT) << (bit-48)) END), 0) AS b3
        |  FROM im LEFT JOIN bits ON bits.doc_id = im.doc_id
        |  GROUP BY im.doc_id
        |), bands AS (
        |  SELECT doc_id, b0, b1, b2, b3, t.band,
        |    CASE t.band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS key
        |  FROM sig, (SELECT unnest(range(4)) AS band) t
        |), nbr AS (
        |  SELECT doc_id AS doc_a, b0, b1, b2, b3,
        |    lead(doc_id) OVER w AS doc_b,
        |    lead(b0) OVER w AS nb0, lead(b1) OVER w AS nb1,
        |    lead(b2) OVER w AS nb2, lead(b3) OVER w AS nb3
        |  FROM bands WINDOW w AS (PARTITION BY band, key ORDER BY doc_id)
        |), p AS (
        |  SELECT DISTINCT doc_a, doc_b,
        |    bit_count(xor(b0, nb0)) + bit_count(xor(b1, nb1))
        |    + bit_count(xor(b2, nb2)) + bit_count(xor(b3, nb3)) AS hamming
        |  FROM nbr WHERE doc_b IS NOT NULL
        |), dropped AS (
        |  SELECT DISTINCT doc_b AS doc_id FROM p WHERE hamming <= 10
        |), feat AS (
        |  SELECT d.doc_id,
        |    regexp_split_to_array(trim(lower(d.text)), '\s+') AS toks,
        |    CAST(length(d.text) - length(regexp_replace(d.text, '[.,!?;:]', '', 'g')) AS DOUBLE)
        |      / length(d.text) AS punct_ratio
        |  FROM documents d LEFT JOIN dropped ON dropped.doc_id = d.doc_id
        |  WHERE dropped.doc_id IS NULL
        |), q AS (
        |  SELECT doc_id,
        |    least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 0.5
        |    + least(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |        / len(toks) * 5.0, 1.0) * 0.3
        |    + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2 AS q
        |  FROM feat
        |)
        |SELECT CAST(im.w AS INT) AS width, CAST(im.h AS INT) AS height,
        |  count(*) AS n_docs, round(avg(q.q) + 1e-9, 4) AS avg_quality
        |FROM q JOIN im ON im.doc_id = q.doc_id
        |WHERE q.q >= 0.5
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mm_frames" ->
      """WITH d AS (SELECT doc_id, strlen(text) AS nb FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, CAST(i AS INT) AS frame_idx, CAST(i * 64 AS BIGINT) AS "offset",
        |    CAST(greatest(least(64, nb - i * 64), 0) AS INT) AS n_bytes
        |  FROM d, LATERAL unnest(range(0, nb // 64 + 1, 4)) AS t(i)
        |)
        |SELECT doc_id, frame_idx, "offset", n_bytes FROM f
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
