package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.ops._
import graft.sim.Similarity
import graft.text.TextOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 appears as a named query over the
  * parquet test tables plus an equivalent DuckDB SQL oracle. Query names are
  * prefixed with the §2 operator id they realize.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The drainer apply path in miniature (SURVEY.md §3.2): change envelope →
    * event filter → k-way merge → per-PK log compaction. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Cdc.compactByPk(Cdc.kwayMerge(Cdc.pumpSources(spark, dir))
      .drop("source_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- CDC core (SURVEY §2.2, §2.5) --
    "m1_changes"       -> ((s, d) => Cdc.changes(s, d)),
    "a1_compact_pk"    -> ((s, d) => Cdc.compactByPk(Cdc.changes(s, d))),
    "t2_kway_merge"    -> ((s, d) => Cdc.kwayMergeQuery(s, d)),
    "t3_watermarks"    -> ((s, d) => Cdc.watermarks(s, d)),
    "t1_pc_match"      -> ((s, d) => Cdc.pcMatch(s, d)),
    "snapshot_diff"    -> ((s, d) => Cdc.snapshotDiff(s, d)),
    // -- filters / routing (SURVEY §2.3) --
    "f1_allow_block"   -> ((s, d) => Filters.allowBlock(s, d)),
    "f2_event_filter"  -> ((s, d) => Filters.eventTypeFilter(s, d)),
    "f3_ignore_ts"     -> ((s, d) => Filters.ignoreCommitTs(s, d)),
    "f4_loopback"      -> ((s, d) => Filters.loopbackFilter(s, d)),
    "f5_ddl_skip"      -> ((s, d) => Filters.ddlSkip(s, d)),
    "f6_truncate_drop" -> ((s, d) => Filters.truncateDrop(s, d)),
    "f7_writable_cols" -> ((s, d) => Filters.writableColumns(s, d)),
    "f9_table_router"  -> ((s, d) => Filters.tableRouter(s, d)),
    "f10_repeated_skip"-> ((s, d) => Filters.repeatedSkip(s, d)),
    "s6_ts_range_scan" -> ((s, d) => Filters.tsRangeScan(s, d)),
    // -- translators (SURVEY §2.4) --
    "m2_kafka_encode"  -> ((s, d) => Translators.kafkaEncode(s, d)),
    "m3_pb_encode"     -> ((s, d) => Translators.pbEncode(s, d)),
    "m4_oracle_dialect"-> ((s, d) => Translators.oracleDialect(s, d)),
    "m6_typed_decode"  -> ((s, d) => Translators.typedDecode(s, d)),
    "m7_sql_text"      -> ((s, d) => Translators.sqlTextGen(s, d)),
    "m8_ddl_rewrite"   -> ((s, d) => Translators.ddlRewrite(s, d)),
    // -- parallel dispatch (SURVEY §2.6) --
    "p1_conflict_groups" -> ((s, d) => Causality.conflictGroups(s, d)),
    // -- transforms / metrics (SURVEY §2.2, §2.4, §2.5, §2.6) --
    "t5_schema_version"-> ((s, d) => Transforms.schemaVersion(s, d)),
    "t7_default_fill"  -> ((s, d) => Transforms.defaultFill(s, d)),
    "t8_update_images" -> ((s, d) => Transforms.updateImages(s, d)),
    "t9_seq_restore"   -> ((s, d) => Transforms.sequenceRestore(s, d)),
    "t9_interleave"    -> ((s, d) => Transforms.seqInterleave(s, d)),
    "scd2_history"     -> ((s, d) => Transforms.scd2(s, d)),
    "range_overlap"    -> ((s, d) => graft.ops.RangeJoin.sessionOverlap(s, d)),
    "m9_value_format"  -> ((s, d) => Transforms.valueFormat(s, d)),
    // -- MySQL type-domain fidelity (SURVEY §1.3, §2.4) --
    "m9_decimal38"     -> ((s, d) => TypeDomain.decimal38(s, d)),
    "m9_unsigned_bit"  -> ((s, d) => TypeDomain.unsignedBit(s, d)),
    "m9_enum_set"      -> ((s, d) => TypeDomain.enumSet(s, d)),
    "m9_tz_format"     -> ((s, d) => TypeDomain.tzFormat(s, d)),
    "m5_ddl_parse"     -> ((s, d) => Ddl.ddlParse(s, d)),
    "t2_merge_quality" -> ((s, d) => Cdc.mergeQuality(s, d)),
    "a2_hash_dispatch" -> ((s, d) => Transforms.hashDispatch(s, d)),
    "a3_bulk_batches"  -> ((s, d) => Transforms.bulkBatches(s, d)),
    "a4_event_metrics" -> ((s, d) => Transforms.eventMetrics(s, d)),
    "a5_ack_window_min"-> ((s, d) => Transforms.ackWindowMin(s, d)),
    "a6_applied_ts"    -> ((s, d) => Transforms.appliedTs(s, d)),
    "sessionize"       -> ((s, d) => Transforms.sessionize(s, d)),
    "det_sample"       -> ((s, d) => Filters.detSample(s, d)),
    "asof_feature_join"-> ((s, d) => Asof.featureAsofQuery(s, d)),
    // -- relational surface (SURVEY §2.8) --
    "q1_pricing_summary"  -> ((s, d) => Relational.pricingSummary(s, d)),
    "q3_shipping_priority"-> ((s, d) => Relational.shippingPriority(s, d)),
    "q5_local_supplier"   -> ((s, d) => Relational.localSupplierVolume(s, d)),
    "q6_revenue_forecast" -> ((s, d) => Relational.revenueForecast(s, d)),
    "q14_promo_revenue"   -> ((s, d) => Relational.promoRevenue(s, d)),
    "q18_large_orders"    -> ((s, d) => Relational.largeOrders(s, d)),
    "semi_big_spenders"   -> ((s, d) => Relational.bigSpenders(s, d)),
    "anti_dormant"        -> ((s, d) => Relational.dormantCustomers(s, d)),
    "topk_per_group"      -> ((s, d) => Relational.topKPerGroup(s, d)),
    "rollup_metrics"      -> ((s, d) => Relational.rollupMetrics(s, d)),
    "pivot_daily_ops"     -> ((s, d) => Relational.pivotDailyOps(s, d)),
    "value_percentiles"   -> ((s, d) => Relational.valuePercentiles(s, d)),
    "window_funcs"        -> ((s, d) => Relational.windowFuncs(s, d)),
    // -- training-data pipeline: dedup (BASELINE.json north star) --
    "dedup_exact"         -> ((s, d) => Dedup.exact(s, d)),
    "dedup_minhash_sigs"  -> ((s, d) => Dedup.minhashSignatures(s, d)),
    "dedup_minhash_lsh"   -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_simhash"       -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_lsh_clusters"  -> ((s, d) => Dedup.lshClusters(s, d)),
    "dedup_simhash_near"  -> ((s, d) => Dedup.simhashNear(s, d)),
    "corpus_curate"       -> ((s, d) => TextOps.curateCorpus(s, d)),
    "text_ngram_freq"     -> ((s, d) => TextOps.ngramFreq(s, d)),
    "text_tfidf"          -> ((s, d) => TextOps.tfidf(s, d)),
    "text_bm25"           -> ((s, d) => TextOps.bm25(s, d)),
    "text_repetition"     -> ((s, d) => TextOps.repetition(s, d)),
    "text_pii_redact"     -> ((s, d) => TextOps.piiRedact(s, d)),
    "strat_sample"        -> ((s, d) => TextOps.stratifiedSample(s, d)),
    "sketch_hll"          -> ((s, d) => graft.sketch.Sketches.hllTokens(s, d)),
    "sketch_cm_topk"      -> ((s, d) => graft.sketch.Sketches.cmTopK(s, d)),
    "sketch_bloom"        -> ((s, d) => graft.sketch.Sketches.bloomSemiJoin(s, d)),
    "pack_chunks"         -> ((s, d) => TextOps.packChunks(s, d)),
    // -- similarity search --
    "ann_topk_cosine"     -> ((s, d) => Similarity.annTopK(s, d)),
    "ann_ivf_topk"        -> ((s, d) => Similarity.ivfTopK(s, d)),
    // rows-only check: Lloyd-trained means are float-sum-order sensitive,
    // so no cross-engine hash oracle exists; recall is spec-asserted
    "ann_ivf_trained"     -> ((s, d) => Similarity.ivfTopKTrained(s, d)),
    "ann_lsh_buckets"     -> ((s, d) => Similarity.lshBuckets(s, d)),
    "emb_quantize"        -> ((s, d) => Similarity.quantize(s, d)),
    "ann_lsh_near_dup"    -> ((s, d) => Similarity.lshNearDup(s, d)),
    // -- text analysis --
    "text_token_counts"   -> ((s, d) => TextOps.tokenCounts(s, d)),
    "text_quality"        -> ((s, d) => TextOps.qualityScore(s, d)),
    "text_lang_id"        -> ((s, d) => TextOps.langId(s, d)),
    "text_fingerprints"   -> ((s, d) => TextOps.fingerprints(s, d)),
    // -- multimodal plumbing --
    "mm_meta"             -> ((s, d) => TextOps.multimodalMeta(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "m1_changes"        -> Cdc.changesCte,
    "a1_compact_pk"     -> Cdc.compactSql,
    "t2_kway_merge"     -> Cdc.kwayMergeSql,
    "t3_watermarks"     -> Cdc.watermarksSql,
    "t1_pc_match"       -> Cdc.pcMatchSql,
    "snapshot_diff"     -> Cdc.snapshotDiffSql,
    "f1_allow_block"    -> Filters.allowBlockSql,
    "f2_event_filter"   -> Filters.eventTypeFilterSql,
    "f3_ignore_ts"      -> Filters.ignoreCommitTsSql,
    "f4_loopback"       -> Filters.loopbackFilterSql,
    "f5_ddl_skip"       -> Filters.ddlSkipSql,
    "f6_truncate_drop"  -> Filters.truncateDropSql,
    "f7_writable_cols"  -> Filters.writableColumnsSql,
    "f9_table_router"   -> Filters.tableRouterSql,
    "f10_repeated_skip" -> Filters.repeatedSkipSql,
    "s6_ts_range_scan"  -> Filters.tsRangeScanSql,
    "m2_kafka_encode"   -> Translators.kafkaEncodeSql,
    "m3_pb_encode"      -> Translators.pbEncodeSql,
    "m4_oracle_dialect" -> Translators.oracleDialectSql,
    "m6_typed_decode"   -> Translators.typedDecodeSql,
    "m7_sql_text"       -> Translators.sqlTextGenSql,
    "m8_ddl_rewrite"    -> Translators.ddlRewriteSql,
    "p1_conflict_groups"-> Causality.conflictGroupsSql,
    "t5_schema_version" -> Transforms.schemaVersionSql,
    "t7_default_fill"   -> Transforms.defaultFillSql,
    "t8_update_images"  -> Transforms.updateImagesSql,
    "t9_seq_restore"    -> Transforms.sequenceRestoreSql,
    "t9_interleave"     -> Transforms.seqInterleaveSql,
    "scd2_history"      -> Transforms.scd2Sql,
    "range_overlap"     -> graft.ops.RangeJoin.sessionOverlapSql,
    "m9_value_format"   -> Transforms.valueFormatSql,
    "m9_decimal38"      -> TypeDomain.decimal38Sql,
    "m9_unsigned_bit"   -> TypeDomain.unsignedBitSql,
    "m9_enum_set"       -> TypeDomain.enumSetSql,
    "m9_tz_format"      -> TypeDomain.tzFormatSql,
    "m5_ddl_parse"      -> Ddl.ddlParseSql,
    "t2_merge_quality"  -> Cdc.mergeQualitySql,
    "a2_hash_dispatch"  -> Transforms.hashDispatchSql,
    "a3_bulk_batches"   -> Transforms.bulkBatchesSql,
    "a4_event_metrics"  -> Transforms.eventMetricsSql,
    "a5_ack_window_min" -> Transforms.ackWindowMinSql,
    "a6_applied_ts"     -> Transforms.appliedTsSql,
    "sessionize"        -> Transforms.sessionizeSql,
    "det_sample"        -> Filters.detSampleSql,
    "asof_feature_join" -> Asof.featureAsofSql,
    "q1_pricing_summary"   -> Relational.pricingSummarySql,
    "q3_shipping_priority" -> Relational.shippingPrioritySql,
    "q5_local_supplier"    -> Relational.localSupplierVolumeSql,
    "q6_revenue_forecast"  -> Relational.revenueForecastSql,
    "q14_promo_revenue"    -> Relational.promoRevenueSql,
    "q18_large_orders"     -> Relational.largeOrdersSql,
    "semi_big_spenders"    -> Relational.bigSpendersSql,
    "anti_dormant"         -> Relational.dormantCustomersSql,
    "topk_per_group"       -> Relational.topKPerGroupSql,
    "rollup_metrics"       -> Relational.rollupMetricsSql,
    "pivot_daily_ops"      -> Relational.pivotDailyOpsSql,
    "value_percentiles"    -> Relational.valuePercentilesSql,
    "window_funcs"         -> Relational.windowFuncsSql,
    "dedup_exact"          -> Dedup.exactSql,
    "dedup_minhash_sigs"   -> Dedup.minhashSignaturesSql,
    "dedup_minhash_lsh"    -> Dedup.minhashLshSql,
    "dedup_ngram_jaccard"  -> Dedup.ngramJaccardSql,
    "dedup_simhash"        -> Dedup.simhashSql,
    "dedup_lsh_clusters"   -> Dedup.lshClustersSql,
    "dedup_simhash_near"   -> Dedup.simhashNearSql,
    "corpus_curate"        -> TextOps.curateCorpusSql,
    "text_ngram_freq"      -> TextOps.ngramFreqSql,
    "text_tfidf"           -> TextOps.tfidfSql,
    "text_bm25"            -> TextOps.bm25Sql(),
    "text_repetition"      -> TextOps.repetitionSql(),
    "text_pii_redact"      -> TextOps.piiRedactSql,
    "strat_sample"         -> TextOps.stratifiedSampleSql(),
    "sketch_hll"           -> graft.sketch.Sketches.hllTokensSql,
    "sketch_cm_topk"       -> graft.sketch.Sketches.cmTopKSql(),
    "sketch_bloom"         -> graft.sketch.Sketches.bloomSemiJoinSql,
    "pack_chunks"          -> TextOps.packChunksSql(),
    "ann_topk_cosine"      -> Similarity.annTopKSql(),
    "ann_ivf_topk"         -> Similarity.ivfTopKSql(),
    "ann_lsh_buckets"      -> Similarity.lshBucketsSql,
    "emb_quantize"         -> Similarity.quantizeSql,
    "ann_lsh_near_dup"     -> Similarity.lshNearDupSql(),
    "text_token_counts"    -> TextOps.tokenCountsSql,
    "text_quality"         -> TextOps.qualityScoreSql,
    "text_lang_id"         -> TextOps.langIdSql,
    "text_fingerprints"    -> TextOps.fingerprintsSql,
    "mm_meta"              -> TextOps.multimodalMetaSql,
  )
}
