package graft

import graft.queries.{EventQueries => EQ, EventQueries2 => EQ2, EventQueries3 => EQ3, EventQueries4 => EQ4, LlmQueries => LQ, TpchQueries => TQ}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 expressed
  * through the graft library; [[oracleSql]] states the identical algorithm
  * in DuckDB SQL over the same parquet tables. Column names and row order
  * are aligned pairwise.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * (Avoids the events table so it runs under any session config.) */
  def entry(spark: SparkSession): DataFrame =
    TQ.pricingSummary(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map[String, Q](
    // -- analytical / bench headliners
    "q1_pricing_summary" -> TQ.pricingSummary,
    "q_revenue_by_nation" -> TQ.revenueByNation,
    "q_selective_scan" -> TQ.selectiveScan,
    "q_top_customer_per_nation" -> TQ.topCustomerPerNation,
    "q_revenue_region_nation" -> TQ.revenueByRegionNation,
    // -- InfluxQL aggregate family (SURVEY §2.5)
    "q_count_hour" -> ((s, d) => EQ.aggHour(s, d, "count")),
    "q_sum_hour" -> ((s, d) => EQ.aggHour(s, d, "sum")),
    "q_mean_hour" -> ((s, d) => EQ.aggHour(s, d, "mean")),
    "q_median_day" -> (EQ.medianDay _),
    "q_mode_day" -> (EQ.modeDay _),
    "q_spread_day" -> (EQ.spreadDay _),
    "q_stddev_day" -> (EQ.stddevDay _),
    "q_distinct" -> (EQ.distinctVals _),
    "q_first_day" -> (EQ.firstDay _),
    "q_last_day" -> (EQ.lastDay _),
    "q_min_day" -> (EQ.minDay _),
    "q_max_day" -> (EQ.maxDay _),
    "q_percentile90_day" -> (EQ.percentile90Day _),
    "q_top3" -> (EQ.top3 _),
    "q_bottom3" -> (EQ.bottom3 _),
    // -- stream transformations (SURVEY §2.5/2.6)
    "q_elapsed" -> (EQ.elapsedQ _),
    "q_difference" -> (EQ.differenceQ _),
    "q_derivative" -> (EQ.derivativeQ _),
    "q_moving_average" -> (EQ.movingAverageQ _),
    "q_cumulative_sum" -> (EQ.cumulativeSumQ _),
    // -- projection/filter/eval (SURVEY §2.2)
    "q_where_eval" -> (EQ.whereEvalQ _),
    // -- forecasting (custom Aggregator; no SQL equivalent)
    "q_holt_winters" -> (EQ.holtWintersQ _),
    // -- reshaping / state / join / alert (SURVEY §2.2/2.3/2.6/2.7)
    "q_change_detect" -> (EQ2.changeDetectQ _),
    "q_state_duration" -> (EQ2.stateDurationQ _),
    "q_state_count" -> (EQ2.stateCountQ _),
    "q_sample" -> (EQ2.sampleQ _),
    "q_shift" -> (EQ2.shiftQ _),
    "q_default_delete" -> (EQ2.defaultDeleteQ _),
    "q_union" -> (EQ2.unionQ _),
    "q_join_tolerance" -> (EQ2.joinToleranceQ _),
    "q_join_ordered" -> (EQ2.joinOrderedQ _),
    "q_alert_levels" -> (EQ2.alertLevelsQ _),
    "q_alert_state_changes" -> (EQ2.alertStateChangesQ _),
    "q_window_sliding" -> (EQ2.windowSlidingQ _),
    "q_flatten" -> (EQ2.flattenQ _),
    "q_combine" -> (EQ2.combineQ _),
    "q_sigma" -> (EQ2.sigmaQ _),
    // -- sideload / deadman / alert templating (SURVEY §2.6/2.7)
    "q_sideload" -> (EQ3.sideloadQ _),
    "q_deadman" -> (EQ3.deadmanQ _),
    "q_alert_message" -> (EQ3.alertMessageQ _),
    "q_window_perpoint" -> (EQ3.windowPerPointQ _),
    "q_sample_duration" -> (EQ3.sampleDurationQ _),
    "q_eval_quiet" -> (EQ3.evalQuietQ _),
    "q_fill_previous" -> (EQ3.fillPreviousQ _),
    "q_fill_linear" -> (EQ3.fillLinearQ _),
    // -- wave 4: aligned windows, k-combinations, batch scheduling
    "q_window_aligned" -> (EQ4.windowAlignedQ _),
    "q_combine_triples" -> (EQ4.combineTriplesQ _),
    "q_batch_periods" -> (EQ4.batchPeriodsQ _),
    "q_alert_all" -> (EQ4.alertAllQ _),
    "q_flatten_multi" -> (EQ4.flattenMultiQ _),
    "q_join_fill" -> (EQ4.joinFillQ _),
    "q_join_on" -> (EQ4.joinOnQ _),
    "q_alert_inhibit" -> (EQ4.alertInhibitQ _),
    "q_top_carry" -> (EQ4.topCarryQ _),
    "q_stateful_lambdas" -> (EQ4.statefulLambdasQ _),
    "q_window_count" -> (EQ4.windowCountQ _),
    // -- training-data pipeline operators (dedup / similarity / text / media)
    "q_dedup_exact" -> (LQ.dedupExactQ _),
    "q_dedup_minhash" -> (LQ.dedupMinhashQ _),
    "q_dedup_clusters" -> (LQ.dedupClustersQ _),
    "q_dedup_simhash" -> (LQ.dedupSimhashQ _),
    "q_dedup_ngram" -> (LQ.dedupNgramQ _),
    "q_decontaminate" -> (LQ.decontaminateQ _),
    "q_text_repetition" -> (LQ.textRepetitionQ _),
    "q_knn_ivfpq" -> (LQ.knnIvfPqQ _),
    "q_dedup_embedding" -> (LQ.dedupEmbeddingQ _),
    "q_knn_bruteforce" -> (LQ.knnBruteQ _),
    "q_knn_lsh" -> (LQ.knnLshQ _),
    "q_knn_ivf" -> (LQ.knnIvfQ _),
    "q_text_langid" -> (LQ.textLangidQ _),
    "q_text_quality" -> (LQ.textQualityQ _),
    "q_text_tokens" -> (LQ.textTokensQ _),
    "q_text_fingerprint" -> (LQ.textFingerprintQ _),
    "q_media_chunks" -> (LQ.mediaChunksQ _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> TQ.pricingSummarySql,
    "q_revenue_by_nation" -> TQ.revenueByNationSql,
    "q_selective_scan" -> TQ.selectiveScanSql,
    "q_top_customer_per_nation" -> TQ.topCustomerPerNationSql,
    "q_revenue_region_nation" -> TQ.revenueByRegionNationSql,
    "q_count_hour" -> EQ.aggHourSql("count"),
    "q_sum_hour" -> EQ.aggHourSql("sum"),
    "q_mean_hour" -> EQ.aggHourSql("mean"),
    "q_median_day" -> EQ.medianDaySql,
    "q_mode_day" -> EQ.modeDaySql,
    "q_spread_day" -> EQ.spreadDaySql,
    "q_stddev_day" -> EQ.stddevDaySql,
    "q_distinct" -> EQ.distinctValsSql,
    "q_first_day" -> EQ.firstDaySql,
    "q_last_day" -> EQ.lastDaySql,
    "q_min_day" -> EQ.minDaySql,
    "q_max_day" -> EQ.maxDaySql,
    "q_percentile90_day" -> EQ.percentile90DaySql,
    "q_top3" -> EQ.top3Sql,
    "q_bottom3" -> EQ.bottom3Sql,
    "q_elapsed" -> EQ.elapsedSql,
    "q_difference" -> EQ.differenceSql,
    "q_derivative" -> EQ.derivativeSql,
    "q_moving_average" -> EQ.movingAverageSql,
    "q_cumulative_sum" -> EQ.cumulativeSumSql,
    "q_where_eval" -> EQ.whereEvalSql,
    "q_change_detect" -> EQ2.changeDetectSql,
    "q_state_duration" -> EQ2.stateDurationSql,
    "q_state_count" -> EQ2.stateCountSql,
    "q_sample" -> EQ2.sampleSql,
    "q_shift" -> EQ2.shiftSql,
    "q_default_delete" -> EQ2.defaultDeleteSql,
    "q_union" -> EQ2.unionSql,
    "q_join_tolerance" -> EQ2.joinToleranceSql,
    "q_join_ordered" -> EQ2.joinOrderedSql,
    "q_alert_levels" -> EQ2.alertLevelsSql,
    "q_alert_state_changes" -> EQ2.alertStateChangesSql,
    "q_window_sliding" -> EQ2.windowSlidingSql,
    "q_flatten" -> EQ2.flattenSql,
    "q_combine" -> EQ2.combineSql,
    "q_sigma" -> EQ2.sigmaSql,
    "q_sideload" -> EQ3.sideloadSql,
    "q_deadman" -> EQ3.deadmanSql,
    "q_alert_message" -> EQ3.alertMessageSql,
    "q_window_perpoint" -> EQ3.windowPerPointSql,
    "q_sample_duration" -> EQ3.sampleDurationSql,
    "q_eval_quiet" -> EQ3.evalQuietSql,
    "q_fill_previous" -> EQ3.fillPreviousSql,
    "q_fill_linear" -> EQ3.fillLinearSql,
    "q_window_aligned" -> EQ4.windowAlignedSql,
    "q_combine_triples" -> EQ4.combineTriplesSql,
    "q_batch_periods" -> EQ4.batchPeriodsSql,
    "q_alert_all" -> EQ4.alertAllSql,
    "q_join_fill" -> EQ4.joinFillSql,
    "q_join_on" -> EQ4.joinOnSql,
    "q_alert_inhibit" -> EQ4.alertInhibitSql,
    "q_top_carry" -> EQ4.topCarrySql,
    "q_stateful_lambdas" -> EQ4.statefulLambdasSql,
    "q_window_count" -> EQ4.windowCountSql,
    "q_flatten_multi" -> EQ4.flattenMultiSql,
    "q_dedup_exact" -> LQ.dedupExactSql,
    "q_dedup_minhash" -> LQ.dedupMinhashSql,
    "q_dedup_clusters" -> LQ.dedupClustersSql,
    "q_dedup_simhash" -> LQ.dedupSimhashSql,
    "q_dedup_ngram" -> LQ.dedupNgramSql,
    "q_decontaminate" -> LQ.decontaminateSql,
    "q_text_repetition" -> LQ.textRepetitionSql,
    "q_knn_ivfpq" -> LQ.knnIvfPqSql,
    "q_dedup_embedding" -> LQ.dedupEmbeddingSql,
    "q_knn_bruteforce" -> LQ.knnBruteSql,
    "q_knn_lsh" -> LQ.knnLshSql,
    "q_knn_ivf" -> LQ.knnIvfSql,
    "q_text_langid" -> LQ.textLangidSql,
    "q_text_quality" -> LQ.textQualitySql,
    "q_text_tokens" -> LQ.textTokensSql,
    "q_text_fingerprint" -> LQ.textFingerprintSql,
    "q_media_chunks" -> LQ.mediaChunksSql
  )
}
