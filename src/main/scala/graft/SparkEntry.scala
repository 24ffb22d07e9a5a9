package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in [[Queries]]; each key here pairs a Spark
  * plan with DuckDB oracle SQL over the same parquet tables. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.tsdbDownsample1h(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TSDB operator inventory (engine-driven; SURVEY §2.2-§2.5, §2.8)
    "tsdb_downsample_1h" -> (Queries.tsdbDownsample1h _),
    "tsdb_rollup_downsample" -> (Queries.tsdbRollupDownsample _),
    "tsdb_final_agg" -> (Queries.tsdbFinalAgg _),
    "tsdb_raw_scan" -> (Queries.tsdbRawScan _),
    "tsdb_tag_filter" -> (Queries.tsdbTagFilter _),
    "tsdb_point_lookup" -> (Queries.tsdbPointLookup _),
    "tsdb_cursor_page" -> (Queries.tsdbCursorPage _),
    "tsdb_latest_version" -> (Queries.tsdbLatestVersion _),
    "tsdb_tombstones" -> (Queries.tsdbTombstones _),
    "tsdb_desc_scan" -> (Queries.tsdbDescScan _),
    "nbql_query_e2e" -> (Queries.nbqlQueryE2e _),
    "nbql_rate" -> (Queries.nbqlRate _),
    "nbql_delta" -> (Queries.nbqlDelta _),
    "nbql_correlate" -> (Queries.nbqlCorrelate _),
    "nbql_topk" -> (Queries.nbqlTopk _),
    "nbql_bottomk" -> (Queries.nbqlBottomk _),
    "show_metrics" -> (Queries.showMetrics _),
    "show_tag_values" -> (Queries.showTagValues _),
    "series_by_tags" -> (Queries.seriesByTags _),
    // Analytics / scale battery (SURVEY §2.6 + north star)
    "tpch_q1" -> (Queries.tpchQ1 _),
    "join_revenue_nation" -> (Queries.joinRevenueByNation _),
    "topk_per_group" -> (Queries.topKPerGroup _),
    "pushdown_scan" -> (Queries.pushdownScan _),
    // Training-data pipeline (dedup / similarity / text / multimodal)
    "doc_stats" -> (Queries.docStats _),
    "quality_probe_gram" -> (Queries.qualityProbeGram _),
    "quality_probe_score" -> (Queries.qualityProbeScore _),
    "lm_crossentropy" -> (Queries.lmCrossentropy _),
    "sample_per_source" -> (Queries.samplePerSource _),
    "doc_chunks" -> (Queries.docChunks _),
    "boilerplate_chunks" -> (Queries.boilerplateChunks _),
    "lang_id" -> (Queries.langId _),
    "dedup_exact" -> (Queries.dedupExact _),
    "dedup_jaccard_pairs" -> (Queries.dedupJaccardPairs _),
    "minhash_signatures" -> (Queries.minhashSignatures _),
    "dedup_minhash_lsh" -> (Queries.dedupMinhashLsh _),
    "simhash_sketches" -> (Queries.simhashSketches _),
    "simhash_neardup" -> (Queries.simhashNearDup _),
    "dedup_clusters" -> (Queries.dedupClusters _),
    "dedup_canonical" -> (Queries.dedupCanonical _),
    "dedup_incremental" -> (Queries.dedupIncremental _),
    "tfidf_topterms" -> (Queries.tfidfTopTerms _),
    "shard_assign" -> (Queries.shardAssign _),
    "ngram_topk" -> (Queries.ngramTopK _),
    "dataset_split" -> (Queries.datasetSplit _),
    "sample_stratified" -> (Queries.sampleStratified _),
    "mixture_sample" -> (Queries.mixtureSample _),
    "winnow_fingerprints" -> (Queries.winnowFingerprints _),
    "winnow_overlap_pairs" -> (Queries.winnowOverlapPairs _),
    "repeated_spans" -> (Queries.repeatedSpans _),
    "exact_substring_cut" -> (Queries.exactSubstringCut _),
    "decontaminate" -> (Queries.decontaminate _),
    "doc_repetition" -> (Queries.docRepetition _),
    "pii_scan" -> (Queries.piiScan _),
    "kmeans_assign" -> (Queries.kmeansAssign _),
    "embedding_quantize" -> (Queries.embeddingQuantize _),
    "embedding_topk" -> (Queries.embeddingTopK _),
    "embedding_neardup" -> (Queries.embeddingNearDup _),
    "embedding_neardup_hi" -> (Queries.embeddingNearDupHi _),
    "embedding_neardup_ivf" -> (Queries.embeddingNearDupIvf _),
    "semantic_dedup" -> (Queries.semanticDedup _),
    "embedding_norms" -> (Queries.embeddingNorms _),
    "ann_lsh_topk" -> (Queries.annLshTopK _),
    "ann_ivf_topk" -> (Queries.annIvfTopK _),
    "ann_pq_topk" -> (Queries.annPqTopK _),
    "ann_pq_topk_indexed" -> (Queries.annPqTopKIndexed _),
    "ann_pq_refine" -> (Queries.annPqRefine _),
    "multimodal_meta" -> (Queries.multimodalMeta _),
    "frame_sample" -> (Queries.frameSample _),
    "curate_lineage" -> (Queries.curateLineage _),
    // Extended operators (as-of join, sessionization, introspection)
    "asof_click_before_purchase" -> (Queries.asofClickBeforePurchase _),
    "range_join_attrib" -> (Queries.rangeJoinAttrib _),
    "sessionize_users" -> (Queries.sessionizeUsers _),
    "show_tag_keys" -> (Queries.showTagKeys _),
    "tsdb_empty_windows" -> (Queries.tsdbEmptyWindows _),
    "tsdb_fill_previous" -> (Queries.tsdbFillPrevious _),
    "tsdb_fill_linear" -> (Queries.tsdbFillLinear _),
    "ts_rate" -> (Queries.tsRate _),
    "ts_rate_split" -> (Queries.tsRateSplit _),
    "ts_rate_prefix" -> (Queries.tsRatePrefix _),
    "ts_delta" -> (Queries.tsDelta _),
    "tsdb_rollup_delta" -> (Queries.tsdbRollupDelta _),
    "ts_delta_by" -> (Queries.tsDeltaBy _),
    "tsdb_rollup_delta_by" -> (Queries.tsdbRollupDeltaBy _),
    "tsdb_rollup_twa" -> (Queries.tsdbRollupTwa _),
    "tsdb_rollup_predict" -> (Queries.tsdbRollupPredict _),
    "ts_irate" -> (Queries.tsIrate _),
    "ts_resets" -> (Queries.tsResets _),
    "ts_changes" -> (Queries.tsChanges _),
    "ts_resets_split" -> (Queries.tsResetsSplit _),
    "ts_resets_by" -> (Queries.tsResetsBy _),
    "ts_rate_by" -> (Queries.tsRateBy _),
    "tsdb_rollup_resets_by" -> (Queries.tsdbRollupResetsBy _),
    "tsdb_rollup_resets" -> (Queries.tsdbRollupResets _),
    "tsdb_rollup_changes" -> (Queries.tsdbRollupChanges _),
    "nbql_resets" -> (Queries.nbqlResets _),
    "ts_predict" -> (Queries.tsPredict _),
    "ts_deriv" -> (Queries.tsDeriv _),
    "ts_anomaly" -> (Queries.tsAnomaly _),
    "ts_anomaly_split" -> (Queries.tsAnomalySplit _),
    "ts_twa" -> (Queries.tsTwa _),
    "ts_twa_split" -> (Queries.tsTwaSplit _),
    "ts_cumsum" -> (Queries.tsCumsum _),
    "ts_ewma" -> (Queries.tsEwma _),
    "ts_holt" -> (Queries.tsHolt _),
    "ts_ewma_by" -> (Queries.tsEwmaBy _),
    "ts_holt_by" -> (Queries.tsHoltBy _),
    "tsdb_rollup_ewma" -> (Queries.tsdbRollupEwma _),
    "tsdb_rollup_holt" -> (Queries.tsdbRollupHolt _),
    "ts_correlate" -> (Queries.tsCorrelate _),
    "ts_cardinality" -> (Queries.tsCardinality _),
    "nbql_cardinality" -> (Queries.nbqlCardinality _),
    "nbql_ewma_by" -> (Queries.nbqlEwmaBy _),
    "ts_ratio" -> (Queries.tsRatio _),
    "ts_topk_series" -> (Queries.tsTopkSeries _),
    "tsdb_groupby_tag" -> (Queries.tsdbGroupByTag _),
    "tsdb_value_filter" -> (Queries.tsdbValueFilter _),
    "tsdb_tag_prefix" -> (Queries.tsdbTagPrefix _),
    "tsdb_metric_prefix" -> (Queries.tsdbMetricPrefix _),
    "zorder_scan" -> (Queries.zorderScan _),
    "tsdb_multifield_agg" -> (Queries.tsdbMultifieldAgg _),
    "distinct_users_per_type" -> (Queries.distinctUsersPerType _),
  )

  /** DuckDB-runnable oracle per query (same column names as the Spark side —
    * the driver sorts columns by name before hashing). */
  /** Shared by `ts_rate`/`ts_rate_split` — the split path is
    * bit-identical to the unsplit plan, so both hash against ONE oracle. */
  private val TsRateSql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
      |  FROM events WHERE event_type = 'purchase'),
      |l AS (
      |  SELECT u, t, value,
      |    lag(value) OVER (PARTITION BY u ORDER BY t) AS pv,
      |    lag(t) OVER (PARTITION BY u ORDER BY t) AS pt
      |  FROM s)
      |SELECT u AS "user", t AS "timestamp", value,
      |  CASE WHEN value < pv THEN value ELSE value - pv END AS delta,
      |  (CASE WHEN value < pv THEN value ELSE value - pv END) * 1e9
      |    / CAST(t - pt AS DOUBLE) AS rate_per_sec
      |FROM l WHERE pv IS NOT NULL AND pt IS NOT NULL
      |ORDER BY 1, 2""".stripMargin

  /** Shared by `ts_delta`/`nbql_delta` (same analytic, API vs wire
    * path). */
  private val TsDeltaSql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
      |  FROM events WHERE event_type = 'purchase'),
      |l AS (
      |  SELECT u, t, value,
      |    lag(value) OVER (PARTITION BY u ORDER BY t) AS pv
      |  FROM s)
      |SELECT u AS "user", count(*) AS n_points,
      |  min(t) AS first_ts, max(t) AS last_ts,
      |  round(max_by(value, t) - min_by(value, t), 4) AS delta,
      |  round(coalesce(sum(CASE WHEN pv IS NULL THEN NULL
      |    WHEN value < pv THEN value ELSE value - pv END), 0), 4) AS increase
      |FROM l GROUP BY u ORDER BY 1""".stripMargin

  /** Shared by `ts_resets`/`tsdb_rollup_resets` (raw lag plan vs the
    * rollup-partial route): consecutive-pair decrease counts — exact
    * longs, hashed unrounded. */
  private val TsResetsSql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
      |  FROM events WHERE event_type = 'purchase'),
      |l AS (
      |  SELECT u, value,
      |    lag(value) OVER (PARTITION BY u ORDER BY t) AS pv
      |  FROM s)
      |SELECT u AS "user", count(*) AS n_points,
      |  count(CASE WHEN pv IS NOT NULL AND value < pv THEN 1 END) AS resets
      |FROM l GROUP BY u ORDER BY 1""".stripMargin

  /** Shared by `ts_resets_by`/`tsdb_rollup_resets_by` (raw windowed lag
    * plan vs the grouped rollup-partial route): per-day reset counts,
    * each pair in the LATER point's day — exact longs. */
  private val TsResetsBySql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
      |  FROM events WHERE event_type = 'purchase'),
      |l AS (
      |  SELECT u, t, value,
      |    lag(value) OVER (PARTITION BY u ORDER BY t) AS pv
      |  FROM s)
      |SELECT u AS "user", t - (t % 86400000000000) AS window_start,
      |  count(*) AS n_points,
      |  count(CASE WHEN pv IS NOT NULL AND value < pv THEN 1 END) AS resets
      |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shared by `ts_changes`/`tsdb_rollup_changes` — consecutive-pair
    * inequality counts. */
  private val TsChangesSql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
      |  FROM events WHERE event_type = 'purchase'),
      |l AS (
      |  SELECT u, value,
      |    lag(value) OVER (PARTITION BY u ORDER BY t) AS pv
      |  FROM s)
      |SELECT u AS "user", count(*) AS n_points,
      |  count(CASE WHEN pv IS NOT NULL AND value <> pv THEN 1 END) AS changes
      |FROM l GROUP BY u ORDER BY 1""".stripMargin

  /** Shared by `ts_delta_by`/`tsdb_rollup_delta_by` (raw analytic vs the
    * rollup-partial route): boundary pairs assigned to the LATER point's
    * day. */
  private val TsDeltaBySql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
      |  FROM events WHERE event_type = 'purchase'),
      |l AS (
      |  SELECT u, t, value,
      |    lag(value) OVER (PARTITION BY u ORDER BY t) AS pv
      |  FROM s),
      |w AS (
      |  SELECT u, t, value, t - (t % 86400000000000) AS ws,
      |    CASE WHEN pv IS NULL THEN NULL
      |         WHEN value < pv THEN value ELSE value - pv END AS d
      |  FROM l)
      |SELECT u AS "user", ws AS window_start, count(*) AS n_points,
      |  round(max_by(value, t) - min_by(value, t), 4) AS delta,
      |  round(coalesce(sum(d), 0), 4) AS increase
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shared by `ts_predict`/`tsdb_rollup_predict` (raw analytic vs the
    * rollup-partial route) — mirrors predictLinear's moment formulas
    * term-for-term. */
  private val TsPredictSql =
      """WITH s AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t_ns, value
        |  FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT u, count(*) AS n_points, max(t_ns) AS last_ts,
        |    avg(CAST(t_ns AS DOUBLE) / 1e9) AS mt, avg(value) AS mv,
        |    avg((CAST(t_ns AS DOUBLE) / 1e9) * value) AS mtv,
        |    avg((CAST(t_ns AS DOUBLE) / 1e9) * (CAST(t_ns AS DOUBLE) / 1e9)) AS mtt
        |  FROM s GROUP BY u),
        |d AS (
        |  SELECT u, n_points, last_ts, mt, mv,
        |    CASE WHEN n_points >= 2 AND mtt - mt * mt > 0
        |      THEN (mtv - mt * mv) / (mtt - mt * mt) END AS slope
        |  FROM m)
        |SELECT u AS "user", n_points, last_ts,
        |  round(slope * 3600, 6) AS slope_per_hour,
        |  round(mv + slope * ((CAST(last_ts AS DOUBLE) + 604800000000000)
        |    / 1e9 - mt), 4) AS predicted
        |FROM d ORDER BY 1""".stripMargin

  /** Shared by `ts_twa`/`ts_twa_split` — same bit-identical contract. */
  private val TsTwaSql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
      |  FROM events WHERE event_type = 'view'),
      |l AS (
      |  SELECT u, t, value, t - (t % 604800000000000) AS ws,
      |    lead(t) OVER (PARTITION BY u ORDER BY t) AS nt
      |  FROM s),
      |w AS (
      |  SELECT u, ws, value,
      |    CAST(least(coalesce(nt, ws + 604800000000000), ws + 604800000000000) - t
      |         AS DOUBLE) AS wt
      |  FROM l)
      |SELECT u AS "user", ws AS window_start,
      |  round(sum(value * wt) / sum(wt), 4) AS twa, count(*) AS n_points
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shared by `ts_anomaly`/`ts_anomaly_split` (trailing ROWS windows
    * are bit-identical under context-replication splitting). */
  private val TsAnomalySql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
      |  FROM events WHERE event_type = 'click'),
      |w AS (
      |  SELECT u, t, value,
      |    avg(value) OVER win AS m,
      |    stddev_samp(value) OVER win AS sd,
      |    count(value) OVER win AS n
      |  FROM s
      |  WINDOW win AS (PARTITION BY u ORDER BY t
      |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      |SELECT u AS "user", t AS "timestamp", value,
      |  round((value - m) / sd, 4) AS z
      |FROM w WHERE n >= 5 AND sd > 1e-12
      |ORDER BY 1, 2""".stripMargin

  /** Shared by `ts_correlate`/`nbql_correlate` (same analytic, API vs
    * wire path). */
  /** Shared by `ts_ewma_by`/`tsdb_rollup_ewma`: the ts_ewma replayed
    * fold, sampled at each daily window's last point with arg_max —
    * identical IEEE order both sides, UNROUNDED doubles hashed. */
  private val TsEwmaBySql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      |  FROM events WHERE event_type = 'purchase'),
      |g AS (SELECT u, list(value ORDER BY t) AS vs FROM s GROUP BY u),
      |f AS (SELECT s.u, s.t, s.value,
      |    list_reduce(g.vs[1:s.rn], (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma,
      |    s.t - s.t % 86400000000000 AS w
      |  FROM s JOIN g ON s.u = g.u)
      |SELECT u AS "user", w AS window_start, count(*) AS n_points,
      |  max(t) AS last_ts, arg_max(value, t) AS value, arg_max(ewma, t) AS ewma
      |FROM f GROUP BY u, w ORDER BY 1, 2""".stripMargin

  /** Shared by `ts_holt_by`/`tsdb_rollup_holt` — the two-term fold
    * sampled per window (ts_holt technique + arg_max). */
  private val TsHoltBySql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      |  FROM events WHERE event_type = 'error'),
      |g AS (SELECT u, list([value, CAST(0 AS DOUBLE)] ORDER BY t) AS vs
      |      FROM s GROUP BY u),
      |f AS (
      |  SELECT s.u, s.t, s.value,
      |    list_reduce(g.vs[1:s.rn], (acc, e) ->
      |      [0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
      |       0.25 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
      |         + 0.75 * acc[2]]) AS h,
      |    s.t - s.t % 86400000000000 AS w
      |  FROM s JOIN g ON s.u = g.u)
      |SELECT u AS "user", w AS window_start, count(*) AS n_points,
      |  max(t) AS last_ts, arg_max(value, t) AS value,
      |  arg_max(h[1], t) AS level, arg_max(h[2], t) AS trend,
      |  arg_max(h[1] + h[2], t) AS forecast
      |FROM f GROUP BY u, w ORDER BY 1, 2""".stripMargin

  private val TsCorrelateSql =
    """WITH s AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u,
      |    epoch_ns(ts) - (epoch_ns(ts) % 86400000000000) AS bucket,
      |    avg(CASE WHEN event_type = 'click' THEN value END) AS va,
      |    avg(CASE WHEN event_type = 'view' THEN value END) AS vb
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY 1, 2)
      |SELECT u AS "user", round(corr(va, vb), 4) AS r, count(*) AS n_buckets
      |FROM s WHERE va IS NOT NULL AND vb IS NOT NULL
      |GROUP BY 1 HAVING count(*) >= 5 AND corr(va, vb) IS NOT NULL
      |ORDER BY 1""".stripMargin

  /** Shared by `ts_topk_series`/`nbql_topk`. */
  private val TsTopkSql =
    """WITH g AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u, sum(value) AS s, count(*) AS n
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT u AS "user",
      |  row_number() OVER (ORDER BY s DESC, u ASC) AS rank,
      |  round(s, 2) AS sum_value, n AS count_star
      |FROM g ORDER BY s DESC, u ASC LIMIT 5""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "tsdb_downsample_1h" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | (epoch_ns(ts) // 3600000000000) * 3600000000000 AS window_start,
        | round(avg(value), 4) AS avg_value, round(sum(value), 2) AS sum_value,
        | count(*) AS count_star
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY window_start, "user"""".stripMargin,
    // NBQL protocol path: same oracle as tsdb_downsample_1h — a green row
    // proves parse→validate→serve equals the engine-direct plan
    "nbql_query_e2e" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | (epoch_ns(ts) // 3600000000000) * 3600000000000 AS window_start,
        | round(avg(value), 4) AS avg_value, round(sum(value), 2) AS sum_value,
        | count(*) AS count_star
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY window_start, "user"""".stripMargin,
    // ANALYZE RATE on the wire: the ts_rate oracle verbatim
    "nbql_rate" ->
      """WITH s AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
        |  FROM events WHERE event_type = 'purchase'),
        |l AS (
        |  SELECT u, t, value,
        |    lag(value) OVER (PARTITION BY u ORDER BY t) AS pv,
        |    lag(t) OVER (PARTITION BY u ORDER BY t) AS pt
        |  FROM s)
        |SELECT u AS "user", t AS "timestamp", value,
        |  CASE WHEN value < pv THEN value ELSE value - pv END AS delta,
        |  (CASE WHEN value < pv THEN value ELSE value - pv END) * 1e9
        |    / CAST(t - pt AS DOUBLE) AS rate_per_sec
        |FROM l WHERE pv IS NOT NULL AND pt IS NOT NULL
        |ORDER BY 1, 2""".stripMargin,
    "tsdb_rollup_downsample" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | (epoch_ns(ts) // 3600000000000) * 3600000000000 AS window_start,
        | round(avg(value), 4) AS avg_value, round(sum(value), 2) AS sum_value,
        | count(*) AS count_star, min(value) AS min_value, max(value) AS max_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY window_start, "user"""".stripMargin,
    "tsdb_final_agg" ->
      """SELECT 'purchase' AS metric, count(*) AS count_star, count(value) AS count_value,
        | round(sum(value), 2) AS sum_value, round(avg(value), 4) AS avg_value,
        | min(value) AS min_value, max(value) AS max_value,
        | arg_min(value, epoch_ns(ts)) AS first_value,
        | arg_max(value, epoch_ns(ts)) AS last_value,
        | round((arg_max(value, epoch_ns(ts)) - arg_min(value, epoch_ns(ts)))
        |       / arg_min(value, epoch_ns(ts)), 4) AS frac_value,
        | round(stddev_samp(value), 4) AS stddev_value,
        | round(quantile_cont(value, 0.5), 4) AS p50_value,
        | round(quantile_cont(value, 0.95), 4) AS p95_value
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "tsdb_raw_scan" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | epoch_ns(ts) AS "timestamp", value, props
        |FROM events
        |WHERE event_type = 'error'
        |  AND epoch_ns(ts) BETWEEN 1704067200000000000 AND 1704153600000000000
        |ORDER BY 3 LIMIT 500""".stripMargin,
    "tsdb_tag_filter" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | epoch_ns(ts) AS "timestamp", value
        |FROM events WHERE event_type = 'click' AND user_id = 7 ORDER BY 3""".stripMargin,
    "tsdb_point_lookup" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | epoch_ns(ts) AS "timestamp", value
        |FROM events WHERE event_type = 'purchase'
        |  AND ts = (SELECT min(ts) FROM events WHERE event_type = 'purchase')""".stripMargin,
    "tsdb_cursor_page" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | epoch_ns(ts) AS "timestamp", value
        |FROM events WHERE event_type = 'view' AND epoch_ns(ts) > 1704153600000000000
        |ORDER BY 3 LIMIT 300""".stripMargin,
    "tsdb_latest_version" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | epoch_ns(ts) AS "timestamp", value * 2 AS value
        |FROM events WHERE event_type = 'signup' ORDER BY 3""".stripMargin,
    "tsdb_tombstones" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | epoch_ns(ts) AS "timestamp", value
        |FROM events WHERE event_type = 'click'
        |  AND NOT (user_id = 3 AND epoch_ns(ts) BETWEEN 1704412800000000000 AND 1704844800000000000)
        |  AND user_id <> 5
        |ORDER BY 3""".stripMargin,
    "tsdb_desc_scan" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | epoch_ns(ts) AS "timestamp", value
        |FROM events WHERE event_type = 'signup'
        |ORDER BY 3 DESC LIMIT 200""".stripMargin,
    "show_metrics" ->
      "SELECT DISTINCT event_type AS metric FROM events ORDER BY 1",
    "show_tag_values" ->
      """SELECT DISTINCT CAST(user_id AS VARCHAR) AS tag_value
        |FROM events WHERE event_type = 'error' ORDER BY 1""".stripMargin,
    "series_by_tags" ->
      """SELECT DISTINCT event_type AS metric, CAST(user_id AS VARCHAR) AS "user"
        |FROM events WHERE event_type IN ('purchase', 'signup') ORDER BY 1, 2""".stripMargin,
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "join_revenue_nation" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "topk_per_group" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        | FROM orders) t WHERE rk <= 3 ORDER BY 1, 2""".stripMargin,
    "pushdown_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity < 5 AND l_discount > 0.05 ORDER BY 1, 2""".stripMargin,
    // ---- pipeline battery ----
    "simhash_sketches" -> simhashOracle,
    "simhash_neardup" -> simhashNearDupOracle,
    "dedup_clusters" -> dedupClustersOracle,
    "curate_lineage" -> curateLineageOracle,
    "dedup_canonical" -> dedupCanonicalOracle,
    "dedup_incremental" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) AS s
        |  FROM w WHERE len(ws) >= 3),
        |posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
        |sig AS (SELECT doc_id,
        | min(substring(md5('0:' || sg), 1, 8)) AS m0,
        | min(substring(md5('0:' || sg), 9, 8)) AS m1,
        | min(substring(md5('0:' || sg), 17, 8)) AS m2,
        | min(substring(md5('0:' || sg), 25, 8)) AS m3,
        | min(substring(md5('1:' || sg), 1, 8)) AS m4,
        | min(substring(md5('1:' || sg), 9, 8)) AS m5,
        | min(substring(md5('1:' || sg), 17, 8)) AS m6,
        | min(substring(md5('1:' || sg), 25, 8)) AS m7
        | FROM posts GROUP BY 1),
        |band AS (
        | SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS h FROM sig
        | UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig
        | UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig
        | UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig),
        |exfp AS (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |           min(doc_id) AS exact_of
        |         FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |infp AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |         FROM documents WHERE doc_id % 2 = 1),
        |exact AS (SELECT i.doc_id, e.exact_of FROM infp i LEFT JOIN exfp e USING (fp)),
        |cand AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS ex_id
        |         FROM band x JOIN band y ON x.band = y.band AND x.h = y.h
        |         WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 0),
        |near AS (SELECT c.doc_id, min(c.ex_id) AS near_of
        |         FROM cand c JOIN sh a ON a.doc_id = c.doc_id JOIN sh b ON b.doc_id = c.ex_id
        |         WHERE len(list_intersect(a.s, b.s))::DOUBLE
        |               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
        |         GROUP BY 1)
        |SELECT e.doc_id,
        |  CASE WHEN e.exact_of IS NOT NULL THEN 'exact_dup'
        |       WHEN n.near_of IS NOT NULL THEN 'near_dup' ELSE 'new' END AS verdict,
        |  COALESCE(e.exact_of, n.near_of) AS dup_of
        |FROM exact e LEFT JOIN near n USING (doc_id) ORDER BY doc_id""".stripMargin,
    "shard_assign" ->
      """WITH tok AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '[^\w]+'), x -> x <> ''))
        |   + (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) AS BIGINT) AS weight
        |  FROM documents),
        |c AS (SELECT doc_id, weight,
        |  CAST(sum(weight) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
        |  FROM tok)
        |SELECT doc_id, weight, cum_weight,
        |  CAST(floor((cum_weight - weight) / 5000.0) AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,
    "tfidf_topterms" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM p GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |        CAST(floor(tf.tf * n.n / dfq.df * 1000000 + 0.5) AS BIGINT) AS score_e6
        |      FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                  ORDER BY score_e6 DESC, term ASC) AS rank FROM s)
        |SELECT doc_id, rank, term, tf, df, score_e6 FROM r
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "ngram_topk" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS ngram
        |      FROM w WHERE len(ws) >= 2)
        |SELECT ngram, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM g GROUP BY 1 ORDER BY tf DESC, ngram ASC LIMIT 50""".stripMargin,
    "dataset_split" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |  substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hx
         |  FROM documents),
         |b AS (SELECT doc_id, lang,
         |  CAST((${hexToIntSql("hx")}) % 100 AS BIGINT) AS bucket FROM h)
         |SELECT doc_id, lang, bucket,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    "mixture_sample" -> mixtureSampleOracle,
    "sample_stratified" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |  substring(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hx
         |  FROM documents),
         |b AS (SELECT doc_id, lang,
         |  CAST((${hexToIntSql("hx")}) % 100 AS BIGINT) AS bucket FROM h)
         |SELECT doc_id, lang, bucket FROM b
         |WHERE bucket < CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 60 ELSE 100 END
         |ORDER BY doc_id""".stripMargin,
    "winnow_fingerprints" ->
      s"""$winnowFpsCte
         |SELECT doc_id AS doc, unnest(fps) AS fp FROM m ORDER BY 1, 2""".stripMargin,
    "winnow_overlap_pairs" ->
      s"""$winnowFpsCte,
         |fp AS (SELECT doc_id, unnest(fps) AS fp FROM m),
         |keep AS (SELECT fp FROM fp GROUP BY 1 HAVING count(*) <= 50),
         |fpk AS (SELECT doc_id, fp.fp FROM fp JOIN keep USING (fp)),
         |nf AS (SELECT doc_id, count(*) AS n FROM fpk GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |          FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2 HAVING count(*) >= 3)
         |SELECT doc_a, doc_b, shared,
         |  CAST(floor(shared * 10000.0 / least(x.n, y.n) + 0.5) AS BIGINT) AS overlap_e4
         |FROM pairs JOIN nf x ON x.doc_id = doc_a JOIN nf y ON y.doc_id = doc_b
         |ORDER BY 1, 2""".stripMargin,
    "repeated_spans" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS ws
         |  FROM documents),
         |g0 AS (SELECT doc_id,
         |  [{'pos': i - 1, 'hx': substring(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |     || ' ' || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5]), 1, 8)}
         |   FOR i IN range(1, len(ws) - 4)] AS gs
         |  FROM w WHERE len(ws) >= 6),
         |g AS (SELECT doc_id, unnest(gs, recursive := true) FROM g0),
         |p AS (SELECT doc_id, pos, CAST(${hexToIntSql("hx")} AS BIGINT) AS gh FROM g),
         |dup AS (SELECT gh FROM p GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         |m AS (SELECT doc_id, pos FROM p JOIN dup USING (gh)),
         |b AS (SELECT doc_id, pos,
         |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 6
         |       THEN 1 ELSE 0 END AS brk FROM m),
         |isl AS (SELECT doc_id, pos,
         |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM b)
         |SELECT doc_id AS doc, min(pos) AS span_start, max(pos) + 6 AS span_end,
         |  max(pos) + 6 - min(pos) AS span_tokens
         |FROM isl GROUP BY doc_id, island ORDER BY 1, 2""".stripMargin,
    // same span derivation as repeated_spans, then the cut: tokens are
    // position-numbered (generate_subscripts + unnest pair positionally),
    // span-covered positions anti-joined away, survivors re-joined in
    // order; docs cut to nothing (or with no tokens) hash the empty string
    "exact_substring_cut" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS ws
         |  FROM documents),
         |g0 AS (SELECT doc_id,
         |  [{'pos': i - 1, 'hx': substring(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
         |     || ' ' || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5]), 1, 8)}
         |   FOR i IN range(1, len(ws) - 4)] AS gs
         |  FROM w WHERE len(ws) >= 6),
         |g AS (SELECT doc_id, unnest(gs, recursive := true) FROM g0),
         |p AS (SELECT doc_id, pos, CAST(${hexToIntSql("hx")} AS BIGINT) AS gh FROM g),
         |dup AS (SELECT gh FROM p GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         |m AS (SELECT doc_id, pos FROM p JOIN dup USING (gh)),
         |b AS (SELECT doc_id, pos,
         |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 6
         |       THEN 1 ELSE 0 END AS brk FROM m),
         |isl AS (SELECT doc_id, pos,
         |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM b),
         |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 6 AS e
         |       FROM isl GROUP BY doc_id, island),
         |tok AS (SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, unnest(ws) AS tk
         |        FROM w),
         |keepx AS (SELECT t.doc_id, t.pos, t.tk
         |          FROM tok t LEFT JOIN sp ON sp.doc_id = t.doc_id
         |            AND t.pos >= sp.s AND t.pos < sp.e
         |          WHERE sp.doc_id IS NULL),
         |ka AS (SELECT doc_id, count(*) AS n_kept,
         |         string_agg(tk, ' ' ORDER BY pos) AS clean
         |       FROM keepx GROUP BY 1),
         |ca AS (SELECT doc_id, sum(e - s) AS n_cut FROM sp GROUP BY 1)
         |SELECT w.doc_id AS doc,
         |  COALESCE(ka.n_kept, 0) AS n_kept,
         |  CAST(COALESCE(ca.n_cut, 0) AS BIGINT) AS n_cut,
         |  md5(COALESCE(ka.clean, '')) AS clean_fp
         |FROM w LEFT JOIN ka USING (doc_id) LEFT JOIN ca USING (doc_id)
         |ORDER BY doc""".stripMargin,
    "decontaminate" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS ws
         |  FROM documents),
         |g AS (SELECT doc_id, list_distinct(
         |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]
         |   FOR i IN range(1, len(ws) - 3)]) AS sh
         |  FROM w WHERE len(ws) >= 5),
         |p AS (SELECT doc_id, substring(md5(s), 1, 8) AS hx
         |      FROM (SELECT doc_id, unnest(sh) AS s FROM g)),
         |ph AS (SELECT doc_id, CAST(${hexToIntSql("hx")} AS BIGINT) AS gh FROM p),
         |tp AS (SELECT doc_id, gh FROM ph WHERE doc_id % 20 <> 0),
         |ep AS (SELECT doc_id AS eval_id, gh FROM ph WHERE doc_id % 20 = 0),
         |j AS (SELECT tp.doc_id, tp.gh, ep.eval_id FROM tp JOIN ep USING (gh))
         |SELECT doc_id, count(DISTINCT gh) AS hits, count(DISTINCT eval_id) AS evals
         |FROM j GROUP BY 1 HAVING count(DISTINCT gh) >= 3 ORDER BY 1""".stripMargin,
    "doc_repetition" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |nz AS (SELECT doc_id, ws FROM w WHERE len(ws) > 0),
        |base AS (SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct FROM nz),
        |bg AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS bg
        |       FROM nz WHERE len(ws) >= 2),
        |c AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) AS top_c FROM c GROUP BY 1)
        |SELECT b.doc_id, b.n_words,
        |  CAST(floor((b.n_words - b.n_distinct) * 10000.0 / b.n_words + 0.5) AS BIGINT) AS dup_word_e4,
        |  COALESCE(CAST(floor(t.top_c * 10000.0 / (b.n_words - 1) + 0.5) AS BIGINT), 0) AS top_bigram_e4
        |FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id ORDER BY 1""".stripMargin,
    "pii_scan" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail-'
        |    || CAST(doc_id AS VARCHAR) || '.example.com'
        |    || CASE WHEN doc_id % 3 = 0
        |       THEN ' or +1-202-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |       ELSE '' END
        |    || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
        |    || CAST(doc_id % 100 AS VARCHAR) || ' end' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(t, '\+\d{1,2}-\d{3}-\d{3}-\d{4}')) AS n_phone,
        |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d{1,2}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS red_fp
        |FROM p ORDER BY doc_id""".stripMargin,
    "embedding_neardup_hi" -> neardupHiOracle,
    "ann_lsh_topk" -> annLshOracle,
    "ann_ivf_topk" -> annIvfOracle,
    "ann_pq_topk" -> annPqOracle,
    // frozen-quantizer contract: the grown+compacted index answers
    // exactly like the in-memory operator, so the same oracle pins it
    "ann_pq_topk_indexed" -> annPqOracle,
    "ann_pq_refine" -> annPqRefineOracle,
    "doc_stats" ->
      """WITH w AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents)
        |SELECT doc_id, len(ws) AS n_tokens, len(list_distinct(ws)) AS n_uniq,
        |  len(list_filter(string_split_regex(text, '[^\w]+'), x -> x <> ''))
        |    + (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) AS n_bpeish,
        |  length(text) AS n_chars_measured,
        |  CAST(floor((0.4 * least(len(ws) / 100.0, 1.0)
        |      + 0.3 * (len(list_distinct(ws))::DOUBLE / len(ws))
        |      + 0.3 * (len(list_filter(ws, x -> x IN ('the','a','of','and')))::DOUBLE / len(ws)))
        |    * 10000 + 0.5) AS BIGINT) AS quality_e4
        |FROM w ORDER BY doc_id""".stripMargin,
    // chunking: pure list arithmetic, byte-identical strings
    "doc_chunks" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |s AS (SELECT doc_id, ws, unnest(generate_series(0,
        |        greatest(0, ((len(ws) - 32 + 23) // 24) * 24), 24)) AS cs
        |      FROM w WHERE len(ws) > 0)
        |SELECT doc_id, CAST(cs // 24 AS INT) AS chunk_index, cs AS chunk_start,
        |  len(ws[cs+1 : cs+32]) AS n_chunk_tokens,
        |  array_to_string(ws[cs+1 : cs+32], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_index""".stripMargin,
    "boilerplate_chunks" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |s AS (SELECT doc_id, ws, unnest(generate_series(0,
        |        greatest(0, ((len(ws) - 8 + 7) // 8) * 8), 8)) AS cs
        |      FROM w WHERE len(ws) > 0),
        |c AS (SELECT doc_id, md5(array_to_string(ws[cs+1 : cs+8], ' ')) AS fp
        |      FROM s)
        |SELECT fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
        |FROM c GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY fp""".stripMargin,
    // per-source cap: md5 rank is identical in both engines
    "sample_per_source" ->
      """WITH r AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    AS sample_rank
        |  FROM documents)
        |SELECT doc_id, source, sample_rank FROM r
        |WHERE sample_rank <= 10 ORDER BY doc_id""".stripMargin,
    // bigram-LM self cross-entropy: the model joins always hit under
    // self-scoring, so the oracle replays the exact smoothing formula
    "lm_crossentropy" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |b AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |      FROM (SELECT doc_id, ws,
        |            unnest(generate_series(1, len(ws)-1)) AS i FROM w)),
        |uni AS (SELECT w1, count(*) AS c1
        |        FROM (SELECT unnest(ws) AS w1 FROM w) GROUP BY 1),
        |bi AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
        |v AS (SELECT count(*)::DOUBLE AS vs FROM uni)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(sum(-log2((c2 + 0.5) / (c1 + 0.5 * vs))) / count(*), 4)
        |    AS bits_per_bigram
        |FROM b JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the probe's training scan: corpus → one row of Gram/moment sums
    "quality_probe_gram" ->
      """WITH w AS (SELECT
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |f AS (SELECT
        |  least(len(ws) / 100.0, 1.0) AS f1,
        |  CASE WHEN len(ws) = 0 THEN 0.0
        |       ELSE len(list_distinct(ws))::DOUBLE / len(ws) END AS f2,
        |  CASE WHEN len(ws) = 0 THEN 0.0
        |       ELSE len(list_filter(ws, x -> x IN ('the','a','of','and')))::DOUBLE
        |            / len(ws) END AS f3
        |  FROM w),
        |x AS (SELECT 1.0 AS x0, f1 AS x1, f2 AS x2, f3 AS x3,
        |        1.0 + f1 * 2.0 + f2 * 3.0 - f3 AS y FROM f)
        |SELECT count(*) AS n,
        |  round(sum(x0*x0), 4) AS g00, round(sum(x0*x1), 4) AS g01,
        |  round(sum(x0*x2), 4) AS g02, round(sum(x0*x3), 4) AS g03,
        |  round(sum(x1*x1), 4) AS g11, round(sum(x1*x2), 4) AS g12,
        |  round(sum(x1*x3), 4) AS g13, round(sum(x2*x2), 4) AS g22,
        |  round(sum(x2*x3), 4) AS g23, round(sum(x3*x3), 4) AS g33,
        |  round(sum(x0*y), 4) AS b0, round(sum(x1*y), 4) AS b1,
        |  round(sum(x2*y), 4) AS b2, round(sum(x3*y), 4) AS b3
        |FROM x""".stripMargin,
    // end-to-end: the oracle computes the GENERATING function directly —
    // matching hashes prove the distributed fit recovered its
    // coefficients (quantized weights make the scoring arithmetic
    // identical IEEE ops, hashed unrounded)
    "quality_probe_score" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |f AS (SELECT doc_id,
        |  least(len(ws) / 100.0, 1.0) AS f1,
        |  CASE WHEN len(ws) = 0 THEN 0.0
        |       ELSE len(list_distinct(ws))::DOUBLE / len(ws) END AS f2,
        |  CASE WHEN len(ws) = 0 THEN 0.0
        |       ELSE len(list_filter(ws, x -> x IN ('the','a','of','and')))::DOUBLE
        |            / len(ws) END AS f3
        |  FROM w)
        |SELECT doc_id, 1.0 + f1 * 2.0 + f2 * 3.0 - f3 AS probe_score
        |FROM f ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      """WITH w AS (SELECT doc_id, lang, text,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |s AS (SELECT doc_id, lang,
        |  len(list_filter(ws, x -> x IN ('the','a','of','and'))) AS s_en,
        |  len(list_filter(ws, x -> x IN ('der','die','und','das'))) AS s_de,
        |  len(list_filter(ws, x -> x IN ('el','que','los','y'))) AS s_es,
        |  len(list_filter(ws, x -> x IN ('le','les','et','la'))) AS s_fr,
        |  length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS s_zh
        | FROM w)
        |SELECT doc_id, lang AS labeled,
        | CASE WHEN s_zh > greatest(s_en, s_de, s_es, s_fr) THEN 'zh'
        |      WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
        |      WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
        |      WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS predicted
        |FROM s ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_jaccard_pairs" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) AS s
        |  FROM w WHERE len(ws) >= 3)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(floor((len(list_intersect(a.s, b.s))::DOUBLE
        |        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) * 10000 + 0.5)
        |       AS BIGINT) AS jaccard_e4
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.s, b.s))::DOUBLE
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
        |ORDER BY 1, 2""".stripMargin,
    "minhash_signatures" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) AS s
        |  FROM w WHERE len(ws) >= 3),
        |posts AS (SELECT doc_id, unnest(s) AS sg FROM sh)
        |SELECT doc_id AS doc,
        | min(substring(md5('0:' || sg), 1, 8)) AS m0,
        | min(substring(md5('0:' || sg), 9, 8)) AS m1,
        | min(substring(md5('0:' || sg), 17, 8)) AS m2,
        | min(substring(md5('0:' || sg), 25, 8)) AS m3,
        | min(substring(md5('1:' || sg), 1, 8)) AS m4,
        | min(substring(md5('1:' || sg), 9, 8)) AS m5,
        | min(substring(md5('1:' || sg), 17, 8)) AS m6,
        | min(substring(md5('1:' || sg), 25, 8)) AS m7
        |FROM posts GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_minhash_lsh" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) AS s
        |  FROM w WHERE len(ws) >= 3),
        |posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
        |sig AS (SELECT doc_id,
        | min(substring(md5('0:' || sg), 1, 8)) AS m0,
        | min(substring(md5('0:' || sg), 9, 8)) AS m1,
        | min(substring(md5('0:' || sg), 17, 8)) AS m2,
        | min(substring(md5('0:' || sg), 25, 8)) AS m3,
        | min(substring(md5('1:' || sg), 1, 8)) AS m4,
        | min(substring(md5('1:' || sg), 9, 8)) AS m5,
        | min(substring(md5('1:' || sg), 17, 8)) AS m6,
        | min(substring(md5('1:' || sg), 25, 8)) AS m7
        | FROM posts GROUP BY 1),
        |band AS (
        | SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS h FROM sig
        | UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig
        | UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig
        | UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM band a JOIN band b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
        |ver AS (SELECT c.doc_a, c.doc_b,
        |  len(list_intersect(x.s, y.s))::DOUBLE
        |    / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS j
        | FROM cand c JOIN sh x ON x.doc_id = c.doc_a JOIN sh y ON y.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, CAST(floor(j * 10000 + 0.5) AS BIGINT) AS jaccard_e4
        |FROM ver WHERE j >= 0.8
        |ORDER BY 1, 2""".stripMargin,
    "embedding_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
        |j AS (SELECT query_id, neighbor_id,
        |        round(list_cosine_similarity(qv, nv), 4) AS cosine
        |      FROM q, c WHERE query_id <> neighbor_id)
        |SELECT query_id, rank, neighbor_id, cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM j) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // threshold-routed: 0.45 < 0.85 route point → IVF cell blocking with
    // first-16 literal centroids and replicate 3 — the oracle reproduces
    // the candidate generation exactly, so rows are pinned, not sampled
    "embedding_neardup" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
        |cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |            embedding::DOUBLE[] AS cv
        |          FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        |asg AS (SELECT id, cid FROM (
        |  SELECT id, cid,
        |    row_number() OVER (PARTITION BY id
        |                       ORDER BY list_dot_product(vec, cv) DESC, cid ASC) AS rn
        |  FROM v CROSS JOIN cents) t WHERE rn <= 3),
        |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
        |         FROM asg x JOIN asg y ON x.cid = y.cid AND x.id < y.id)
        |SELECT id_a, id_b,
        |  round(list_cosine_similarity(a.vec, b.vec), 4) AS cosine
        |FROM cand JOIN v a ON a.id = cand.id_a JOIN v b ON b.id = cand.id_b
        |WHERE list_cosine_similarity(a.vec, b.vec) >= 0.45
        |ORDER BY 1, 2""".stripMargin,
    "embedding_neardup_ivf" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
        |cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |            embedding::DOUBLE[] AS cv
        |          FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        |asg AS (SELECT id, cid FROM (
        |  SELECT id, cid,
        |    row_number() OVER (PARTITION BY id
        |                       ORDER BY list_dot_product(vec, cv) DESC, cid ASC) AS rn
        |  FROM v CROSS JOIN cents) t WHERE rn <= 2),
        |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
        |         FROM asg x JOIN asg y ON x.cid = y.cid AND x.id < y.id)
        |SELECT id_a, id_b,
        |  round(list_cosine_similarity(a.vec, b.vec), 4) AS cosine
        |FROM cand JOIN v a ON a.id = cand.id_a JOIN v b ON b.id = cand.id_b
        |WHERE list_cosine_similarity(a.vec, b.vec) >= 0.45
        |ORDER BY 1, 2""".stripMargin,
    "semantic_dedup" ->
      """WITH RECURSIVE v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
        |cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
        |            embedding::DOUBLE[] AS cv
        |          FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
        |asg AS (SELECT id, cid FROM (
        |  SELECT id, cid,
        |    row_number() OVER (PARTITION BY id
        |                       ORDER BY list_dot_product(vec, cv) DESC, cid ASC) AS rn
        |  FROM v CROSS JOIN cents) t WHERE rn <= 2),
        |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
        |         FROM asg x JOIN asg y ON x.cid = y.cid AND x.id < y.id),
        |pairs AS (SELECT id_a, id_b
        |  FROM cand JOIN v a ON a.id = cand.id_a JOIN v b ON b.id = cand.id_b
        |  WHERE list_cosine_similarity(a.vec, b.vec) >= 0.45),
        |und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |        UNION SELECT id_b, id_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT id, id FROM v
        |  UNION
        |  SELECT reach.node, und.b FROM reach JOIN und ON und.a = reach.r),
        |lab AS (SELECT node AS vec_id, min(r) AS cluster_id FROM reach GROUP BY 1),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
        |SELECT lab.vec_id, lab.cluster_id, sz.cluster_size,
        |  CAST(lab.vec_id = lab.cluster_id AS BIGINT) AS keep
        |FROM lab JOIN sz USING (cluster_id) ORDER BY 1""".stripMargin,
    "kmeans_assign" ->
      """WITH v AS (SELECT vec_id AS id,
        |  list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 10000 + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, qv AS cv
        |       FROM (SELECT id, qv FROM v ORDER BY id LIMIT 8)),
        |d0 AS (SELECT v.id, c0.cid,
        |         CAST(list_sum([qv[i] * cv[i] FOR i IN range(1, len(qv) + 1)]) AS BIGINT) AS d
        |       FROM v CROSS JOIN c0),
        |a0 AS (SELECT id, cid FROM (
        |        SELECT id, cid,
        |          row_number() OVER (PARTITION BY id ORDER BY d DESC, cid ASC) AS rn
        |        FROM d0) t WHERE rn = 1),
        |ex AS (SELECT a0.cid, generate_subscripts(v.qv, 1) AS pos,
        |         unnest(v.qv) AS val
        |       FROM a0 JOIN v USING (id)),
        |u AS (SELECT cid, pos, CAST(floor(sum(val)::DOUBLE / count(*)) AS BIGINT) AS c
        |      FROM ex GROUP BY 1, 2),
        |c1 AS (SELECT cid, list(c ORDER BY pos) AS cv FROM u GROUP BY 1),
        |d1 AS (SELECT v.id, c1.cid,
        |         CAST(list_sum([qv[i] * cv[i] FOR i IN range(1, len(qv) + 1)]) AS BIGINT) AS d
        |       FROM v CROSS JOIN c1),
        |a1 AS (SELECT id, cid, d FROM (
        |        SELECT id, cid, d,
        |          row_number() OVER (PARTITION BY id ORDER BY d DESC, cid ASC) AS rn
        |        FROM d1) t WHERE rn = 1)
        |SELECT id AS vec_id, cid AS cluster, d AS dot FROM a1 ORDER BY vec_id""".stripMargin,
    "embedding_quantize" ->
      """WITH m AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |  list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
        |  FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |  CASE WHEN mx = 0 THEN NULL ELSE 127.0 / mx END AS scale FROM m),
        |q AS (SELECT vec_id, scale,
        |  list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qv
        |  FROM sc)
        |SELECT vec_id,
        |  CAST(floor(scale * 1e9 + 0.5) AS BIGINT) AS scale_e9,
        |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
        |  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_l2sq
        |FROM q ORDER BY vec_id""".stripMargin,
    "embedding_norms" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS l2_norm,
        |  round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) / len(embedding), 6) AS mean_sq
        |FROM embeddings ORDER BY 1""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // raw 8x4 grayscale frames over the pure-ASCII corpus: a frame is a
    // 32-char slice, so substring == the byte slice Spark digests
    "frame_sample" ->
      """WITH d AS (SELECT doc_id AS media_id, text FROM documents),
        |f AS (SELECT media_id, CAST(t.i AS INT) AS frame_idx,
        |        substring(text, CAST(t.i AS INT) * 32 + 1, 32) AS fr
        |      FROM d, unnest(range(length(text) // 32)) AS t(i)
        |      WHERE t.i % 2 = 0)
        |SELECT media_id, frame_idx, CAST(frame_idx AS BIGINT) * 100 AS pts_ms,
        |  CAST(list_sum([ord(substring(fr, j, 1)) FOR j IN range(1, 33)]) * 10000 // 8160
        |       AS BIGINT) AS brightness_e4,
        |  md5(fr) AS frame_md5
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "asof_click_before_purchase" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             (epoch_ns(ts) // 1000) * 1000 AS t FROM events),
        |p AS (SELECT event_id, user_id, t AS p_ts FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, t AS c_ts, event_id AS click_event FROM e WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.p_ts, c.c_ts AS click_ts, c.click_event
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.c_ts <= p.p_ts
        |ORDER BY p.event_id""".stripMargin,
    "range_join_attrib" ->
      """WITH p AS (SELECT event_id AS purchase_id, epoch_ns(ts) AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT epoch_ns(ts) AS c_ts, user_id AS click_user
        |      FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, count(*) AS n_clicks,
        |       count(DISTINCT c.click_user) AS n_users,
        |       min(c.c_ts) AS first_click_ts
        |FROM p JOIN c ON c.c_ts >= p.p_ts AND c.c_ts <= p.p_ts + 1800000000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sessionize_users" ->
      """WITH o AS (SELECT user_id, (epoch_ns(ts) // 1000) * 1000 AS t FROM events),
        |b AS (SELECT user_id, t,
        |        CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |                  > 3600000000000 THEN 1 ELSE 0 END AS brk
        |      FROM o),
        |s AS (SELECT user_id, t,
        |        CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM b)
        |SELECT user_id, session_id, min(t) AS session_start, max(t) AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "show_tag_keys" -> "SELECT 'user' AS tag_key",
    "tsdb_empty_windows" ->
      """WITH b AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u,
        |    (epoch_ns(ts) // 21600000000000) * 21600000000000 AS w,
        |    count(*) AS n, sum(value) AS s, avg(value) AS a
        |  FROM events
        |  WHERE event_type = 'purchase'
        |    AND epoch_ns(ts) BETWEEN 1704067200000000000 AND 1704672000000000000
        |  GROUP BY 1, 2),
        |series AS (SELECT DISTINCT u FROM b),
        |wins AS (SELECT w FROM range(1704067200000000000, 1704672000000000000,
        |                             21600000000000) t(w))
        |SELECT series.u AS "user", wins.w AS window_start,
        |  coalesce(b.n, 0) AS count_star,
        |  round(coalesce(b.s, 0.0), 2) AS sum_value,
        |  round(coalesce(b.a, 'NaN'::DOUBLE), 4) AS avg_value
        |FROM series CROSS JOIN wins
        |LEFT JOIN b ON b.u = series.u AND b.w = wins.w
        |ORDER BY 2, 1""".stripMargin,
    "tsdb_fill_previous" ->
      """WITH b AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u,
        |    (epoch_ns(ts) // 21600000000000) * 21600000000000 AS w,
        |    count(*) AS n, avg(value) AS a
        |  FROM events
        |  WHERE event_type = 'purchase'
        |    AND epoch_ns(ts) BETWEEN 1704067200000000000 AND 1704672000000000000
        |  GROUP BY 1, 2),
        |series AS (SELECT DISTINCT u FROM b),
        |wins AS (SELECT w FROM range(1704067200000000000, 1704672000000000000,
        |                             21600000000000) t(w)),
        |grid AS (
        |  SELECT series.u, wins.w, b.n, b.a, b.n IS NOT NULL AS hit
        |  FROM series CROSS JOIN wins
        |  LEFT JOIN b ON b.u = series.u AND b.w = wins.w)
        |SELECT u AS "user", w AS window_start,
        |  coalesce(n, 0) AS count_star,
        |  round(CASE WHEN hit THEN a ELSE coalesce(
        |    last_value(CASE WHEN hit THEN a END IGNORE NULLS) OVER (
        |      PARTITION BY u ORDER BY w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    'NaN'::DOUBLE) END, 4) AS avg_value
        |FROM grid ORDER BY 2, 1""".stripMargin,
    "tsdb_fill_linear" ->
      """WITH b AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u,
        |    (epoch_ns(ts) // 21600000000000) * 21600000000000 AS w,
        |    count(*) AS n, min(value) AS mn, max(value) AS mx
        |  FROM events
        |  WHERE event_type = 'purchase'
        |    AND epoch_ns(ts) BETWEEN 1704067200000000000 AND 1704672000000000000
        |  GROUP BY 1, 2),
        |series AS (SELECT DISTINCT u FROM b),
        |wins AS (SELECT w FROM range(1704067200000000000, 1704672000000000000,
        |                             21600000000000) t(w)),
        |grid AS (
        |  SELECT series.u, wins.w, b.n, b.mn, b.mx, b.n IS NOT NULL AS hit
        |  FROM series CROSS JOIN wins
        |  LEFT JOIN b ON b.u = series.u AND b.w = wins.w),
        |nb AS (
        |  SELECT u, w, n, mn, mx, hit,
        |    last_value(CASE WHEN hit THEN w END IGNORE NULLS) OVER (
        |      PARTITION BY u ORDER BY w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pw,
        |    last_value(CASE WHEN hit THEN mn END IGNORE NULLS) OVER (
        |      PARTITION BY u ORDER BY w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
        |    last_value(CASE WHEN hit THEN mx END IGNORE NULLS) OVER (
        |      PARTITION BY u ORDER BY w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px,
        |    first_value(CASE WHEN hit THEN w END IGNORE NULLS) OVER (
        |      PARTITION BY u ORDER BY w
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nw,
        |    first_value(CASE WHEN hit THEN mn END IGNORE NULLS) OVER (
        |      PARTITION BY u ORDER BY w
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm,
        |    first_value(CASE WHEN hit THEN mx END IGNORE NULLS) OVER (
        |      PARTITION BY u ORDER BY w
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        |  FROM grid)
        |SELECT u AS "user", w AS window_start,
        |  coalesce(n, 0) AS count_star,
        |  CASE WHEN hit THEN mn
        |    WHEN pw IS NOT NULL AND nw IS NOT NULL
        |      THEN pm + (nm - pm) * (CAST(w - pw AS DOUBLE) / CAST(nw - pw AS DOUBLE))
        |    ELSE 'NaN'::DOUBLE END AS min_value,
        |  CASE WHEN hit THEN mx
        |    WHEN pw IS NOT NULL AND nw IS NOT NULL
        |      THEN px + (nx - px) * (CAST(w - pw AS DOUBLE) / CAST(nw - pw AS DOUBLE))
        |    ELSE 'NaN'::DOUBLE END AS max_value
        |FROM nb ORDER BY 2, 1""".stripMargin,
    "zorder_scan" ->
      """SELECT event_id, user_id, epoch_ns(ts) AS "timestamp", value
        |FROM events
        |WHERE user_id BETWEEN 0 AND 12
        |  AND epoch_ns(ts) BETWEEN 1704067200000000000 AND 1704412800000000000
        |ORDER BY event_id""".stripMargin,
    // ts_rate_split runs the SAME query through the hot-series split
    // path (bit-identical contract) — identical oracle by construction
    "ts_rate" -> TsRateSql,
    "ts_rate_split" -> TsRateSql,
    "ts_rate_prefix" ->
      """WITH s AS (
        |  SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS u,
        |    epoch_ns(ts) AS t, value
        |  FROM events),
        |l AS (
        |  SELECT metric, u, t, value,
        |    lag(value) OVER w AS pv, lag(t) OVER w AS pt
        |  FROM s WINDOW w AS (PARTITION BY metric, u ORDER BY t))
        |SELECT metric, u AS "user", t AS "timestamp", value,
        |  CASE WHEN value < pv THEN value ELSE value - pv END AS delta,
        |  (CASE WHEN value < pv THEN value ELSE value - pv END) * 1e9
        |    / CAST(t - pt AS DOUBLE) AS rate_per_sec
        |FROM l WHERE pv IS NOT NULL AND pt IS NOT NULL
        |ORDER BY 1, 2, 3""".stripMargin,
    "ts_anomaly" -> TsAnomalySql,
    "ts_anomaly_split" -> TsAnomalySql,
    // nbql_delta runs the SAME analytic through the protocol path —
    // identical oracle by construction
    "ts_delta" -> TsDeltaSql,
    "nbql_delta" -> TsDeltaSql,
    "tsdb_rollup_delta" -> TsDeltaSql,
    // windowed change: boundary pairs assigned to the LATER point's day;
    // tsdb_rollup_delta_by is the rollup-partial route, same oracle
    "ts_delta_by" -> TsDeltaBySql,
    "tsdb_rollup_delta_by" -> TsDeltaBySql,
    // tsdb_rollup_twa: the rollup-partial route, same oracle
    "tsdb_rollup_twa" -> TsTwaSql,
    // counter transitions (PromQL resets/changes); the rollup twins are
    // the partial-decomposition routes, same oracles — exact long counts
    "ts_resets" -> TsResetsSql,
    "tsdb_rollup_resets" -> TsResetsSql,
    "ts_changes" -> TsChangesSql,
    "tsdb_rollup_changes" -> TsChangesSql,
    // split twin + full-protocol twin: same oracle, distinct serve paths
    "ts_resets_split" -> TsResetsSql,
    "nbql_resets" -> TsResetsSql,
    // windowed transitions: boundary pairs land in the LATER point's day
    "ts_resets_by" -> TsResetsBySql,
    "tsdb_rollup_resets_by" -> TsResetsBySql,
    // windowed average rate: the DELTA BY increase over the window
    // duration, mirrored op-for-op (inc * 1e9 / windowNs)
    "ts_rate_by" ->
      """WITH s AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
        |  FROM events WHERE event_type = 'purchase'),
        |l AS (
        |  SELECT u, t, value,
        |    lag(value) OVER (PARTITION BY u ORDER BY t) AS pv
        |  FROM s),
        |w AS (
        |  SELECT u, t, value, t - (t % 86400000000000) AS ws,
        |    CASE WHEN pv IS NULL THEN NULL
        |         WHEN value < pv THEN value ELSE value - pv END AS d
        |  FROM l)
        |SELECT u AS "user", ws AS window_start, count(*) AS n_points,
        |  round(coalesce(sum(d), 0) * 1e9 / 86400000000000, 6) AS rate_per_sec
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ts_irate" ->
      """WITH s AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value
        |  FROM events WHERE event_type = 'purchase'),
        |l AS (
        |  SELECT u, t, value,
        |    lag(value) OVER w AS pv, lag(t) OVER w AS pt,
        |    row_number() OVER (PARTITION BY u ORDER BY t DESC) AS rn
        |  FROM s WINDOW w AS (PARTITION BY u ORDER BY t))
        |SELECT u AS "user", t AS "timestamp", value,
        |  CASE WHEN value < pv THEN value ELSE value - pv END AS delta,
        |  round((CASE WHEN value < pv THEN value ELSE value - pv END) * 1e9
        |    / CAST(t - pt AS DOUBLE), 6) AS rate_per_sec
        |FROM l WHERE rn = 1 AND pv IS NOT NULL AND pt IS NOT NULL
        |ORDER BY 1""".stripMargin,
    // mirrors predictLinear's moment formulas term-for-term (same
    // conditioning in both engines; only summation order differs)
    // tsdb_rollup_predict: the rollup-partial route, same oracle (the
    // battery's anchor 0 makes the moment-shift terms vanish)
    "ts_predict" -> TsPredictSql,
    // deriv = the same moment fit projected to slope (PromQL deriv())
    "ts_deriv" ->
      """WITH s AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t_ns, value
        |  FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT u, count(*) AS n_points, max(t_ns) AS last_ts,
        |    avg(CAST(t_ns AS DOUBLE) / 1e9) AS mt, avg(value) AS mv,
        |    avg((CAST(t_ns AS DOUBLE) / 1e9) * value) AS mtv,
        |    avg((CAST(t_ns AS DOUBLE) / 1e9) * (CAST(t_ns AS DOUBLE) / 1e9)) AS mtt
        |  FROM s GROUP BY u)
        |SELECT u AS "user", n_points, last_ts,
        |  round(CASE WHEN n_points >= 2 AND mtt - mt * mt > 0
        |    THEN (mtv - mt * mv) / (mtt - mt * mt) END * 3600, 6)
        |    AS slope_per_hour
        |FROM m ORDER BY 1""".stripMargin,
    "tsdb_rollup_predict" -> TsPredictSql,

    // ts_twa_split: same bit-identical-split contract as ts_rate_split
    "ts_twa" -> TsTwaSql,
    "ts_twa_split" -> TsTwaSql,
    "ts_cumsum" ->
      """SELECT CAST(user_id AS VARCHAR) AS "user", epoch_ns(ts) AS "timestamp",
        |  value,
        |  round(sum(value) OVER w, 2) AS cum_sum,
        |  max(value) OVER w AS cum_max,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts) AS point_index
        |FROM events WHERE event_type = 'error'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY 1, 2""".stripMargin,
    "ts_ewma" ->
      // list_reduce replays the engine's exact left fold (seed = first
      // value; acc' = 0.25*x + 0.75*acc) in the same IEEE order, so the
      // hash compares UNROUNDED doubles — a closed-form oracle differs in
      // ulps, and cent-valued inputs with dyadic alpha land ewma values
      // exactly on 5-decimal rounding boundaries, so rounding can't save it
      """WITH s AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT u, list(value ORDER BY t) AS vs FROM s GROUP BY u)
        |SELECT s.u AS "user", s.t AS "timestamp", s.value,
        |  list_reduce(g.vs[1:s.rn], (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma
        |FROM s JOIN g ON s.u = g.u
        |ORDER BY 1, 2""".stripMargin,
    "ts_holt" ->
      // same replay-the-fold technique as ts_ewma, with a two-term
      // accumulator: [level, trend] pairs fold left in the identical IEEE
      // order (dyadic alpha/beta), so all three doubles hash UNROUNDED
      """WITH s AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u, epoch_ns(ts) AS t, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events WHERE event_type = 'error'),
        |g AS (SELECT u, list([value, CAST(0 AS DOUBLE)] ORDER BY t) AS vs
        |      FROM s GROUP BY u)
        |SELECT q.u AS "user", q.t AS "timestamp", q.value,
        |  q.h[1] AS level, q.h[2] AS trend, q.h[1] + q.h[2] AS forecast
        |FROM (
        |  SELECT s.u, s.t, s.value,
        |    list_reduce(g.vs[1:s.rn], (acc, e) ->
        |      [0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
        |       0.25 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
        |         + 0.75 * acc[2]]) AS h
        |  FROM s JOIN g ON s.u = g.u) q
        |ORDER BY 1, 2""".stripMargin,
    // windowed smoothing: the same replayed folds sampled at each day's
    // last point (arg_max). The tsdb_rollup_* twins are the smoothing-
    // rollup routes (stored exact fold states) — same oracles VERBATIM,
    // hashing UNROUNDED doubles.
    "ts_ewma_by" -> TsEwmaBySql,
    "tsdb_rollup_ewma" -> TsEwmaBySql,
    "nbql_ewma_by" -> TsEwmaBySql, // the wire twin, same oracle
    "ts_holt_by" -> TsHoltBySql,
    "tsdb_rollup_holt" -> TsHoltBySql,
    // nbql_correlate runs the same analytic through ANALYZE CORRELATE
    "ts_correlate" -> TsCorrelateSql,
    "nbql_correlate" -> TsCorrelateSql,
    "ts_ratio" ->
      """WITH s AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u,
        |    epoch_ns(ts) - (epoch_ns(ts) % 86400000000000) AS bucket,
        |    avg(CASE WHEN event_type = 'click' THEN value END) AS va,
        |    avg(CASE WHEN event_type = 'view' THEN value END) AS vb,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS n_a,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS n_b
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1, 2)
        |SELECT u AS "user", bucket, n_a, n_b, round(va / vb, 4) AS ratio
        |FROM s WHERE va IS NOT NULL AND vb IS NOT NULL AND vb <> 0
        |ORDER BY 1, 2""".stripMargin,
    // nbql_topk runs the same ranking through AGGREGATE … ANALYZE TOPK
    "ts_topk_series" -> TsTopkSql,
    "nbql_topk" -> TsTopkSql,
    // BOTTOMK: the same ranking ascending (PromQL bottomk)
    "nbql_bottomk" ->
      """WITH g AS (
        |  SELECT CAST(user_id AS VARCHAR) AS u, sum(value) AS s, count(*) AS n
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT u AS "user",
        |  row_number() OVER (ORDER BY s ASC, u ASC) AS rank,
        |  round(s, 2) AS sum_value, n AS count_star
        |FROM g ORDER BY s ASC, u ASC LIMIT 5""".stripMargin,
    "tsdb_groupby_tag" ->
      """SELECT 'click' AS metric,
        |  epoch_ns(ts) - (epoch_ns(ts) % 3600000000000) AS window_start,
        |  round(sum(value), 2) AS sum_value,
        |  count(*) AS count_star, min(value) AS min_value, max(value) AS max_value,
        |  round(quantile_cont(value, 0.5), 4) AS p50_value
        |FROM events WHERE event_type = 'click'
        |GROUP BY 2 ORDER BY 2""".stripMargin,
    "tsdb_metric_prefix" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        |  epoch_ns(ts) AS "timestamp", value
        |FROM events WHERE event_type LIKE 'sig%'
        |ORDER BY 2, 3""".stripMargin,
    "tsdb_tag_prefix" ->
      """SELECT CAST(user_id AS VARCHAR) AS "user", epoch_ns(ts) AS "timestamp",
        |  value
        |FROM events
        |WHERE event_type = 'purchase' AND CAST(user_id AS VARCHAR) LIKE '11%'
        |ORDER BY 1, 2""".stripMargin,
    "tsdb_value_filter" ->
      """SELECT CAST(user_id AS VARCHAR) AS "user",
        |  (epoch_ns(ts) // 86400000000000) * 86400000000000 AS window_start,
        |  round(sum(value), 2) AS sum_value, count(*) AS count_star,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events WHERE event_type = 'view' AND value > 50
        |GROUP BY 1, 2 ORDER BY 2, 1""".stripMargin,
    // nbql_cardinality: the same exact count through the wire path
    // (SHOW CARDINALITY BY 1d) — shared oracle
    "ts_cardinality" ->
      """SELECT event_type AS metric,
        |  epoch_ns(ts) - (epoch_ns(ts) % 86400000000000) AS window_start,
        |  count(DISTINCT user_id) AS n_series, count(*) AS n_points
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "nbql_cardinality" ->
      """SELECT event_type AS metric,
        |  epoch_ns(ts) - (epoch_ns(ts) % 86400000000000) AS window_start,
        |  count(DISTINCT user_id) AS n_series, count(*) AS n_points
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "tsdb_multifield_agg" ->
      """SELECT CAST(user_id AS VARCHAR) AS "user",
        |  (epoch_ns(ts) // 86400000000000) * 86400000000000 AS window_start,
        |  round(avg(value), 4) AS avg_value, max(value) AS max_value,
        |  count(props) AS count_props, count(value) AS count_value
        |FROM events WHERE event_type = 'error'
        |GROUP BY 1, 2 ORDER BY 2, 1""".stripMargin,
    "distinct_users_per_type" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )

  /** DuckDB oracle for the SimHash battery, generated over the 64 bit
    * lanes: lane b = bit (b%4) of md5-hex nibble (b/4); vote = Σ(±1);
    * sketch nibble j = sign bits 4j..4j+3, printed MSB-first as hex.
    * Mirrors [[graft.pipeline.Dedup.simhash]] exactly — both sides hash
    * the same 3-gram shingles with their own md5. */
  /** Shared CTE prefix: 3-gram shingles → md5 posts → per-doc 64 bit-lane
    * votes (lane b = bit b%4 of md5-hex nibble b/4), as `v(doc_id, v0..v63)`. */
  private def simhashVotesCte: String = {
    val votes = (0 until 64).map { b =>
      s"sum(CASE WHEN (((strpos('0123456789abcdef', h[${b / 4 + 1}]) - 1) >> ${b % 4}) & 1) = 1" +
        s" THEN 1 ELSE -1 END) AS v$b"
    }.mkString(",\n   ")
    s"""w AS (SELECT doc_id,
       |  list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS ws
       |  FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) AS s
       |  FROM w WHERE len(ws) >= 3),
       |posts AS (SELECT doc_id, md5(unnest(s)) AS h FROM sh),
       |v AS (SELECT doc_id,
       |   $votes
       | FROM posts GROUP BY 1)""".stripMargin
  }

  private def simhashOracle: String = {
    val hexChars = (15 to 0 by -1).map { j =>
      val nib = (0 until 4)
        .map(i => s"(CASE WHEN v${4 * j + i} > 0 THEN ${1 << i} ELSE 0 END)")
        .mkString(" + ")
      s"substring('0123456789abcdef', 1 + $nib, 1)"
    }.mkString(" || ")
    s"""WITH $simhashVotesCte
       |SELECT doc_id AS doc, $hexChars AS simhash_hex
       |FROM v ORDER BY 1""".stripMargin
  }

  /** DuckDB oracle for SimHash near-dup pairs: same vote CTE as
    * [[simhashOracle]], sketches materialized as 16 nibble ints, then a
    * BRUTE-FORCE all-pairs Hamming join — the Spark side's band blocking
    * is complete at radius 3 (pigeonhole over 4 disjoint 16-bit bands),
    * so the two must agree exactly. */
  private def simhashNearDupOracle: String = {
    val nibs = (0 until 16).map { j =>
      "(" + (0 until 4)
        .map(i => s"(CASE WHEN v${4 * j + i} > 0 THEN ${1 << i} ELSE 0 END)")
        .mkString(" + ") + s") AS nib$j"
    }.mkString(", ")
    val ham = (0 until 16)
      .map(j => s"bit_count(xor(a.nib$j, b.nib$j)::BIGINT)")
      .mkString(" + ")
    s"""WITH $simhashVotesCte,
       |n AS (SELECT doc_id, $nibs FROM v)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST($ham AS BIGINT) AS hamming
       |FROM n a JOIN n b ON a.doc_id < b.doc_id
       |WHERE $ham <= 3
       |ORDER BY 1, 2""".stripMargin
  }

  /** Shared CTE chain for the cluster oracles: the dedup_minhash_lsh pair
    * chain (same signatures/bands/verify), then connected components via
    * a recursive reachability CTE, labels = per-component min doc_id —
    * ends with `lab(doc_id, cluster_id)` and `sz(cluster_id,
    * cluster_size)`. */
  private def dupClusterCte: String =
    """WITH RECURSIVE w AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) AS s
      |  FROM w WHERE len(ws) >= 3),
      |posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
      |sig AS (SELECT doc_id,
      | min(substring(md5('0:' || sg), 1, 8)) AS m0,
      | min(substring(md5('0:' || sg), 9, 8)) AS m1,
      | min(substring(md5('0:' || sg), 17, 8)) AS m2,
      | min(substring(md5('0:' || sg), 25, 8)) AS m3,
      | min(substring(md5('1:' || sg), 1, 8)) AS m4,
      | min(substring(md5('1:' || sg), 9, 8)) AS m5,
      | min(substring(md5('1:' || sg), 17, 8)) AS m6,
      | min(substring(md5('1:' || sg), 25, 8)) AS m7
      | FROM posts GROUP BY 1),
      |band AS (
      | SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS h FROM sig
      | UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig
      | UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM sig
      | UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM sig),
      |cnd AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      | FROM band a JOIN band b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
      |pairs AS (SELECT c.doc_a, c.doc_b
      | FROM cnd c JOIN sh x ON x.doc_id = c.doc_a JOIN sh y ON y.doc_id = c.doc_b
      | WHERE len(list_intersect(x.s, y.s))::DOUBLE
      |       / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= 0.8),
      |und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |        UNION SELECT doc_b, doc_a FROM pairs),
      |reach(node, r) AS (
      | SELECT doc_id, doc_id FROM documents
      | UNION
      | SELECT reach.node, und.b FROM reach JOIN und ON und.a = reach.r),
      |lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
      |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)""".stripMargin

  private def dedupClustersOracle: String =
    s"""$dupClusterCte
       |SELECT lab.doc_id, lab.cluster_id, sz.cluster_size
       |FROM lab JOIN sz USING (cluster_id) ORDER BY 1""".stripMargin

  /** Canonical-copy oracle: per-cluster argmax on the doc_stats quality
    * score (same formula), min doc_id tie-break. */
  private def dedupCanonicalOracle: String =
    s"""$dupClusterCte,
       |qq AS (SELECT doc_id,
       |  CAST(floor((0.4 * least(len(ws) / 100.0, 1.0)
       |      + 0.3 * (len(list_distinct(ws))::DOUBLE / len(ws))
       |      + 0.3 * (len(list_filter(ws, x -> x IN ('the','a','of','and')))::DOUBLE / len(ws)))
       |    * 10000 + 0.5) AS BIGINT) AS score
       |  FROM w),
       |rkd AS (SELECT lab.doc_id, lab.cluster_id, sz.cluster_size, qq.score,
       |    row_number() OVER (PARTITION BY lab.cluster_id
       |                       ORDER BY qq.score DESC, lab.doc_id ASC) AS rk
       |  FROM lab JOIN sz USING (cluster_id) JOIN qq USING (doc_id))
       |SELECT doc_id, cluster_id, cluster_size, score
       |FROM rkd WHERE rk = 1 ORDER BY doc_id""".stripMargin

  /** Shared CTE prefix for the winnowing oracles: positional 3-gram
    * shingles (duplicates kept) → int(md5[0:8]) hashes → window-4 min
    * selection, distinct, as `m(doc_id, fps)`. Mirrors
    * [[graft.pipeline.TextAnalysis.winnowHashes]] exactly. */
  private def winnowFpsCte: String =
    s"""WITH w AS (SELECT doc_id,
       |  list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS ws
       |  FROM documents),
       |g AS (SELECT doc_id,
       |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)] AS sh
       |  FROM w WHERE len(ws) >= 3),
       |h AS (SELECT doc_id,
       |  list_transform(list_transform(sh, s -> substring(md5(s), 1, 8)),
       |                 x -> ${hexToIntSql("x")}) AS hs FROM g),
       |m AS (SELECT doc_id, CASE WHEN len(hs) >= 4
       |  THEN list_distinct([list_min(hs[i:i+3]) FOR i IN range(1, len(hs) - 2)])
       |  ELSE [list_min(hs)] END AS fps FROM h)""".stripMargin

  /** SQL parsing an 8-hex-char column to its integer value (DuckDB lacks
    * a hex→int conv; both engines then agree on md5-bucket arithmetic). */
  private def hexToIntSql(col: String): String = hexToIntSqlN(col, 8)

  /** General n-hex-char variant (n ≤ 15 stays in BIGINT). */
  private def hexToIntSqlN(col: String, n: Int): String =
    (1 to n).map { i =>
      val mult = java.math.BigInteger.valueOf(16L).pow(n - i)
      s"(strpos('0123456789abcdef', $col[$i]) - 1) * ${mult}"
    }.mkString(" + ")

  /** Oracle for the T=2 mixture-sampling battery entry: re-derives the
    * √-share rates with the SAME arithmetic shape as
    * [[graft.pipeline.Sampling.mixtureSample]] (integer counts, IEEE
    * sqrt/floor in the same association order, 12-hex-char md5 ppm) —
    * membership is bit-for-bit, not statistical. */
  private def mixtureSampleOracle: String =
    s"""WITH c AS (SELECT lang AS src, count(*) AS src_n FROM documents GROUP BY 1),
       |cq AS (SELECT src, src_n,
       |         CAST(floor(sqrt(src_n * 1000000)) AS BIGINT) AS sq FROM c),
       |t AS (SELECT sum(src_n) AS tot_n, sum(sq) AS tot_s FROM cq),
       |r AS (SELECT src,
       |        least(1000000, CAST(floor(
       |          ((CAST(floor((tot_n * 500000.0) / 1000000.0) AS BIGINT) * 1000000.0) * sq)
       |          / (CAST(tot_s AS DOUBLE) * src_n)) AS BIGINT)) AS rate_ppm
       |      FROM cq CROSS JOIN t),
       |h AS (SELECT doc_id, lang,
       |        substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 12) AS hx
       |      FROM documents),
       |p AS (SELECT doc_id, lang, (${hexToIntSqlN("hx", 12)}) % 1000000 AS ppm FROM h)
       |SELECT p.doc_id, p.lang FROM p JOIN r ON p.lang = r.src
       |WHERE ppm < rate_ppm ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for the HIGH-threshold (sign-LSH-routed) near-dup
    * battery entry: plants near-duplicate copies of the first 50 vectors
    * (components × alternating 1.45/0.55 — DuckDB's lambda index is
    * 1-based, hence `(i-1) % 2`), embeds the SAME 24-table × 8-plane
    * seeded hyperplanes as literals, and re-derives buckets → candidates
    * → exact-cosine verification. Any pair the 8-bit LSH misses is
    * missed identically on both sides (same planes, same signs), so the
    * row set is pinned exactly, not just recall-tested. */
  /** DuckDB oracle for the COMPOSED curation lineage: re-composes the
    * already-oracled stage SQL (lang_id, doc_stats quality formula,
    * dedup_exact fingerprint, dedup_minhash_lsh signatures/banding,
    * dedup_clusters reachability, decontaminate gram hashing) in
    * [[graft.pipeline.Curate]]'s sequential-survivor order, with the
    * same planted rows as the Spark query. */
  private def curateLineageOracle: String =
    s"""WITH RECURSIVE d AS (SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 15
       |  UNION ALL SELECT 200000, 'der die und das der die und das der die und das'),
       |w AS (SELECT doc_id, text,
       |  list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS ws
       |  FROM d),
       |sig0 AS (SELECT doc_id,
       |  CASE WHEN (length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')))
       |            > greatest(len(list_filter(ws, x -> x IN ('the','a','of','and'))),
       |                       len(list_filter(ws, x -> x IN ('der','die','und','das'))),
       |                       len(list_filter(ws, x -> x IN ('el','que','los','y'))),
       |                       len(list_filter(ws, x -> x IN ('le','les','et','la')))) THEN 'zh'
       |       WHEN len(list_filter(ws, x -> x IN ('the','a','of','and')))
       |            >= greatest(len(list_filter(ws, x -> x IN ('der','die','und','das'))),
       |                        len(list_filter(ws, x -> x IN ('el','que','los','y'))),
       |                        len(list_filter(ws, x -> x IN ('le','les','et','la')))) THEN 'en'
       |       WHEN len(list_filter(ws, x -> x IN ('der','die','und','das')))
       |            >= greatest(len(list_filter(ws, x -> x IN ('el','que','los','y'))),
       |                        len(list_filter(ws, x -> x IN ('le','les','et','la')))) THEN 'de'
       |       WHEN len(list_filter(ws, x -> x IN ('el','que','los','y')))
       |            >= len(list_filter(ws, x -> x IN ('le','les','et','la'))) THEN 'es'
       |       ELSE 'fr' END AS lang,
       |  CAST(floor((0.4 * least(len(ws) / 100.0, 1.0)
       |      + 0.3 * (len(list_distinct(ws))::DOUBLE / len(ws))
       |      + 0.3 * (len(list_filter(ws, x -> x IN ('the','a','of','and')))::DOUBLE / len(ws)))
       |    * 10000 + 0.5) AS BIGINT) AS q
       | FROM w),
       |qualok AS (SELECT doc_id, q FROM sig0 WHERE lang IN ('en') AND q >= 3400),
       |fp AS (SELECT w.doc_id, q.q,
       |         md5(regexp_replace(lower(trim(w.text)), '\\s+', ' ', 'g')) AS f
       |       FROM w JOIN qualok q ON q.doc_id = w.doc_id),
       |fpg AS (SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY 1),
       |exact_drop AS (SELECT fp.doc_id, 'exact_dup' AS drop_reason, fpg.keep_id AS dup_of
       |               FROM fp JOIN fpg USING (f) WHERE fp.doc_id <> fpg.keep_id),
       |exactok AS (SELECT fp.doc_id, fp.q FROM fp JOIN fpg USING (f) WHERE fp.doc_id = fpg.keep_id),
       |sh AS (SELECT w.doc_id,
       |  list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) AS s
       |  FROM w JOIN exactok e ON e.doc_id = w.doc_id WHERE len(ws) >= 3),
       |posts AS (SELECT doc_id, unnest(s) AS sg FROM sh),
       |msig AS (SELECT doc_id,
       | min(substring(md5('0:' || sg), 1, 8)) AS m0,
       | min(substring(md5('0:' || sg), 9, 8)) AS m1,
       | min(substring(md5('0:' || sg), 17, 8)) AS m2,
       | min(substring(md5('0:' || sg), 25, 8)) AS m3,
       | min(substring(md5('1:' || sg), 1, 8)) AS m4,
       | min(substring(md5('1:' || sg), 9, 8)) AS m5,
       | min(substring(md5('1:' || sg), 17, 8)) AS m6,
       | min(substring(md5('1:' || sg), 25, 8)) AS m7
       | FROM posts GROUP BY 1),
       |band AS (
       | SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS h FROM msig
       | UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM msig
       | UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM msig
       | UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM msig),
       |cnd AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       | FROM band a JOIN band b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
       |pairs AS (SELECT c.doc_a, c.doc_b
       | FROM cnd c JOIN sh x ON x.doc_id = c.doc_a JOIN sh y ON y.doc_id = c.doc_b
       | WHERE len(list_intersect(x.s, y.s))::DOUBLE
       |       / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= 0.8),
       |und AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
       |reach(node, r) AS (
       | SELECT doc_id, doc_id FROM exactok
       | UNION
       | SELECT reach.node, und.b FROM reach JOIN und ON und.a = reach.r),
       |lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |rkd AS (SELECT lab.doc_id, lab.cluster_id,
       |    row_number() OVER (PARTITION BY lab.cluster_id
       |                       ORDER BY e.q DESC, lab.doc_id ASC) AS rk
       |  FROM lab JOIN exactok e USING (doc_id)),
       |keepc AS (SELECT cluster_id, doc_id AS keep FROM rkd WHERE rk = 1),
       |near_drop AS (SELECT rkd.doc_id, 'near_dup' AS drop_reason, keepc.keep AS dup_of
       |              FROM rkd JOIN keepc USING (cluster_id) WHERE rk > 1),
       |nearok AS (SELECT doc_id FROM rkd WHERE rk = 1),
       |g5 AS (SELECT doc_id, list_distinct(
       |  [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]
       |   FOR i IN range(1, len(ws) - 3)]) AS sh5
       |  FROM w WHERE len(ws) >= 5),
       |p5 AS (SELECT doc_id, substring(md5(s), 1, 8) AS hx
       |      FROM (SELECT doc_id, unnest(sh5) AS s FROM g5)),
       |ph AS (SELECT doc_id, CAST(${hexToIntSql("hx")} AS BIGINT) AS gh FROM p5),
       |tp AS (SELECT ph.doc_id, gh FROM ph JOIN nearok n ON n.doc_id = ph.doc_id),
       |ep AS (SELECT doc_id AS eval_id, gh FROM ph WHERE doc_id % 20 = 0),
       |contam AS (SELECT tp.doc_id FROM tp JOIN ep USING (gh)
       |           GROUP BY 1 HAVING count(DISTINCT gh) >= 3),
       |contam_drop AS (SELECT doc_id, 'contaminated' AS drop_reason, CAST(NULL AS BIGINT) AS dup_of FROM contam),
       |filter_drop AS (SELECT doc_id,
       |    CASE WHEN lang NOT IN ('en') THEN 'lang'
       |         WHEN q < 3400 THEN 'quality' END AS drop_reason,
       |    CAST(NULL AS BIGINT) AS dup_of
       |  FROM sig0 WHERE lang NOT IN ('en') OR q < 3400),
       |dropped AS (SELECT * FROM filter_drop UNION ALL SELECT * FROM exact_drop
       |            UNION ALL SELECT * FROM near_drop UNION ALL SELECT * FROM contam_drop)
       |SELECT d.doc_id, coalesce(dr.drop_reason, 'kept') AS drop_reason,
       |       coalesce(dr.dup_of, -1) AS dup_of
       |FROM d
       |LEFT JOIN dropped dr USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  private def neardupHiOracle: String = {
    val planeRows = graft.pipeline.Similarity.tablePlanes(24, 8, 64, 42L)
      .map { case (t, planes) =>
        planes.map(_.mkString("[", ", ", "]")).mkString(s"($t, ", ", ", ")")
      }.mkString(",\n  ")
    def bkt(v: String) = (0 until 8)
      .map(i => s"${1 << i} * (CASE WHEN list_dot_product($v, p$i) >= 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
       |pert AS (SELECT id + 100000 AS id,
       |           list_transform(vec, (x, i) -> x * (CASE WHEN (i - 1) % 2 = 0
       |             THEN 1.45::DOUBLE ELSE 0.55::DOUBLE END)) AS vec
       |         FROM base WHERE id < 50),
       |v AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
       |planes(tbl, p0, p1, p2, p3, p4, p5, p6, p7) AS (VALUES
       |  $planeRows),
       |bk AS (SELECT id, tbl, ${bkt("vec")} AS bkt FROM v CROSS JOIN planes),
       |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |         FROM bk x JOIN bk y ON x.tbl = y.tbl AND x.bkt = y.bkt AND x.id < y.id)
       |SELECT id_a, id_b, round(list_cosine_similarity(a.vec, b.vec), 4) AS cosine
       |FROM cand JOIN v a ON a.id = cand.id_a JOIN v b ON b.id = cand.id_b
       |WHERE list_cosine_similarity(a.vec, b.vec) >= 0.9
       |ORDER BY 1, 2""".stripMargin
  }

  /** DuckDB oracle for sign-LSH ANN: the SAME seeded hyperplanes the
    * Spark side uses ([[graft.pipeline.Similarity.tablePlanes]]) embedded
    * as list literals (shortest-round-trip doubles — both engines see
    * bit-identical planes, and both compute dot products as a sequential
    * left-to-right sum, so bucket signs agree exactly). Ranks are taken
    * on the 4-dp-rounded cosine with id tie-break, like the Spark side. */
  private def annLshOracle: String = {
    val planeRows = graft.pipeline.Similarity.tablePlanes(8, 4, 64, 42L)
      .map { case (t, planes) =>
        planes.map(_.mkString("[", ", ", "]")).mkString(s"($t, ", ", ", ")")
      }.mkString(",\n  ")
    def bkt(v: String) = (0 until 4)
      .map(i => s"${1 << i} * (CASE WHEN list_dot_product($v, p$i) >= 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
       |planes(tbl, p0, p1, p2, p3) AS (VALUES
       |  $planeRows),
       |qb AS (SELECT query_id, tbl, ${bkt("qv")} AS bkt FROM q CROSS JOIN planes),
       |cb AS (SELECT neighbor_id, tbl, ${bkt("nv")} AS bkt FROM c CROSS JOIN planes),
       |cand AS (SELECT DISTINCT query_id, neighbor_id
       |         FROM qb JOIN cb USING (tbl, bkt) WHERE query_id <> neighbor_id),
       |scored AS (SELECT query_id, neighbor_id,
       |             round(list_cosine_similarity(qv, nv), 4) AS cosine
       |           FROM cand JOIN q USING (query_id) JOIN c USING (neighbor_id))
       |SELECT query_id, rank, neighbor_id, cosine FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB oracle for IVF ANN: centroids are the first 16 corpus vectors
    * by id — a rule the oracle derives from the same parquet table, so
    * assignment (dot DESC, cid ASC), nprobe=6 probing, and ranking are
    * reproduced exactly. */
  private def annIvfOracle: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
      |cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
      |            embedding::DOUBLE[] AS cv
      |          FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
      |ca AS (SELECT neighbor_id, cid FROM (
      |  SELECT neighbor_id, cid,
      |    row_number() OVER (PARTITION BY neighbor_id
      |                       ORDER BY list_dot_product(nv, cv) DESC, cid ASC) AS rn
      |  FROM c CROSS JOIN cents) t WHERE rn = 1),
      |qa AS (SELECT query_id, cid FROM (
      |  SELECT query_id, cid,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY list_dot_product(qv, cv) DESC, cid ASC) AS rn
      |  FROM q CROSS JOIN cents) t WHERE rn <= 6),
      |cand AS (SELECT DISTINCT query_id, neighbor_id
      |         FROM qa JOIN ca USING (cid) WHERE query_id <> neighbor_id),
      |scored AS (SELECT query_id, neighbor_id,
      |             round(list_cosine_similarity(qv, nv), 4) AS cosine
      |           FROM cand JOIN q USING (query_id) JOIN c USING (neighbor_id))
      |SELECT query_id, rank, neighbor_id, cosine FROM (
      |  SELECT query_id, neighbor_id, cosine,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
      |  FROM scored) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** DuckDB oracle for [[Queries.annPqTopK]] (IVF-PQ/ADC): first-16
    * centroids + first-16-per-subspace codebooks derived from the table
    * itself; encode = per-subspace argmin of x·x − 2·x·c + c·c (the
    * EXACT double formula the Spark expression evaluates, so argmin ties
    * break identically); ADC partials are ⌊dot·10⁴+0.5⌋ longs whose
    * integer sum is summation-order-free in both engines. m=8 subspaces
    * × 8 dims, ks=16 codes, nlist=16, nprobe=6, k=10. */
  private def annPqOracle: String =
    s"""$annPqCte
       |SELECT query_id, rank, neighbor_id, adc_e4 FROM (
       |  SELECT query_id, neighbor_id, adc_e4,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY adc_e4 DESC, neighbor_id ASC) AS rank
       |  FROM sc) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Two-stage oracle: the ADC shortlist widened to 4·k = 40, then
    * exact-cosine rescored and re-ranked (the `embedding_topk` cosine
    * formula over the shortlist rows only). */
  private def annPqRefineOracle: String =
    s"""$annPqCte,
       |sl AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY adc_e4 DESC, neighbor_id ASC) AS rk
       |  FROM sc) t WHERE rk <= 40),
       |rs AS (SELECT sl.query_id, sl.neighbor_id,
       |         round(list_cosine_similarity(q.qv, c.nv), 4) AS cosine
       |       FROM sl JOIN q USING (query_id)
       |       JOIN c ON c.neighbor_id = sl.neighbor_id)
       |SELECT query_id, rank, neighbor_id, cosine FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM rs) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Shared IVF-PQ CTE chain ending at `sc(query_id, neighbor_id,
    * adc_e4)` — the full ADC candidate scoring both PQ oracles rank. */
  private def annPqCte: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
      |f16 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS ci,
      |          embedding::DOUBLE[] AS cv
      |        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
      |ca AS (SELECT neighbor_id, cid FROM (
      |  SELECT neighbor_id, ci AS cid,
      |    row_number() OVER (PARTITION BY neighbor_id
      |                       ORDER BY list_dot_product(nv, cv) DESC, ci ASC) AS rn
      |  FROM c CROSS JOIN f16) t WHERE rn = 1),
      |qa AS (SELECT query_id, cid FROM (
      |  SELECT query_id, ci AS cid,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY list_dot_product(qv, cv) DESC, ci ASC) AS rn
      |  FROM q CROSS JOIN f16) t WHERE rn <= 6),
      |cb AS (SELECT j, ci AS code, list_slice(cv, j*8+1, j*8+8) AS cw,
      |         list_dot_product(list_slice(cv, j*8+1, j*8+8),
      |                          list_slice(cv, j*8+1, j*8+8)) AS cc
      |       FROM f16 CROSS JOIN (SELECT unnest(range(8)) AS j)),
      |enc AS (SELECT neighbor_id, j, code FROM (
      |  SELECT c.neighbor_id, cb.j, cb.code,
      |    row_number() OVER (PARTITION BY c.neighbor_id, cb.j
      |      ORDER BY list_dot_product(list_slice(nv, cb.j*8+1, cb.j*8+8),
      |                                list_slice(nv, cb.j*8+1, cb.j*8+8))
      |               - list_dot_product(list_slice(nv, cb.j*8+1, cb.j*8+8), cb.cw) * 2
      |               + cb.cc ASC, cb.code ASC) AS rn
      |  FROM c CROSS JOIN cb) t WHERE rn = 1),
      |cand AS (SELECT DISTINCT query_id, neighbor_id
      |         FROM qa JOIN ca USING (cid) WHERE query_id <> neighbor_id),
      |parts AS (SELECT cand.query_id, cand.neighbor_id,
      |    CAST(floor(list_dot_product(list_slice(q.qv, cb.j*8+1, cb.j*8+8), cb.cw)
      |               * 10000 + 0.5) AS BIGINT) AS pe4
      |  FROM cand JOIN q USING (query_id)
      |  JOIN enc e ON e.neighbor_id = cand.neighbor_id
      |  JOIN cb ON cb.j = e.j AND cb.code = e.code),
      |sc AS (SELECT query_id, neighbor_id, CAST(sum(pe4) AS BIGINT) AS adc_e4
      |       FROM parts GROUP BY 1, 2)""".stripMargin
}
