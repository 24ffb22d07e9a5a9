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
    "tsdb_final_agg" -> (Queries.tsdbFinalAgg _),
    "tsdb_raw_scan" -> (Queries.tsdbRawScan _),
    "tsdb_tag_filter" -> (Queries.tsdbTagFilter _),
    "tsdb_point_lookup" -> (Queries.tsdbPointLookup _),
    "tsdb_cursor_page" -> (Queries.tsdbCursorPage _),
    "tsdb_latest_version" -> (Queries.tsdbLatestVersion _),
    "tsdb_tombstones" -> (Queries.tsdbTombstones _),
    "tsdb_desc_scan" -> (Queries.tsdbDescScan _),
    "show_metrics" -> (Queries.showMetrics _),
    "show_tag_values" -> (Queries.showTagValues _),
    "series_by_tags" -> (Queries.seriesByTags _),
    // Analytics / scale battery (SURVEY §2.6 + north star)
    "tpch_q1" -> (Queries.tpchQ1 _),
    "join_revenue_nation" -> (Queries.joinRevenueByNation _),
    "topk_per_group" -> (Queries.topKPerGroup _),
    "pushdown_scan" -> (Queries.pushdownScan _),
  )

  /** DuckDB-runnable oracle per query (same column names as the Spark side —
    * the driver sorts columns by name before hashing). */
  def oracleSql: Map[String, String] = Map(
    "tsdb_downsample_1h" ->
      """SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS "user",
        | (epoch_ns(ts) // 3600000000000) * 3600000000000 AS window_start,
        | round(avg(value), 4) AS avg_value, round(sum(value), 2) AS sum_value,
        | count(*) AS count_star
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
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
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
  )
}
