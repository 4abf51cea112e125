package graft

import graft.queries.CoreQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one named query per implemented operator (SURVEY.md
  * §2) plus its DuckDB-runnable ANSI-SQL oracle over the same parquet
  * tables. Column names/types are aligned pairwise (driver hashes values
  * after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.goldAgg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_gold_agg"          -> ((s, d) => CoreQueries.goldAgg(s, d)),
    "q02_quality_split_ok"  -> ((s, d) => CoreQueries.qualitySplitOk(s, d)),
    "q03_quality_split_bad" -> ((s, d) => CoreQueries.qualitySplitBad(s, d)),
    "q04_derive"            -> ((s, d) => CoreQueries.derive(s, d)),
    "q05_stay_duration"     -> ((s, d) => CoreQueries.stayDuration(s, d)),
    "q06_latest_lookup"     -> ((s, d) => CoreQueries.latestLookup(s, d)),
    "q07_alter_row"         -> ((s, d) => CoreQueries.alterRow(s, d)),
    "q08_merge_upsert"      -> ((s, d) => CoreQueries.mergeUpsert(s, d)),
    "q09_scd1_fold"         -> ((s, d) => CoreQueries.scd1Fold(s, d)),
    "q10_final_select"      -> ((s, d) => CoreQueries.finalSelect(s, d)),
    "q11_cdc_end_to_end"    -> ((s, d) => CoreQueries.cdcEndToEnd(s, d)),
    "q12_pricing_summary"   -> ((s, d) => CoreQueries.pricingSummary(s, d)),
    "q13_topk_customers"    -> ((s, d) => CoreQueries.topkCustomers(s, d)),
    "q14_region_rollup"     -> ((s, d) => CoreQueries.regionRollup(s, d)),
  )

  // DuckDB twins. Conventions shared with the Spark side (graft.Oracle):
  // second-precision strftime for event timestamps (ns parquet),
  // DECIMAL-routed money sums, BIGINT-aligned integer outputs,
  // deterministic window tie-breaks on (formatted ts, key).
  def oracleSql: Map[String, String] = Map(
    "q01_gold_agg" ->
      """SELECT n_name AS country, COUNT(*) AS total_bookings,
         CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
         strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_booking_date
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q02_quality_split_ok" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE NOT COALESCE(l_shipdate < o_orderdate, FALSE)""",
    "q03_quality_split_bad" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE COALESCE(l_shipdate < o_orderdate, FALSE)""",
    "q04_derive" ->
      """SELECT event_id, user_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
         CAST(year(ts) AS BIGINT) AS booking_year,
         CAST(month(ts) AS BIGINT) AS booking_month,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         event_type || ':' || CAST(user_id AS VARCHAR) AS tag
         FROM events""",
    "q05_stay_duration" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST((epoch_ms(l_shipdate) - epoch_ms(o_orderdate)) // 86400000 AS BIGINT) AS stay_duration
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "q06_latest_lookup" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
         ts_s AS last_ts
         FROM (SELECT user_id, event_id, event_type,
                 strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S') DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1""",
    "q07_alter_row" ->
      """SELECT e.event_id, e.user_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
         CASE WHEN x.user_id IS NULL THEN 'insert' ELSE 'update' END AS op
         FROM events e
         LEFT JOIN (SELECT DISTINCT user_id FROM events
                    WHERE event_id % 10 < 8) x
           ON e.user_id = x.user_id
         WHERE e.event_id % 10 >= 8""",
    "q08_merge_upsert" ->
      """WITH pre AS (
           SELECT user_id, event_id, event_type, value,
                  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S') DESC, event_id DESC) AS rn
           FROM events WHERE event_id % 10 < 8),
         post AS (
           SELECT user_id, event_id, event_type, value,
                  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S') DESC, event_id DESC) AS rn
           FROM events WHERE event_id % 10 >= 8)
         SELECT user_id, event_id, event_type, value, ts_s FROM pre
         WHERE rn = 1 AND user_id NOT IN (SELECT user_id FROM post WHERE rn = 1)
         UNION ALL
         SELECT user_id, event_id, event_type, value, ts_s FROM post WHERE rn = 1""",
    "q09_scd1_fold" ->
      """SELECT user_id, event_id, event_type, ts_s
         FROM (SELECT user_id, event_id, event_type,
                 strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY (CASE quarter(ts) WHEN 2 THEN 0 WHEN 1 THEN 1
                             WHEN 4 THEN 2 ELSE 3 END) DESC,
                            strftime(ts, '%Y-%m-%d %H:%M:%S') DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1""",
    "q10_final_select" ->
      """SELECT c_custkey AS customer_id, c_name AS full_name,
         c_mktsegment AS segment, n_name AS country,
         c_name || ', ' || n_name AS full_address
         FROM customer JOIN nation ON c_nationkey = n_nationkey""",
    "q11_cdc_end_to_end" ->
      """WITH ok AS (SELECT * FROM events WHERE NOT COALESCE(event_type = 'error', FALSE)),
         latest AS (
           SELECT user_id, value, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S') DESC, event_id DESC) AS rn
           FROM ok)
         SELECT n_name AS country, COUNT(*) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           MAX(ts_s) AS last_seen
         FROM latest JOIN customer ON user_id = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE rn = 1
         GROUP BY n_name""",
    "q12_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q13_topk_customers" ->
      """SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
         FROM orders GROUP BY o_custkey
         ORDER BY revenue DESC, o_custkey ASC LIMIT 10""",
    "q14_region_rollup" ->
      """SELECT r_name AS region, COUNT(*) AS total_bookings,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
  )
}
