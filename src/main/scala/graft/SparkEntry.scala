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
    "wire_format"          -> (ReferenceOps.wireFormatRoundtrip(_, _)),
    "filter_pushdown_scan" -> (ReferenceOps.filterPushdownScan(_, _)),
  )

  /** DuckDB oracle twins (driver runs these on the same parquet dirs). */
  def oracleSql: Map[String, String] = Map(
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
  )
}
