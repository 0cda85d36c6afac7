package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{Ingest, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named `(SparkSession, sfDir) => DataFrame`, with a DuckDB-runnable
  * ANSI SQL oracle where the semantics are SQL-expressible. The
  * driver's compare sorts columns by NAME and hashes values, so each
  * computed column is aliased identically in the Spark query and the
  * oracle SQL, and every query ends with a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §7.2 minimum slice: ingest + partition-column derivation (S2/P1/P2/F1-F4)
    "q_ingest_partition" -> Ingest.eventsPartitioned _,
    // §2.4 aggregations
    "q1_pricing" -> Relational.q1PricingSummary _,
    "q2_pushdown" -> Relational.q2FilterPushdown _,
    "q_having" -> Relational.qHaving _,
    "q_count_distinct" -> Relational.qCountDistinct _,
    "q_approx_distinct" -> Relational.qApproxDistinct _,
    "q_rollup" -> Relational.qRollup _,
    "q_cube" -> Relational.qCube _,
    // §2.3 joins
    "q3_shipping" -> Relational.q3ShippingPriority _,
    "q5_local_revenue" -> Relational.q5LocalRevenue _,
    "q_semi_join" -> Relational.qSemiJoin _,
    "q_anti_join" -> Relational.qAntiJoin _,
    "q_outer_counts" -> Relational.qOuterCounts _,
    "q_broadcast_dim" -> Relational.qBroadcastDim _,
    "q_scalar_subquery" -> Relational.qScalarSubquery _,
    // §2.5 window functions
    "q_window_rank" -> Relational.qWindowRank _,
    "q_window_running" -> Relational.qWindowRunning _,
    "q_window_lag_lead" -> Relational.qWindowLagLead _,
    // §2.6 sort / limit / set ops
    "q_topk" -> Relational.qTopK _,
    "q_distinct" -> Relational.qDistinct _,
    "q_set_ops" -> Relational.qSetOps _,
    "q_union" -> Relational.qUnion _,
    "q_case_buckets" -> Relational.qCaseBuckets _,
  )

  /** DuckDB oracle SQL per query key (same parquet tables, registered
    * by table name). Omitted for q_approx_distinct (sketch estimates
    * are implementation-defined → rows-only check).
    */
  def oracleSql: Map[String, String] = Map(
    "q_ingest_partition" ->
      """SELECT event_id, user_id, event_type, value,
        |  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  strftime(ts, '%Y-%m-%d') AS logday,
        |  strftime(ts, '%H') AS h,
        |  strftime(ts, '%M') AS m
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_having" ->
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 1000
        |ORDER BY l_partkey""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_parts,
        |  COUNT(DISTINCT l_suppkey) AS nd_supps,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
        |  COALESCE(o_orderstatus, 'ALL') AS st,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus)
        |ORDER BY seg, st""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_outer_counts" ->
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,4))) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_broadcast_dim" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |WHERE p_retailprice >
        |  (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |   FROM part) * 1.05
        |ORDER BY p_partkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders
        |ORDER BY o_custkey, orderdate, o_orderkey""".stripMargin,
    "q_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  NTILE(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_set_ops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q_union" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nationkey, 'customer' AS side
        |FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INTEGER) AS nationkey, 'supplier' AS side
        |FROM supplier
        |ORDER BY nationkey, side""".stripMargin,
    "q_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  COUNT(*) AS n,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,
  )
}
