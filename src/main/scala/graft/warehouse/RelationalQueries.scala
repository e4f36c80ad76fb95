package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables
import graft.util.Exact.{cents, netE4}

/** Core relational operator surface (SURVEY.md §2.2–§2.4, §2.6–§2.7).
  *
  * Oracle-parity conventions (driver compares vs DuckDB at sf0.01):
  *  - every money/quantity output is a BIGINT scaled integer (Exact.cents /
  *    Exact.netE4) so aggregation is exact, order-independent, and free of the
  *    driver hasher's decimal-repr normalization in both engines;
  *  - every result has a total ORDER BY on a unique key combination;
  *  - every computed column is aliased identically in Spark and SQL.
  *
  * Scale notes are attached per query: each one is declarative DataFrame
  * code, so Catalyst pushes filters/prunes columns into the Parquet scan and
  * AQE picks join strategies at runtime. Nothing materializes on the driver.
  */
object RelationalQueries {

  // Money outputs are BIGINT scaled integers (cents / 1e-4 units) on BOTH
  // engines — see graft.util.Exact for why no oracle-gated output may carry
  // a decimal type (round-2 verdict: the driver's hasher strips decimal
  // trailing zeros on one side only).

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- A2: grouped aggregation (TPC-H Q1 shape). Partial aggregation
    //    (map-side combine) happens automatically; only |groups| rows
    //    shuffle, so this holds at any scale.
    "q01_agg_group" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
          sum(netE4(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price_e4"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // -- P6/P7: filter + projection. Predicate and column pruning reach the
    //    Parquet scan (PushedFilters on l_quantity/l_discount) — at 100 TB
    //    this reads only matching row groups and 4 columns.
    "q02_filter_project" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 45 && col("l_discount") > 0.07)
        .select(
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          cents(col("l_quantity")).as("qty_cents"),
          netE4(col("l_extendedprice"), col("l_discount")).as("net_price_e4"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // -- J2: broadcast join chain over the dim tables. region/nation are
    //    tiny at any scale factor -> explicit broadcast() keeps this
    //    shuffle-free on the fact side; customer aggregates map-side first.
    "q03_join_broadcast" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val nat  = Tables.nation(s, d)
      val reg  = Tables.region(s, d)
      cust
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(cents(col("c_acctbal"))).as("total_acctbal_cents"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // -- J1: large-side equi-join orders⋈lineitem. Catalyst/AQE picks
    //    sort-merge vs shuffled-hash; both sides shuffle on the join key
    //    once, and the aggregation reuses that partitioning.
    "q04_join_fact" -> { (s, d) =>
      val o  = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(cents(col("l_extendedprice"))).as("total_price_cents"))
        .orderBy(col("o_orderpriority"))
    },

    // -- J3: left outer join — customers keep a row even with zero orders
    //    (the reference's optional `ticket` field is the same semantics).
    "q05_join_outer" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(cents(col("o_totalprice"))), lit(0L)).as("total_spent_cents"))
        .orderBy(col("c_custkey"))
    },

    // -- J4a: left semi join (EXISTS).
    "q06_join_semi" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // -- J4b: left anti join (NOT EXISTS) — "customers with no high-value
    //    open order" (filter keeps the result non-empty at every sf).
    "q07_join_anti" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000 && col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // -- A3: distinct + count distinct.
    "q08_distinct" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("l_returnflag"))
    },

    // -- A6: filtered / conditional aggregation (pivot-style CASE sums).
    "q09_conditional_agg" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", cents(col("o_totalprice"))).otherwise(0L)).as("f_total_cents"),
          sum(when(col("o_orderstatus") === "O", cents(col("o_totalprice"))).otherwise(0L)).as("o_total_cents"),
          count(when(col("o_orderstatus") === "P", lit(1))).as("p_count"))
        .orderBy(col("o_orderpriority"))
    },

    // -- A5: rollup (hierarchical grouping sets region -> nation).
    "q10_rollup" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val nat  = Tables.nation(s, d)
      val reg  = Tables.region(s, d)
      cust
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },

    // -- A5 companion: rollup with GROUPING disambiguation — the
    //    practitioner-correct form where subtotal rows carry an explicit
    //    level id (grand total 3, region subtotal 1, detail 0) instead
    //    of being inferred from NULLs that could also be data. Spark's
    //    grouping_id() and the SQL-standard GROUPING(a, b) share the bit
    //    encoding, so the gate pins it exactly.
    "q127_rollup_grouping_id" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val nat  = Tables.nation(s, d)
      val reg  = Tables.region(s, d)
      cust
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_customers"))
        .select(col("r_name"), col("n_name"), col("gid"), col("n_customers"))
        .orderBy(col("gid").desc, col("r_name").asc_nulls_first,
          col("n_name").asc_nulls_first)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_cents,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS net_price_e4
        |FROM lineitem WHERE l_quantity >= 45 AND l_discount > 0.07
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_broadcast" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q04_join_fact" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_price_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_join_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)), 0) AS BIGINT) AS total_spent_cents
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q06_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q07_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_totalprice > 300000 AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q08_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q09_conditional_agg" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS f_total_cents,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS o_total_cents,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_count
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q10_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q127_rollup_grouping_id" ->
      """SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
        |  COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid DESC, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin
  )
}
