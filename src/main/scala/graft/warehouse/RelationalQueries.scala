package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.Tables

/** Core relational operator surface (SURVEY.md §2.2–§2.4, §2.6–§2.7).
  *
  * Oracle-parity conventions (driver compares vs DuckDB at sf0.01):
  *  - every money/quantity SUM goes through DecimalType(18,2) so the
  *    aggregation is exact and order-independent in both engines;
  *  - every result has a total ORDER BY on a unique key combination;
  *  - every computed column is aliased identically in Spark and SQL.
  *
  * Scale notes are attached per query: each one is declarative DataFrame
  * code, so Catalyst pushes filters/prunes columns into the Parquet scan and
  * AQE picks join strategies at runtime. Nothing materializes on the driver.
  */
object RelationalQueries {

  private val dec = DecimalType(18, 2)
  // Final aggregate outputs are pinned to DECIMAL(38,2) on BOTH engines:
  // Spark's SUM(DECIMAL(18,2)) widens to (28,2) while DuckDB's widens to
  // (38,2), and the driver's hash is physical-type sensitive (round-1
  // verdict). The cast is lossless (same scale, wider precision).
  private val dec38 = DecimalType(38, 2)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- A2: grouped aggregation (TPC-H Q1 shape). Partial aggregation
    //    (map-side combine) happens automatically; only |groups| rows
    //    shuffle, so this holds at any scale.
    "q01_agg_group" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast(dec38).as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast(dec38).as("sum_base_price"),
          // decimal-domain arithmetic: raw columns are exact 2-decimal
          // values, so cast-then-multiply is exact and order-independent
          // (casting the computed double instead would hit double→decimal
          // rounding divergence vs the oracle at .xx5 boundaries).
          sum(col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("sum_disc_price"),
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
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(dec).as("qty"),
          (col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec)))
            .cast(DecimalType(38, 4)).as("net_price"))
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
          sum(col("c_acctbal").cast(dec)).cast(dec38).as("total_acctbal"))
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
          sum(col("l_extendedprice").cast(dec)).cast(dec38).as("total_price"))
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
          coalesce(sum(col("o_totalprice").cast(dec)), lit(0).cast(dec)).cast(dec38).as("total_spent"))
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
          sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0).cast(dec)).cast(dec38).as("f_total"),
          sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0).cast(dec)).cast(dec38).as("o_total"),
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
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS net_price
        |FROM lineitem WHERE l_quantity >= 45 AND l_discount > 0.07
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_broadcast" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q04_join_fact" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_join_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(38,2)) AS total_spent
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
        |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS f_total,
        |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS o_total,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_count
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q10_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin
  )
}
