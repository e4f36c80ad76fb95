package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.{Exact, Tables}

/** TPC-H-shaped multi-join analytics — the realistic warehouse workloads
  * the reference's Redshift exists to serve (README.md:3). Classic Q3/Q5
  * shapes adapted to the testdata schema (no mktsegment filter dims
  * dropped where the generator lacks them).
  *
  * Plan shape at scale: dims broadcast, fact-fact joins shuffle once on
  * the join key, aggregations ride the same partitioning, AQE coalesces.
  */
object TpchQueries {

  /** Revenue in exact 10^-4 currency units as BIGINT (Exact.netE4):
    * round 1 emitted DECIMAL(38,4) here and failed the driver's hash with
    * types AND values verified identical (VERDICT q55/q56); this was the
    * prototype of the round-3 repo-wide decimal ban. */
  private def revenueE4(li: DataFrame): Column =
    sum(Exact.netE4(li("l_extendedprice"), li("l_discount")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- Q3 shape: shipping-priority revenue per order.
    "q55_tpch_q3" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(revenueE4(li).as("revenue_e4"))
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("orderdate"),
          col("o_orderpriority"), col("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("o_orderkey"))
        .limit(20)
    },

    // -- Q4 shape: correlated EXISTS. Exercises Catalyst's subquery
    //    decorrelation (RewritePredicateSubquery → LeftSemi with the
    //    non-equi shipdate predicate riding the join) — the physical
    //    plan is one shuffle on the order key, never a per-row probe.
    "q80_exists_subquery" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_q80")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q80")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM orders_q80
          |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          |  AND o_orderdate < TIMESTAMP '1995-04-01'
          |  AND EXISTS (SELECT 1 FROM lineitem_q80
          |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // -- Q10 shape: returned-item revenue per customer, top 20. Fact-fact
    //    join shuffles once on the order key; nation broadcasts; the
    //    limit is a TakeOrderedAndProject, not a global sort.
    "q81_tpch_q10" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val n = Tables.nation(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(revenueE4(li).as("revenue_e4"),
          max(Exact.cents(col("c_acctbal"))).as("acctbal_cents"))
        .orderBy(col("revenue_e4").desc, col("c_custkey"))
        .limit(20)
    },

    // -- Q17 shape: small-quantity-order revenue — the correlated
    //    AGGREGATE subquery face (`l_quantity < 0.2 * avg per part`).
    //    Expressed as its decorrelated form: one per-part aggregate
    //    joined back to the fact (what Catalyst's subquery decorrelation
    //    produces anyway), with the threshold comparison rewritten in
    //    EXACT integers — `q < 0.2 * (sum/n)` ⟺ `5·q_cents·n <
    //    sum_cents` — so no engine-dependent double average can flip a
    //    borderline row. Both fact passes shuffle on the same part key.
    "q85_tpch_q17" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_brand") === "Brand#11")
        .select(col("p_partkey"))
      val perPart = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg(sum(Exact.cents(col("l_quantity"))).as("sum_qty_cents"),
          count(lit(1)).as("n_qty"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(perPart, li("l_partkey") === col("ap_partkey"))
        .filter(Exact.cents(col("l_quantity")) * col("n_qty") * lit(5L) <
          col("sum_qty_cents"))
        .agg(sum(Exact.cents(col("l_extendedprice"))).as("small_order_revenue_cents"),
          count(lit(1)).as("n_lines"))
    },

    // -- Q18 shape: large-volume customers — HAVING-filtered aggregate as
    //    a semi-filter on the fact. The big-orders relation is ~0.3% of
    //    orders (473 at sf0.1): too big to assume broadcast at 100 TB, so
    //    it joins by shuffle on the order key — the SAME key the
    //    customer⋈orders⋈lineitem chain and the final groupBy already
    //    shuffle on, so AQE reuses the exchange; it may still elect to
    //    broadcast at small SF.
    "q88_tpch_q18" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val big = li.groupBy(col("l_orderkey").as("big_orderkey"))
        .agg(sum(Exact.cents(col("l_quantity"))).as("sum_q_cents"))
        .filter(col("sum_q_cents") > lit(300L * 100))
        .select(col("big_orderkey"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(big, o("o_orderkey") === col("big_orderkey"), "left_semi")
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"))
        .agg(sum(Exact.cents(col("l_quantity"))).as("total_qty_cents"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("orderdate"), col("total_qty_cents"))
        .orderBy(col("total_qty_cents").desc, col("o_orderkey"))
        .limit(20)
    },

    // -- Q22 shape: above-average-balance customers with no recent orders
    //    — scalar aggregate subquery (1-row broadcast, q54's face) COMBINED
    //    with an anti join, the classic "lapsed valuable customers" report.
    //    The average test is exact integers (`cents·n > sum_cents`), so no
    //    double average can flip a borderline customer.
    "q89_tpch_q22" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      val avgAgg = c.filter(col("c_acctbal") > 0)
        .agg(sum(Exact.cents(col("c_acctbal"))).as("sum_bal_cents"),
          count(lit(1)).as("n_bal"))
      c.crossJoin(broadcast(avgAgg))
        .filter(Exact.cents(col("c_acctbal")) * col("n_bal") > col("sum_bal_cents"))
        .join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          sum(Exact.cents(col("c_acctbal"))).as("totacctbal_cents"))
        .orderBy(col("n_name"))
    },

    // -- Q5 shape: revenue by nation through the full dim chain.
    "q56_tpch_q5" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(revenueE4(li).as("revenue_e4"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"), col("n_name"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q55_tpch_q3" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_e4 DESC, o_orderkey LIMIT 20""".stripMargin,

    "q80_exists_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q81_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  MAX(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS acctbal_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin,

    // The oracle keeps the CORRELATED subquery spelling (the surface under
    // test); the integer rewrite makes it value-identical to the Spark
    // decorrelated form.
    "q85_tpch_q17" ->
      """SELECT
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS small_order_revenue_cents,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#11'
        |  AND CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = p_partkey) * 5 <
        |      (SELECT CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |       FROM lineitem l3 WHERE l3.l_partkey = p_partkey)""".stripMargin,

    "q88_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS orderdate,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS total_qty_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |         > 30000)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
        |ORDER BY total_qty_cents DESC, o_orderkey LIMIT 20""".stripMargin,

    "q89_tpch_q22" ->
      """SELECT n_name, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS totacctbal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
        |    > (SELECT CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |       FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q56_tpch_q5" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  COUNT(*) AS n_lines
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin
  )
}
