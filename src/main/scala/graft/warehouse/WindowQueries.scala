package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables
import graft.util.Exact.cents

/** Window-function surface (SURVEY.md §2.5): running totals, ranking,
  * frames, top-k. The reference's `balance_amt` column IS a materialized
  * running sum (txns.csv), so W1 is its core implied operator.
  *
  * Determinism rule for the oracle: every window ORDER BY ends on a unique
  * key (orderkey / custkey / event_id) so rank and frame contents are
  * reproducible in both engines.
  *
  * Scale: window functions shuffle once on the partition key, then sort
  * within partitions — the same plan a 1000-executor cluster runs. No
  * driver-side state. Skew risk sits on hot partition keys (a user with
  * millions of events); for such workloads pre-bucket by the partition key.
  */
object WindowQueries {

  // Output-type pinning: money outputs are BIGINT cents (Exact.cents; no
  // decimal may reach an oracle-gated output — round-2 verdict), rank
  // functions are int32 in Spark vs int64 in DuckDB so ranks cast to long,
  // and DuckDB widens window SUM(BIGINT) to HUGEINT so the oracle wraps it
  // in CAST(... AS BIGINT).

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- W1/W4: running total per customer (the reference's balance_amt
    //    semantics re-expressed as a window).
    "q11_window_running" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(cents(col("o_totalprice"))).over(w).as("running_total_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // -- W2/W5: row_number ranking, top-3 orders per priority class.
    "q12_window_rank_topk" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
          cents(col("o_totalprice")).as("totalprice_cents"))
        .orderBy(col("o_orderpriority"), col("rk"))
    },

    // -- sorts/limits §2.6: global top-k (TakeOrderedAndProject — each
    //    partition keeps k rows, driver merges k*partitions, no full sort).
    "q15_order_limit_topk" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("totalprice_cents"))
    },

    // -- W2: ntile + dense_rank (dense_rank tolerates acctbal ties).
    //    The global quartile runs through Scale.withGlobalNtile — a
    //    partitionBy-less `Window.orderBy` funnels the whole table
    //    through ONE task (round-1 verdict: correct at sf0.1, dead at
    //    100 TB); the two-pass range-partitioned formulation produces
    //    identical standard NTILE semantics distributed.
    "q16_window_ntile" -> { (s, d) =>
      val wSeg = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
      Scale.withGlobalNtile(Tables.customer(s, d),
          Seq(col("c_acctbal"), col("c_custkey")), 4, "wealth_quartile")
        .withColumn("seg_rank", dense_rank().over(wSeg).cast("long"))
        .select(col("c_custkey"), col("c_mktsegment"),
          col("wealth_quartile"), col("seg_rank"))
        .orderBy(col("c_custkey"))
    },

    // -- trending leaderboard: top-5 parts by weekly revenue, each
    //    carrying last week's rank and the delta — the rank-CHANGE
    //    composition (rank, then as-of self-join on the previous
    //    period) behind every "movers" report. The weekly rank window
    //    partitions by week: its per-partition size is bounded by the
    //    PART CATALOG, not the fact table — the fact rows collapse in
    //    the (week, part) rollup first — so the single-task-per-week
    //    sort is dimension-sized at any SF (and the q12 top-k window
    //    pattern applies if the catalog itself ever needs sharding).
    //    prev_rank is NULL for new entrants; delta = prev − current
    //    (positive = climbing).
    "q180_trending_rank" -> { (s, d) =>
      val wk = Tables.lineitem(s, d)
        .groupBy(date_trunc("week", col("l_shipdate")).cast("date").as("week"),
          col("l_partkey"))
        .agg(sum(cents(col("l_extendedprice"))).as("rev_cents"))
      val w = Window.partitionBy(col("week"))
        .orderBy(col("rev_cents").desc, col("l_partkey"))
      val ranked = wk.withColumn("rk", row_number().over(w).cast("long"))
      val prev = ranked.select(date_add(col("week"), 7).as("week"),
        col("l_partkey"), col("rk").as("prev_rank"))
      ranked.filter(col("rk") <= 5)
        .join(prev, Seq("week", "l_partkey"), "left_outer")
        .select(col("week"), col("rk"), col("l_partkey"), col("rev_cents"),
          col("prev_rank"), (col("prev_rank") - col("rk")).as("delta"))
        .orderBy(col("week"), col("rk"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q11_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_total_cents
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q12_window_rank_topk" ->
      """SELECT o_orderpriority, rk, o_orderkey, totalprice_cents FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS totalprice_cents,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "q15_order_limit_topk" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS totalprice_cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q16_window_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |  NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS wealth_quartile,
        |  DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS seg_rank
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q180_trending_rank" ->
      """WITH wk AS (
        |  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week, l_partkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS rev_cents
        |  FROM lineitem GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY week
        |    ORDER BY rev_cents DESC, l_partkey) AS rk
        |  FROM wk),
        |prev AS (
        |  SELECT week + 7 AS week, l_partkey, rk AS prev_rank FROM ranked)
        |SELECT r.week, r.rk, r.l_partkey, r.rev_cents, p.prev_rank,
        |  p.prev_rank - r.rk AS delta
        |FROM ranked r LEFT JOIN prev p
        |  ON p.week = r.week AND p.l_partkey = r.l_partkey
        |WHERE r.rk <= 5
        |ORDER BY r.week, r.rk""".stripMargin
  )
}
