package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables
import graft.util.Exact.cents

/** Set operations, multi-dimensional grouping, non-equi joins, and array
  * flattening (SURVEY.md §2.3 J5, §2.4 A5, §2.6).
  *
  * The reference's two pipelines landing in one warehouse is semantically a
  * unionByName (q17); its RDS-vs-Redshift parity check generalizes to
  * except/intersect (q18/q19, and graft.cdc.Reconcile).
  */
object SetAggQueries {

  // Money outputs are BIGINT cents (Exact.cents) — no decimal type may
  // appear in an oracle-gated output (round-2 verdict).

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- §2.6: UNION ALL of the two "pipelines" (customer/supplier account
    //    populations) tagged by source, then grouped — map-side combine
    //    keeps the shuffle at |nationkey × source| rows.
    "q17_union_all" -> { (s, d) =>
      val c = Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("nationkey"),
          lit("customer").as("side"), col("c_acctbal").as("acctbal"))
      val p = Tables.supplier(s, d)
        .select(col("s_nationkey").cast("long").as("nationkey"),
          lit("supplier").as("side"), col("s_acctbal").as("acctbal"))
      c.unionByName(p)
        .groupBy(col("nationkey"), col("side"))
        .agg(count(lit(1)).as("n"), sum(cents(col("acctbal"))).as("total_bal_cents"))
        .orderBy(col("nationkey"), col("side"))
    },

    // -- §2.6: INTERSECT (distinct) — nations having both customers and
    //    suppliers.
    "q18_intersect" -> { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").cast("long").as("nationkey"))
        .intersect(
          Tables.supplier(s, d).select(col("s_nationkey").cast("long").as("nationkey")))
        .orderBy(col("nationkey"))
    },

    // -- §2.6: EXCEPT (distinct) — orders that have no lineitems (non-empty
    //    at every sf). This is also the shape of the CDC reconciliation
    //    check (source minus target).
    "q19_except" -> { (s, d) =>
      Tables.orders(s, d).select(col("o_orderkey").as("orderkey"))
        .except(Tables.lineitem(s, d).select(col("l_orderkey").as("orderkey")))
        .orderBy(col("orderkey"))
    },

    // -- J5: range (non-equi) join against a tiny in-memory band dim.
    //    The band side is broadcast -> a BroadcastNestedLoopJoin that
    //    streams the fact side once; never a cartesian shuffle.
    "q24_range_join" -> { (s, d) =>
      import s.implicits._
      val bands = Seq(
        (0L, 100000L, "small"),
        (100000L, 250000L, "medium"),
        (250000L, 1000000000L, "large")
      ).toDF("lo", "hi", "band")
      val o = Tables.orders(s, d)
      o.join(broadcast(bands),
          o("o_totalprice") >= bands("lo") && o("o_totalprice") < bands("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy(col("band"))
    },

    // -- J5 (custom-plan face): KEYED interval join through the
    //    sweep-line exec (IntervalJoinNode → IntervalJoinExec) — repeat
    //    orders landing within 7 days of a prior order by the same
    //    customer. Spark's own planner turns equi+range predicates into
    //    a SortMergeJoin whose range half is a POST-JOIN filter (the
    //    per-customer cross product materializes first); the custom exec
    //    shuffles each side once on o_custkey and sweeps the sorted
    //    partitions with an active-interval buffer bounded by per-key
    //    interval CONCURRENCY, not interval count. Rolled up per
    //    customer so the oracle output stays small and stable.
    "q208_interval_join" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val intervals = o.select(col("o_custkey"),
        col("o_orderdate").as("win_start"),
        expr("o_orderdate + INTERVAL 7 DAYS").as("win_end"),
        col("o_orderkey").as("prior_orderkey"))
      val points = o.select(col("o_custkey"),
        col("o_orderdate").as("pdate"), col("o_orderkey"))
      graft.plans.Interval.join(intervals, points,
          key = "o_custkey", startCol = "win_start", endCol = "win_end",
          pointCol = "pdate")
        .filter(col("prior_orderkey") =!= col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_rapid_pairs"))
        .orderBy(col("o_custkey"))
    },

    // -- A5: full cube over status × priority.
    "q26_cube" -> { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // -- A5: explicit GROUPING SETS via SQL (Spark SQL surface).
    "q27_grouping_sets" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    // -- §2.7 array ops: posexplode of the embedding vectors (the
    //    reference's asks/bids arrays): first 3 dims per vector, 1-based
    //    ordinal to match UNNEST WITH ORDINALITY.
    "q29_explode" -> { (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 100)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "val")))
        .filter(col("pos0") < 3)
        .select(col("vec_id"), (col("pos0") + 1).cast("long").as("dim"),
          col("val").cast("double").as("val"))
        .orderBy(col("vec_id"), col("dim"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q17_union_all" ->
      """SELECT nationkey, side, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_bal_cents
        |FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, 'customer' AS side, c_acctbal AS acctbal FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS BIGINT) AS nationkey, 'supplier' AS side, s_acctbal AS acctbal FROM supplier)
        |GROUP BY nationkey, side ORDER BY nationkey, side""".stripMargin,

    "q18_intersect" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q19_except" ->
      """SELECT o_orderkey AS orderkey FROM orders
        |EXCEPT
        |SELECT l_orderkey AS orderkey FROM lineitem
        |ORDER BY orderkey""".stripMargin,

    "q24_range_join" ->
      """SELECT band, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |JOIN (VALUES (0, 100000, 'small'), (100000, 250000, 'medium'),
        |             (250000, 1000000000, 'large')) AS bands(lo, hi, band)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    // Plain equi+range self-join: the declarative definition the
    // sweep-line exec must reproduce exactly.
    "q208_interval_join" ->
      """SELECT a.o_custkey AS o_custkey, COUNT(*) AS n_rapid_pairs
        |FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |  AND b.o_orderdate >= a.o_orderdate
        |  AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
        |  AND a.o_orderkey <> b.o_orderkey
        |GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "q26_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q27_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q29_explode" ->
      """SELECT vec_id, CAST(d.dim AS BIGINT) AS dim,
        |  CAST(embedding[d.dim] AS DOUBLE) AS val
        |FROM embeddings, (VALUES (1), (2), (3)) AS d(dim)
        |WHERE vec_id < 100
        |ORDER BY vec_id, dim""".stripMargin
  )
}
