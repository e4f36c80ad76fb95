package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom Catalyst as-of join (AsOfJoinNode → AsOfJoinStrategy →
  * AsOfJoinExec): hand-built edge shapes the oracle gate can't isolate,
  * equivalence with the q25 window rewrite on real data, and the plan
  * shape (the exec node actually plans, with the declared exchanges).
  */
class AsOfJoinPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quotes = Seq(
    // key, time, px
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 20L, 2.5), ("a", 30L, 3.0),
    ("b", 15L, 9.0),
    (null.asInstanceOf[String], 5L, 99.0)
  ).toDF("sym", "qt", "px")

  private def trades = Seq(
    ("a", 5L), ("a", 20L), ("a", 25L), ("a", 1000L),
    ("b", 14L), ("b", 16L),
    ("c", 50L),
    (null.asInstanceOf[String], 6L)
  ).toDF("sym", "tt")

  private def run(tol: Option[Long]) =
    AsOf.join(trades, quotes, key = "sym", leftTime = "tt", rightTime = "qt",
        rightTimeAs = "quote_time", toleranceLong = tol)
      .select(col("sym"), col("tt"), col("quote_time"), col("px"))
      .collect()
      .map(r => (Option(r.get(0)).orNull, r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toSet

  test("backward match, tie takes latest-in-sort-order, nulls never match") {
    assert(run(None) == Set(
      ("a", 5L, -1L, -1.0),       // before any quote
      ("a", 20L, 20L, 2.5),       // tie on time: latest row in sort order
      ("a", 25L, 20L, 2.5),
      ("a", 1000L, 30L, 3.0),     // arbitrarily far back without tolerance
      ("b", 14L, -1L, -1.0),
      ("b", 16L, 15L, 9.0),
      ("c", 50L, -1L, -1.0),      // key with no right rows
      (null, 6L, -1L, -1.0)))     // null key never matches (null quote too)
  }

  test("tolerance drops stale matches") {
    val got = run(Some(10L))
    assert(got.contains(("a", 25L, 20L, 2.5)))  // 5 back, within 10
    assert(got.contains(("a", 1000L, -1L, -1.0))) // 970 back, dropped
    assert(got.contains(("b", 16L, 15L, 9.0)))
  }

  test("equivalent to the q25 window rewrite on the events table") {
    val d = "/root/testdata/sf0.001"
    val events = spark.read.parquet(s"$d/events.parquet")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"))
    val got = AsOf.join(purchases, clicks, key = "user_id",
        leftTime = "event_id", rightTime = "event_id", rightTimeAs = "last_click_id")
      .select(col("event_id"), col("user_id"), col("last_click_id"))
    val want = graft.warehouse.EventQueries.queries("q25_asof_join")(spark, d)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("timestamp time column joins on internal microseconds") {
    val l = Seq(("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:10")))
      .toDF("k", "lts")
    val r = Seq(
      ("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:07"), "early"),
      ("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:09"), "late"),
      ("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:11"), "future"))
      .toDF("k", "rts", "tag")
    val hit = AsOf.join(l, r, "k", "lts", "rts", "matched_ts")
      .select(col("tag")).as[String].collect().toSeq
    assert(hit == Seq("late"))
    // tolerance is µs: 1s back is inside 2_000_000 µs, outside 500_000 µs
    val tight = AsOf.join(l, r, "k", "lts", "rts", "matched_ts", Some(500000L))
      .select(col("tag")).as[String].collect().toSeq
    assert(tight == Seq(null.asInstanceOf[String]))
  }

  test("plan contains AsOfJoinExec with both sides exchanged and sorted") {
    val df = AsOf.join(trades, quotes, "sym", "tt", "qt", "quote_time")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    // declared distribution/ordering realized by EnsureRequirements
    assert("(?s)Exchange hashpartitioning".r.findAllIn(plan).size >= 2)
    assert("(?s)Sort \\[".r.findAllIn(plan).size >= 2)
  }

  test("every left row is emitted exactly once (left-outer cardinality)") {
    val n = 5000L
    val l = spark.range(n).select((col("id") % 7).as("k"), col("id").as("t"))
    val r = spark.range(100).select(
      (col("id") % 7).as("k"), (col("id") * 40).as("t"), col("id").as("payload"))
    val out = AsOf.join(l, r, "k", "t", "t", "rt")
    assert(out.count() == n)
    // spot-check one row against a per-row predicate computed the slow way:
    // left row t=2000 has k = 2000 % 7 = 5; its match is the largest
    // r.t = 40*id with id%7==5 and 40*id <= 2000 → id ∈ {5,12,...,47},
    // largest 47 → t=1880, payload 47.
    val row = out.filter(col("k") === 5 && col("t") === 2000).head()
    assert(row.getAs[Long]("payload") == 47L)
    assert(row.getAs[Long]("rt") == 1880L)
  }

  test("missing column names fail fast") {
    intercept[IllegalArgumentException] {
      AsOf.join(trades, quotes, "sym", "tt", "no_such_col", "x")
    }
  }

  // -- AsOfRules: the custom node must not be an optimization barrier.

  test("left-only filters push below the node and reach the parquet scan") {
    val d = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$d/events.parquet")
    val l = ev.select(col("event_id"), col("user_id"))
    val r = ev.select(col("user_id"), col("event_id"))
    val joined = AsOf.join(l, r, "user_id", "event_id", "event_id", "rid")
      .filter(col("event_id") < 500)
    val opt = joined.queryExecution.optimizedPlan
    // the Filter no longer sits above the custom node...
    val topFilter = opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoinNode] => f }
    assert(topFilter.isEmpty, s"filter not pushed:\n$opt")
    // ...and the LEFT scan received it as a data filter
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") && phys.contains("LessThan(event_id,500)"),
      s"scan missed the pushed filter:\n$phys")
    // semantics unchanged vs filtering before the join
    val want = AsOf.join(l.filter(col("event_id") < 500), r,
      "user_id", "event_id", "event_id", "rid")
    assert(joined.exceptAll(want).isEmpty && want.exceptAll(joined).isEmpty)
  }

  test("right-side filters do NOT push (null-extension semantics)") {
    val out = AsOf.join(trades, quotes, "sym", "tt", "qt", "quote_time")
      .filter(col("px") > 2.0)  // right payload: must run post-join
    val opt = out.queryExecution.optimizedPlan
    assert(opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoinNode] => f }.nonEmpty)
    // matches-only survive: unmatched (null px) rows are dropped by the filter
    assert(out.count() == 4)  // a@20→2.5, a@25→2.5, a@1000→3.0, b@16→9.0
  }

  test("projection prunes unused payload columns out of both scans") {
    val d = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$d/events.parquet")
    val l = ev.select(col("event_id"), col("user_id"), col("props"))
    val r = ev.select(col("user_id"), col("event_id"), col("value"), col("props"))
    val joined = AsOf.join(l, r.withColumnRenamed("props", "rprops"),
        "user_id", "event_id", "event_id", "rid")
      .select(col("event_id"), col("user_id"), col("rid"), col("value"))
    val node = joined.queryExecution.optimizedPlan.collectFirst {
      case a: AsOfJoinNode => a }.get
    val childCols = (node.left.output ++ node.right.output).map(_.name).toSet
    assert(!childCols.contains("props") && !childCols.contains("rprops"),
      s"payload not pruned: $childCols")
    // pruning reached the scans: neither side reads the props column
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("props"), s"scan still reads props:\n$phys")
    assert(joined.count() ==
      spark.read.parquet(s"$d/events.parquet").count())
  }
}
