package graft.plans

import org.apache.spark.sql.{GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The global registration path: a session configured with
  * `graft.plans.GraftExtensions` must plan ALL THREE custom nodes without
  * any helper-API `register()` call — the contract for deserialized plans
  * and `spark.sql.extensions`-configured clusters.
  */
class ExtensionsPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def attr(p: LogicalPlan, n: String): AttributeReference =
    p.output.collectFirst { case a: AttributeReference if a.name == n => a }.get

  test("extensions-configured session plans as-of, interval, and overlap nodes") {
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-plans-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val quotes = Seq(("a", 10L, 1.0), ("a", 20L, 2.0)).toDF("sym", "qt", "px")
      val trades = Seq(("a", 15L), ("a", 25L)).toDF("sym2", "tt")
      val ivs = Seq(("k", 0L, 10L, "i1")).toDF("k", "s", "e", "tag")
      val pts = Seq(("k", 5L)).toDF("k2", "p")

      // nodes built RAW (no AsOf/Interval/Overlap.join, no register()):
      // only the injected strategies can plan them
      val (tp, qp) = (trades.queryExecution.analyzed, quotes.queryExecution.analyzed)
      val asof = GraftPlanBridge.ofRows(s2, AsOfJoinNode(tp, qp,
        attr(tp, "sym2"), attr(qp, "sym"), attr(tp, "tt"), attr(qp, "qt"), None))
      assert(asof.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(asof.count() == 2)

      val (ip, pp) = (ivs.queryExecution.analyzed, pts.queryExecution.analyzed)
      val interval = GraftPlanBridge.ofRows(s2, IntervalJoinNode(ip, pp,
        attr(ip, "k"), attr(pp, "k2"), attr(ip, "s"), attr(ip, "e"), attr(pp, "p")))
      assert(interval.queryExecution.executedPlan.toString.contains("IntervalJoin"))
      assert(interval.count() == 1)

      val ivs2 = Seq(("k", 3L, 7L, "j1")).toDF("k2", "s2", "e2", "tag2")
      val jp = ivs2.queryExecution.analyzed
      val overlap = GraftPlanBridge.ofRows(s2, OverlapJoinNode(ip, jp,
        attr(ip, "k"), attr(jp, "k2"), attr(ip, "s"), attr(ip, "e"),
        attr(jp, "s2"), attr(jp, "e2")))
      assert(overlap.queryExecution.executedPlan.toString.contains("OverlapJoin"))
      assert(overlap.count() == 1)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  // ---- strategy choice: custom sweep vs native (AsOfRules.ChooseRangeJoinImpl) ----

  private def ivData = {
    import spark.implicits._
    (Seq(("a", 0L, 10L, "i1"), ("a", 5L, 15L, "i2"), ("b", 0L, 4L, "i3"))
       .toDF("k", "s", "e", "tag"),
     Seq(("a", 4L), ("a", 12L), ("b", 9L)).toDF("k", "p"))
  }

  private def expected = Set(("a", 4L, "i1"), ("a", 12L, "i2"))

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.select(org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("p"),
        org.apache.spark.sql.functions.col("tag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

  test("rangeJoin.impl=native rewrites to Join + range filter with identical results") {
    val (ivs, pts) = ivData
    spark.conf.set(AsOfRules.RangeJoinImplKey, "native")
    try {
      val df = Interval.join(ivs, pts, "k", "s", "e", "p")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("IntervalJoinExec"), s"custom exec should be rewritten:\n$plan")
      assert(plan.contains("Join"), plan)
      assert(resultSet(df) == expected)
    } finally spark.conf.unset(AsOfRules.RangeJoinImplKey)
    // and the default keeps the custom exec, with the same answer
    val sweep = Interval.join(ivs, pts, "k", "s", "e", "p")
    assert(sweep.queryExecution.executedPlan.toString.contains("IntervalJoin"))
    assert(resultSet(sweep) == expected)
  }

  test("rangeJoin.impl=auto: native under the broadcast threshold, sweep when stats are large") {
    val (ivs, pts) = ivData
    spark.conf.set(AsOfRules.RangeJoinImplKey, "auto")
    try {
      // tiny local relations sit far under the default 10 MB threshold
      val small = Interval.join(ivs, pts, "k", "s", "e", "p")
      assert(!small.queryExecution.executedPlan.toString.contains("IntervalJoinExec"))
      assert(resultSet(small) == expected)
      // threshold disabled → nothing qualifies as "bounded": keep the
      // skew-proof sweep exec
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val big = Interval.join(ivs, pts, "k", "s", "e", "p")
        assert(big.queryExecution.executedPlan.toString.contains("IntervalJoin"))
        assert(resultSet(big) == expected)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally spark.conf.unset(AsOfRules.RangeJoinImplKey)
  }

  test("rangeJoin.impl=native also rewrites the overlap join, same pairs") {
    import spark.implicits._
    val l = Seq(("k", 0L, 10L, "L1"), ("k", 20L, 30L, "L2")).toDF("k", "s", "e", "ltag")
    val r = Seq(("k", 5L, 25L, "R1")).toDF("k", "rs", "re", "rtag")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(org.apache.spark.sql.functions.col("ltag"),
          org.apache.spark.sql.functions.col("rtag"))
        .collect().map(x => (x.getString(0), x.getString(1))).toSet
    val sweep = Overlap.join(l, r, "k", "s", "e", "rs", "re")
    assert(sweep.queryExecution.executedPlan.toString.contains("OverlapJoin"))
    spark.conf.set(AsOfRules.RangeJoinImplKey, "native")
    try {
      val native = Overlap.join(l, r, "k", "s", "e", "rs", "re")
      assert(!native.queryExecution.executedPlan.toString.contains("OverlapJoinExec"))
      assert(pairs(native) == pairs(sweep))
      assert(pairs(native) == Set(("L1", "R1"), ("L2", "R1")))
    } finally spark.conf.unset(AsOfRules.RangeJoinImplKey)
  }
}
