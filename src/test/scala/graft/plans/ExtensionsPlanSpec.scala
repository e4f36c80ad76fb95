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
}
