package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-11 verdict #5: an UNPARTITIONED WindowExec moves its whole
  * input through ONE task ("No Partition Defined for Window operation"
  * — the single-partition sort that dies first at 100 TB). Every such
  * window in the 267-query surface must consume a BOUNDED spine (a
  * scalar combine, an allocation table of ≤ a few hundred rows, a
  * percentile grid…), never a row-scaled table. The plan scans in
  * PLANS.md attributed each occurrence to a bounded spine by hand; this
  * spec makes the attribution a GATE: it walks every query's physical
  * plan (through AQE wrappers and cached relations) and fails if an
  * unpartitioned WindowExec appears in any query OUTSIDE the reviewed
  * whitelist — so a future edit that drops a partitioning column from a
  * row-scaled window regresses HERE, not in a 1000-executor postmortem.
  *
  * The whitelist is intentionally per-QUERY, not per-window: a
  * whitelisted query that adds a second, row-scaled unpartitioned
  * window would still pass this spec, but each entry below names the
  * bounded spine it was reviewed against, and the companion assertion
  * (every whitelisted query still HAS one) keeps the list honest —
  * entries that stop planning unpartitioned windows must be removed.
  */
class WindowBoundednessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"

  /** Queries REVIEWED as bounded-by-construction, with the spine that
    * bounds the unpartitioned window's input. */
  private val whitelist: Map[String, String] = Map(
    "q123_proportional_alloc" ->
      ("largest-remainder ranking over the ALLOCATION table (one row " +
        "per group, the grouped aggregate upstream)"),
    "q145_skyline" ->
      ("final prune over the LOCAL-pass survivors (skyline2d: per-" +
        "partition prune first; anti-correlated worst case declared in " +
        "the operator scaladoc, SkylineSpec pins it)"),
    "q163_autocorr" ->
      ("lag-1 over the DAILY aggregate — one row per distinct order " +
        "date, bounded by the calendar not the table"),
    "q172_decile_gains" ->
      ("cumulative share over the 10-row DECILE table (the row-scaled " +
        "ranking itself rides Scale.withGlobalNtile's two-pass form)"),
    "q231_vocab_growth" ->
      ("cumulative vocab over the 10-row BUCKET spine (bucketing rides " +
        "withGlobalNtile; new-word counts are grouped aggregates)"),
    "q235_survival_km" ->
      ("Kaplan-Meier product over the EVENT-TIME spine (distinct " +
        "observed durations, ~30 rows)"),
    "q242_neyman_alloc" ->
      ("largest-remainder ranking over the STRATA table (one row per " +
        "stratum)"),
    "q253_temperature_mixture" ->
      ("share normalization over the SOURCE-WEIGHT table (one row per " +
        "corpus source)"))

  private def unpartitioned(p: SparkPlan): Int = {
    val direct = p.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty => 1
      case a: AdaptiveSparkPlanExec => unpartitioned(a.inputPlan)
      case c: InMemoryTableScanExec =>
        unpartitioned(c.relation.cachedPlan)
    }
    direct.sum
  }

  test("no query plans an unpartitioned WindowExec outside the " +
      "reviewed bounded-spine whitelist") {
    val offenders = scala.collection.mutable.Map[String, Int]()
    val failed = scala.collection.mutable.Map[String, String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = unpartitioned(fn(spark, d).queryExecution.executedPlan)
        if (n > 0) offenders(name) = n
      } catch { case e: Throwable => failed(name) = e.getMessage }
    }
    assert(failed.isEmpty,
      s"queries failed to plan at sf0.001: ${failed.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k (${String.valueOf(v).take(120)})" }
        .mkString("; ")}")
    val unreviewed = offenders.keySet -- whitelist.keySet
    assert(unreviewed.isEmpty,
      "unpartitioned WindowExec over an UNREVIEWED input — either " +
        "partition the window or review the spine and whitelist it: " +
        offenders.filter(kv => unreviewed(kv._1)).toSeq.sortBy(_._1)
          .map { case (k, n) => s"$k ($n windows)" }.mkString(", "))
    val stale = whitelist.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"whitelist entries no longer planning unpartitioned windows — " +
        s"remove them: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
