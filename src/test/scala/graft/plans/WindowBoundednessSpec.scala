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
  * window in the query surface must consume a BOUNDED spine (a scalar
  * combine, an allocation table of ≤ a few hundred rows, a percentile
  * grid…), never a row-scaled table. The plan scans in PLANS.md
  * attributed each occurrence to a bounded spine by hand; this spec
  * makes the attribution a GATE: it walks every query's physical plan
  * (through AQE wrappers and cached relations) and fails if an
  * unpartitioned WindowExec appears OUTSIDE the reviewed whitelist —
  * so a future edit that drops a partitioning column from a row-scaled
  * window regresses HERE, not in a 1000-executor postmortem.
  *
  * Round-12 verdict #5 tightening: the whitelist is PER-WINDOW, not
  * per-query — each entry is one reviewed window, identified by a
  * fingerprint (its window-expression output names + order spec), and
  * the spec requires each query's planned unpartitioned windows to
  * match its reviewed entries as an exact MULTISET. A second,
  * row-scaled unpartitioned window added to a whitelisted query now
  * fails the gate (it changes the multiset), as does swapping a
  * reviewed window for a different one; entries that stop planning
  * fail the staleness assertion and must be removed.
  */
class WindowBoundednessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"

  private case class Reviewed(fingerprint: String, spine: String)

  /** One entry PER REVIEWED WINDOW (query → multiset of windows), each
    * naming the bounded spine the window's input was reviewed against. */
  private val whitelist: Map[String, Seq[Reviewed]] = Map(
    "q123_proportional_alloc" -> Seq(Reviewed(
      "rk / rem DESC NULLS LAST,source ASC NULLS FIRST",
      "largest-remainder ranking over the ALLOCATION table (one row " +
        "per group, the grouped aggregate upstream)")),
    "q145_skyline" -> Seq(Reviewed(
      "_m / spend DESC NULLS LAST,last_dt DESC NULLS LAST",
      "final prune over the LOCAL-pass survivors (skyline2d: per-" +
        "partition prune first; anti-correlated worst case declared in " +
        "the operator scaladoc, SkylineSpec pins it)")),
    "q163_autocorr" -> Seq(Reviewed(
      "x / dt ASC NULLS FIRST",
      "lag-1 over the DAILY aggregate — one row per distinct order " +
        "date, bounded by the calendar not the table")),
    "q172_decile_gains" -> Seq(Reviewed(
      "cum_cents / decile ASC NULLS FIRST",
      "cumulative share over the 10-row DECILE table (the row-scaled " +
        "ranking itself rides Scale.withGlobalNtile's two-pass form)")),
    "q231_vocab_growth" -> Seq(Reviewed(
      "vocab_size / bucket ASC NULLS FIRST",
      "cumulative vocab over the 10-row BUCKET spine (bucketing rides " +
        "withGlobalNtile; new-word counts are grouped aggregates)")),
    "q235_survival_km" -> Seq(
      Reviewed("_we0 / day ASC NULLS FIRST",
        "Kaplan-Meier survival product over the EVENT-TIME spine " +
          "(distinct observed durations, ~30 rows)"),
      Reviewed("_we0 / day ASC NULLS FIRST",
        "the Nelson-Aalen cumulative-hazard sum over the SAME bounded " +
          "event-time spine (two cumulative folds, one spine — the " +
          "per-query whitelist used to hide that this is two windows)")),
    "q242_neyman_alloc" -> Seq(Reviewed(
      "rk / frac DESC NULLS LAST,source ASC NULLS FIRST",
      "largest-remainder ranking over the STRATA table (one row per " +
        "stratum)")),
    "q253_temperature_mixture" -> Seq(Reviewed(
      "rk / frac DESC NULLS LAST,source ASC NULLS FIRST",
      "share normalization over the SOURCE-WEIGHT table (one row per " +
        "corpus source)")))

  /** Fingerprints of every unpartitioned WindowExec in the plan:
    * window-expression output names + the order spec — enough to tell
    * a reviewed window from a newly-added one in the same query. */
  private def unpartitioned(p: SparkPlan): Seq[String] = {
    val direct = p.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq(w.windowExpression.map(_.name).sorted.mkString(",") +
          " / " + w.orderSpec.map(_.sql).mkString(","))
      case a: AdaptiveSparkPlanExec => unpartitioned(a.inputPlan)
      case c: InMemoryTableScanExec =>
        unpartitioned(c.relation.cachedPlan)
    }
    direct.flatten
  }

  test("every unpartitioned WindowExec matches a reviewed bounded-spine " +
      "whitelist entry, one entry per window, as an exact multiset") {
    val planned = scala.collection.mutable.Map[String, Seq[String]]()
    val failed = scala.collection.mutable.Map[String, String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val f = unpartitioned(fn(spark, d).queryExecution.executedPlan)
        if (f.nonEmpty) planned(name) = f
      } catch { case e: Throwable => failed(name) = e.getMessage }
    }
    assert(failed.isEmpty,
      s"queries failed to plan at sf0.001: ${failed.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k (${String.valueOf(v).take(120)})" }
        .mkString("; ")}")
    val unreviewed = planned.keySet -- whitelist.keySet
    assert(unreviewed.isEmpty,
      "unpartitioned WindowExec in an UNREVIEWED query — either " +
        "partition the window or review the spine and whitelist it: " +
        planned.filter(kv => unreviewed(kv._1)).toSeq.sortBy(_._1)
          .map { case (k, f) => s"$k [${f.mkString(" | ")}]" }
          .mkString(", "))
    val stale = whitelist.keySet -- planned.keySet
    assert(stale.isEmpty,
      s"whitelist entries no longer planning unpartitioned windows — " +
        s"remove them: ${stale.toSeq.sorted.mkString(", ")}")
    // the per-window gate: planned windows == reviewed windows, exactly
    whitelist.toSeq.sortBy(_._1).foreach { case (name, reviewed) =>
      val got = planned(name).sorted
      val want = reviewed.map(_.fingerprint).sorted
      assert(got == want,
        s"$name plans unpartitioned windows [${got.mkString(" | ")}] " +
          s"but the review covers [${want.mkString(" | ")}] — a new or " +
          "changed window needs its own spine review")
    }
  }
}
