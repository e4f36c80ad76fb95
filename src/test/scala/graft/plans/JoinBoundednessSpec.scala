package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-13 verdict #6: the crossJoin audit, locked as a GATE the way
  * the window audit was in r12/r13. A `CartesianProductExec` shuffles
  * the FULL cross product of two row-scaled inputs — the other plan
  * shape (besides an unpartitioned window) that dies first at 100 TB —
  * and a `BroadcastNestedLoopJoinExec` is only acceptable when its
  * broadcast side is BOUNDED (a query-vector row, a centroid set, a
  * scalar total, a stopword list…). Every crossJoin in the query
  * surface is written `crossJoin(broadcast(…))` with a reviewed
  * bounded side; this spec makes the review a gate:
  *
  *  - NO query may plan a `CartesianProductExec`, ever (a bounded
  *    cross product belongs on the broadcast path; an unbounded one is
  *    a bug wherever it appears).
  *  - Every `BroadcastNestedLoopJoinExec` must appear in the reviewed
  *    whitelist below as an exact PER-QUERY MULTISET of fingerprints
  *    (join type + build side), each entry naming the bounded side it
  *    was reviewed against — a new nested-loop join added to any query
  *    regresses HERE, not in a 1000-executor postmortem. Entries that
  *    stop planning fail the staleness assertion and must be removed.
  *
  * The fingerprint is deliberately coarse (type + build side): what
  * the review pins is THAT a bounded-side nested loop was deliberate
  * in that query; the bounded side itself is named in the entry so a
  * reviewer can re-find it.
  */
class JoinBoundednessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"

  private case class Reviewed(fingerprint: String, boundedSide: String)

  private val cross = "CROSS/BuildRight"
  private def n(k: Int, fp: String, side: String): Seq[Reviewed] =
    Seq.fill(k)(Reviewed(fp, side))

  /** One entry PER REVIEWED nested-loop join (query → multiset), each
    * naming the bounded broadcast side. Sources: `ann/Similarity` +
    * `ann/IndexStore` broadcast query vectors / centroid sets (a probe
    * is ≤ a few hundred rows by construction); the scalar-total
    * pattern `counts.crossJoin(broadcast(total))` (1-row aggregate);
    * allocation/mixture tables (one row per source/stratum). */
  private val whitelist: Map[String, Seq[Reviewed]] = Map(
    "q24_range_join" -> Seq(Reviewed("INNER/BuildRight",
      "broadcast rate-interval dim table (bounded validity windows)")),
    "q42_ann_bruteforce" -> n(1, cross, "broadcast query vectors"),
    "q43_ann_ivf" -> n(2, cross,
      "broadcast centroid set (assignment) + broadcast query vectors"),
    "q66_ann_lsh" -> n(1, cross, "broadcast query bucket signatures"),
    "q84_token_budget_mixture" -> n(1, cross,
      "1-row corpus token total"),
    "q89_tpch_q22" -> n(1, cross, "1-row average account balance"),
    "q98_tpch_q11" -> n(1, cross, "1-row national stock total"),
    "q99_tfidf_terms" -> n(1, cross, "1-row corpus doc count N"),
    "q107_triangles" -> n(1, cross, "1-row triangle count total"),
    "q112_basket_lift" -> n(1, cross, "1-row basket count total"),
    "q117_resample_ffill" -> n(1, cross,
      "hourly spine derived from data min/max (bounded calendar)"),
    "q123_proportional_alloc" -> n(3, cross,
      "1-row totals + leftover scalars of the largest-remainder fold"),
    "q136_skew_profile" -> n(1, cross, "1-row key-count total"),
    "q166_kmv_distinct" -> n(1, cross,
      "1-row exact-distinct aggregate (KMV invariant gate)"),
    "q172_decile_gains" -> n(1, cross, "1-row revenue grand total"),
    "q174_benford" -> n(1, cross, "1-row first-digit total"),
    "q177_drift_tv" -> n(3, cross,
      "1-row per-window totals + 1-row TV distance of the drift test"),
    "q178_contingency" -> n(1, cross, "1-row contingency grand total"),
    "q189_dsir_select" -> n(1, cross, "1-row corpus hash-bag total"),
    "q194_knn_classify" -> n(1, cross, "broadcast query code vectors"),
    "q198_hard_negatives" -> n(1, cross,
      "broadcast class-prototype code vectors"),
    "q215_bm25" -> n(1, cross, "1-row corpus stats (N, avgdl)"),
    "q226_more_like_this" -> n(4, cross,
      "seed-doc term vector + corpus stats scalars (MLT pipeline)"),
    "q228_pps_sample" -> n(1, cross, "1-row size total (PPS step)"),
    "q232_pmi_collocations" -> n(2, cross,
      "1-row unigram + bigram totals"),
    "q234_modularity" -> n(2, cross,
      "1-row intra-community weight + 1-row total edge weight m"),
    "q235_survival_km" -> n(4, cross,
      "1-row risk-set bounds/totals over the bounded event-time spine"),
    "q237_join_estimate" -> n(2, cross,
      "1-row exact + estimated join-size aggregates"),
    "q241_log_templates" -> n(1, cross, "1-row template count total"),
    "q242_neyman_alloc" -> n(3, cross,
      "per-stratum variance table + leftover scalars (bounded strata)"),
    "q243_ann_ivf_incremental" -> n(7, cross,
      "broadcast centroids (seed assign, delta assign, re-train) + " +
        "broadcast query vectors across the incremental probe path"),
    "q253_temperature_mixture" -> n(3, cross,
      "per-source weight table + leftover scalars (bounded sources)"),
    "q279_ivf_upsert" -> n(1, cross,
      "broadcast query vectors (IndexStore.searchPruned)"),
    "q282_index_cascade" -> n(1, cross,
      "broadcast query vectors (IndexStore.searchPruned)"),
    "q285_cascade_set" -> n(1, cross,
      "broadcast query vectors (IndexStore.searchPruned)"))

  /** Fingerprints of every BNLJ (and any cartesian, tagged so) in the
    * plan, through AQE wrappers, cached relations and subqueries. */
  private def nestedLoops(p: SparkPlan): Seq[String] = {
    val direct = p.collectWithSubqueries {
      case j: BroadcastNestedLoopJoinExec =>
        Seq(s"${j.joinType.sql}/${j.buildSide}")
      case c: CartesianProductExec =>
        Seq(s"CARTESIAN(${c.left.nodeName}×${c.right.nodeName})")
      case a: AdaptiveSparkPlanExec => nestedLoops(a.inputPlan)
      case c: InMemoryTableScanExec => nestedLoops(c.relation.cachedPlan)
    }
    direct.flatten
  }

  test("no CartesianProductExec anywhere; every BroadcastNestedLoopJoin " +
      "matches a reviewed bounded-side whitelist entry as an exact " +
      "per-query multiset") {
    val planned = scala.collection.mutable.Map[String, Seq[String]]()
    val failed = scala.collection.mutable.Map[String, String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val f = nestedLoops(fn(spark, d).queryExecution.executedPlan)
        if (f.nonEmpty) planned(name) = f
      } catch { case e: Throwable => failed(name) = e.getMessage }
    }
    assert(failed.isEmpty,
      s"queries failed to plan at sf0.001: ${failed.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k (${String.valueOf(v).take(120)})" }
        .mkString("; ")}")
    val cartesian = planned.filter(_._2.exists(_.startsWith("CARTESIAN")))
    assert(cartesian.isEmpty,
      "CartesianProductExec planned — a full cross-product shuffle of " +
        "row-scaled inputs; broadcast the bounded side instead: " +
        cartesian.toSeq.sortBy(_._1)
          .map { case (k, f) => s"$k [${f.mkString(" | ")}]" }
          .mkString(", "))
    val unreviewed = planned.keySet -- whitelist.keySet
    assert(unreviewed.isEmpty,
      "BroadcastNestedLoopJoin in an UNREVIEWED query — either express " +
        "the join with keys or review the bounded side and whitelist " +
        "it: " + planned.filter(kv => unreviewed(kv._1)).toSeq
          .sortBy(_._1)
          .map { case (k, f) => s"$k [${f.mkString(" | ")}]" }
          .mkString(", "))
    val stale = whitelist.keySet -- planned.keySet
    assert(stale.isEmpty,
      s"whitelist entries no longer planning nested-loop joins — " +
        s"remove them: ${stale.toSeq.sorted.mkString(", ")}")
    whitelist.toSeq.sortBy(_._1).foreach { case (name, reviewed) =>
      val got = planned(name).sorted
      val want = reviewed.map(_.fingerprint).sorted
      assert(got == want,
        s"$name plans nested-loop joins [${got.mkString(" | ")}] but " +
          s"the review covers [${want.mkString(" | ")}] — a new or " +
          "changed join needs its own bounded-side review")
    }
  }
}
