package graft.warehouse

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("bloom semi-join: no false negatives, bounded false-positive overhead") {
    val raw = SketchQueries.bloomHitCounts(spark, sf).collect()(0)
    val bloomHits = raw.getLong(0)
    val exactHits = raw.getLong(1)
    assert(bloomHits >= exactHits) // a Bloom filter never drops a member
    // 400k bits over <=1.5k keys: fp rate well under 5%
    assert(bloomHits <= (exactHits * 1.05 + 50))
    // oracle-gated face carries the invariant
    val gated = SketchQueries.queries("q70_bloom_semi_join")(spark, sf).collect()(0)
    assert(gated.getLong(0) == exactHits && gated.getBoolean(1))
  }

  test("hll union: merged nation sketches track the exact region distinct") {
    val rows = SketchQueries.queries("q141_hll_union")(spark, sf).collect()
    assert(rows.length == 5) // all five regions present
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getBoolean(2), s"${r.getString(0)}: union estimate outside ±5%")
    }
  }

  test("counting-selection percentiles ≡ buffered percentile aggregate") {
    // q140's distributed selection must reproduce q122's per-group-buffer
    // `percentile` answers exactly — same groups, same medians.
    val sel = StatsQueries.moreQueries("q140_percentile_select")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val buf = StatsQueries.queries("q122_approx_percentile")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(sel == buf)
    assert(sel.nonEmpty)
  }

  test("count-min: estimate >= exact per key, and tight at this scale") {
    val rows = SketchQueries.cmsEstimates(spark, sf)
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, est) =>
      assert(est >= exact, s"$t: estimate $est < exact $exact")
      // eps = 0.001 over ~1.5k events: estimates should be essentially exact
      assert(est <= exact + 50, s"$t: estimate $est way over $exact")
    }
    // oracle-gated face carries the invariant
    val gated = SketchQueries.queries("q71_count_min")(spark, sf).collect()
    assert(gated.length == rows.length && gated.forall(_.getBoolean(2)))
  }

  test("xxhash64 join estimator (q250): coordinated sampling — identical " +
      "surviving key sets both sides — estimate tracks the exact join, " +
      "plan is estimate-only") {
    import org.apache.spark.sql.functions._
    import graft.util.Tables
    val rate = 64L
    def keep(k: org.apache.spark.sql.Column) =
      pmod(xxhash64(k), lit(rate)) === 0
    // COORDINATION: the filter is a pure function of the key value, so
    // the same key survives (or not) on both sides — surviving key SETS
    // over the shared domain are identical
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val lhsKeys = o.filter(keep(col("o_custkey")))
      .select(col("o_custkey").as("k")).distinct()
      .collect().map(_.getLong(0)).toSet
    val rhsKeys = c.filter(keep(col("c_custkey")))
      .select(col("c_custkey").as("k")).distinct()
      .collect().map(_.getLong(0)).toSet
    val sharedDomain = o.select(col("o_custkey").as("k")).distinct()
      .join(c.select(col("c_custkey").as("k")).distinct(), Seq("k"))
      .collect().map(_.getLong(0)).toSet
    assert((lhsKeys intersect sharedDomain) == (rhsKeys intersect sharedDomain),
      "coordinated sampling must keep the SAME keys on both sides")
    assert(lhsKeys.nonEmpty, "the 1/64 residue class must be non-empty here")
    // ESTIMATE QUALITY on real data: deterministic hash → a fixed band
    // is stable. Both pairs stay within 3x of the exact size at sf0.001
    // (key-frequency-weighted sampling variance; the md5 face q237 shows
    // the same order of spread and is oracle-scored).
    val est = SketchQueries.queries("q250_join_estimate_xxhash")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map(
      "customer_orders" ->
        o.join(c, col("o_custkey") === col("c_custkey")).count(),
      "orders_lineitem" ->
        Tables.lineitem(spark, sf)
          .join(o, col("l_orderkey") === col("o_orderkey")).count())
    exact.foreach { case (pair, ex) =>
      val e = est(pair)
      assert(e * 3 >= ex && e <= ex * 3,
        s"$pair: xx estimate $e vs exact $ex outside the 3x band")
    }
    // PLAN: estimate-only — no un-sampled fact-to-fact join anywhere
    // (every scan feeds through the residue filter before the join)
    val plan = SketchQueries.queries("q250_join_estimate_xxhash")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"), "the sampling filter must be present")
  }
}
