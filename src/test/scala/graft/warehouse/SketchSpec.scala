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
}
