package graft.warehouse

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("bloom semi-join: no false negatives, bounded false-positive overhead") {
    val row = SketchQueries.queries("q70_bloom_semi_join")(spark, sf).collect()(0)
    val bloomHits = row.getLong(0)
    val exactHits = row.getLong(1)
    assert(bloomHits >= exactHits) // a Bloom filter never drops a member
    // 400k bits over <=1.5k keys: fp rate well under 5%
    assert(bloomHits <= (exactHits * 1.05 + 50))
  }

  test("count-min: estimate >= exact per key, and tight at this scale") {
    val rows = SketchQueries.queries("q71_count_min")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1)
      val est = r.getLong(2)
      assert(est >= exact, s"${r.getString(0)}: estimate $est < exact $exact")
      assert(r.getBoolean(3))
      // eps = 0.001 over ~1.5k events: estimates should be essentially exact
      assert(est <= exact + 50, s"${r.getString(0)}: estimate $est way over $exact")
    }
  }
}
