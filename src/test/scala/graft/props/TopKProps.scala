package graft.props

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{TopKBuf, TopKByValue}

/** Properties of the mergeable top-k buffer: any partitioning/merge order
  * must equal the global sort — the invariant that makes the Aggregator
  * safe under Spark's arbitrary partial-aggregation tree. */
object TopKProps extends Properties("topk") {

  private val agg = new TopKByValue(5)
  private val rows = Gen.listOf(Gen.zip(
    Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(0L, 100000L)))

  private def expected(xs: List[(Double, Long)]): Seq[(Double, Long)] =
    xs.distinct.sortBy { case (v, k) => (-v, k) }.take(5)

  private def result(b: TopKBuf): Seq[(Double, Long)] =
    b.vals.zip(b.keys).toSeq

  property("sequential reduce equals global sort-take-k") =
    Prop.forAll(rows) { xs =>
      val dedup = xs.distinct
      result(dedup.foldLeft(agg.zero)(agg.reduce)) == expected(dedup)
    }

  property("any split + merge equals global sort-take-k") =
    Prop.forAll(rows, Gen.chooseNum(0, 100)) { (xs, cut) =>
      val dedup = xs.distinct
      val (l, r) = dedup.splitAt(cut % (dedup.length + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      result(merged) == expected(dedup)
    }

  property("merge is commutative") =
    Prop.forAll(rows, rows) { (a0, b0) =>
      val (a, b) = (a0.distinct, b0.distinct.filterNot(a0.contains))
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      result(agg.merge(ba, bb)) == result(agg.merge(bb, ba))
    }
}
