package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // --- q220: stride-scheduled mixture order ---------------------------

  test("stride mixture: every prefix of the training order holds each source's share") {
    val d = "/root/testdata/sf0.001"
    val rows = SamplingQueries.queries("q220_stride_mixture")(spark, d)
      .orderBy(col("global_pos"))
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(rows.nonEmpty && rows.map(_._2).toSeq == (1L to rows.length).toSeq)
    val w = graft.util.Tables.documents(spark, d)
      .groupBy(col("source"))
      .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = w.values.sum.toDouble
    val nSources = w.size
    // midpoint-rule bound: at any threshold x, count_s = floor(x·w_s + ½),
    // giving |count_s − P·w_s/W| ≤ ½ + (S/2)·(w_s/W) at threshold cuts;
    // prefixes that cut between thresholds add up to ~2 rows of slack.
    // The point is the deviation is a small CONSTANT at EVERY prefix —
    // an epoch shuffle deviates O(√(P·share)) ≈ 5 at P≈450 here, and
    // only in expectation.
    // ... and only while no source is exhausted: once a source's docs
    // run out its share necessarily freezes (the tail of the order is
    // whatever remains — inherent to any interleave of finite streams).
    val docsPerSource = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val counts = scala.collection.mutable.Map.empty[String, Long]
    var exhausted = false
    var checked = 0
    rows.zipWithIndex.foreach { case ((src, _), i) =>
      counts(src) = counts.getOrElse(src, 0L) + 1L
      exhausted = exhausted ||
        counts.exists { case (s, c) => c >= docsPerSource(s) }
      val p = i + 1
      if (!exhausted) {
        checked = p
        w.keys.foreach { s =>
          val share = w(s) / total
          val bound = 0.5 + nSources / 2.0 * share + 2.0
          val dev = math.abs(counts.getOrElse(s, 0L) - p * share)
          assert(dev <= bound,
            s"prefix $p source $s: count ${counts.getOrElse(s, 0L)} " +
              s"vs expected ${p * share} exceeds $bound")
        }
      }
    }
    assert(checked > rows.length / 2,
      "the unexhausted region must cover a meaningful prefix span")
    // and the full order is a permutation of the corpus
    val nDocs = graft.util.Tables.documents(spark, d).count()
    assert(rows.length.toLong == nDocs)
  }

  // --- q228: PPS systematic sampling ----------------------------------

  test("pps sample: exactly n draws by telescoping, weights bound multiplicity") {
    val d = "/root/testdata/sf0.001"
    val picks = SamplingQueries.queries("q228_pps_sample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // telescoping: Σ n_picks = floor(W·n/W) − floor(0) = n, always
    assert(picks.map(_._3).sum == 40L)
    assert(picks.forall(_._3 >= 1L))
    // a doc can only be drawn ⌈w·n/W⌉ times; with w ≪ W/n that is 1 —
    // verify the certainty-sampling bound row by row
    val w = graft.util.Tables.documents(spark, d)
      .agg(sum(col("n_chars"))).head().getLong(0)
    picks.foreach { case (id, chars, n) =>
      val maxDraws = (chars * 40L) / w + 1L
      assert(n <= maxDraws, s"doc $id drawn $n > $maxDraws times")
    }
    // deterministic: a rerun selects the identical multiset
    val again = SamplingQueries.queries("q228_pps_sample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(picks.toSeq == again.toSeq)
  }
}
