package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chg(rows: (String, String, String)*): DataFrame =
    rows.toDF("k", "v", "_change_type")

  private def recompute(live: Seq[(String, String)]) =
    live.groupBy(_._1).view.mapValues { vs =>
      (vs.map(_._2).distinct.size.toLong, vs.size.toLong)
    }.toMap

  private def collectCounts(bag: DataFrame) =
    IncrementalDistinct.distinctCounts(bag).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("incremental distinct equals from-scratch recompute; a delete only " +
      "decrements when the LAST live copy goes") {
    // u1 sees 'click' twice — the case where naive per-window distinct
    // arithmetic breaks on the first delete
    var live = Seq(("u1", "click"), ("u1", "click"), ("u1", "buy"),
      ("u2", "view"))
    var bag = IncrementalDistinct.seed(live.toDF("k", "v"),
      col("k"), col("v"))
    assert(collectCounts(bag) == recompute(live))

    // delete ONE of u1's two clicks: n_distinct must NOT drop
    bag = IncrementalDistinct.applyDelta(bag,
      chg(("u1", "click", "delete")), col("k"), col("v"))
    live = live.diff(Seq(("u1", "click")))
    assert(collectCounts(bag) == recompute(live))
    assert(collectCounts(bag)("u1") == ((2L, 2L)))

    // delete the LAST click: now it drops
    bag = IncrementalDistinct.applyDelta(bag,
      chg(("u1", "click", "delete")), col("k"), col("v"))
    live = live.diff(Seq(("u1", "click")))
    assert(collectCounts(bag)("u1") == ((1L, 1L)))

    // an update (delete+insert) plus a brand-new key in one window
    bag = IncrementalDistinct.applyDelta(bag,
      chg(("u2", "view", "delete"), ("u2", "buy", "insert"),
        ("u3", "view", "insert")), col("k"), col("v"))
    live = live.diff(Seq(("u2", "view"))) ++ Seq(("u2", "buy"), ("u3", "view"))
    assert(collectCounts(bag) == recompute(live))

    // deleting a key's only row removes the key entirely, and the bag
    // carries no zero-multiplicity residue
    bag = IncrementalDistinct.applyDelta(bag,
      chg(("u3", "view", "delete")), col("k"), col("v"))
    live = live.diff(Seq(("u3", "view")))
    assert(collectCounts(bag) == recompute(live))
    assert(!collectCounts(bag).contains("u3"))
    assert(bag.filter(col("m") <= 0).isEmpty)
  }

  test("null keys merge, not duplicate: the fold's key equality is null-safe " +
      "like the GROUP BY it maintains") {
    // round-8 advice: plain `=` keys never match null, so a null-keyed
    // delta row landed in `fresh` and DUPLICATED the null-keyed state
    // row. SQL GROUP BY puts all nulls in one group; the fold must too.
    val state = Seq((Some("a"), 2L, 20L), (None, 3L, 30L))
      .toDF("key", "n", "tot")
    val delta = Seq((Some("a"), 1L, 5L), (None, 1L, 7L), (Some("b"), 1L, 1L))
      .toDF("key", "dn", "dtot")
    val merged = IvmFold.mergeCounts(state, delta, Seq("key"),
        Seq("n" -> "dn", "tot" -> "dtot"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet
    assert(merged == Set(
      (Some("a"), 3L, 25L),
      (None, 4L, 37L),      // ONE null-keyed row, counters summed
      (Some("b"), 1L, 1L)))
  }

  test("the fold shuffles only delta-sized data: a 2-row window against a " +
      "100k-pair bag moves a handful of records, never the bag") {
    // the scale claim behind the broadcast-merge fold (IvmFold): the
    // union + re-aggregate form it replaced shuffled the WHOLE bag per
    // commit. Assert on actual shuffle-write task metrics, not plan
    // strings — robust to AQE/broadcast-reuse plan shapes.
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffled.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    // 21 coprime to 5000 and lcm(5000, 21) > 100000: every (k, v) pair
    // occurs exactly once, so the bag holds 100k live pairs at m = 1
    val bag = IncrementalDistinct.seed(
        spark.range(100000L)
          .select(concat(lit("k"), (col("id") % 5000L)).as("k"),
            concat(lit("v"), (col("id") % 21L)).as("v")),
        col("k"), col("v"))
      .localCheckpoint(true)
    assert(bag.count() == 100000L)
    spark.sparkContext.addSparkListener(listener)
    try {
      // (k2, v2) is live at m = 1 (id ≡ 2 mod 5000 ⇒ v ≡ 2 mod 20), so
      // the delete drops it; the insert adds one fresh pair — net 0
      val n = IncrementalDistinct.applyDelta(bag,
        chg(("k1", "zz", "insert"), ("k2", "v2", "delete")),
        col("k"), col("v")).count()
      assert(n == 100000L)
      Thread.sleep(1000) // listener events are async
      assert(shuffled.get() < 1000L,
        s"fold shuffled ${shuffled.get()} records - base-sized, not delta-sized")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
