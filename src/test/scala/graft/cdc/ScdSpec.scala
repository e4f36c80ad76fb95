package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def history(rows: Seq[(Long, String, Long, Long)]) =
    Scd.type2(
      rows.map { case (k, st, t, e) => (k, st, ts(t), e) }
        .toDF("k", "st", "t", "e"),
      col("k"), col("st"), col("t"), col("e"))
      .orderBy(col("key"), col("version"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getInt(4), r.getBoolean(5)))
      .toSeq

  test("runs collapse, intervals are half-open and adjacent, last is current") {
    val h = history(Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), // same-state run collapses
      (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L))) // state may recur as a NEW version
    assert(h == Seq(
      (1L, "A", ts(10), Some(ts(30)), 1, false),
      (1L, "B", ts(30), Some(ts(40)), 2, false),
      (1L, "A", ts(40), None, 3, true)))
    // adjacency: every valid_to equals the next run's valid_from
    h.sliding(2).foreach {
      case Seq(a, b) => assert(a._4.contains(b._3))
      case _         =>
    }
  }

  test("keys are independent; single-event key is version 1 and current") {
    val h = history(Seq(
      (1L, "A", 10L, 1L),
      (2L, "Z", 5L, 2L), (2L, "Z", 6L, 3L)))
    assert(h == Seq(
      (1L, "A", ts(10), None, 1, true),
      (2L, "Z", ts(5), None, 1, true)))
  }

  test("equal timestamps are ordered by the tie-breaker") {
    // same ts: tie column decides A-then-B, so two runs, B current
    val h = history(Seq((1L, "B", 10L, 2L), (1L, "A", 10L, 1L)))
    assert(h.map(x => (x._2, x._5, x._6)) == Seq(("A", 1, false), ("B", 2, true)))
  }

  test("null states group into one run, not one run per event") {
    val rows = Seq((1L, null.asInstanceOf[String], 10L, 1L),
      (1L, null.asInstanceOf[String], 20L, 2L),
      (1L, "A", 30L, 3L))
    val h = Scd.type2(
      rows.map { case (k, st, t, e) => (k, st, ts(t), e) }
        .toDF("k", "st", "t", "e"),
      col("k"), col("st"), col("t"), col("e"))
      .orderBy(col("version"))
      .collect()
      .map(r => (Option(r.getString(1)), r.getInt(4), r.getBoolean(5)))
      .toSeq
    assert(h == Seq((None, 1, false), (Some("A"), 2, true)))
  }
}
