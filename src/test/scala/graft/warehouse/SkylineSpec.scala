package graft.warehouse

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dominance-shape coverage for the two-pass distributed skyline —
  * degenerate geometries the customer-frontier oracle can't exercise.
  */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sky(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    StatsQueries.skyline2d(
        pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
          .toDF("id", "x", "y"), "x", "y")
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.toSet

  test("single dominant point wins; equal duplicates all survive") {
    assert(sky(Seq((1L, 1L), (5L, 5L), (3L, 3L))) == Set((5L, 5L)))
    // two identical maxima: neither strictly dominates the other
    assert(sky(Seq((5L, 5L), (5L, 5L), (1L, 9L))) == Set((5L, 5L), (1L, 9L)))
  }

  test("anti-correlated staircase keeps every point") {
    val stair = (1L to 20L).map(i => (i, 21L - i))
    assert(sky(stair) == stair.toSet)
  }

  test("matches the O(n²) definition on seeded random frames") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      val pts = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      assert(sky(pts) == brute(pts))
    }
  }
}
