package graft.warehouse

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Closure correctness of the graph operators on hand-built graphs —
  * shapes the co-purchase oracle gate can't isolate (complete graphs,
  * triangle-free chains/stars, disconnected unions).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = GraphQueries.triangleCount(edges.toDF("u", "v")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("triangles: K4 has 4, K3 has 1") {
    assert(counts(Seq((1L, 2L), (1L, 3L), (2L, 3L))) == ((3L, 1L)))
    val k4 = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    assert(counts(k4) == ((6L, 4L)))
  }

  test("triangles: chains and stars are triangle-free") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((3L, 0L)))
    assert(counts(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) == ((4L, 0L)))
  }

  test("triangles: disconnected components add up") {
    // two disjoint K3s
    val two = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 20L), (10L, 30L), (20L, 30L))
    assert(counts(two) == ((6L, 2L)))
  }

  test("degree distribution: star = one hub of degree n, n leaves of 1") {
    val dist = GraphQueries.degreeDistribution(
        Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(1L -> 4L, 4L -> 1L))
  }
}
