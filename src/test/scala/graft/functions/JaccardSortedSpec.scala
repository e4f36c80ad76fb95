package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JaccardSortedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def j(a: Seq[Long], b: Seq[Long]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(JaccardSorted.jaccard_sorted(col("a"), col("b")).as("j"))
      .collect()(0).getDouble(0)

  test("matches the array_intersect/array_union composition") {
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 5L, 9L, 20L), Seq(2L, 5L, 9L, 21L, 30L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L)))
    cases.foreach { case (a, b) =>
      val expected = Seq((a, b)).toDF("a", "b")
        .select((size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b"))).cast("double")).as("j"))
        .collect()(0).getDouble(0)
      assert(j(a, b) == expected, s"a=$a b=$b")
    }
  }

  test("both empty -> 0.0, disjoint -> 0.0, identical -> 1.0") {
    assert(j(Seq.empty, Seq.empty) == 0.0)
    assert(j(Seq(1L, 2L), Seq(3L, 4L)) == 0.0)
    assert(j(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 1.0)
  }

  test("null elements are excluded from both intersection and union") {
    // nulls used to be skipped by the intersection but counted in the
    // union denominator, silently deflating the Jaccard (round-2 advice)
    val df = Seq(1).toDF("x").select(
      array(lit(null).cast("long"), lit(1L), lit(2L)).as("a"),
      array(lit(2L), lit(3L)).as("b"))
    val got = df.select(JaccardSorted.jaccard_sorted(col("a"), col("b")).as("j"))
      .collect()(0).getDouble(0)
    assert(got == 1.0 / 3.0) // {1,2} vs {2,3}: inter 1, union 3 — not 1/4
    // all-null vs all-null: empty effective sets -> 0.0, no div-by-zero
    val z = Seq(1).toDF("x").select(
      array(lit(null).cast("long")).as("a"), array(lit(null).cast("long")).as("b"))
    assert(z.select(JaccardSorted.jaccard_sorted(col("a"), col("b")))
      .collect()(0).getDouble(0) == 0.0)
  }

  test("codegen and interpreted paths agree") {
    val df = spark.range(200).select(
      sort_array(array_distinct(array(
        pmod(xxhash64(col("id")), lit(50)),
        pmod(xxhash64(col("id") + 1), lit(50)),
        pmod(xxhash64(col("id") * 3), lit(50))))).as("a"),
      sort_array(array_distinct(array(
        pmod(xxhash64(col("id") + 2), lit(50)),
        pmod(xxhash64(col("id") * 3), lit(50))))).as("b"))
    val viaExpr = df.select(JaccardSorted.jaccard_sorted(col("a"), col("b")).as("j"))
      .collect().map(_.getDouble(0)).toSeq
    val viaComposition = df.select((size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b"))).cast("double")).as("j"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaExpr == viaComposition)
  }
}
