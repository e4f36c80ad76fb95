package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ReconcileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("A1: count parity holds for identical multisets") {
    val a = Seq(1, 2, 2, 3).toDF("v")
    val b = Seq(3, 2, 2, 1).toDF("v")
    assert(Reconcile.countParity(a, b))
    val r = Reconcile.report(a, b)
    assert(r.exactMatch && r.countsMatch)
  }

  test("exceptAll catches divergence that count parity misses") {
    val source = Seq(1, 2, 3).toDF("v")
    val target = Seq(1, 2, 2).toDF("v") // same count, different content
    assert(Reconcile.countParity(source, target))
    val r = Reconcile.report(source, target)
    assert(!r.exactMatch)
    assert(r.missingInTarget == 1 && r.extraInTarget == 1)
  }
}
