package graft.warehouse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("A4: approx_count_distinct within the HLL++ error envelope") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("A8: CentsSum equals decimal-exact summation") {
    import spark.implicits._
    val df = Seq(0.01, 0.02, 0.03, 100.10, -0.06).toDF("x")
    val centsSum = udaf(graft.functions.CentsSum)
    val got = df.agg(centsSum(col("x"))).collect()(0).getDouble(0)
    assert(got == 100.10)
  }
}
