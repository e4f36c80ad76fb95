package graft.warehouse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Exact

/** The scaled-integer money kernel behind every oracle-gated output
  * (round-3 decimal ban): `cents` must recover the EXACT integer for every
  * representable 2-decimal value — including the trailing-zero values the
  * driver's decimal hasher mangles — because one off-by-one anywhere
  * hash-fails the whole query. */
class ExactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cents recovers every 2-decimal value in [-1000.00, 1000.00] exactly") {
    // x = c/100.0 is usually NOT exactly representable as a double; the
    // decimal(18,2) cast must still round it back to exactly c cents.
    val bad = spark.range(-100000, 100001)
      .select(col("id"), (col("id").cast("double") / 100.0).as("x"))
      .select(col("id"), Exact.cents(col("x")).as("c"))
      .filter(col("c") =!= col("id"))
      .count()
    assert(bad == 0)
  }

  test("netE4 equals exact BigDecimal arithmetic on a price×discount grid") {
    val rows = spark.range(5000)
      .select(
        ((col("id") * 37 % 99999).cast("double") / 100.0).as("price"),
        ((col("id") % 100).cast("double") / 100.0).as("disc"))
      .withColumn("e4", Exact.netE4(col("price"), col("disc")))
      .collect()
    rows.foreach { r =>
      val p = BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val d = BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val expected = (p * 100).toLongExact * (100L - (d * 100).toLongExact)
      assert(r.getLong(2) == expected, s"price=$p disc=$d")
    }
  }
}
