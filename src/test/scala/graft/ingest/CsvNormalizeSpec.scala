package graft.ingest

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Schemas

class CsvNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val raw = CsvNormalize.readRaw(spark, TestSpark.resource("txns_fixture.csv"))

  test("S2: headers normalize to the reference's exact names") {
    assert(raw.columns.toSeq == Schemas.txnsColumns)
  }

  test("S3: landing is all-varchar (every column StringType)") {
    assert(raw.schema.fields.forall(_.dataType == StringType))
  }

  test("money parse handles padded thousands-separated strings and empties") {
    val typed = CsvNormalize.typedTxns(raw).orderBy("date")
    val first = typed.filter(col("account_no") === "409000611074")
      .orderBy("date").limit(1).collect()(0)
    assert(first.getAs[java.math.BigDecimal]("deposit_amt")
      .compareTo(new java.math.BigDecimal("1000000.00")) == 0)
    assert(first.isNullAt(first.fieldIndex("withdrawal_amt")))
  }

  test("d-MMM-yy dates and booleans parse") {
    val typed = CsvNormalize.typedTxns(raw)
    assert(typed.filter(col("date").isNull || col("value_date").isNull).count() == 0)
    assert(typed.filter(col("chip_used")).count() == 3)
    val d = typed.agg(min("date")).collect()(0).getDate(0)
    assert(d.toString == "2017-06-29")
  }

  test("exactly one of withdrawal/deposit per row") {
    val typed = CsvNormalize.typedTxns(raw)
    val bad = typed.filter(
      col("withdrawal_amt").isNull === col("deposit_amt").isNull)
    assert(bad.count() == 0)
  }

  test("W1 invariant: balance_amt is the running sum of deposits-withdrawals") {
    val typed = CsvNormalize.typedTxns(raw)
    val w = Window.partitionBy("account_no").orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val recomputed = typed.withColumn("recalc",
      sum(coalesce(col("deposit_amt"), lit(0)) - coalesce(col("withdrawal_amt"), lit(0))).over(w))
    assert(recomputed.filter(col("recalc") =!= col("balance_amt")).count() == 0)
  }
}
