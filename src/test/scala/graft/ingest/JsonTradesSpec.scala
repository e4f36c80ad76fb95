package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JsonTradesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val trades = JsonTrades.readTradesFile(spark, TestSpark.resource("trades_fixture.json"))

  test("S5: document file explodes to one row per trade") {
    assert(trades.count() == 8)
    assert(trades.select("id").distinct().count() == 8)
  }

  test("S10: optional ticket lands null, not error") {
    assert(trades.filter(col("ticket").isNull).count() == 1)
    assert(trades.filter(col("ticket").isNotNull).count() == 7)
  }

  test("nested SUPER-equivalent structs navigate by dot path") {
    val systems = trades.select(col("details.system")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(systems == Set("alpha", "beta", "gamma"))
  }

  test("S10 schema evolution: widened landing schema null-fills old rows, lands new fields") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val widened = StructType(
      graft.model.Schemas.tradesLanding.fields :+
        StructField("venue", StringType, nullable = true))
    val lines = Seq(
      """{"id": "old1", "ticker": "aa", "price": 1.0}""",
      """{"id": "new1", "ticker": "bb", "price": 2.0, "venue": "XNYS"}""")
    val df = spark.read.schema(widened).json(lines.toDS())
    assert(df.count() == 2)
    val byId = df.collect().map(r => r.getAs[String]("id") ->
      Option(r.getAs[String]("venue"))).toMap
    assert(byId("old1").isEmpty && byId("new1").contains("XNYS"))
  }

  test("typed view: ISO timestamps parse, array stats computed") {
    val t = JsonTrades.typedTrades(trades)
    assert(t.filter(col("trade_ts").isNull).count() == 0)
    val row = t.filter(col("ticker") === "wxyz").collect()(0)
    assert(row.getAs[Double]("best_ask") == 210.9)
    assert(row.getAs[Int]("n_bids") == 4)
  }
}
