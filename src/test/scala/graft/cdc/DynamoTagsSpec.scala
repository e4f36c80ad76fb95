package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Schemas

class DynamoTagsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val taggedJson =
    """{"id": {"S": "64f1a2b3c4d5e6f708192a3b"},
      | "details": {"M": {"asks": {"L": [{"N": "110.07"}, {"N": "110.12"}]},
      |                   "bids": {"L": [{"N": "109.9"}]},
      |                   "lag": {"N": "3"}, "system": {"S": "alpha"}}},
      | "price": {"N": "110"}, "shares": {"N": "200"},
      | "ticker": {"S": "wxyz"},
      | "time": {"M": {"date": {"S": "2012-03-02T22:00:00.000Z"}}}}""".stripMargin.replace("\n", "")

  test("P3: tagged NEW_IMAGE decodes to the landing schema, optional field null") {
    val tagged = spark.read
      .schema(DynamoTags.taggedSchema(Schemas.tradesLanding))
      .json(Seq(taggedJson).toDS())
    val decoded = DynamoTags.decode(tagged, Schemas.tradesLanding)
    assert(decoded.schema.fieldNames.toSeq == Schemas.tradesLanding.fieldNames.toSeq)
    assert(decoded.schema.fields.map(_.dataType.simpleString).toSeq ==
      Schemas.tradesLanding.fields.map(_.dataType.simpleString).toSeq)
    val row = decoded.collect()(0)
    assert(row.getAs[String]("id") == "64f1a2b3c4d5e6f708192a3b")
    assert(row.getAs[Double]("price") == 110.0)
    assert(row.getAs[Int]("shares") == 200)
    assert(row.isNullAt(row.fieldIndex("ticket"))) // absent tag -> null
    val details = row.getStruct(row.fieldIndex("details"))
    assert(details.getSeq[Double](details.fieldIndex("asks")) == Seq(110.07, 110.12))
    assert(details.getLong(details.fieldIndex("lag")) == 3L)
    val time = row.getStruct(row.fieldIndex("time"))
    assert(time.getString(0) == "2012-03-02T22:00:00.000Z")
  }

  test("number tags narrow exactly like the reference's Decimal->double") {
    val j = """{"price": {"N": "110.123456789012345678"}}"""
    val target = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("price",
        org.apache.spark.sql.types.DoubleType)))
    val tagged = spark.read.schema(DynamoTags.taggedSchema(target)).json(Seq(j).toDS())
    val v = DynamoTags.decode(tagged, target).collect()(0).getDouble(0)
    assert(v == "110.123456789012345678".toDouble) // double-nearest, the P4 narrowing
  }
}
