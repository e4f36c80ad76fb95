package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DynamoDB attribute-value tag codec (SURVEY.md §2.2 P3).
  *
  * The reference's stream handler receives NEW_IMAGE records in the tagged
  * wire form `{"S": str, "N": numeric-string, "BOOL": bool, "M": {...},
  * "L": [...]}` and unwraps them with boto3's TypeDeserializer
  * (`source/write_dynamodb_stream_to_s3_lambda/handler.py:30`). This is
  * the declarative equivalent: given the target landing schema, derive the
  * tagged schema for `from_json`/`spark.read.json`, and project the typed
  * columns out of the tags. Numbers travel as strings in the wire form
  * (arbitrary precision); the cast to the landing type reproduces the
  * reference's Decimal→double narrowing exactly where the landing schema
  * says DoubleType (P4).
  *
  * Pure column expressions — decode happens inside the scan projection,
  * no UDF, no driver involvement.
  */
object DynamoTags {

  /** The tagged-wire schema that lands a given target schema. */
  def taggedSchema(target: StructType): StructType =
    StructType(target.fields.map(f => StructField(f.name, taggedType(f.dataType), nullable = true)))

  private def taggedType(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(Seq(StructField("M", taggedSchema(s))))
    case ArrayType(elem, _) =>
      StructType(Seq(StructField("L", ArrayType(taggedType(elem)))))
    case BooleanType =>
      StructType(Seq(StructField("BOOL", BooleanType)))
    case _: NumericType =>
      StructType(Seq(StructField("N", StringType)))
    case _ =>
      StructType(Seq(StructField("S", StringType)))
  }

  /** Unwrap one tagged column into its target type. */
  def decodeColumn(tagged: Column, dt: DataType): Column = dt match {
    case s: StructType =>
      when(tagged.getField("M").isNotNull,
        struct(s.fields.map(f =>
          decodeColumn(tagged.getField("M").getField(f.name), f.dataType).as(f.name)).toIndexedSeq: _*))
    case ArrayType(elem, _) =>
      transform(tagged.getField("L"), x => decodeColumn(x, elem))
    case BooleanType => tagged.getField("BOOL")
    case n: NumericType => tagged.getField("N").cast(n)
    case other => tagged.getField("S").cast(other)
  }

  /** Decode a whole tagged record DataFrame into the target shape. */
  def decode(tagged: DataFrame, target: StructType): DataFrame =
    tagged.select(target.fields.map(f =>
      decodeColumn(col(f.name), f.dataType).as(f.name)).toIndexedSeq: _*)
}
