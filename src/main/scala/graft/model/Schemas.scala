package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas for the two replicated tables and the CDC envelope.
  *
  * Mirrors the reference's data model (SURVEY.md §1, FIXTURES.md):
  *  - `txns`: the SQL-path banking table; landed all-varchar
  *    (reference infers every column as varchar(40),
  *    `source/configure_rds_lambda/handler.py:41-49`), analytics happen
  *    over a typed view.
  *  - `trades`: the NoSQL-path document table; nested structs stand in for
  *    Redshift SUPER columns
  *    (`source/configure_redshift_for_dynamodb_cdc_lambda/handler.py:22-31`),
  *    `ticket` is optional and must land null when absent.
  *  - `ChangeEvent`: the engine-neutral CDC envelope implied by the
  *    reference's stream handler
  *    (`source/write_dynamodb_stream_to_s3_lambda/handler.py:27-38`).
  */
object Schemas {

  /** Normalized `txns` column names — the exact output of the reference's
    * lowercase + space→underscore header rule applied to its CSV header
    * (padded raw names keep their underscores). */
  val txnsColumns: Seq[String] = Seq(
    "account_no", "date", "transaction_details", "chip_used", "value_date",
    "_withdrawal_amt_", "_deposit_amt_", "balance_amt")

  /** Faithful all-varchar landing schema for `txns`. */
  val txnsLanding: StructType =
    StructType(txnsColumns.map(c => StructField(c, StringType, nullable = true)))

  /** `details` SUPER-equivalent struct (FIXTURES.md §2). */
  val tradeDetails: StructType = StructType(Seq(
    StructField("asks", ArrayType(DoubleType)),
    StructField("bids", ArrayType(DoubleType)),
    StructField("lag", LongType),
    StructField("system", StringType)))

  /** `time` SUPER-equivalent struct; `date` stays a string at landing
    * (schema-on-read), cast to timestamp in views. */
  val tradeTime: StructType = StructType(Seq(
    StructField("date", StringType)))

  /** `trades` landing schema, matching the Redshift DDL typing
    * (id unique key, price float, shares integer, optional ticket). */
  val tradesLanding: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("details", tradeDetails, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("shares", IntegerType, nullable = true),
    StructField("ticker", StringType, nullable = true),
    StructField("ticket", StringType, nullable = true),
    StructField("time", tradeTime, nullable = true)))

  /** Wrapper for the raw fixture file shape `{"data": [...]}`. */
  val tradesFile: StructType = StructType(Seq(
    StructField("data", ArrayType(tradesLanding))))

  /** CDC envelope: op + key + after-image + event timestamp. `after` is
    * null for REMOVE (NEW_IMAGE view semantics). */
  def envelope(after: StructType): StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("after", after, nullable = true),
    StructField("ts", TimestampType, nullable = false)))

  val tradesEnvelope: StructType = envelope(tradesLanding)
}
