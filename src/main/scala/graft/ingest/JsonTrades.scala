package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** NoSQL-path ingest (SURVEY.md §2.1 S5/S10, §2.2 P4): multiline JSON
  * document scan, `$.data` array explode, schema-on-read landing.
  *
  * Re-expresses `source/load_data_to_dynamodb_lambda/handler.py:12-15`
  * (floats parsed as Decimal, then deliberately narrowed to double at the
  * stream sink, `write_dynamodb_stream_to_s3_lambda/handler.py:16-20` —
  * here the landing schema types them DoubleType directly, mirroring that
  * lossy cast) and the Redshift `COPY json 'auto'` name-matching: fields
  * absent in a record (the optional `ticket`) land as null rather than
  * erroring.
  */
object JsonTrades {

  /** S5: read `{"data": [...]}` fixture file into one row per trade.
    * Explicit schema = deterministic landing (no sampling-based inference),
    * which is what schema-on-read against a fixed DDL means at scale. */
  def readTradesFile(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .schema(Schemas.tradesFile)
      .json(path)
      .select(explode(col("data")).as("t"))
      .select(col("t.*"))

  /** S10: NDJSON (one document per line) with the landing schema — the
    * staged-file shape; missing keys → null columns. */
  def readNdjson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.tradesLanding).json(path)

  /** Typed analytical view: ISO-8601 `time.date` → timestamp, array stats
    * over asks/bids (§2.7 array ops). */
  def typedTrades(trades: DataFrame): DataFrame =
    trades.select(
      col("id"),
      col("ticker"),
      col("ticket"),
      col("price"),
      col("shares"),
      to_timestamp(col("time.date"), "yyyy-MM-dd'T'HH:mm:ss.SSSX").as("trade_ts"),
      col("details.system").as("system"),
      col("details.lag").as("lag"),
      col("details.asks").as("asks"),
      col("details.bids").as("bids"),
      array_max(col("details.asks")).as("best_ask"),
      array_max(col("details.bids")).as("best_bid"),
      size(col("details.asks")).as("n_asks"),
      size(col("details.bids")).as("n_bids"))
}
