package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SQL-path ingest (SURVEY.md §2.1 S1–S3, §2.7): CSV scan with header,
  * header normalization, all-varchar landing, and the typed analytical view.
  *
  * Re-expresses `source/load_data_to_rds_lambda/handler.py:23-28` and
  * `source/configure_rds_lambda/handler.py:34-49`: the reference reads the
  * CSV at runtime, lowercases headers and replaces spaces with underscores,
  * and lands every column as varchar(40). Analytics then need explicit
  * casts (money strings like "  1,000,000.00 ", dates like 29-Jun-17,
  * booleans FALSE/TRUE) — those casts are the typed view below.
  *
  * All column-level work is Catalyst built-ins (regexp_replace/cast/
  * to_date), so the whole view stays inside WholeStageCodegen and the scan
  * still prunes columns at 100 TB.
  */
object CsvNormalize {

  /** S2: lowercase + space→underscore on every column name (padded raw
    * headers keep their underscores, e.g. " WITHDRAWAL AMT " →
    * "_withdrawal_amt_"). */
  def normalizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c => c.toLowerCase.replace(" ", "_")).toIndexedSeq: _*)

  /** S1+S3: header CSV scan into the all-varchar landing shape. No
    * inferSchema — stringly-typed ingest is the reference's semantics. */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    normalizeHeaders(
      spark.read
        .option("header", "true")
        .option("quote", "\"")
        .csv(path))

  /** Money-string parse: strip spaces/commas, empty → null, exact decimal.
    * Default path is the native codegen'd expression (single pass, no
    * regex); [[moneyColComposed]] is the built-ins-only equivalent kept
    * for cross-validation. */
  def moneyCol(c: Column): Column = graft.functions.ParseMoney.parse_money(c)

  def moneyColComposed(c: Column): Column = {
    val cleaned = regexp_replace(c, "[ ,]", "")
    when(cleaned === "" || cleaned.isNull, lit(null).cast(DecimalType(18, 2)))
      .otherwise(cleaned.try_cast(DecimalType(18, 2))) // ANSI-safe: garbage -> null
  }

  /** `29-Jun-17`-style date parse (reference txns.csv date format). */
  def dMmmYy(c: Column): Column = to_date(c, "d-MMM-yy")

  /** Typed analytical view over the all-varchar landing (FIXTURES.md §1). */
  def typedTxns(raw: DataFrame): DataFrame =
    raw.select(
      col("account_no"),
      dMmmYy(col("date")).as("date"),
      trim(col("transaction_details")).as("transaction_details"),
      col("chip_used").cast("boolean").as("chip_used"),
      dMmmYy(col("value_date")).as("value_date"),
      moneyCol(col("_withdrawal_amt_")).as("withdrawal_amt"),
      moneyCol(col("_deposit_amt_")).as("deposit_amt"),
      moneyCol(col("balance_amt")).as("balance_amt"))
}
