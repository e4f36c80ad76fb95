package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives an `sfDir`; all table access
  * funnels through here so scan options (and, at cluster scale, catalog
  * indirection / bucketing metadata) live in one place.
  *
  * Scale note: these are plain columnar Parquet scans — Catalyst pushes
  * predicates and prunes columns into the scan, so at 100 TB the same code
  * reads only the row groups + columns a query needs. Nothing here ever
  * collects to the driver.
  */
object Tables {

  // Memoized per (session, path): repeated reads of the same immutable
  // table otherwise re-list files and re-read parquet footers on every
  // query — measurable fixed overhead when a session runs the whole
  // 58-query surface. The cache holds lazy plans (no data), so memory
  // cost is the file index only.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** `events.ts` lands as a naive Parquet `timestamp[us]`, which Spark 4
    * infers as TIMESTAMP_NTZ. The rest of the library (and the streaming
    * surface, watermarks included) speaks session-zoned TimestampType, so
    * normalize here with a cast — under the contract's UTC session zone the
    * internal microsecond value is unchanged, and DuckDB's naive TIMESTAMP
    * reads the identical integers, so both engines agree to the microsecond.
    * (Earlier testdata generations wrote ns-precision epoch longs instead;
    * this loader is the single seam that absorbed that change.) Queries
    * still order by `event_id` (globally monotonic with ts) by convention —
    * ts ties would otherwise make result order engine-dependent.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case other =>
        // fail fast: a blanket cast would read e.g. a legacy ns-epoch
        // LongType as SECONDS and silently produce wrong timestamps
        // (round-7 ADVICE) — stale testdata must be regenerated, not
        // absorbed wrongly
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected TIMESTAMP or " +
            "TIMESTAMP_NTZ); regenerate the testdata")
    }
  }
}
