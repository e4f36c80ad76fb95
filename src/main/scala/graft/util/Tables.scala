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

  /** `events` is written with nanosecond Parquet timestamps, which Spark 4
    * refuses to read natively (PARQUET_TYPE_ILLEGAL). We read them as raw
    * nanos via the legacy flag and rebuild `ts` at microsecond precision
    * with exact integer division (`div`, not double division — ns-since-epoch
    * exceeds double's 53-bit mantissa). DuckDB keeps full nanos, so
    * oracle-facing queries must only use `ts` through `date_trunc('second')`
    * or coarser, and must order by `event_id` (globally monotonic with ts)
    * rather than by `ts` itself.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
