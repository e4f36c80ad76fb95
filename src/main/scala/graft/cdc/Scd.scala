package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building from a change feed.
  *
  * The reference lands every change event as an append row and leaves the
  * warehouse table as an ever-growing event pile (README.md:30 documents
  * the duplicate accumulation on its MODIFY path). A warehouse consumer
  * usually wants one of two compactions: latest-state
  * ([[Envelope.latestByKey]], q33) or the full SCD **Type 2** history —
  * one row per (key, state) RUN with validity interval and version, the
  * standard dimension-history shape (Kimball DW toolkit; Delta/Iceberg
  * MERGE recipes build the same thing imperatively).
  *
  * Scale shape: one shuffle on the key; both windows (change detection,
  * interval stitching) and the implicit dedup all ride that single
  * partitioning. No joins, no driver state — a 100 TB feed compacts in
  * one exchange.
  */
object Scd {

  /** Collapse a change feed to SCD Type-2 history rows.
    *
    * Consecutive events (ordered by `ts`, tie-broken by `tie`, which must
    * make the ordering total — e.g. a monotonic event id) carrying the
    * same `state` collapse into one validity run; a run's `valid_to` is
    * the next run's `valid_from` (half-open intervals, the join-friendly
    * convention) and NULL on the current run.
    *
    * Output: (key, state, valid_from, valid_to, version, is_current)
    * with `version` numbering runs 1..n per key in time order.
    */
  def type2(feed: DataFrame, key: Column, state: Column, ts: Column,
      tie: Column): DataFrame = {
    val base = feed.select(key.as("key"), state.as("state"), ts.as("ts"),
      tie.as("tie"))
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
    // Run starts: first event per key, or a state different from the
    // previous event's. `<=>`-negation keeps NULL states grouping into
    // runs instead of starting a new run per NULL.
    val starts = base
      .withColumn("prev", lag(col("state"), 1).over(w))
      .withColumn("is_first", row_number().over(w) === 1)
      .filter(col("is_first") || !(col("prev") <=> col("state")))
    val wRun = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
    starts.select(col("key"), col("state"), col("ts").as("valid_from"),
        lead(col("ts"), 1).over(wRun).as("valid_to"),
        row_number().over(wRun).as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
