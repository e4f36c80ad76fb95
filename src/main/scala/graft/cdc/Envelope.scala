package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC envelope semantics (SURVEY.md §2.2 P1–P3, §2.8 T4/T5).
  *
  * The reference's stream handler
  * (`source/write_dynamodb_stream_to_s3_lambda/handler.py:27-38`) routes on
  * eventName: INSERT and MODIFY are kept (NewImage appended — no dedup, no
  * merge), REMOVE is dropped (a documented divergence, README.md:30), and
  * any other op raises. `route` reproduces exactly that contract as a
  * single codegen'd filter.
  */
object Envelope {

  val Insert = "INSERT"
  val Modify = "MODIFY"
  val Remove = "REMOVE"

  /** P1: keep INSERT/MODIFY, drop REMOVE, raise on anything else. The
    * raise lives in the filter predicate itself so Catalyst cannot prune
    * it away, and evaluation stays row-at-a-time inside codegen. */
  def route(events: DataFrame, opCol: String = "op"): DataFrame =
    events.filter(
      when(col(opCol).isin(Insert, Modify), lit(true))
        .when(col(opCol) === Remove, lit(false))
        .otherwise(raise_error(concat(lit("Unknown CDC op: "), col(opCol)))))

  /** P2: project the after-image only (stream metadata dropped). */
  def afterImage(routed: DataFrame): DataFrame =
    routed.select(col("after.*"))

  /** T4-improved (explicitly NOT the faithful default): latest state per
    * key — the merge/upsert view the reference never implements. One
    * window over a single shuffle on the key; at scale this is the
    * standard CDC compaction pattern.
    */
  def latestByKey(appended: DataFrame, key: Column, version: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tieBreak makes equal-version rows deterministic (e.g. merge apply
    // orders REMOVE above MODIFY so deletes win replays reproducibly);
    // without it, equal versions fall to arbitrary partition order.
    val w = Window.partitionBy(key).orderBy(version.desc +: tieBreak: _*)
    appended
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
