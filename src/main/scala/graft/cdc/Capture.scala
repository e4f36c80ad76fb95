package graft.cdc

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Change capture: stream of CDC envelopes → staged NDJSON micro-batches
  * (SURVEY.md §2.1 S7/S8, §2.8 T1–T3/T8).
  *
  * Re-expresses the reference's stream→S3 Lambda
  * (`source/write_dynamodb_stream_to_s3_lambda/handler.py:40-59`): each
  * micro-batch becomes newline-delimited JSON under a name that encodes
  * event-time, uuid and record count; an empty batch (e.g. all REMOVEs)
  * produces a zero-byte `…__no_inserted_or_modified_records.txt` marker so
  * "no data" is distinguishable from "not run".
  *
  * Differences from the reference, by design:
  *  - one *directory* of part files per batch instead of one object — a
  *    single coalesced file would serialize the write through one task at
  *    scale; the metadata lives in the directory name instead;
  *  - Structured Streaming checkpointing replaces the
  *    unprocessed/processed prefix dance (S9) — exactly-once for the
  *    file-sink path, which strictly exceeds the reference's
  *    at-least-once semantics (T8).
  */
object Capture {

  // The reference's S3 keys use a full ISO timestamp with colons
  // (`handler.py:47`); Hadoop Path globbing rejects ':' in path segments,
  // so the time-of-day separators become '-' here. Same information, FS-safe.
  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH-mm-ss'Z'").withZone(ZoneOffset.UTC)

  /** Batch-dir / marker-file name, reference naming convention
    * (`handler.py:47-48`): `{utc-ts}__{uuid}__{n}__{kind}`. */
  def batchName(n: Long, at: Instant = Instant.now()): String = {
    val kind =
      if (n > 0) "inserted_or_modified_records"
      else "no_inserted_or_modified_records"
    s"${tsFmt.format(at)}__${UUID.randomUUID()}__${n}__$kind"
  }

  /** Write one already-routed micro-batch to the staging area. Exposed
    * separately so batch tests cover it without a streaming context. */
  def stageBatch(routed: DataFrame, stageDir: String): String = {
    // Cheap distributed write; the count is needed for the marker protocol
    // anyway, so persist to avoid recomputing the routed projection.
    routed.persist()
    try {
      val n = routed.count()
      val name = batchName(n)
      if (n == 0) {
        // FS-neutral marker write (the stage dir is an S3 prefix in the
        // reference deployment, handler.py:47-48)
        val hc = graft.util.Hfs.conf(routed.sparkSession)
        graft.util.Hfs.mkdirs(new org.apache.hadoop.fs.Path(stageDir), hc)
        graft.util.Hfs.touch(
          new org.apache.hadoop.fs.Path(stageDir, s"$name.txt"), hc)
      } else {
        routed.select(col("after.*"))
          .write.mode("overwrite").json(s"$stageDir/$name")
      }
      name
    } finally routed.unpersist()
  }

  /** Kafka-wire adapter (S7): a Kafka source yields (key binary, value
    * binary, timestamp, …); this projects it into the CDC envelope via
    * from_json on the payload — `spark.readStream.format("kafka")…` plugs
    * straight into [[start]] through this. Envelope JSON shape:
    * {"op": …, "after": {…}}; the record key is the entity key and the
    * broker timestamp the event time. */
  def fromKafkaShape(
      kafka: DataFrame,
      afterSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val parsed = from_json(
      col("value").cast("string"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("op",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("after", afterSchema))))
    kafka.select(
      parsed.getField("op").as("op"),
      col("key").cast("string").as("key"),
      parsed.getField("after").as("after"),
      col("timestamp").as("ts"))
  }

  /** S7/S8: start the capture query. `maxFilesPerTrigger`-style batch caps
    * and start position belong to the upstream source config; here the
    * trigger mirrors the reference's 5-second batching window (T1).
    */
  def start(
      envelopes: DataFrame,
      stageDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        stageBatch(Envelope.route(batch), stageDir)
        ()
      }
      .start()
}
