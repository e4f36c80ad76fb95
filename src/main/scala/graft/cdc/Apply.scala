package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Staged-file → warehouse apply loop (SURVEY.md §2.1 S9–S11, §2.8 T9).
  *
  * The reference lists an `unprocessed/` S3 prefix every 5 minutes, issues
  * one Redshift `COPY … FORMAT AS JSON 'auto'` per file, then moves the
  * file to a `processed/` prefix
  * (`source/load_s3_files_from_dynamodb_stream_to_redshift_lambda/handler.py:45-92`).
  * Structured Streaming's file source + checkpoint subsumes that entire
  * protocol: the checkpoint IS the processed-files ledger, and restart
  * resumes exactly where it stopped (T9 idempotence for free). Marker
  * `.txt` files are excluded by the `*.json` glob — they carry no rows,
  * matching the loader's archive-without-COPY branch (`handler.py:80-90`).
  *
  * Retention (S12): `cleanSourceArchive` mirrors the reference's
  * processed-prefix + 1-day-expiry lifecycle.
  */
object Apply {

  /** Streaming view of the staged NDJSON batches, schema-on-read: fields
    * absent in a record land as null (Redshift `COPY json 'auto'`
    * semantics, S10). */
  def stagedStream(
      spark: SparkSession,
      stageDir: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 100,
      cleanSource: Option[String] = None, // S12: "archive" | "delete"
      sourceArchiveDir: Option[String] = None): DataFrame = {
    val r = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // T2 batch cap
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.json")
    // Retention (S12): the reference moves consumed files to a processed/
    // prefix with 1-day S3 expiry; the file source's cleanSource option is
    // the native equivalent (archive to a prefix, or delete outright).
    val r2 = cleanSource.fold(r)(m => r.option("cleanSource", m))
    val r3 = sourceArchiveDir.fold(r2)(p => r2.option("sourceArchiveDir", p))
    r3.json(stageDir)
  }

  /** S9/T4: continuous append into the warehouse table (parquet dir).
    * Faithful semantics: INSERT and MODIFY both append, one row per change
    * event, no dedup — the warehouse accumulates history exactly like the
    * reference's Redshift table. */
  def startAppend(
      staged: DataFrame,
      warehouseDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      partitionBy: Seq[String] = Nil): StreamingQuery = {
    val w = staged.writeStream
      .format("parquet")
      .option("path", warehouseDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
    // Partitioned layout: at warehouse scale the landing table partitions
    // on a low-cardinality derived key (e.g. event date) so analytic scans
    // prune whole directories — the Spark-native form of Redshift's
    // distribution/sort keys.
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).start()
  }

  /** T4/T5-improved: merge (upsert+delete) apply mode — the capability the
    * reference documents as missing (README.md:30: REMOVE events dropped,
    * MODIFY accumulates duplicates). Each micro-batch folds into the
    * keyed table: latest-by-version wins per key, REMOVE tombstones
    * delete. Hand-rolled over parquet (no table format available
    * offline): read-modify-write with a staging dir + atomic-ish rename.
    * At cluster scale the same foreachBatch body targets a transactional
    * table format's MERGE; only this sink function changes.
    */
  def startMerge(
      envelopes: DataFrame,
      tableDir: String,
      checkpointDir: String,
      keyCol: String,
      versionCol: String,
      schema: StructType,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        import org.apache.spark.sql.functions._
        val spark = batch.sparkSession
        val dir = new java.io.File(tableDir)
        // crash recovery: a death between the two renames leaves the table
        // only under .old — restore it before reading, otherwise the replay
        // would publish a table containing just the replayed batch
        val retired = new java.io.File(tableDir + ".old")
        if (!dir.exists() && retired.exists() && !retired.renameTo(dir))
          sys.error(s"cannot restore $retired")
        val versionType = envelopes.schema(versionCol).dataType
        val stored = addVersion(schema, versionType)
        val current =
          if (dir.exists() && dir.listFiles().exists(_.getName.endsWith(".parquet")))
            spark.read.schema(stored).parquet(tableDir)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stored)
        // batch rows carry the key at the envelope level (REMOVE has a
        // null after-image, so the payload key can't be used for merging)
        val upserts = batch
          .select(col("op"), col("key").as("_key"),
            col(versionCol).as("_version"), col("after.*"))
        val cur = current
          .withColumn("op", lit(Envelope.Modify))
          .withColumn("_key", col(keyCol))
        // tie-break: on equal versions REMOVE outranks MODIFY outranks
        // INSERT ('R' > 'M' > 'I'), so deletes win replays deterministically
        val merged = Envelope.latestByKey(
            cur.unionByName(upserts, allowMissingColumns = true),
            col("_key"), col("_version"), tieBreak = Seq(col("op").desc))
          .filter(col("op") =!= Envelope.Remove) // tombstones drop out
          .drop("op", "_key")
        val tmp = tableDir + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        // swap (best-effort atomic on a local fs; table formats make this a
        // metadata commit)
        val old = new java.io.File(tableDir + ".old")
        if (old.exists()) delete(old)
        if (dir.exists() && !dir.renameTo(old)) sys.error(s"cannot retire $tableDir")
        if (!new java.io.File(tmp).renameTo(dir)) sys.error(s"cannot publish $tmp")
        delete(old)
        ()
      }
      .start()

  private def addVersion(schema: StructType,
      versionType: org.apache.spark.sql.types.DataType): StructType =
    StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_version", versionType))

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete()
    ()
  }

  /** S11: full-load-and-cdc composition — batch snapshot into
    * `{dir}/full_load`, change stream into `{dir}/cdc`. Two physical
    * phases, one logical table (read via [[readWarehouse]]). Kept as
    * separate directories because the streaming parquet sink's
    * `_spark_metadata` ledger would otherwise hide batch-written snapshot
    * files from readers — and because at scale the snapshot is written
    * once with full parallelism while the CDC phase streams with
    * exactly-once file-sink semantics.
    */
  def fullLoadAndCdc(
      spark: SparkSession,
      snapshot: DataFrame,
      stageDir: String,
      schema: StructType,
      warehouseDir: String,
      checkpointDir: String): StreamingQuery = {
    snapshot.write.mode("overwrite").parquet(s"$warehouseDir/full_load")
    startAppend(stagedStream(spark, stageDir, schema), s"$warehouseDir/cdc", checkpointDir)
  }

  /** The logical warehouse table: snapshot ∪ accumulated change rows. */
  def readWarehouse(spark: SparkSession, warehouseDir: String, schema: StructType): DataFrame = {
    val full = spark.read.schema(schema).parquet(s"$warehouseDir/full_load")
    val cdcPath = new java.io.File(s"$warehouseDir/cdc")
    if (cdcPath.exists())
      full.unionByName(spark.read.schema(schema).parquet(s"$warehouseDir/cdc"))
    else full
  }

  /** T9: idempotent start — no-op if a query with this name is already
    * active (the reference's "start task only if ready/stopped" check,
    * `source/start_dms_replication_task_lambda/handler.py:60-79`). */
  def startIfNotRunning(spark: SparkSession, name: String)(start: => StreamingQuery): Option[StreamingQuery] =
    if (spark.streams.active.exists(_.name == name)) None else Some(start)
}
