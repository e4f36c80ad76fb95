package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables
import graft.util.Exact.cents

/** Oracle-visible CDC operators over the deterministic `events` table —
  * the batch-checkable faces of the streaming pipeline (SURVEY.md §2.2
  * P1-P3, §2.8 T4/T5, §3.3). `events` stands in for the change feed:
  * signup→INSERT, error→REMOVE, everything else→MODIFY.
  */
object CdcQueries {

  /** events as a CDC envelope feed. */
  private def asFeed(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("op",
      when(col("event_type") === "signup", Envelope.Insert)
        .when(col("event_type") === "error", Envelope.Remove)
        .otherwise(Envelope.Modify))

  /** q275's MERGE TABLE, fed from the events envelope stream in two
    * file-streamed micro-batches (event_id ≤ cut → commit 1, rest →
    * commit 2) — the real [[Apply.startMerge]] path end-to-end, so each
    * commit recorded its CDC-OUT change slice at write time. Built once
    * per (session, corpus); every q275 run is a pure read. */
  private[graft] def mergeFeedDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("mergeFeedSeed", s, d) {
      val ev = Tables.events(s, d)
      val cut = ev.agg(max(col("event_id"))).head.getLong(0) / 2
      val env = asFeed(s, d).select(col("op"),
        col("user_id").as("key"), col("event_id"),
        when(col("op") === Envelope.Remove, lit(null))
          .otherwise(struct(col("user_id"), col("event_type"),
            col("value"))).as("after"))
      val base = java.nio.file.Files
        .createTempDirectory("graftmergefeed").toString
      val tableDir = s"$base/table"
      val schema = env.schema("after").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      def mergeOnce(part: String, pred: org.apache.spark.sql.Column): Unit = {
        val in = s"$base/in_$part"
        env.filter(pred).write.parquet(in)
        val q = Apply.startMerge(
          s.readStream.schema(env.schema).parquet(in), tableDir,
          checkpointDir = s"$base/ck_$part",
          keyCol = "user_id", versionCol = "event_id", schema = schema)
        q.processAllAvailable(); q.stop()
      }
      mergeOnce("seed", col("event_id") <= cut)  // commit 1
      mergeOnce("delta", col("event_id") > cut)  // commit 2
      tableDir
    }

  /** q283's merge table — the SQL WRITE FACE exercised end-to-end
    * (round-13 verdict #6): commit 1 seeds the first event window
    * through the real startMerge path; commit 2 is a plain
    * `INSERT INTO <catalog>.<dir>.merge SELECT ...` — Spark's V1 write
    * fallback hands the rows to [[Apply.insertBatch]], which stages
    * them as MODIFY envelopes and folds ONE leased, ledgered,
    * change-slice-emitting commit. A user whose latest event is in the
    * SEED window exercises the versioned upsert: the INSERT's older
    * rows lose the fold. */
  private[graft] def sqlInsertDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlInsertSeed", s, d) {
      val ev = Tables.events(s, d)
      val cut = ev.agg(max(col("event_id"))).head.getLong(0) / 2
      val base = java.nio.file.Files
        .createTempDirectory("graftsqlins").toString
      val tableDir = s"$base/table"
      val env = ev.filter(col("event_id") <= cut).select(
        lit(Envelope.Modify).as("op"), col("user_id").as("key"),
        col("event_id"),
        struct(col("user_id"), col("event_type"), col("value")).as("after"))
      env.write.parquet(s"$base/in")
      val q = Apply.startMerge(
        s.readStream.schema(env.schema).parquet(s"$base/in"), tableDir,
        checkpointDir = s"$base/ck",
        keyCol = "user_id", versionCol = "event_id",
        schema = env.schema("after").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      q.processAllAvailable(); q.stop() // commit 1
      s.conf.set("spark.sql.catalog.graft_sql",
        classOf[graft.sources.GraftCatalog].getName)
      ev.filter(col("event_id") > cut)
        .createOrReplaceTempView("graft_insert_delta")
      s.sql(s"INSERT INTO graft_sql.`$tableDir`.merge " +
        "(user_id, event_type, value, _version) " +
        "SELECT user_id, event_type, value, event_id " +
        "FROM graft_insert_delta") // commit 2
      tableDir
    }

  /** q284's merge table — SQL DELETE end-to-end: the [[sqlInsertDir]]
    * construction (commit 1 startMerge + commit 2 SQL INSERT) plus
    * commit 3, a plain `DELETE FROM ... WHERE user_id IN (...)` —
    * Spark's SupportsDelete path routes the key-equality predicate
    * onto [[Apply.purgeKeys]]: one ledgered commit rewriting only the
    * touched buckets, REMOVE events in the change slice. Own table
    * (the q283 gate must keep reading the undeleted state). The
    * deleted set is every user_id divisible by 7 — collected as a
    * bounded distinct-user list because the purge verb is
    * key-addressed by design (a predicate delete is select-keys +
    * purge). */
  private[graft] def sqlDeleteDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlDeleteSeed", s, d) {
      val ev = Tables.events(s, d)
      val cut = ev.agg(max(col("event_id"))).head.getLong(0) / 2
      val base = java.nio.file.Files
        .createTempDirectory("graftsqldel").toString
      val tableDir = s"$base/table"
      val env = ev.filter(col("event_id") <= cut).select(
        lit(Envelope.Modify).as("op"), col("user_id").as("key"),
        col("event_id"),
        struct(col("user_id"), col("event_type"), col("value")).as("after"))
      env.write.parquet(s"$base/in")
      val q = Apply.startMerge(
        s.readStream.schema(env.schema).parquet(s"$base/in"), tableDir,
        checkpointDir = s"$base/ck",
        keyCol = "user_id", versionCol = "event_id",
        schema = env.schema("after").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      q.processAllAvailable(); q.stop() // commit 1
      s.conf.set("spark.sql.catalog.graft_sql",
        classOf[graft.sources.GraftCatalog].getName)
      ev.filter(col("event_id") > cut)
        .createOrReplaceTempView("graft_delete_delta")
      s.sql(s"INSERT INTO graft_sql.`$tableDir`.merge " +
        "(user_id, event_type, value, _version) " +
        "SELECT user_id, event_type, value, event_id " +
        "FROM graft_delete_delta") // commit 2
      val gone = ev.select(col("user_id")).distinct()
        .filter(col("user_id") % 7 === 0)
        .collect().map(_.getLong(0)).sorted
      if (gone.nonEmpty)
        s.sql(s"DELETE FROM graft_sql.`$tableDir`.merge " +
          s"WHERE user_id IN (${gone.mkString(", ")})") // commit 3
      tableDir
    }

  /** q288's merge table — SQL UPDATE end-to-end (round-14 verdict #4):
    * commit 1 seeds EVERY event through the real streamed fold (the
    * stored row per user is the latest event), commit 2 is one plain
    * `UPDATE … SET …, _version = _version + 1 WHERE user_id % 3 = 0` —
    * Spark's delta-based row-level rewrite hands the matched rows to
    * [[graft.sources.GraftDeltaWriter]] tasks, which stage MODIFY
    * envelopes under the table root; the driver commit enforces the
    * version-advance gate and folds ONE leased change-slice-emitting
    * commit ([[Apply.rowLevelCommit]]). */
  private[graft] def sqlUpdateDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlUpdateSeed", s, d) {
      val tableDir = seedLatestStateTable(s, d, "graftsqlupd")
      s.sql(s"UPDATE graft_sql.`$tableDir`.merge SET value = 42.0, " +
        "event_type = 'repriced', _version = _version + 1 " +
        "WHERE user_id % 3 = 0") // commit 2
      tableDir
    }

  /** q295's merge table — SQL `INSERT OVERWRITE` end-to-end
    * (round 15, verdict r14 #7): seed the latest-state table, then
    * overwrite its whole content with the upper-cased latest state of
    * only `user_id % 3 <> 0` users at `event_id + 1` (the version must
    * advance — the overwrite rides the stale-gated fold). Dropped
    * users become REMOVE events in the commit's change slice; the
    * final state is exactly the SELECT — DuckDB-recomputable. */
  private[graft] def sqlOverwriteDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlOverwriteSeed", s, d) {
      val tableDir = seedLatestStateTable(s, d, "graftsqlow")
      Tables.events(s, d)
        .createOrReplaceTempView("graft_overwrite_events")
      s.sql(s"INSERT OVERWRITE graft_sql.`$tableDir`.merge " +
        "SELECT user_id, upper(event_type) AS event_type, value, " +
        "event_id + 1 AS _version FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY event_id DESC) AS rn FROM graft_overwrite_events) " +
        "WHERE rn = 1 AND user_id % 3 <> 0") // commit 2
      tableDir
    }

  /** q297's merge table — SQL `REPLACE WHERE` end-to-end (round 15,
    * §12d): seed the latest-state table, then replace ONLY the
    * `user_id <= max/2` region with its non-'error' members
    * upper-cased at `event_id + 1` — region members whose latest event
    * was an error drop out (REMOVEs in the slice), every other user is
    * untouched. The region is a RANGE predicate because `REPLACE
    * WHERE` conditions must translate to data-source filters (`%`
    * does not — V2Writes rejects it before the write builder, by
    * design). Deterministic, DuckDB-recomputable. */
  private[graft] def sqlReplaceWhereDir(s: SparkSession,
      d: String): String =
    graft.util.Maintenance.getOrBuild("sqlReplaceWhereSeed", s, d) {
      val tableDir = seedLatestStateTable(s, d, "graftsqlrw")
      val ev = Tables.events(s, d)
      val cut = ev.agg(max(col("user_id"))).head.getLong(0) / 2
      ev.createOrReplaceTempView("graft_rw_events")
      s.sql(s"INSERT INTO graft_sql.`$tableDir`.merge " +
        s"REPLACE WHERE user_id <= $cut " +
        "SELECT user_id, upper(event_type) AS event_type, value, " +
        "event_id + 1 AS _version FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY event_id DESC) AS rn FROM graft_rw_events) " +
        s"WHERE rn = 1 AND user_id <= $cut AND event_type <> 'error'")
      tableDir // commit 2
    }

  /** q299/q302's merge table — SQL `REPLACE TABLE … AS SELECT`
    * end-to-end (round 16, verdict r15 #1): seed the latest-state
    * table, then REPLACE it with a DIFFERENT declaration — `value`
    * dropped, a computed `tag` added — holding only `user_id % 2 = 0`
    * users upper-cased at `event_id + 1` (the version contract holds
    * across a replace). Odd users become REMOVEs at their stored
    * versions in the commit's change slice; the final state (and the
    * declaration) is exactly the replacing SELECT. Deterministic,
    * DuckDB-recomputable. */
  private[graft] def sqlReplaceDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlReplaceSeed", s, d) {
      val tableDir = seedLatestStateTable(s, d, "graftsqlrt")
      Tables.events(s, d).createOrReplaceTempView("graft_rt_events")
      s.sql(s"REPLACE TABLE graft_sql.`$tableDir`.merge " +
        "TBLPROPERTIES (key_col 'user_id') AS " +
        "SELECT user_id, upper(event_type) AS event_type, " +
        "concat(event_type, '-r') AS tag, event_id + 1 AS _version " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY event_id DESC) AS rn FROM graft_rt_events) " +
        "WHERE rn = 1 AND user_id % 2 = 0") // commit 2
      tableDir
    }

  /** q300's merge table — bare SQL `TRUNCATE TABLE` end-to-end
    * (round 16, verdict r15 #2): seed the latest-state table, then
    * truncate it — the EMPTY overwrite, one fold commit whose change
    * slice is a typed-null REMOVE at the stored version for EVERY
    * stored key (a cascade purges coherently); the table itself
    * survives. The gate reads the FEED (the final state is empty —
    * vacuously hash-equal; the slice carries the verb's whole
    * observable contract). */
  private[graft] def sqlTruncateDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlTruncateSeed", s, d) {
      val tableDir = seedLatestStateTable(s, d, "graftsqltr")
      s.sql(s"TRUNCATE TABLE graft_sql.`$tableDir`.merge") // commit 2
      tableDir
    }

  /** q301's merge table — SQL `ALTER TABLE … DROP COLUMN` end-to-end
    * (round 16, verdict r15 #4): CREATE with an `extra` column, INSERT
    * every event carrying it, then DROP it — the library fold-rewrite
    * (ONE projection commit over every live bucket, narrowed
    * declaration archived, no logical change in the feed). The table
    * must read as the latest event per user WITHOUT the column —
    * while `VERSION AS OF` the pre-DROP commit still serves it
    * (GraftDropColumnSpec pins that side). */
  private[graft] def sqlDropColumnDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlDropColSeed", s, d) {
      val base = java.nio.file.Files
        .createTempDirectory("graftsqldc").toString
      val tableDir = s"$base/table"
      s.conf.set("spark.sql.catalog.graft_sql",
        classOf[graft.sources.GraftCatalog].getName)
      Tables.events(s, d).createOrReplaceTempView("graft_dc_events")
      s.sql(s"CREATE TABLE graft_sql.`$tableDir`.merge (" +
        "user_id BIGINT, event_type STRING, value DOUBLE, " +
        "extra STRING, _version BIGINT) " +
        "TBLPROPERTIES (key_col 'user_id')") // commit 0
      s.sql(s"INSERT INTO graft_sql.`$tableDir`.merge " +
        "SELECT user_id, event_type, value, upper(event_type), " +
        "event_id FROM graft_dc_events") // commit 1
      s.sql(s"ALTER TABLE graft_sql.`$tableDir`.merge " +
        "DROP COLUMN extra") // commit 2: the projection rewrite
      tableDir
    }

  /** q303's merge table — `CALL system.migrate_schema_history`
    * end-to-end (round 16, verdict r15 #5): a table seeded ONLY by
    * the library fold (no CREATE TABLE — no declaration sidecar, no
    * schema history: the pre-round-15 layout), upgraded by the
    * migrate procedure, which archives the physical baseline as the
    * declaration FLOOR at the current commit. The gate reads the
    * resulting ledger — fully determined by the substrate. */
  private[graft] def sqlMigrateDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlMigrateSeed", s, d) {
      val tableDir = seedLatestStateTable(s, d, "graftsqlmh")
      s.sql("CALL graft_sql.system.migrate_schema_history(" +
        s"store => '$tableDir')")
      tableDir
    }

  /** q289's merge table — SQL MERGE INTO end-to-end: one statement
    * carrying all three action kinds against the seeded latest-state
    * table (matched-update re-prices user_id%4==1 one version up,
    * matched-delete tombstones user_id%4==2, not-matched-insert lands
    * a synthetic +10M user per user_id%4==3), folded as ONE row-level
    * commit. The deterministic %4 routing keeps the whole closure
    * DuckDB-recomputable. */
  private[graft] def sqlMergeDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlMergeSeed", s, d) {
      val tableDir = seedLatestStateTable(s, d, "graftsqlmrg")
      val users = Tables.events(s, d).select(col("user_id")).distinct()
      users.filter(col("user_id") % 4 === 1)
        .select(col("user_id").as("id"), lit("upd").as("action"))
        .unionByName(users.filter(col("user_id") % 4 === 2)
          .select(col("user_id").as("id"), lit("del").as("action")))
        .unionByName(users.filter(col("user_id") % 4 === 3)
          .select((col("user_id") + 10000000L).as("id"),
            lit("ins").as("action")))
        .createOrReplaceTempView("graft_merge_src")
      s.sql(
        s"""MERGE INTO graft_sql.`$tableDir`.merge AS t
           |USING graft_merge_src AS s ON t.user_id = s.id
           |WHEN MATCHED AND s.action = 'del' THEN DELETE
           |WHEN MATCHED AND s.action = 'upd' THEN UPDATE SET
           |  value = 7.5, event_type = 'merged',
           |  _version = t._version + 1
           |WHEN NOT MATCHED AND s.action = 'ins' THEN INSERT
           |  (user_id, event_type, value, _version)
           |  VALUES (s.id, 'inserted', 5.25, 1)""".stripMargin) // commit 2
      tableDir
    }

  /** q290's merge table — predicate DELETE end-to-end: unlike q284's
    * key-equality DELETE (which Spark's metadata-delete optimization
    * converts to the compliance purge), an arbitrary-predicate DELETE
    * rides the row-level face — the scan finds the matched rows, task
    * writers stage REMOVE envelopes at the scanned versions, and the
    * fold tombstones them in ONE commit. Deterministic predicate
    * (`event_type = 'error' OR value > 900`) keeps the closure
    * DuckDB-recomputable. */
  private[graft] def sqlDeletePredDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlDeletePredSeed", s, d) {
      val tableDir = seedLatestStateTable(s, d, "graftsqldelp")
      s.sql(s"DELETE FROM graft_sql.`$tableDir`.merge " +
        "WHERE event_type = 'error' OR value > 900.0") // commit 2
      tableDir
    }

  /** q291's merge table — the FULL SQL LIFECYCLE, no library verb in
    * sight: `CREATE TABLE` (commit 0: empty manifest + creation-schema
    * sidecar), `INSERT INTO … SELECT` every event (commit 1: the
    * versioned fold keeps the latest per user), `UPDATE` every fifth
    * user (commit 2: the row-level face, version advanced), and a
    * predicate `DELETE` (commit 3: row-level tombstones). A Redshift
    * analyst's whole workflow, reproduced on the fold. */
  private[graft] def sqlLifecycleDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlLifecycleSeed", s, d) {
      val base = java.nio.file.Files
        .createTempDirectory("graftsqlcre").toString
      val tableDir = s"$base/table"
      s.conf.set("spark.sql.catalog.graft_sql",
        classOf[graft.sources.GraftCatalog].getName)
      s.sql(s"CREATE TABLE graft_sql.`$tableDir`.merge (" +
        "user_id BIGINT, event_type STRING, value DOUBLE, " +
        "_version BIGINT) TBLPROPERTIES (key_col 'user_id')")
      Tables.events(s, d).createOrReplaceTempView("graft_lifecycle_events")
      s.sql(s"INSERT INTO graft_sql.`$tableDir`.merge " +
        "SELECT user_id, event_type, value, event_id " +
        "FROM graft_lifecycle_events")
      s.sql(s"UPDATE graft_sql.`$tableDir`.merge SET value = 11.0, " +
        "event_type = 'lifted', _version = _version + 1 " +
        "WHERE user_id % 5 = 0")
      s.sql(s"DELETE FROM graft_sql.`$tableDir`.merge " +
        "WHERE value > 950.0")
      tableDir
    }

  /** q292's merge table — SQL SCHEMA EVOLUTION end-to-end: CREATE with
    * the base schema, INSERT the early event window, `ALTER TABLE ADD
    * COLUMNS (etype2 STRING)`, then INSERT the late window WITH the
    * new column (upper-cased event type). Early rows read etype2 as
    * NULL (the declared-schema widening — parquet's missing-column
    * contract); late rows carry it; the fold keeps latest per user
    * across both windows. */
  private[graft] def sqlEvolutionDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sqlEvolutionSeed", s, d) {
      val ev = Tables.events(s, d)
      val cut = ev.agg(max(col("event_id"))).head.getLong(0) / 2
      val base = java.nio.file.Files
        .createTempDirectory("graftsqlevo").toString
      val tableDir = s"$base/table"
      s.conf.set("spark.sql.catalog.graft_sql",
        classOf[graft.sources.GraftCatalog].getName)
      ev.createOrReplaceTempView("graft_evolution_events")
      s.sql(s"CREATE TABLE graft_sql.`$tableDir`.merge (" +
        "user_id BIGINT, event_type STRING, value DOUBLE, " +
        "_version BIGINT) TBLPROPERTIES (key_col 'user_id')")
      s.sql(s"INSERT INTO graft_sql.`$tableDir`.merge " +
        "SELECT user_id, event_type, value, event_id " +
        s"FROM graft_evolution_events WHERE event_id <= $cut")
      s.sql(s"ALTER TABLE graft_sql.`$tableDir`.merge " +
        "ADD COLUMNS (etype2 STRING)")
      s.sql(s"INSERT INTO graft_sql.`$tableDir`.merge " +
        "(user_id, event_type, value, _version, etype2) " +
        "SELECT user_id, event_type, value, event_id, " +
        "upper(event_type) " +
        s"FROM graft_evolution_events WHERE event_id > $cut")
      tableDir
    }

  /** q293's merge table — the DSv2 STREAMING SINK end-to-end: CREATE
    * the table in SQL, then stream every event into it through
    * `writeStream.format("graft")` (file-source micro-batches, each
    * epoch one leased fold commit). The table must read as the latest
    * event per user — the sink is an equal citizen of the fold. */
  private[graft] def sinkStreamDir(s: SparkSession, d: String): String =
    graft.util.Maintenance.getOrBuild("sinkStreamSeed", s, d) {
      val base = java.nio.file.Files
        .createTempDirectory("graftsinkq").toString
      val tableDir = s"$base/table"
      s.conf.set("spark.sql.catalog.graft_sql",
        classOf[graft.sources.GraftCatalog].getName)
      s.sql(s"CREATE TABLE graft_sql.`$tableDir`.merge (" +
        "user_id BIGINT, event_type STRING, value DOUBLE, " +
        "_version BIGINT) TBLPROPERTIES (key_col 'user_id')")
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), col("value"), col("event_id").as("_version"))
      ev.write.parquet(s"$base/in")
      val q = s.readStream.schema(ev.schema).parquet(s"$base/in")
        .writeStream.format("graft").option("path", tableDir)
        .option("checkpointLocation", s"$base/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
      tableDir
    }

  /** Shared seed for the row-level gates: every event folded through
    * the real streamed merge path as commit 1, so the stored row per
    * user is the LATEST event (q33's closure) before the SQL statement
    * under test runs. */
  private def seedLatestStateTable(s: SparkSession, d: String,
      tag: String): String = {
    val ev = Tables.events(s, d)
    val base = java.nio.file.Files.createTempDirectory(tag).toString
    val tableDir = s"$base/table"
    val env = ev.select(lit(Envelope.Modify).as("op"),
      col("user_id").as("key"), col("event_id"),
      struct(col("user_id"), col("event_type"), col("value")).as("after"))
    env.write.parquet(s"$base/in")
    val q = Apply.startMerge(
      s.readStream.schema(env.schema).parquet(s"$base/in"), tableDir,
      checkpointDir = s"$base/ck",
      keyCol = "user_id", versionCol = "event_id",
      schema = env.schema("after").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    q.processAllAvailable(); q.stop() // commit 1
    s.conf.set("spark.sql.catalog.graft_sql",
      classOf[graft.sources.GraftCatalog].getName)
    tableDir
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- P1/T5: route the change feed — REMOVEs dropped, kept ops counted.
    //    Uses the production Envelope.route (raise-on-unknown included).
    "q32_cdc_route" -> { (s, d) =>
      Envelope.route(asFeed(s, d))
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))
        .orderBy(col("op"))
    },

    // -- T4-improved: latest-state compaction (the merge view the
    //    reference's warehouse never materializes). One shuffle on the
    //    key + in-partition sort: the standard CDC upsert at any scale.
    //    `last_value` is emitted as BIGINT cents: round 1 failed the
    //    driver's hash here with types and values verified identical on
    //    both sides (VERDICT "What's wrong" #1, q33/q55/q56) — the defense
    //    is to output only primitive types.
    "q33_cdc_latest_state" -> { (s, d) =>
      Envelope.latestByKey(Tables.events(s, d), col("user_id"), col("event_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 12: the WAREHOUSE TABLE'S OWN CHANGE FEED
    //    (`changes.merge` — [[Apply.changeFeedDirs]] through
    //    [[graft.sources.ChangeFeedTable]]): each merge commit recorded
    //    its applied envelope rows (latest per key, REMOVEs kept) as a
    //    change slice atomically with the commit, so the feed since
    //    commit 1 is EXACTLY the second micro-batch's effective
    //    upserts — no snapshot diffing anywhere. Oracle = latest-per-
    //    user over the delta half of the events feed, REMOVE rows with
    //    null images (the envelope convention). The merge table builds
    //    once ([[mergeFeedDir]]); this query is a pure feed read.
    "q275_merge_change_feed" -> { (s, d) =>
      val dir = mergeFeedDir(s, d)
      s.read.format("graft").option("path", dir)
        .option("table", "changes.merge")
        .option("sinceCommit", "1").load()
        .select(col("op"), col("_key").as("user_id"),
          col("_version").as("version"),
          col("event_type").as("last_type"),
          cents(col("value")).as("value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 13: the SQL WRITE FACE — half the corpus entered the
    //    table through `INSERT INTO` (the DSv2 V1 fallback onto the
    //    leased insertBatch fold), half through startMerge; the table
    //    must read as the latest event per user over ALL events (q33's
    //    oracle — the SQL path is an equal citizen of the fold).
    "q283_sql_insert" -> { (s, d) =>
      val dir = sqlInsertDir(s, d)
      Apply.readMergeTable(s, dir)
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 13: SQL DELETE — the compliance sweep issued as plain
    //    SQL, routed onto the key-addressed purgeKeys rewrite; the
    //    table must read as the latest event per user MINUS the
    //    deleted keys (and the purge commit recorded REMOVE events in
    //    the change slice — GraftCatalogSpec pins that side).
    "q284_sql_delete" -> { (s, d) =>
      val dir = sqlDeleteDir(s, d)
      Apply.readMergeTable(s, dir)
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 14: SQL UPDATE — one statement re-prices every third
    //    user through the delta-based row-level face: task-staged
    //    MODIFY envelopes, the version-advance gate, ONE leased fold
    //    commit. The table must read as the latest event per user with
    //    the matched users carrying the updated image one version up.
    "q288_sql_update" -> { (s, d) =>
      val dir = sqlUpdateDir(s, d)
      Apply.readMergeTable(s, dir)
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 14: predicate SQL DELETE — the row-level flavor (q284
    //    stays the key-equality metadata purge): matched rows
    //    tombstone out of the latest-event state through the fold.
    "q290_sql_delete_predicate" -> { (s, d) =>
      val dir = sqlDeletePredDir(s, d)
      Apply.readMergeTable(s, dir)
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 14: the FULL SQL LIFECYCLE — CREATE TABLE → INSERT →
    //    UPDATE → predicate DELETE, four commits, zero library verbs;
    //    the table must read as the composed closure.
    "q291_sql_lifecycle" -> { (s, d) =>
      val dir = sqlLifecycleDir(s, d)
      Apply.readMergeTable(s, dir)
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 14: the DSv2 streaming sink — every event streamed into
    //    a CREATEd table through writeStream.format("graft"); the
    //    table must read as the latest event per user (q33's closure).
    "q293_stream_sink" -> { (s, d) =>
      val dir = sinkStreamDir(s, d)
      Apply.readMergeTable(s, dir)
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 14: SQL schema evolution — ALTER TABLE ADD COLUMNS
    //    between two INSERT windows; early-window winners read the new
    //    column as NULL, late-window winners carry it.
    "q292_sql_evolution" -> { (s, d) =>
      val dir = sqlEvolutionDir(s, d)
      s.sql(s"SELECT * FROM graft_sql.`$dir`.merge")
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"), col("etype2"))
        .orderBy(col("user_id"))
    },

    // -- q295's commit seen through the CHANGE FEED: the overwrite's
    //    slice must carry a MODIFY per new row and a typed-null REMOVE
    //    per dropped key — a cascade consumes an overwrite as plain
    //    upserts + deletions.
    "q296_sql_overwrite_feed" -> { (s, d) =>
      val dir = sqlOverwriteDir(s, d)
      s.read.format("graft").option("path", dir)
        .option("table", "changes.merge")
        .option("sinceCommit", "1").option("untilCommit", "2").load()
        .select(col("op"), col("_key").as("user_id"),
          col("_version").as("version"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 15 (§12d): SQL REPLACE WHERE — replace ONLY the
    //    condition's region in one stale-gated fold commit; everything
    //    outside the region must be untouched.
    "q297_sql_replace_where" -> { (s, d) =>
      val dir = sqlReplaceWhereDir(s, d)
      s.sql(s"SELECT * FROM graft_sql.`$dir`.merge")
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- q294's DECLARATION LEDGER through the CALL face: one row per
    //    DDL commit with the declaration that commit published. The
    //    substrate's DDL fully determines the rows, so the oracle is
    //    the literal expected ledger (the invariant-gate pattern).
    "q298_sql_schema_history" -> { (s, d) =>
      val dir = sqlEvolutionDir(s, d)
      s.sql(s"CALL graft_sql.system.schema_history(store => '$dir')")
        .select(col("commit").as("commit_id"), col("declared_schema"))
        .orderBy(col("commit_id"))
    },

    // -- round 15 (verdict r14 #2): the DECLARATION is versioned —
    //    ALTER is its own commit (CREATE=0, INSERT=1, ALTER=2,
    //    INSERT=3 on the q292 substrate), and a time-travel read
    //    serves the declaration AS OF that commit. Reading AS OF the
    //    ALTER commit shows the EARLY window's rows widened by the
    //    just-declared column as NULL: data from before the ALTER,
    //    schema from the ALTER — neither the current declaration nor
    //    the bare physical schema. The oracle recomputes the early
    //    latest-per-user state with a NULL etype2.
    "q294_sql_evolution_asof" -> { (s, d) =>
      val dir = sqlEvolutionDir(s, d)
      s.sql(s"SELECT * FROM graft_sql.`$dir`.merge VERSION AS OF 2")
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"), col("etype2"))
        .orderBy(col("user_id"))
    },

    // -- round 15 (verdict r14 #7): SQL INSERT OVERWRITE — replace the
    //    table's content in ONE stale-gated fold commit (MODIFYs for
    //    the batch, REMOVEs for disappeared keys). The table must read
    //    as exactly the overwriting SELECT.
    "q295_sql_overwrite" -> { (s, d) =>
      val dir = sqlOverwriteDir(s, d)
      s.sql(s"SELECT * FROM graft_sql.`$dir`.merge")
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 16 (verdict r15 #1): SQL REPLACE TABLE — data AND
    //    declaration reset in ONE fold commit; the table must read as
    //    exactly the replacing SELECT, in its new schema.
    "q299_sql_replace_table" -> { (s, d) =>
      val dir = sqlReplaceDir(s, d)
      s.sql(s"SELECT * FROM graft_sql.`$dir`.merge")
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"), col("tag"))
        .orderBy(col("user_id"))
    },

    // -- q299's commit through the CHANGE FEED: a cascade consumes a
    //    table replacement as plain upserts + deletions — MODIFYs in
    //    the NEW schema for kept users, typed-null REMOVEs at stored
    //    versions for dropped ones.
    "q302_sql_replace_table_feed" -> { (s, d) =>
      val dir = sqlReplaceDir(s, d)
      s.read.format("graft").option("path", dir)
        .option("table", "changes.merge")
        .option("sinceCommit", "1").option("untilCommit", "2").load()
        .select(col("op"), col("_key").as("user_id"),
          col("_version").as("version"),
          col("event_type").as("last_type"), col("tag"))
        .orderBy(col("user_id"))
    },

    // -- round 16 (verdict r15 #2): bare TRUNCATE TABLE — the empty
    //    overwrite; the commit's slice is a REMOVE at the stored
    //    version for EVERY stored key (the verb's whole observable
    //    contract — the final state is empty).
    "q300_sql_truncate_feed" -> { (s, d) =>
      val dir = sqlTruncateDir(s, d)
      s.read.format("graft").option("path", dir)
        .option("table", "changes.merge")
        .option("sinceCommit", "1").option("untilCommit", "2").load()
        .select(col("op"), col("_key").as("user_id"),
          col("_version").as("version"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 16 (verdict r15 #4): ALTER TABLE DROP COLUMN — the
    //    library fold-rewrite; the table reads as the latest event per
    //    user WITHOUT the dropped column, data otherwise intact.
    "q301_sql_drop_column" -> { (s, d) =>
      val dir = sqlDropColumnDir(s, d)
      s.sql(s"SELECT * FROM graft_sql.`$dir`.merge")
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- round 16 (verdict r15 #5): migrate_schema_history — the
    //    declaration ledger of a library-seeded (pre-versioning)
    //    table after the migrate procedure: exactly the physical
    //    baseline archived as the floor at the current commit.
    "q303_sql_migrate_history" -> { (s, d) =>
      val dir = sqlMigrateDir(s, d)
      s.sql(s"CALL graft_sql.system.schema_history(store => '$dir')")
        .select(col("commit").as("commit_id"), col("declared_schema"))
        .orderBy(col("commit_id"))
    },

    // -- round 14: SQL MERGE INTO — matched-update, matched-delete and
    //    not-matched-insert in ONE statement, ONE row-level fold
    //    commit; the table must read as the deterministic %4 closure
    //    over the latest-event state.
    "q289_sql_merge" -> { (s, d) =>
      val dir = sqlMergeDir(s, d)
      Apply.readMergeTable(s, dir)
        .select(col("user_id"), col("_version").as("last_event_id"),
          col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    },

    // -- A1/3.3: the reference's reconciliation counts, one row per table.
    "q34_reconcile_counts" -> { (s, d) =>
      val one = (name: String, df: DataFrame) =>
        df.agg(count(lit(1)).as("n")).select(lit(name).as("tbl"), col("n"))
      one("customer", Tables.customer(s, d))
        .unionByName(one("lineitem", Tables.lineitem(s, d)))
        .unionByName(one("orders", Tables.orders(s, d)))
        .orderBy(col("tbl"))
    },

    // -- 3.3 strengthened: exceptAll catches a double-applied batch that
    //    count parity alone would misattribute — target built as source
    //    plus a duplicated 'O'-status slice; the diff is exactly that slice.
    "q35_reconcile_exceptall" -> { (s, d) =>
      val src = Tables.orders(s, d).select(col("o_orderkey").as("orderkey"))
      val dup = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey").as("orderkey"))
      src.unionByName(dup).exceptAll(src).orderBy(col("orderkey"))
    },

    // -- J7 (batch face): stream-static enrichment — change feed joined to
    //    the customer dim; dim side broadcast, no shuffle of the feed.
    "q36_stream_static_join" -> { (s, d) =>
      val feed = Envelope.route(asFeed(s, d))
      val dim = Tables.customer(s, d)
      feed.join(broadcast(dim), feed("user_id") === dim("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_changes"),
          sum(cents(col("value"))).as("total_value_cents"))
        .orderBy(col("c_mktsegment"))
    },

    // -- SCD Type-2 dimension history: the change feed compacted to one
    //    row per (user, event_type) run with half-open validity interval
    //    and version — the Kimball dimension-history shape the reference's
    //    append-only landing never materializes. One shuffle on user_id;
    //    both windows ride it.
    //    Validity bounds go out as BIGINT epoch-µs: timestamp columns are
    //    on the driver-hash risk list (ns-vs-µs repr drift), primitives
    //    are not.
    "q86_scd2" -> { (s, d) =>
      Scd.type2(Tables.events(s, d), col("user_id"), col("event_type"),
          col("ts"), col("event_id"))
        .select(col("key").as("user_id"), col("state"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"),
          col("version").cast("long").as("version"),
          col("is_current"))
        .orderBy(col("user_id"), col("version"))
    },

    // -- incremental aggregate maintenance (materialized-view delta
    //    update): the maintained aggregate = combine(base partial state,
    //    delta partial state) — NEVER a rescan of the base fact. Here the
    //    base snapshot is pre-2000 orders and the delta is the newer
    //    append feed (the reference's landing model is append-only;
    //    updates/deletes generalize by signed ±1 weights on the same
    //    combine). SUM/COUNT states merge by addition, so the combine is
    //    a union of two agg tables re-aggregated on the group key — at
    //    100 TB the base side of that union is agg-table-sized (a few
    //    rows per group), not fact-sized. The two partials must PARTITION
    //    the fact exactly, so the delta predicate is the negation of the
    //    base predicate (NOT(date < cut)), which routes NULL order dates
    //    to the delta side instead of silently dropping them from both.
    //    The oracle recomputes from scratch: incremental ≡ full is
    //    exactly the maintenance invariant.
    "q106_incremental_agg" -> { (s, d) =>
      val cut = lit("2000-01-01").cast("timestamp")
      def partial(df: DataFrame) = df
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("tot"))
      val base = partial(Tables.orders(s, d).filter(col("o_orderdate") < cut))
      val delta = partial(Tables.orders(s, d).filter(!(col("o_orderdate") < cut) ||
        col("o_orderdate").isNull))
      base.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).as("n_orders"), sum(col("tot")).as("total_cents"))
        .orderBy(col("o_orderpriority"))
    },

    // -- maintained top-k leaderboard: the per-customer spend aggregate
    //    kept current through the REAL [[IncrementalAgg.applyDelta]]
    //    broadcast-merge fold (q106 gates the partial-combine algebra
    //    with inline partials; this gates the production fold path),
    //    then TakeOrdered derives the top-10 from the maintained state
    //    — a leaderboard that never rescans the fact. Oracle = full
    //    recompute: incremental ≡ full, ranked.
    //    The fold's contract is a MICRO-BATCH-SIZED delta (IvmFold
    //    broadcasts it), so the cut sits two months before the data's
    //    end — ~2.6% of orders, a genuine commit window (round-8 advice:
    //    the previous 2000-01-01 cut pushed ~20 months through the
    //    broadcast, fine at bench scale but against the fold's own
    //    documented contract). A backfill-sized window should rebuild
    //    the view instead — that is the cheaper plan anyway.
    "q238_incremental_topk" -> { (s, d) =>
      val cut = lit("2001-06-01").cast("timestamp")
      val or = Tables.orders(s, d)
      val state = or.filter(col("o_orderdate") < cut)
        .select(col("o_custkey").as("key"), cents(col("o_totalprice")).as("v"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
      val delta = or.filter(!(col("o_orderdate") < cut) ||
          col("o_orderdate").isNull)
        .withColumn("_change_type", lit("insert"))
      IncrementalAgg.applyDelta(state, delta,
          col("o_custkey"), cents(col("o_totalprice")))
        .orderBy(col("tot").desc, col("key")).limit(10)
        .select(col("key").as("o_custkey"), col("n").as("n_orders"),
          col("tot").as("spend_cents"))
    },

    // -- incremental COUNT(DISTINCT) maintenance: the distinct face of
    //    the materialized-view family (q106 sums; this one's support bag
    //    is the state DISTINCT needs because a delete only decrements
    //    the count when the last live copy goes — Gupta–Mumick counting,
    //    see cdc.IncrementalDistinct). Base = pre-cut events folded to
    //    the (key, value, m) bag; delta = the newer append feed at +1
    //    weights; one bag-fold + one rollup answers per-user distinct
    //    event types WITHOUT rescanning the base fact — at 100 TB the
    //    fold is |Δ| + matching-bag rows shuffled into the bag's
    //    (key, value) hash layout. The oracle recomputes from scratch:
    //    incremental ≡ full is the maintenance invariant; the signed
    //    (delete) path is pinned by IncrementalDistinctSpec.
    "q229_incremental_distinct" -> { (s, d) =>
      val cut = lit("2024-01-20").cast("timestamp")
      val ev = Tables.events(s, d)
      val base = IncrementalDistinct.seed(
        ev.filter(col("ts") < cut), col("user_id"), col("event_type"))
      val delta = ev.filter(!(col("ts") < cut) || col("ts").isNull)
        .withColumn("_change_type", lit("insert"))
      val bag = IncrementalDistinct.applyDelta(base, delta,
        col("user_id"), col("event_type"))
      IncrementalDistinct.distinctCounts(bag)
        .select(col("key").as("user_id"), col("n_distinct"), col("n_rows"))
        .orderBy(col("user_id"))
    },

    // -- sequence-gap audit: find every missing id range in the
    //    successfully-processed stream (here: non-error events over the
    //    dense event_id sequence — each gap is a dropped/poisoned batch a
    //    CDC operator must replay). Plan is fully distributed: the
    //    gaps-and-islands key (id − global_rn) rides the TWO-PASS
    //    range-partitioned numbering (Scale.withGlobalRowNumber — never a
    //    bare global window), islands reduce by that key, and consecutive
    //    islands pair by a second two-pass numbering + an equi self-join
    //    on rank — O(islands) shuffle, no single-task sort anywhere.
    "q143_sequence_gaps" -> { (s, d) =>
      sequenceGaps(Tables.events(s, d)
        .filter(col("event_type") =!= "error")
        .select(col("event_id").as("id")))
    },

    // -- table checksum reconciliation: per-key-range sums of a PORTABLE
    //    row hash (TextFunctions.portableHash48 over a canonical '|'
    //    serialization) — how a CDC operator proves source and target
    //    agree WITHOUT shipping rows (the DMS-validation / pt-table-
    //    checksum pattern; reference boundary: DMS's own validation-only
    //    task). A mismatched bucket pinpoints the divergent key range for
    //    a targeted re-sync; the whole comparison is N_buckets numbers.
    //    One map-side hash projection + one bounded-cardinality
    //    aggregate; 48-bit hashes keep 1000-row bucket sums 4 orders of
    //    magnitude inside BIGINT.
    "q158_table_checksum" -> { (s, d) =>
      val rowRepr = concat_ws("|",
        col("o_orderkey").cast("string"),
        col("o_custkey").cast("string"),
        col("o_orderstatus"),
        cents(col("o_totalprice")).cast("string"),
        col("o_orderdate").cast("date").cast("string"))
      Tables.orders(s, d)
        .select(expr("o_orderkey div 1000").as("bucket"),
          graft.text.TextFunctions.portableHash48(rowRepr).as("h"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
        .orderBy(col("bucket"))
    },

    // -- point-in-time (AS OF event time) join against the Type-2
    //    dimension: every purchase picks the account-state version whose
    //    [valid_from, valid_to) interval covers the purchase timestamp —
    //    THE correctness test for any SCD2 history (a fact must never see
    //    a future version). Both sides shuffle once on the user key; the
    //    validity predicate evaluates inside the joined partition against
    //    a per-key version list that is bounded by the key's change
    //    count, so there is no range-join blowup. Purchases before any
    //    state version survive the left join as 'none'.
    // -- segment-hash reconciliation (Merkle localization): q158 builds
    //    ONE table's segment checksums; this op diffs two replicas'
    //    checksum vectors to localize divergence to O(segment) rows
    //    without shipping either table — the anti-entropy step a CDC
    //    validation pass runs after apply (the reference validates
    //    COUNT(*) parity only; segment hashes additionally bound the
    //    re-read to the diverged buckets). The "replica" here is the
    //    base table with two injected faults — one delete, one in-place
    //    update — so exactly two buckets must diverge, one by count and
    //    one by checksum alone (the count-equal case is precisely what
    //    COUNT(*) reconciliation cannot see). Checksums are SUMs of
    //    portable 48-bit row hashes: order-independent, map-side
    //    combinable, and bounded by rows·2^48 (decimal widening is the
    //    declared upgrade past ~30k rows per bucket).
    "q179_merkle_diff" -> { (s, d) =>
      def sums(df: DataFrame, n: String, c: String): DataFrame = {
        val rowRepr = concat_ws("|",
          col("o_orderkey").cast("string"),
          col("o_custkey").cast("string"),
          cents(col("o_totalprice")).cast("string"))
        df.select(expr("o_orderkey div 1000").as("bucket"),
            graft.text.TextFunctions.portableHash48(rowRepr).as("h"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as(n), sum(col("h")).as(c))
      }
      val base = Tables.orders(s, d)
      val replica = base
        .filter(col("o_orderkey") =!= 4242)
        .withColumn("o_totalprice",
          when(col("o_orderkey") === 100, col("o_totalprice") + lit(0.01))
            .otherwise(col("o_totalprice")))
      sums(base, "n_base", "cs_base")
        .join(sums(replica, "n_replica", "cs_replica"), Seq("bucket"), "full_outer")
        .select(col("bucket"), col("n_base"), col("n_replica"),
          (coalesce(col("n_base"), lit(-1L)) =!= coalesce(col("n_replica"), lit(-1L)) ||
            coalesce(col("cs_base"), lit(-1L)) =!= coalesce(col("cs_replica"), lit(-1L)))
            .as("diverged"))
        .orderBy(col("bucket"))
    },

    "q148_pit_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("ts_s", date_trunc("second", col("ts")))
      val dim = Scd.type2(ev.filter(col("event_type") =!= "purchase"),
        col("user_id"), col("event_type"), col("ts_s"), col("event_id"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_s"), cents(col("value")).as("c"))
      facts.join(dim,
          facts("user_id") === dim("key") &&
            dim("valid_from") <= facts("ts_s") &&
            (dim("valid_to").isNull || facts("ts_s") < dim("valid_to")),
          "left")
        .groupBy(coalesce(col("state"), lit("none")).as("state_at_purchase"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("c")).as("total_cents"))
        .orderBy(col("state_at_purchase"))
    }
  )

  /** Missing ranges in a (distinct) id column — every maximal run of
    * absent ids strictly inside [min(id), max(id)], as (gap_lo, gap_hi,
    * n_missing). See the q143 plan notes above. */
  def sequenceGaps(ids: DataFrame): DataFrame = {
    import graft.warehouse.Scale
    val numbered = Scale.withGlobalRowNumber(ids, Seq(col("id")), "rn")
    val islands = numbered
      .groupBy((col("id") - col("rn")).as("k"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
    val ranked = Scale.withGlobalRowNumber(islands, Seq(col("lo")), "irn")
    ranked.as("a")
      .join(ranked.as("b"), col("b.irn") === col("a.irn") + 1)
      .select((col("a.hi") + 1).as("gap_lo"), (col("b.lo") - 1).as("gap_hi"),
        (col("b.lo") - col("a.hi") - 1).as("n_missing"))
      .orderBy(col("gap_lo"))
  }

  def oracleSql: Map[String, String] = Map(
    "q32_cdc_route" ->
      """SELECT op, COUNT(*) AS n, MIN(event_id) AS first_event,
        |  MAX(event_id) AS last_event
        |FROM (SELECT *, CASE WHEN event_type = 'signup' THEN 'INSERT'
        |    WHEN event_type = 'error' THEN 'REMOVE' ELSE 'MODIFY' END AS op
        |  FROM events)
        |WHERE op IN ('INSERT', 'MODIFY')
        |GROUP BY op ORDER BY op""".stripMargin,

    "q33_cdc_latest_state" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // After the SQL DELETE, the table is q33's recompute restricted to
    // the kept users.
    "q284_sql_delete" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND user_id % 7 <> 0 ORDER BY user_id""".stripMargin,

    // The table fed half by startMerge, half by SQL INSERT must equal
    // the latest event per user over ALL events — q33's recompute; the
    // SQL path is an equal citizen of the versioned fold.
    "q283_sql_insert" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // The latest event per user, with every third user carrying the
    // UPDATE's image (value 42.0, type 'repriced') one version above
    // its last event.
    "q288_sql_update" ->
      """SELECT user_id,
        |  CASE WHEN user_id % 3 = 0 THEN event_id + 1 ELSE event_id END
        |    AS last_event_id,
        |  CASE WHEN user_id % 3 = 0 THEN 'repriced' ELSE event_type END
        |    AS last_type,
        |  CASE WHEN user_id % 3 = 0 THEN 4200
        |    ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END
        |    AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // The latest event per user MINUS the rows the predicate DELETE
    // tombstoned (matched on the LATEST image, the scanned state).
    "q290_sql_delete_predicate" ->
      """SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND NOT (event_type = 'error' OR value > 900.0)
        |ORDER BY user_id""".stripMargin,

    // The CREATE→INSERT→UPDATE→DELETE closure: latest event per user,
    // every fifth user lifted to (lifted, 11.0) one version up, then
    // rows whose FINAL value exceeds 950 deleted (lifted rows are 11.0,
    // so only un-lifted users can match).
    "q291_sql_lifecycle" ->
      """SELECT user_id,
        |  CASE WHEN user_id % 5 = 0 THEN event_id + 1 ELSE event_id END
        |    AS last_event_id,
        |  CASE WHEN user_id % 5 = 0 THEN 'lifted' ELSE event_type END
        |    AS last_type,
        |  CASE WHEN user_id % 5 = 0 THEN 1100
        |    ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END
        |    AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND (user_id % 5 = 0 OR NOT value > 950.0)
        |ORDER BY user_id""".stripMargin,

    // The sink-fed table equals the latest event per user (q33's
    // recompute — the streaming sink is an equal citizen of the fold).
    "q293_stream_sink" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Latest event per user; winners from the post-ALTER window carry
    // the upper-cased etype2, earlier winners read it as NULL.
    "q292_sql_evolution" ->
      """SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS last_value_cents,
        |  CASE WHEN event_id > (SELECT MAX(event_id) // 2 FROM events)
        |    THEN UPPER(event_type) ELSE NULL END AS etype2
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // The overwrite closure: latest event per user restricted to
    // user_id % 3 <> 0, upper-cased, one version past the latest event.
    "q295_sql_overwrite" ->
      """SELECT user_id, event_id + 1 AS last_event_id,
        |  UPPER(event_type) AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND user_id % 3 <> 0 ORDER BY user_id""".stripMargin,

    // The declaration ledger is fully determined by the substrate's
    // own DDL (CREATE at commit 0, ALTER ADD COLUMNS at commit 2).
    "q298_sql_schema_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT),
        |   'user_id BIGINT,event_type STRING,value DOUBLE,_version BIGINT'),
        |  (CAST(2 AS BIGINT),
        |   'user_id BIGINT,event_type STRING,value DOUBLE,_version BIGINT,etype2 STRING'))
        |  AS t(commit_id, declared_schema)
        |ORDER BY commit_id""".stripMargin,

    // REPLACE WHERE closure: only the user_id <= max/2 region changes
    // — its non-'error' members replaced one version up and
    // upper-cased, its 'error' members removed; everyone else
    // untouched.
    "q297_sql_replace_where" ->
      """WITH cut AS (SELECT MAX(user_id) // 2 AS c FROM events),
        |latest AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn FROM events)
        |  WHERE rn = 1)
        |SELECT user_id,
        |  CASE WHEN user_id <= (SELECT c FROM cut)
        |    THEN event_id + 1 ELSE event_id END AS last_event_id,
        |  CASE WHEN user_id <= (SELECT c FROM cut)
        |    THEN UPPER(event_type) ELSE event_type END AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS last_value_cents
        |FROM latest
        |WHERE user_id > (SELECT c FROM cut) OR event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // The overwrite's change slice: MODIFYs for kept users at the
    // advanced version, typed-null REMOVEs (at the stored version) for
    // dropped users.
    "q296_sql_overwrite_feed" ->
      """WITH latest AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn FROM events)
        |  WHERE rn = 1)
        |SELECT 'MODIFY' AS op, user_id, event_id + 1 AS version,
        |  UPPER(event_type) AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS last_value_cents
        |FROM latest WHERE user_id % 3 <> 0
        |UNION ALL
        |SELECT 'REMOVE' AS op, user_id, event_id AS version,
        |  CAST(NULL AS VARCHAR) AS last_type,
        |  CAST(NULL AS BIGINT) AS last_value_cents
        |FROM latest WHERE user_id % 3 = 0
        |ORDER BY user_id""".stripMargin,

    // AS OF the ALTER commit: the EARLY window's latest-per-user state
    // (the only data that existed), widened by the just-declared
    // etype2 as NULL.
    "q294_sql_evolution_asof" ->
      """SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS last_value_cents,
        |  CAST(NULL AS VARCHAR) AS etype2
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events
        |  WHERE event_id <= (SELECT MAX(event_id) // 2 FROM events))
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // The REPLACE TABLE closure: latest event per user restricted to
    // even users, upper-cased + tagged, one version past the latest
    // event — in the replacing declaration (no value column).
    "q299_sql_replace_table" ->
      """SELECT user_id, event_id + 1 AS last_event_id,
        |  UPPER(event_type) AS last_type,
        |  event_type || '-r' AS tag
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND user_id % 2 = 0 ORDER BY user_id""".stripMargin,

    // The replace's change slice: MODIFYs (new declaration) for even
    // users at the advanced version, typed-null REMOVEs at stored
    // versions for odd users.
    "q302_sql_replace_table_feed" ->
      """WITH latest AS (
        |  SELECT user_id, event_id, event_type
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn FROM events)
        |  WHERE rn = 1)
        |SELECT 'MODIFY' AS op, user_id, event_id + 1 AS version,
        |  UPPER(event_type) AS last_type, event_type || '-r' AS tag
        |FROM latest WHERE user_id % 2 = 0
        |UNION ALL
        |SELECT 'REMOVE' AS op, user_id, event_id AS version,
        |  CAST(NULL AS VARCHAR) AS last_type,
        |  CAST(NULL AS VARCHAR) AS tag
        |FROM latest WHERE user_id % 2 <> 0
        |ORDER BY user_id""".stripMargin,

    // The truncation's slice: a typed-null REMOVE at the stored
    // (latest-event) version for every stored user.
    "q300_sql_truncate_feed" ->
      """SELECT 'REMOVE' AS op, user_id, event_id AS version,
        |  CAST(NULL AS VARCHAR) AS last_type,
        |  CAST(NULL AS BIGINT) AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Post-DROP state: the latest event per user — the dropped column
    // gone, everything else byte-identical to q33's recompute.
    "q301_sql_drop_column" ->
      """SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS last_value_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // The migrated ledger: exactly one floor entry — the physical
    // baseline declaration at the seed commit.
    "q303_sql_migrate_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT),
        |   'user_id BIGINT,event_type STRING,value DOUBLE,_version BIGINT'))
        |  AS t(commit_id, declared_schema)
        |ORDER BY commit_id""".stripMargin,

    // The MERGE closure over the latest-event state: %4==1 users carry
    // the update image one version up, %4==2 users are deleted,
    // %4==3 users spawn a synthetic +10M inserted row at version 1.
    "q289_sql_merge" ->
      """WITH latest AS (
        |  SELECT user_id, event_id, event_type, value
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn FROM events)
        |  WHERE rn = 1)
        |SELECT user_id,
        |  CASE WHEN user_id % 4 = 1 THEN event_id + 1 ELSE event_id END
        |    AS last_event_id,
        |  CASE WHEN user_id % 4 = 1 THEN 'merged' ELSE event_type END
        |    AS last_type,
        |  CASE WHEN user_id % 4 = 1 THEN 750
        |    ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END
        |    AS last_value_cents
        |FROM latest WHERE user_id % 4 <> 2
        |UNION ALL
        |SELECT user_id + 10000000 AS user_id, 1 AS last_event_id,
        |  'inserted' AS last_type, 525 AS last_value_cents
        |FROM latest WHERE user_id % 4 = 3
        |ORDER BY user_id""".stripMargin,

    // The feed since commit 1 must equal the delta batch's effective
    // upserts: latest event per user among event_id > cut, REMOVEs
    // kept with null images.
    "q275_merge_change_feed" ->
      """WITH env AS (
        |  SELECT user_id, event_id, event_type, value,
        |    CASE WHEN event_type = 'signup' THEN 'INSERT'
        |         WHEN event_type = 'error' THEN 'REMOVE'
        |         ELSE 'MODIFY' END AS op
        |  FROM events
        |  WHERE event_id > (SELECT MAX(event_id) // 2 FROM events)),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn FROM env)
        |SELECT op, user_id, event_id AS version,
        |  CASE WHEN op = 'REMOVE' THEN NULL ELSE event_type END AS last_type,
        |  CASE WHEN op = 'REMOVE' THEN NULL
        |       ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |  END AS value_cents
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q34_reconcile_counts" ->
      """SELECT 'customer' AS tbl, COUNT(*) AS n FROM customer
        |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |ORDER BY tbl""".stripMargin,

    "q35_reconcile_exceptall" ->
      """SELECT orderkey FROM (
        |  SELECT o_orderkey AS orderkey FROM orders
        |  UNION ALL
        |  SELECT o_orderkey AS orderkey FROM orders WHERE o_orderstatus = 'O')
        |EXCEPT ALL
        |SELECT o_orderkey AS orderkey FROM orders
        |ORDER BY orderkey""".stripMargin,

    "q36_stream_static_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_changes,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_value_cents
        |FROM (SELECT *, CASE WHEN event_type = 'signup' THEN 'INSERT'
        |    WHEN event_type = 'error' THEN 'REMOVE' ELSE 'MODIFY' END AS op
        |  FROM events) e
        |JOIN customer ON e.user_id = c_custkey
        |WHERE op IN ('INSERT', 'MODIFY')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // Run starts via LAG + row-number-1; interval stitching + version via
    // LEAD/ROW_NUMBER over the surviving run starts. (ts, event_id) makes
    // the ordering total, so the closure is deterministic.
    "q86_scd2" ->
      """WITH chg AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    LAG(event_type) OVER w AS prev,
        |    ROW_NUMBER() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |starts AS (
        |  SELECT user_id, event_type, ts, event_id FROM chg
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type AS state,
        |  EPOCH_US(ts) AS valid_from_us,
        |  EPOCH_US(LEAD(ts) OVER w) AS valid_to_us,
        |  ROW_NUMBER() OVER w AS version,
        |  LEAD(ts) OVER w IS NULL AS is_current
        |FROM starts
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,

    // Full recompute — equality with the incremental combine IS the
    // materialized-view maintenance invariant under test.
    "q106_incremental_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q238_incremental_topk" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT)
        |    AS spend_cents
        |FROM orders GROUP BY 1
        |ORDER BY spend_cents DESC, o_custkey LIMIT 10""".stripMargin,

    "q229_incremental_distinct" ->
      """SELECT user_id, COUNT(DISTINCT event_type) AS n_distinct,
        |  COUNT(*) AS n_rows
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q158_table_checksum" ->
      """WITH r AS (
        |  SELECT o_orderkey // 1000 AS bucket,
        |    md5_number_lower(
        |      CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
        |      || '|' || o_orderstatus || '|' ||
        |      CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS VARCHAR)
        |      || '|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |    ) % 281474976710656 AS h
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n_rows, CAST(SUM(h) AS BIGINT) AS checksum
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q179_merkle_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |replica AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey = 100 THEN cents + 1 ELSE cents END AS cents
        |  FROM base WHERE o_orderkey <> 4242),
        |hb AS (
        |  SELECT o_orderkey // 1000 AS bucket, COUNT(*) AS n_base,
        |    CAST(SUM(md5_number_lower(
        |      CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
        |      || '|' || CAST(cents AS VARCHAR)) % 281474976710656) AS BIGINT)
        |      AS cs_base
        |  FROM base GROUP BY 1),
        |hr AS (
        |  SELECT o_orderkey // 1000 AS bucket, COUNT(*) AS n_replica,
        |    CAST(SUM(md5_number_lower(
        |      CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
        |      || '|' || CAST(cents AS VARCHAR)) % 281474976710656) AS BIGINT)
        |      AS cs_replica
        |  FROM replica GROUP BY 1)
        |SELECT COALESCE(hb.bucket, hr.bucket) AS bucket, n_base, n_replica,
        |  (COALESCE(n_base, -1) <> COALESCE(n_replica, -1)
        |   OR COALESCE(cs_base, -1) <> COALESCE(cs_replica, -1)) AS diverged
        |FROM hb FULL OUTER JOIN hr ON hb.bucket = hr.bucket
        |ORDER BY bucket""".stripMargin,

    "q148_pit_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, date_trunc('second', ts) AS ts_s,
        |    event_id, value
        |  FROM events),
        |st AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
        |chg AS (
        |  SELECT user_id, event_type, ts_s, event_id,
        |    LAG(event_type) OVER w AS prev, ROW_NUMBER() OVER w AS rn
        |  FROM st WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |runs AS (
        |  SELECT user_id, event_type AS state, ts_s AS valid_from,
        |    LEAD(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
        |      AS valid_to
        |  FROM chg WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |p AS (
        |  SELECT user_id, ts_s,
        |    CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) AS c
        |  FROM ev WHERE event_type = 'purchase')
        |SELECT coalesce(r.state, 'none') AS state_at_purchase,
        |  COUNT(*) AS n_purchases, CAST(SUM(p.c) AS BIGINT) AS total_cents
        |FROM p LEFT JOIN runs r
        |  ON p.user_id = r.user_id AND r.valid_from <= p.ts_s
        |  AND (r.valid_to IS NULL OR p.ts_s < r.valid_to)
        |GROUP BY 1 ORDER BY state_at_purchase""".stripMargin,

    "q143_sequence_gaps" ->
      """WITH ok AS (
        |  SELECT event_id AS id FROM events WHERE event_type <> 'error'),
        |isl AS (
        |  SELECT id, id - row_number() OVER (ORDER BY id) AS k FROM ok),
        |g AS (SELECT MIN(id) AS lo, MAX(id) AS hi FROM isl GROUP BY k),
        |p AS (SELECT hi, lead(lo) OVER (ORDER BY lo) AS next_lo FROM g)
        |SELECT hi + 1 AS gap_lo, next_lo - 1 AS gap_hi,
        |  next_lo - hi - 1 AS n_missing
        |FROM p WHERE next_lo IS NOT NULL
        |ORDER BY gap_lo""".stripMargin
  )
}
