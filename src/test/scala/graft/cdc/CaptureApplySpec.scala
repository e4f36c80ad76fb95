package graft.cdc

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end CDC pipeline semantics (SURVEY.md §2.8, FIXTURES.md §3-§4):
  * capture → staged NDJSON with metadata names / markers → apply →
  * warehouse append, with checkpoint idempotence.
  */
class CaptureApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private def env(op: String, id: String, price: Double = 1.0) =
    Env(op, id, After(id, "tick", price), ts(1700000000L))

  private val afterSchema =
    Seq(env("INSERT", "x")).toDF().schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  test("S8: staged batch dir carries ts/uuid/count metadata name, NDJSON content") {
    val stage = tmp("stage")
    val batch = Seq(env("INSERT", "a"), env("MODIFY", "b", 2.0), env("REMOVE", "c")).toDF()
    val name = Capture.stageBatch(Envelope.route(batch), stage)
    assert(name.matches("""\d{4}-\d{2}-\d{2}T\d{2}-\d{2}-\d{2}Z__[0-9a-f-]{36}__2__inserted_or_modified_records"""))
    val staged = spark.read.schema(afterSchema).json(s"$stage/$name")
    assert(staged.count() == 2)
  }

  test("S8: empty batch produces a zero-byte marker, not a data file") {
    val stage = tmp("stage-empty")
    val batch = Seq(env("REMOVE", "a"), env("REMOVE", "b")).toDF()
    val name = Capture.stageBatch(Envelope.route(batch), stage)
    assert(name.endsWith("__0__no_inserted_or_modified_records"))
    val marker = Paths.get(stage, s"$name.txt")
    assert(Files.exists(marker) && Files.size(marker) == 0)
  }

  test("S7->S9 e2e: capture stream -> staged -> apply appends to warehouse; restart is idempotent") {
    val stage = tmp("stage-e2e")
    val wh = tmp("warehouse")
    val ckCapture = tmp("ck-capture")
    val ckApply = tmp("ck-apply")

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Env]
    val q = Capture.start(ms.toDF(), stage, ckCapture)
    ms.addData(env("INSERT", "a"), env("MODIFY", "b", 2.0), env("REMOVE", "gone"))
    q.processAllAvailable()
    ms.addData(env("INSERT", "c", 3.0))
    q.processAllAvailable()
    q.stop()

    // Apply phase 1: AvailableNow drains both staged batches.
    val ap1 = Apply.startAppend(
      Apply.stagedStream(spark, stage, afterSchema), wh, ckApply)
    ap1.awaitTermination()
    val landed = spark.read.schema(afterSchema).parquet(wh)
    assert(landed.count() == 3) // a, b, c — REMOVE dropped (T5)

    // Restart with same checkpoint: nothing new -> no duplicates (T8/T9).
    val ap2 = Apply.startAppend(
      Apply.stagedStream(spark, stage, afterSchema), wh, ckApply)
    ap2.awaitTermination()
    assert(spark.read.schema(afterSchema).parquet(wh).count() == 3)
  }

  test("S11: fullLoadAndCdc = snapshot then streamed appends") {
    val stage = tmp("stage-fl")
    val wh = tmp("warehouse-fl")
    val ck = tmp("ck-fl")

    // stage one CDC batch first
    Capture.stageBatch(
      Envelope.route(Seq(env("MODIFY", "a", 10.0), env("INSERT", "d", 4.0)).toDF()), stage)

    val snapshot = Seq(env("INSERT", "a"), env("INSERT", "b", 2.0))
      .toDF().select(col("after.*"))
    val q = Apply.fullLoadAndCdc(spark, snapshot, stage, afterSchema, wh, ck)
    q.awaitTermination()

    val landed = Apply.readWarehouse(spark, wh, afterSchema)
    assert(landed.count() == 4) // 2 snapshot + 2 cdc, append-only
    // improved mode compacts to latest state
    val latest = Envelope.latestByKey(landed, col("id"), col("price"))
    assert(latest.count() == 3)
  }

  test("S9: partitioned warehouse append creates prunable directories") {
    val stage = tmp("stage-part")
    val wh = tmp("wh-part")
    Capture.stageBatch(Envelope.route(
      Seq(env("INSERT", "a"), env("INSERT", "b", 2.0)).toDF()), stage)
    val ap = Apply.startAppend(
      Apply.stagedStream(spark, stage, afterSchema), wh, tmp("ck-part"),
      partitionBy = Seq("ticker"))
    ap.awaitTermination()
    assert(new java.io.File(s"$wh/ticker=tick").exists())
    // partition filter prunes to the directory
    val scan = spark.read.schema(afterSchema).parquet(wh).filter(col("ticker") === "tick")
    assert(scan.count() == 2)
  }

  test("T4/T5-improved: merge apply upserts by latest version and deletes on REMOVE") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-table") + "/t" // nonexistent dir initially
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-merge"),
      keyCol = "id", versionCol = "ts",
      schema = afterSchema, trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    // batch 1: two inserts
    ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)),
      env("INSERT", "b", 2.0).copy(ts = ts(100)))
    q.processAllAvailable()
    // batch 2: modify a, remove b, insert c
    ms.addData(
      env("MODIFY", "a", 10.0).copy(ts = ts(200)),
      Env("REMOVE", "b", null, ts(200)),
      env("INSERT", "c", 3.0).copy(ts = ts(200)))
    q.processAllAvailable()
    q.stop()
    val landed = Apply.readMergeTable(spark, table)
    val byId = landed.collect().map(r => r.getAs[String]("id") ->
      r.getAs[Double]("price")).toMap
    assert(byId == Map("a" -> 10.0, "c" -> 3.0)) // b deleted, a upserted
  }

  test("schema evolution on merge restart: a widened payload reads old " +
      "generations as null, upserts carry the new column, and the table " +
      "read merges mixed-schema buckets") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-evolve") + "/t"
    // phase 1: the v1 writer lands several keys (spread across buckets)
    val ms1 = MemoryStream[Env]
    // data BEFORE start: the default AvailableNow trigger snapshots
    // available offsets at query start — adding afterwards races
    ms1.addData(
      env("INSERT", "a", 1.0).copy(ts = ts(100)),
      env("INSERT", "b1", 2.0).copy(ts = ts(100)),
      env("INSERT", "b2", 3.0).copy(ts = ts(100)),
      env("INSERT", "b3", 4.0).copy(ts = ts(100)))
    val q1 = Apply.startMerge(ms1.toDF(), table, tmp("ck-ev1"),
      keyCol = "id", versionCol = "ts", schema = afterSchema)
    q1.processAllAvailable(); q1.stop()
    // phase 2: upstream ALTER adds `region` — restart the writer with
    // the widened schema (a fixed-schema streaming query cannot widen
    // in place; evolution-on-restart is the declared contract)
    val afterSchema2 = Seq(Env2("INSERT", "x",
        After2("x", "tick", 1.0, "eu"), ts(1)))
      .toDF().schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val ms2 = MemoryStream[Env2]
    ms2.addData(
      Env2("MODIFY", "a", After2("a", "tick", 10.0, "eu"), ts(200)),
      Env2("INSERT", "d", After2("d", "tick", 5.0, "us"), ts(200)))
    val q2 = Apply.startMerge(ms2.toDF(), table, tmp("ck-ev2"),
      keyCol = "id", versionCol = "ts", schema = afterSchema2)
    q2.processAllAvailable(); q2.stop()
    // the merged table: evolved rows carry region, pre-evolution rows
    // read it as null — even though untouched buckets still hold v1
    // files (mergeSchema on the manifest read; before round 10 the
    // single-file schema sample could silently DROP the new column)
    val landed = Apply.readMergeTable(spark, table)
    assert(landed.columns.contains("region"),
      "the widened column must survive the mixed-schema table read")
    val rows = landed.collect().map(r => r.getAs[String]("id") ->
      (r.getAs[Double]("price"), Option(r.getAs[String]("region")))).toMap
    assert(rows == Map(
      "a" -> (10.0, Some("eu")), "d" -> (5.0, Some("us")),
      "b1" -> (2.0, None), "b2" -> (3.0, None), "b3" -> (4.0, None)))
  }

  test("purgeKeys: physical right-to-be-forgotten sweep — touched " +
      "buckets rewrite, untouched keep their generation, gcGraceMs=0 " +
      "destroys superseded files and pre-purge restore fails closed") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-purge") + "/t"
    val ms = MemoryStream[Env]
    // data BEFORE start (AvailableNow snapshots offsets at query start)
    ms.addData((1 to 8).map(i =>
      env("INSERT", s"k$i", i.toDouble).copy(ts = ts(100))): _*)
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-purge"),
      keyCol = "id", versionCol = "ts", schema = afterSchema)
    q.processAllAvailable(); q.stop()
    val preCommit = Apply.commits(spark, table).max
    val before = Apply.readMergeTable(spark, table)
    assert(before.count() == 8)
    // purge two subjects with ZERO grace: compliance-complete in one call
    val purged = Apply.purgeKeys(spark, table,
      Seq("k2", "k5").toDF("id"), "id", gcGraceMs = 0L)
    assert(purged == 2L)
    val after = Apply.readMergeTable(spark, table)
    assert(after.count() == 6)
    assert(!after.collect().map(_.getAs[String]("id")).toSet("k2"))
    // purging absent keys is a no-op that reports zero
    assert(Apply.purgeKeys(spark, table,
      Seq("nope").toDF("id"), "id", gcGraceMs = 0L) == 0L)
    // fail-closed history: the pre-purge snapshot's generations were
    // destroyed by the zero-grace purge, so restoring it fails loudly
    // instead of resurrecting purged rows
    val e = intercept[IllegalArgumentException] {
      Apply.restore(spark, table, preCommit)
    }
    assert(e.getMessage.contains("no longer restorable"))
  }

  test("partition-scoped merge: a batch leaves untouched buckets byte-identical") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-buckets") + "/t"
    // pick two keys that hash into different buckets (same function the
    // sink uses: xxhash64 mod nBuckets)
    def bucketOf(k: String): Int = spark.range(1)
      .select(pmod(xxhash64(lit(k)), lit(8)).cast("int")).collect()(0).getInt(0)
    val k1 = "a"
    val k2 = ('b' to 'z').map(_.toString).find(bucketOf(_) != bucketOf(k1)).get
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-buckets"),
      keyCol = "id", versionCol = "ts", schema = afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      nBuckets = 8)
    ms.addData(env("INSERT", k1, 1.0).copy(ts = ts(100)),
      env("INSERT", k2, 2.0).copy(ts = ts(100)))
    q.processAllAvailable()
    val dir1 = new java.io.File(Apply.bucketDirs(spark, table)(bucketOf(k1)).toUri.getPath)
    def snapshot(d: java.io.File): Map[String, (Long, String)] =
      d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        f.getName -> (f.lastModified(), java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("MD5").digest(bytes)))
      }.toMap
    val before = snapshot(dir1)
    assert(before.nonEmpty)
    // second batch touches ONLY k2's bucket
    ms.addData(env("MODIFY", k2, 20.0).copy(ts = ts(200)))
    q.processAllAvailable()
    q.stop()
    assert(snapshot(dir1) == before) // k1's bucket: same files, same bytes
    val byId = Apply.readMergeTable(spark, table).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Double]("price")).toMap
    assert(byId == Map(k1 -> 1.0, k2 -> 20.0))
  }

  test("T8: equal-version MODIFY+REMOVE ties resolve deterministically (REMOVE wins)") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-tie") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-tie"), "id", "ts", afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    ms.addData(
      env("MODIFY", "x", 9.0).copy(ts = ts(100)),
      Env("REMOVE", "x", null, ts(100)), // same version as the MODIFY
      env("INSERT", "y", 1.0).copy(ts = ts(100)))
    q.processAllAvailable(); q.stop()
    val ids = Apply.readMergeTable(spark, table).collect().map(_.getAs[String]("id")).toSet
    assert(ids == Set("y")) // delete outranks modify on a version tie
  }

  test("time travel: snapshots read past states; GC'd snapshots fail loudly") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-tt") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-tt"), "id", "ts", afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)))
    q.processAllAvailable()
    ms.addData(env("MODIFY", "a", 2.0).copy(ts = ts(200)),
      env("INSERT", "b", 3.0).copy(ts = ts(200)))
    q.processAllAvailable()
    q.stop()
    def state(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      df.collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("price")).toMap
    assert(Apply.commits(spark, table) == Seq(1L, 2L))
    assert(state(Apply.readMergeTableAt(spark, table, 1)) == Map("a" -> 1.0))
    assert(state(Apply.readMergeTableAt(spark, table, 2)) ==
      Map("a" -> 2.0, "b" -> 3.0))
    // the latest snapshot and the current read are the same table
    assert(state(Apply.readMergeTableAt(spark, table, 2)) ==
      state(Apply.readMergeTable(spark, table)))
    // a snapshot whose generations were reclaimed fails loudly, with the
    // still-live snapshots unaffected (retention semantics)
    Apply.vacuum(spark, table, graceMs = 0L)
    val e = intercept[IllegalArgumentException] {
      Apply.readMergeTableAt(spark, table, 1)
    }
    assert(e.getMessage.contains("garbage-collected"))
    assert(state(Apply.readMergeTableAt(spark, table, 2)) ==
      Map("a" -> 2.0, "b" -> 3.0))
    // an unknown snapshot id lists what exists
    val e2 = intercept[IllegalArgumentException] {
      Apply.readMergeTableAt(spark, table, 99)
    }
    assert(e2.getMessage.contains("no committed snapshot"))
  }

  test("restore: snapshot becomes current as a new commit; undo by re-restore") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-restore") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-restore"), "id", "ts", afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)))
    q.processAllAvailable()
    ms.addData(env("MODIFY", "a", 2.0).copy(ts = ts(200)),
      env("INSERT", "b", 3.0).copy(ts = ts(200)))
    q.processAllAvailable()
    q.stop()
    def state(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      df.collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("price")).toMap
    assert(Apply.commits(spark, table) == Seq(1L, 2L))
    // restore to commit 1: current read flips back, as commit 3
    Apply.restore(spark, table, 1L)
    assert(state(Apply.readMergeTable(spark, table)) == Map("a" -> 1.0))
    assert(Apply.commits(spark, table) == Seq(1L, 2L, 3L))
    // history intact: the overwritten state is still readable...
    assert(state(Apply.readMergeTableAt(spark, table, 2)) ==
      Map("a" -> 2.0, "b" -> 3.0))
    // ...and the restore is undone by restoring it
    Apply.restore(spark, table, 2L)
    assert(state(Apply.readMergeTable(spark, table)) ==
      Map("a" -> 2.0, "b" -> 3.0))
    assert(Apply.commits(spark, table) == Seq(1L, 2L, 3L, 4L))
    // restored generations are un-retired: an immediate zero-grace vacuum
    // must not delete what the CURRENT state references
    Apply.vacuum(spark, table, graceMs = 0L)
    assert(state(Apply.readMergeTable(spark, table)) ==
      Map("a" -> 2.0, "b" -> 3.0))
    // commit-1-only generations are now gone; restoring it fails loudly
    val e = intercept[IllegalArgumentException] {
      Apply.restore(spark, table, 1L)
    }
    assert(e.getMessage.contains("garbage-collected"))
    // an unknown snapshot id lists what exists
    val e2 = intercept[IllegalArgumentException] {
      Apply.restore(spark, table, 99L)
    }
    assert(e2.getMessage.contains("no committed snapshot"))
  }

  test("timestamp-as-of time travel resolves through commit write times") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-ttts") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-ttts"), "id", "ts",
      afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)))
    q.processAllAvailable()
    Thread.sleep(1100) // separate the two commits on the mtime axis
    ms.addData(env("MODIFY", "a", 2.0).copy(ts = ts(200)))
    q.processAllAvailable()
    q.stop()
    val times = Apply.commitTimes(spark, table)
    assert(times.map(_._1) == Seq(1L, 2L))
    val Seq((_, t1), (_, t2)) = times
    assert(t1 < t2)
    def price(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[Double]("price")).toSeq
    // between the commits -> snapshot 1; at/after the last -> snapshot 2
    assert(price(Apply.readMergeTableAsOf(spark, table, t1)) == Seq(1.0))
    assert(price(Apply.readMergeTableAsOf(spark, table, t2 - 1)) == Seq(1.0))
    assert(price(Apply.readMergeTableAsOf(spark, table, t2)) == Seq(2.0))
    assert(price(Apply.readMergeTableAsOf(spark, table, Long.MaxValue)) == Seq(2.0))
    // before the first commit there is no table to read
    val e = intercept[IllegalArgumentException] {
      Apply.readMergeTableAsOf(spark, table, t1 - 1)
    }
    assert(e.getMessage.contains("no commit at or before"))
  }

  test("change data feed: row-level inserts/deletes between snapshots") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-cdf") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-cdf"), "id", "ts",
      afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      gcGraceMs = Long.MaxValue)
    ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)),
      env("INSERT", "b", 2.0).copy(ts = ts(100)))
    q.processAllAvailable()
    ms.addData(env("MODIFY", "a", 9.0).copy(ts = ts(200)),  // update a
      env("REMOVE", "b", 2.0).copy(ts = ts(200)),           // delete b
      env("INSERT", "c", 3.0).copy(ts = ts(200)))           // insert c
    q.processAllAvailable()
    q.stop()
    val changes = Apply.changesBetween(spark, table, 1, 2)
      .collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[String]("id"),
        r.getAs[Double]("price"))).toSet
    assert(changes == Set(
      ("delete", "a", 1.0), ("insert", "a", 9.0), // the update pair
      ("delete", "b", 2.0),
      ("insert", "c", 3.0)))
    // a no-change window is empty
    intercept[IllegalArgumentException] {
      Apply.changesBetween(spark, table, 2, 2)
    }
  }

  test("incremental SCD2 from the change feed ≡ batch-built history") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-scd2") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-scd2"), "id", "ts",
      afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      gcGraceMs = Long.MaxValue)
    // c1: two dimension rows appear
    ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)),
      env("INSERT", "b", 2.0).copy(ts = ts(100)))
    q.processAllAvailable()
    // c2: a changes state; b is rewritten with the SAME state (new ts
    // only — a bookkeeping rewrite that must NOT open a new run)
    ms.addData(env("MODIFY", "a", 9.0).copy(ts = ts(200)),
      env("MODIFY", "b", 2.0).copy(ts = ts(200)))
    q.processAllAvailable()
    // c3: b deleted, c appears
    ms.addData(env("REMOVE", "b", 2.0).copy(ts = ts(300)),
      env("INSERT", "c", 3.0).copy(ts = ts(300)))
    q.processAllAvailable()
    // c4: b re-inserted with a new state — version resumes, not restarts
    ms.addData(env("INSERT", "b", 5.0).copy(ts = ts(400)))
    q.processAllAvailable()
    q.stop()

    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("key", "state", "valid_from", "valid_to", "version", "is_current")
      .collect().map(r => (r.getString(0), r.getAs[Double](1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4), r.getBoolean(5)))
      .toSet

    val inc = norm(Scd.type2FromMergeTable(spark, table, col("id"), col("price")))
    assert(inc == Set(
      ("a", 1.0, 1L, 2L, 1, false), ("a", 9.0, 2L, -1L, 2, true),
      ("b", 2.0, 1L, 3L, 1, false), ("b", 5.0, 4L, -1L, 2, true),
      ("c", 3.0, 3L, -1L, 1, true)))

    // batch equivalent: observe every key at every commit (NULL state
    // when absent = tombstone), run the one-shot type2, drop tombstone
    // runs, renumber versions over the real runs. The tombstone run's
    // start is exactly the deletion commit, so valid_to bounds agree.
    val cs = Apply.commits(spark, table).sorted
    assert(cs.size == 4)
    val live = cs.map(c => Apply.readMergeTableAt(spark, table, c)
        .select(col("id"), col("price")).withColumn("c", lit(c)))
      .reduce(_ unionByName _)
    val obs = live.select(col("id")).distinct()
      .crossJoin(live.select(col("c")).distinct())
      .join(live, Seq("id", "c"), "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("valid_from"))
    val batch = Scd.type2(obs, col("id"), col("price"), col("c"), col("c"))
      .filter(col("state").isNotNull)
      .withColumn("version", row_number().over(w))
    assert(norm(batch) == inc)
  }

  test("incremental as-of enrichment from the change feed ≡ batch as-of join " +
      "(late arrivals and in-place updates included)") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-asof") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-asof"), "id", "ts",
      afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      gcGraceMs = Long.MaxValue)
    // quote identity = sym+time (id), as-of key = ticker, state = price
    def quote(op: String, sym: String, t: Long, px: Double, c: Long) =
      Env(op, s"$sym$t", After(s"$sym$t", sym, px), ts(c))
    // c1: A@10 = 1.0, B@40 = 4.0
    ms.addData(quote("INSERT", "A", 10, 1.0, 100), quote("INSERT", "B", 40, 4.0, 100))
    q.processAllAvailable()
    // c2: a LATER quote A@20 = 2.0 — re-enriches only txns with t >= 20
    ms.addData(quote("INSERT", "A", 20, 2.0, 200))
    q.processAllAvailable()
    // c3: a LATE-ARRIVING quote A@12 = 1.5 (affects only the txn whose
    // match it betters) + an in-place UPDATE of A@20's state to 2.5
    ms.addData(quote("INSERT", "A", 12, 1.5, 300), quote("MODIFY", "A", 20, 2.5, 300))
    q.processAllAvailable()
    q.stop()

    val txns = Seq((1L, "A", 5L), (2L, "A", 15L), (3L, "A", 25L), (4L, "B", 50L))
      .toDF("txn_id", "sym", "t")
    val qTime = expr("CAST(substring(id, 2) AS LONG)")
    val inc = Scd.asOfFromMergeTable(spark, table, txns, col("txn_id"),
      col("sym"), col("t"), col("ticker"), qTime, col("price"))
    def key(r: org.apache.spark.sql.Row, tCol: String, sCol: String) =
      (r.getAs[Long]("txn_id"),
        if (r.isNullAt(r.fieldIndex(tCol))) -1L else r.getAs[Long](tCol),
        if (r.isNullAt(r.fieldIndex(sCol))) -1.0 else r.getAs[Double](sCol))
    val got = inc.collect().map(key(_, "q_time", "q_state")).toSet
    assert(got == Set(
      (1L, -1L, -1.0),   // t=5: before every quote — no match
      (2L, 12L, 1.5),    // the late arrival wins over A@10
      (3L, 20L, 2.5),    // the updated state of the matched quote
      (4L, 40L, 4.0)))
    // batch parity: the custom as-of exec over the FINAL snapshot
    val cs = Apply.commits(spark, table).sorted
    assert(cs.size == 3)
    val finalQuotes = Apply.readMergeTableAt(spark, table, cs.last)
      .select(col("ticker").as("sym"), qTime.as("qt"), col("price"))
    val batch = graft.plans.AsOf.join(txns, finalQuotes, "sym", "t", "qt", "q_time")
    assert(batch.collect().map(key(_, "q_time", "price")).toSet == got)
  }

  test("incremental aggregate maintenance ≡ groupBy of the live snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-iagg") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-iagg"), "id", "ts",
      afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      gcGraceMs = Long.MaxValue)
    // group key = ticker (constant "tick" would be one group; use ids as
    // two groups via distinct tickers in the after-image)
    def ev(op: String, id: String, tick: String, price: Double, s: Long) =
      Env(op, id, After(id, tick, price), ts(s))
    ms.addData(ev("INSERT", "a", "X", 1.0, 100), ev("INSERT", "b", "Y", 2.0, 100))
    q.processAllAvailable()
    ms.addData(ev("MODIFY", "a", "X", 9.0, 200),  // update: net +8 on X
      ev("INSERT", "c", "X", 3.0, 200))           // second X member
    q.processAllAvailable()
    ms.addData(ev("REMOVE", "b", "Y", 2.0, 300))  // Y's count reaches zero
    q.processAllAvailable()
    q.stop()

    val cents = (col("price") * 100).cast("long")
    val inc = IncrementalAgg.fromMergeTable(spark, table, col("ticker"), cents)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // X: a=9.00 + c=3.00; Y: deleted group drops out entirely
    assert(inc == Map("X" -> ((2L, 1200L))))
    // the invariant: identical to a from-scratch groupBy of the final table
    val full = Apply.readMergeTable(spark, table)
      .groupBy(col("ticker"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(cents).as("tot"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(inc == full)
  }

  test("compact: generations collapse to one, data and snapshots intact") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-compact") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-compact"), "id", "ts",
      afterSchema, nBuckets = 4,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      gcGraceMs = Long.MaxValue)
    // three batches so buckets span several generations
    ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)),
      env("INSERT", "b", 2.0).copy(ts = ts(100)))
    q.processAllAvailable()
    ms.addData(env("MODIFY", "a", 1.5).copy(ts = ts(200)),
      env("INSERT", "c", 3.0).copy(ts = ts(200)))
    q.processAllAvailable()
    ms.addData(env("INSERT", "d", 4.0).copy(ts = ts(300)))
    q.processAllAvailable()
    q.stop()
    def state(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      df.collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("price")).toMap
    val before = state(Apply.readMergeTable(spark, table))
    assert(before == Map("a" -> 1.5, "b" -> 2.0, "c" -> 3.0, "d" -> 4.0))
    val gensBefore = Apply.bucketDirs(spark, table).values
      .map(_.getParent.getName).toSet
    assert(gensBefore.size > 1, s"expected multi-generation table, got $gensBefore")
    val lastCommit = Apply.commits(spark, table).last

    Apply.compact(spark, table, gcGraceMs = Long.MaxValue)
    // data identical; every bucket now lives in ONE generation
    assert(state(Apply.readMergeTable(spark, table)) == before)
    val gensAfter = Apply.bucketDirs(spark, table).values
      .map(_.getParent.getName).toSet
    assert(gensAfter.size == 1, s"expected one live generation, got $gensAfter")
    // compaction is a commit: a new snapshot id, and the PRE-compaction
    // snapshot still reads (its dirs are retired, not deleted)
    assert(Apply.commits(spark, table).last == lastCommit + 1)
    assert(state(Apply.readMergeTableAt(spark, table, lastCommit)) == before)
    // ~one file per bucket in the compacted generation
    val hc = graft.util.Hfs.conf(spark)
    Apply.bucketDirs(spark, table).values.foreach { d =>
      val files = graft.util.Hfs.list(d, hc)
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(files == 1, s"$d has $files files after compaction")
    }
    // vacuum reclaims the retired dirs; current read unaffected
    Apply.vacuum(spark, table, graceMs = 0L)
    assert(state(Apply.readMergeTable(spark, table)) == before)
    intercept[IllegalArgumentException] {
      Apply.readMergeTableAt(spark, table, lastCommit)
    }
  }

  test("S7: Kafka-wire shape projects into the envelope") {
    import spark.implicits._
    val payload = """{"op": "INSERT", "after": {"id": "k1", "ticker": "tt", "price": 5.5}}"""
    val kafka = Seq((
      "k1".getBytes, payload.getBytes, new java.sql.Timestamp(1700000000000L),
      "topic-a", 0, 42L))
      .toDF("key", "value", "timestamp", "topic", "partition", "offset")
    val env = Capture.fromKafkaShape(kafka, afterSchema)
    val row = Envelope.route(env).collect()(0)
    assert(row.getAs[String]("op") == "INSERT")
    assert(row.getAs[String]("key") == "k1")
    assert(row.getStruct(row.fieldIndex("after")).getAs[Double]("price") == 5.5)
  }

  test("T8: re-merging an already-applied batch is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-idem") + "/t"
    def runOnce(ck: String): Unit = {
      val ms = MemoryStream[Env]
      val q = Apply.startMerge(ms.toDF(), table, ck, "id", "ts", afterSchema,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)),
        env("MODIFY", "a", 2.0).copy(ts = ts(200)))
      q.processAllAvailable(); q.stop()
    }
    runOnce(tmp("ck-i1"))
    val first = Apply.readMergeTable(spark, table).collect().map(_.toString).sorted
    runOnce(tmp("ck-i2")) // fresh checkpoint = full replay of the same batch
    val second = Apply.readMergeTable(spark, table).collect().map(_.toString).sorted
    assert(first.sameElements(second)) // latest-by-version makes replay a no-op
  }

  test("S12: cleanSource=archive actually moves consumed staged files") {
    val stage = tmp("stage-s12")
    val archive = tmp("archive-s12")
    val ck = tmp("ck-s12")
    val wh = tmp("wh-s12")
    // three staged batches -> three source files
    (1 to 3).foreach { i =>
      Capture.stageBatch(Envelope.route(Seq(env("INSERT", s"k$i", i.toDouble)).toDF()), stage)
    }
    def sourceDataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(stage)).map(_.getName).filter(_.endsWith(".json")).toSet
    }
    val before = sourceDataFiles()
    assert(before.size == 3)
    def runPass(): Unit = {
      val q = Apply.startAppend(
        Apply.stagedStream(spark, stage, afterSchema, maxFilesPerTrigger = 1,
          cleanSource = Some("archive"), sourceArchiveDir = Some(archive)),
        wh, ck)
      q.awaitTermination()
    }
    runPass()
    // the cleaner archives a batch's files while later batches run; a
    // second pass (new data) flushes the tail, and the move is async —
    // poll briefly
    Capture.stageBatch(Envelope.route(Seq(env("INSERT", "k4", 4.0)).toDF()), stage)
    runPass()
    def archivedFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(archive)).map(_.getName).filter(_.endsWith(".json")).toSet
    }
    val deadline = System.currentTimeMillis() + 20000
    while (archivedFiles().isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    val archived = archivedFiles()
    assert(archived.nonEmpty, "no staged file was archived")
    assert(archived.subsetOf(before + "k4"), "archived files must come from the staged set")
    // archived files left the source prefix (retention applied, S12)
    assert(archived.intersect(sourceDataFiles()).isEmpty)
    // and no data was lost: all four inserts landed
    assert(spark.read.schema(afterSchema).parquet(wh).count() == 4)
  }

  test("S7 e2e: kafka-shaped stream -> envelopes -> staged -> warehouse") {
    implicit val sqlCtx = spark.sqlContext
    val stage = tmp("stage-kafka")
    val wh = tmp("wh-kafka")
    // exactly the schema spark.readStream.format("kafka") produces; only
    // the broker is faked (no Kafka in the offline sandbox)
    val ms = MemoryStream[(Array[Byte], Array[Byte], java.sql.Timestamp, String, Int, Long)]
    val kafkaShaped = ms.toDF()
      .toDF("key", "value", "timestamp", "topic", "partition", "offset")
    val q = Capture.start(
      Capture.fromKafkaShape(kafkaShaped, afterSchema), stage, tmp("ck-kafka"))
    def rec(op: String, id: String, price: Double, off: Long) = (
      id.getBytes("UTF-8"),
      s"""{"op": "$op", "after": {"id": "$id", "ticker": "tick", "price": $price}}""".getBytes("UTF-8"),
      new java.sql.Timestamp(1700000000000L + off), "trades", 0, off)
    ms.addData(rec("INSERT", "a", 1.5, 0), rec("MODIFY", "b", 2.5, 1), rec("REMOVE", "c", 0.0, 2))
    q.processAllAvailable()
    q.stop()
    val ap = Apply.startAppend(
      Apply.stagedStream(spark, stage, afterSchema), wh, tmp("ck-kafka-apply"))
    ap.awaitTermination()
    val landed = spark.read.schema(afterSchema).parquet(wh)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("price")).toMap
    assert(landed == Map("a" -> 1.5, "b" -> 2.5)) // REMOVE routed out (T5)
  }

  test("manifest commit: an uncommitted generation is invisible and GC'd") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-manifest") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-mf1"), "id", "ts", afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)))
    q.processAllAvailable(); q.stop()
    // simulate a publish that died between data write and manifest flip:
    // a generation on disk that no manifest entry references. This is the
    // crash the old rename-swap protocol could not survive on an object
    // store — here it must be invisible to readers (no reliance on any
    // rename being atomic) and reclaimed by the next commit's GC.
    val orphan = new java.io.File(table, "gen=999/_bucket=0")
    Seq(env("INSERT", "zzz", 9.0)).toDF()
      .select(col("after.*"), col("ts").as("_version"))
      .write.parquet(orphan.getPath)
    val ids0 = Apply.readMergeTable(spark, table)
      .collect().map(_.getAs[String]("id")).toSet
    assert(ids0 == Set("a")) // manifest-resolved read ignores the orphan
    // a later writer (fresh checkpoint, so stream batch ids restart — the
    // generation counter must not collide with live dirs) commits past it
    val ms2 = MemoryStream[Env]
    // gcGraceMs = 0: this test pins the GC mechanism itself; the deferred
    // default is covered by the vacuum test below
    val q2 = Apply.startMerge(ms2.toDF(), table, tmp("ck-mf2"), "id", "ts", afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      gcGraceMs = 0L)
    ms2.addData(env("INSERT", "b", 2.0).copy(ts = ts(200)))
    q2.processAllAvailable(); q2.stop()
    assert(!new java.io.File(table, "gen=999").exists(), "orphan generation not GC'd")
    val ids = Apply.readMergeTable(spark, table)
      .collect().map(_.getAs[String]("id")).toSet
    assert(ids == Set("a", "b"))
  }

  test("deferred GC: superseded generations outlive the commit until vacuum") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-vacuum") + "/t"
    def runOnce(ck: String, e: Env): Unit = {
      val ms = MemoryStream[Env]
      val q = Apply.startMerge(ms.toDF(), table, ck, "id", "ts", afterSchema,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      ms.addData(e)
      q.processAllAvailable(); q.stop()
    }
    runOnce(tmp("ck-vac1"), env("INSERT", "a", 1.0).copy(ts = ts(100)))
    runOnce(tmp("ck-vac2"), env("MODIFY", "a", 2.0).copy(ts = ts(200)))
    def genDirs = new java.io.File(table).listFiles()
      .filter(_.getName.startsWith("gen=")).map(_.getName).toSet
    // the superseded generation is retired, NOT deleted (default grace):
    // a reader that planned its scan against the previous manifest can
    // still finish
    assert(genDirs.size == 2, s"expected retained superseded gen, got $genDirs")
    val meta = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(table, "_graft_table_meta.json").toPath), "UTF-8")
    assert(meta.contains("\"retired\": [{\"gen\""), meta)
    val byId = Apply.readMergeTable(spark, table).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Double]("price")).toMap
    assert(byId == Map("a" -> 2.0))
    // vacuum(grace=0) reclaims; the live generation and contents survive
    Apply.vacuum(spark, table, graceMs = 0L)
    assert(genDirs.size == 1, s"vacuum left $genDirs")
    Apply.vacuum(spark, table, graceMs = 0L) // idempotent
    val after = Apply.readMergeTable(spark, table).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Double]("price")).toMap
    assert(after == Map("a" -> 2.0))
  }

  test("manifest parse is scoped and fails loudly on malformed content") {
    val m = Apply.parseMeta(
      """{"layout": "bucketed-v2", "nBuckets": 8,
        | "buckets": {"0": 3, "5": 2},
        | "retired": [{"gen": 1, "bucket": 0, "at": 1700000000000}],
        | "rowCounts": {"7": 999}}""".stripMargin)
    // a numeric map elsewhere in the manifest must NOT be absorbed as
    // bucket entries (the round-5 regex would have)
    assert(m.buckets == Map(0 -> 3L, 5 -> 2L))
    assert(m.retired == Map((1L, 0) -> 1700000000000L))
    assert(m.nBuckets == 8)
    // pre-round-6 manifest without a retired ledger still parses
    val old = Apply.parseMeta("""{"layout": "bucketed-v2", "nBuckets": 4, "buckets": {"1": 0}}""")
    assert(old.buckets == Map(1 -> 0L) && old.retired.isEmpty)
    intercept[RuntimeException] {
      Apply.parseMeta("""{"layout": "bucketed-v2", "nBuckets": 4, "buckets": {"x": "y"}}""")
    }
    intercept[RuntimeException] {
      Apply.parseMeta("""{"nBuckets": 4, "buckets": {}}""")
    }
  }

  test("layout guard: merge persists nBuckets and refuses a mismatched writer") {
    implicit val sqlCtx = spark.sqlContext
    val table = tmp("merge-guard") + "/t"
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), table, tmp("ck-guard1"), "id", "ts", afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      nBuckets = 8)
    ms.addData(env("INSERT", "a", 1.0).copy(ts = ts(100)))
    q.processAllAvailable(); q.stop()
    val meta = new java.io.File(table, "_graft_table_meta.json")
    assert(meta.exists())
    assert(new String(java.nio.file.Files.readAllBytes(meta.toPath), "UTF-8")
      .contains("\"nBuckets\": 8"))
    // a writer configured with a different bucket count must fail fast
    // (silently rehashing would drop rows from rewritten buckets)
    val ms2 = MemoryStream[Env]
    val q2 = Apply.startMerge(ms2.toDF(), table, tmp("ck-guard2"), "id", "ts", afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      nBuckets = 16)
    ms2.addData(env("MODIFY", "a", 2.0).copy(ts = ts(200)))
    val e = intercept[Exception] { q2.processAllAvailable() }
    assert(e.getMessage.contains("nBuckets") ||
      Option(e.getCause).exists(_.getMessage.contains("nBuckets")))
    // the guard fired before any rewrite: table contents unchanged
    val byId = Apply.readMergeTable(spark, table).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Double]("price")).toMap
    assert(byId == Map("a" -> 1.0))
  }

  test("layout guard: merge refuses a pre-existing flat (non-bucketed) table") {
    implicit val sqlCtx = spark.sqlContext
    val flat = tmp("merge-flat") + "/t"
    // a round-1-style flat layout: parquet files at the table root
    Seq(env("INSERT", "a", 1.0)).toDF().select(col("after.*"), col("ts").as("_version"))
      .write.parquet(flat)
    val ms = MemoryStream[Env]
    val q = Apply.startMerge(ms.toDF(), flat, tmp("ck-flat"), "id", "ts", afterSchema,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    ms.addData(env("MODIFY", "a", 2.0).copy(ts = ts(200)))
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(e.getMessage.contains("non-bucketed") ||
      Option(e.getCause).exists(_.getMessage.contains("non-bucketed")))
  }

  test("T9: startIfNotRunning is a no-op when the named query is active") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Env]
    val stage = tmp("stage-t9")
    val q = ms.toDF().writeStream.queryName("cdc-capture-t9")
      .option("checkpointLocation", tmp("ck-t9"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    try {
      val second = Apply.startIfNotRunning(spark, "cdc-capture-t9") {
        fail("should not start a second query"); q
      }
      assert(second.isEmpty)
    } finally q.stop()
  }
}
