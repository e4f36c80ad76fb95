package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.Apply

/** The DSv2 STREAMING SINK (round 14): `writeStream.format("graft")`
  * must fold each epoch as one leased merge commit with its change
  * slice, cap per-epoch size via the source's batching, clean its
  * staging with the commit, and be exactly-once under replay (a
  * replayed epoch's envelopes lose the fold's full-tie break — no
  * duplicate state, no duplicate feed events). */
class GraftStreamSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val catalogReady: Unit = spark.conf.set(
    "spark.sql.catalog.graft_ss", classOf[GraftCatalog].getName)

  test("writeStream.format(graft): epochs fold as ledgered commits " +
      "with change slices; staging dies with each epoch; a replay is " +
      "a semantic no-op (state unchanged, feed slice empty)") {
    catalogReady
    import spark.implicits._
    val base = Files.createTempDirectory("graftsink").toString
    val dir = s"$base/t"
    spark.sql(s"CREATE TABLE graft_ss.`$dir`.merge " +
      "(id BIGINT, ticker STRING, price DOUBLE, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id')")
    // two source files => two epochs under maxFilesPerTrigger=1
    val in = s"$base/in"
    Seq((1L, "a", 1.0, 10L), (2L, "b", 2.0, 10L))
      .toDF("id", "ticker", "price", "_version")
      .repartition(1).write.parquet(s"$in/f1")
    Seq((1L, "a2", 9.0, 11L), (3L, "c", 3.0, 10L))
      .toDF("id", "ticker", "price", "_version")
      .repartition(1).write.parquet(s"$in/f2")
    def run(ck: String): Unit = {
      val q = spark.readStream
        .schema("id BIGINT, ticker STRING, price DOUBLE, _version BIGINT")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(in)
        .writeStream.format("graft").option("path", dir)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
    }
    run(s"$base/ck1")
    val commits = Apply.currentCommit(spark, dir)
    assert(commits == 2L,
      s"two epochs must land as two ledgered commits, got $commits")
    val state = Apply.readMergeTable(spark, dir)
      .select(col("id"), col("ticker"), col("_version")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(state == Set((1L, "a2", 11L), (2L, "b", 10L), (3L, "c", 10L)),
      s"the sink must ride the versioned fold: $state")
    // each commit's change slice carries that epoch's winners
    def slice(from: Long, to: Long): Set[(Long, String)] =
      spark.read.format("graft").option("path", dir)
        .option("table", "changes.merge")
        .option("sinceCommit", from.toString)
        .option("untilCommit", to.toString).load()
        .select(col("_key"), col("op")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(slice(0L, 2L).map(_._1) == Set(1L, 2L, 3L))
    // staging cleaned per epoch
    val staging = new java.io.File(s"$dir/_staging")
    assert(Option(staging.listFiles()).getOrElse(Array.empty).isEmpty,
      "each epoch's staging must die with its commit")
    // resuming the SAME checkpoint re-processes nothing
    run(s"$base/ck1")
    assert(Apply.currentCommit(spark, dir) == commits,
      "a resumed checkpoint with no new input must not commit")
    // a FULL REPLAY (fresh checkpoint, same input) is a semantic
    // no-op: commits advance but the state is unchanged and the
    // replayed slices are EMPTY (the stored rows win full ties, so a
    // downstream cascade sees nothing)
    run(s"$base/ck2")
    val afterReplay = Apply.readMergeTable(spark, dir)
      .select(col("id"), col("ticker"), col("_version")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(afterReplay == state, "replay must not change the table")
    assert(slice(commits, Apply.currentCommit(spark, dir)).isEmpty,
      "replayed envelopes lose the fold and must NOT enter the feed")
  }

  test("the sink refuses a stream missing the fold axes, and refuses " +
      "non-merge surfaces") {
    catalogReady
    import spark.implicits._
    val base = Files.createTempDirectory("graftsink2").toString
    val dir = s"$base/t"
    spark.sql(s"CREATE TABLE graft_ss.`$dir`.merge " +
      "(id BIGINT, price DOUBLE, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id')")
    val in = s"$base/in"
    Seq((1L, 1.0)).toDF("id", "price")
      .repartition(1).write.parquet(in)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception] {
      val q = spark.readStream.schema("id BIGINT, price DOUBLE")
        .parquet(in)
        .writeStream.format("graft").option("path", dir)
        .option("checkpointLocation", s"$base/ck")
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(chain(e).exists(_.contains("_version")),
      chain(e).mkString(" <- "))
  }

  test("a STREAMING EPOCH racing a SQL UPDATE never loses an update " +
      "silently: the faces serialize on the table's lease, every " +
      "committed statement is one ledgered commit, and the loser (if " +
      "any) fails attributably") {
    catalogReady
    import spark.implicits._
    val base = Files.createTempDirectory("graftsinkrace").toString
    val dir = s"$base/t"
    spark.sql(s"CREATE TABLE graft_ss.`$dir`.merge " +
      "(id BIGINT, price DOUBLE, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id')")
    spark.sql(s"INSERT INTO graft_ss.`$dir`.merge VALUES " +
      "(1, 100.0, 10), (2, 2.0, 10)") // commit 1
    val in = s"$base/in"
    Seq((1L, 200.0, 20L)).toDF("id", "price", "_version")
      .repartition(1).write.parquet(in)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def run(body: => Unit) = pool.submit(new Runnable {
      def run(): Unit = {
        gate.await()
        try body catch { case t: Throwable => errs.add(t); () }
      }
    })
    // face A: a SQL UPDATE offering version 11
    run(spark.sql(s"UPDATE graft_ss.`$dir`.merge " +
      "SET price = price + 1.0, _version = _version + 1 WHERE id = 1"))
    // face B: one streaming epoch offering version 20 for the same key
    run {
      val q = spark.readStream
        .schema("id BIGINT, price DOUBLE, _version BIGINT").parquet(in)
        .writeStream.format("graft").option("path", dir)
        .option("checkpointLocation", s"$base/ck")
        .trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300,
      java.util.concurrent.TimeUnit.SECONDS))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val wins = 2 - errs.size()
    val commit = Apply.currentCommit(spark, dir)
    val row = Apply.readMergeTable(spark, dir).filter(col("id") === 1L)
      .select(col("price"), col("_version")).head
    val (price, version) = (row.getDouble(0), row.getLong(1))
    // invariant 1: commits == seed + successful statements — every
    // committed effect is ledgered, nothing half-applies
    assert(commit == 1L + wins,
      s"$wins statement(s) succeeded but the ledger shows " +
        s"${commit - 1} post-seed commits")
    // invariant 2: the final image is one of the three serializable
    // outcomes — never a silent mix
    val outcome = (wins, price, version)
    assert(outcome == ((2, 200.0, 20L)) || // UPDATE then epoch
      outcome == ((2, 201.0, 21L)) ||      // epoch, then UPDATE on top
      outcome == ((1, 200.0, 20L)),        // epoch won; UPDATE stale
      s"non-serializable outcome: wins=$wins price=$price v=$version")
    // invariant 3: a losing UPDATE failed ATTRIBUTABLY
    errs.forEach { t =>
      assert(chain(t).exists(m => m.contains("stale") ||
        m.contains("FENCED")),
        "the losing face must fail loudly: " + chain(t).mkString(" <- "))
    }
  }
}
