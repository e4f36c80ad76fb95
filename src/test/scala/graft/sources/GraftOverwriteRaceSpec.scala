package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.Apply

/** The OVERWRITE-FAMILY race matrix (round 16, verdict r15 #3) —
  * extends the round-15 UPDATE-vs-UPDATE and UPDATE-vs-epoch races to
  * the verbs added since: REPLACE WHERE racing an UPDATE inside its
  * region, two REPLACE WHEREs on overlapping regions, and INSERT
  * OVERWRITE racing a streaming-sink epoch. One invariant throughout
  * (the round-15 contract, `GraftRowLevelSpec`): applied effects ==
  * successful statements — the ledger advances once per winner, the
  * final state is a serializable order of the winners, and every
  * loser fails ATTRIBUTABLY (stale gate or lease fence), never by
  * silently losing its fold. */
class GraftOverwriteRaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val catalogReady: Unit = spark.conf.set(
    "spark.sql.catalog.graft_or", classOf[GraftCatalog].getName)

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  /** CREATE + INSERT ids 1..4 at version 10 (commit 1). */
  private def seed(): String = {
    catalogReady
    val base = Files.createTempDirectory("graftor").toString
    val dir = s"$base/t"
    spark.sql(s"CREATE TABLE graft_or.`$dir`.merge (" +
      "id BIGINT, ticker STRING, price DOUBLE, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id')")
    spark.sql(s"INSERT INTO graft_or.`$dir`.merge VALUES " +
      "(1, 't1', 1.0, 10), (2, 't2', 2.0, 10), " +
      "(3, 't3', 3.0, 10), (4, 't4', 4.0, 10)")
    assert(Apply.currentCommit(spark, dir) == 1L)
    dir
  }

  private def state(dir: String): Map[Long, (String, Double, Long)] =
    Apply.readMergeTable(spark, dir)
      .select(col("id"), col("ticker"), col("price"), col("_version"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2),
        r.getLong(3)))).toMap

  /** Run the two bodies concurrently from a shared gate; return the
    * losers' throwables. */
  private def race(a: => Unit, b: => Unit): Seq[Throwable] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def run(body: => Unit) = pool.submit(new Runnable {
      def run(): Unit = {
        gate.await()
        try body catch { case t: Throwable => errs.add(t); () }
      }
    })
    run(a); run(b)
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300,
      java.util.concurrent.TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    errs.asScala.toSeq
  }

  private def assertAttributable(errs: Seq[Throwable]): Unit =
    errs.foreach { t =>
      assert(chain(t).exists(m => m.contains("stale") ||
        m.contains("FENCED")),
        "a losing face must fail loudly: " + chain(t).mkString(" <- "))
    }

  test("REPLACE WHERE racing an UPDATE on a key inside the region: " +
      "commits == 1 + winners, the final image is a serializable " +
      "order, the loser (if any) is attributable") {
    val dir = seed()
    import spark.implicits._
    Seq((1L, "rw", 9.0, 20L), (2L, "rw", 9.0, 20L))
      .toDF("id", "ticker", "price", "_version")
      .createOrReplaceTempView("graft_or_rw1")
    val errs = race(
      spark.sql(s"UPDATE graft_or.`$dir`.merge " +
        "SET price = price + 1.0, _version = _version + 1 WHERE id = 1"),
      spark.sql(s"INSERT INTO graft_or.`$dir`.merge " +
        "REPLACE WHERE id <= 2 SELECT * FROM graft_or_rw1"))
    val wins = 2 - errs.size
    assert(Apply.currentCommit(spark, dir) == 1L + wins,
      s"$wins statement(s) succeeded but the ledger shows " +
        s"${Apply.currentCommit(spark, dir) - 1} post-seed commits")
    val s = state(dir)
    // id 2 is inside the region and absent from the UPDATE: the
    // replace's image whenever the replace won (it always can — v20
    // beats both 10 and 11)
    assert(s(2L) == (("rw", 9.0, 20L)), s"$s")
    // id 1: three serializable outcomes
    val outcome = (wins, s(1L))
    assert(outcome == ((2, ("rw", 9.0, 20L))) ||   // UPDATE then replace
      outcome == ((2, ("rw", 10.0, 21L))) ||       // replace then UPDATE
      outcome == ((1, ("rw", 9.0, 20L))),          // UPDATE lost, stale
      s"non-serializable outcome: $outcome")
    assert((3L to 4L).forall(i => s(i) == ((s"t$i", i.toDouble, 10L))),
      s"keys outside the region must be untouched: $s")
    assertAttributable(errs)
  }

  test("two REPLACE WHEREs on OVERLAPPING regions: exactly one wins " +
      "(the overlap key makes the second stale), the final state is " +
      "the winner's closure, the loser is attributable") {
    val dir = seed()
    import spark.implicits._
    Seq((1L, "a", 5.0, 20L), (2L, "a", 5.0, 20L))
      .toDF("id", "ticker", "price", "_version")
      .createOrReplaceTempView("graft_or_ova")
    Seq((2L, "b", 6.0, 20L), (3L, "b", 6.0, 20L), (4L, "b", 6.0, 20L))
      .toDF("id", "ticker", "price", "_version")
      .createOrReplaceTempView("graft_or_ovb")
    val errs = race(
      spark.sql(s"INSERT INTO graft_or.`$dir`.merge " +
        "REPLACE WHERE id <= 2 SELECT * FROM graft_or_ova"),
      spark.sql(s"INSERT INTO graft_or.`$dir`.merge " +
        "REPLACE WHERE id >= 2 SELECT * FROM graft_or_ovb"))
    // both re-offer version 20 for the shared key 2 — whichever
    // commits second must reject WHOLE (the gate runs before the fold)
    assert(errs.size == 1,
      s"exactly one of two overlapping replaces must win, got " +
        s"${2 - errs.size} winners")
    assert(Apply.currentCommit(spark, dir) == 2L)
    val s = state(dir)
    val aWon = Map(
      1L -> (("a", 5.0, 20L)), 2L -> (("a", 5.0, 20L)),
      3L -> (("t3", 3.0, 10L)), 4L -> (("t4", 4.0, 10L)))
    val bWon = Map(
      1L -> (("t1", 1.0, 10L)), 2L -> (("b", 6.0, 20L)),
      3L -> (("b", 6.0, 20L)), 4L -> (("b", 6.0, 20L)))
    assert(s == aWon || s == bWon,
      s"the final state must be exactly ONE winner's closure: $s")
    assertAttributable(errs)
  }

  test("INSERT OVERWRITE racing a streaming-sink epoch: both commit " +
      "(the epoch's replay contract never goes stale), the ledger " +
      "counts both, and the final state is a serializable order") {
    val dir = seed()
    val base = Files.createTempDirectory("graftorow").toString
    import spark.implicits._
    Seq((1L, "ow", 7.0, 20L), (7L, "new", 7.0, 20L))
      .toDF("id", "ticker", "price", "_version")
      .createOrReplaceTempView("graft_or_ow")
    val in = s"$base/in"
    Seq((2L, "ep", 30.0, 30L)).toDF("id", "ticker", "price", "_version")
      .repartition(1).write.parquet(in)
    val errs = race(
      spark.sql(s"INSERT OVERWRITE graft_or.`$dir`.merge " +
        "SELECT * FROM graft_or_ow"),
      {
        val q = spark.readStream
          .schema("id BIGINT, ticker STRING, price DOUBLE, _version BIGINT")
          .parquet(in)
          .writeStream.format("graft").option("path", dir)
          .option("checkpointLocation", s"$base/ck")
          .trigger(Trigger.AvailableNow()).start()
        try q.processAllAvailable() finally q.stop()
      })
    val wins = 2 - errs.size
    assert(Apply.currentCommit(spark, dir) == 1L + wins)
    val s = state(dir)
    if (errs.isEmpty) {
      // serializable orders: overwrite-then-epoch resurrects id 2 at
      // v30; epoch-then-overwrite REMOVEs it at its epoch version
      assert(s == Map(1L -> (("ow", 7.0, 20L)), 7L -> (("new", 7.0, 20L)),
          2L -> (("ep", 30.0, 30L))) ||
        s == Map(1L -> (("ow", 7.0, 20L)), 7L -> (("new", 7.0, 20L))),
        s"non-serializable outcome: $s")
    }
    assertAttributable(errs)
  }
}
