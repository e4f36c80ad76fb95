package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.Apply

case class DcAfter(id: Long, ticker: String, extra: String)
case class DcEnv(op: String, key: Long, after: DcAfter, v: Long)

/** `ALTER TABLE … DROP COLUMN` as a library FOLD-REWRITE (round 16,
  * verdict r15 #4) and `migrate_schema_history` (#5). Contracts: the
  * drop is ONE projection commit (narrowed declaration archived, every
  * live bucket rewritten, no logical change in the feed), AS-OF reads
  * before the DROP still serve the column WITH its data, the fold
  * axes are untouchable, and pre-versioning tables gain a uniform
  * declaration floor via the migrate procedure. Also pins the
  * round-16 explicit REPLACE WHERE region-scan pruning helper
  * ([[Apply.removableReadSchema]]). */
class GraftDropColumnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val catalogReady: Unit = spark.conf.set(
    "spark.sql.catalog.graft_dc", classOf[GraftCatalog].getName)

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  /** CREATE with an `extra` column (commit 0) + INSERT ids 1..3 at
    * version 10 carrying it (commit 1). */
  private def seed(): String = {
    catalogReady
    val base = Files.createTempDirectory("graftdc").toString
    val dir = s"$base/t"
    spark.sql(s"CREATE TABLE graft_dc.`$dir`.merge (" +
      "id BIGINT, ticker STRING, extra STRING, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id')")
    spark.sql(s"INSERT INTO graft_dc.`$dir`.merge VALUES " +
      "(1, 't1', 'x1', 10), (2, 't2', 'x2', 10), (3, 't3', 'x3', 10)")
    assert(Apply.currentCommit(spark, dir) == 1L)
    dir
  }

  test("DROP COLUMN is one projection-rewrite commit: the column is " +
      "gone physically and declaratively, data otherwise intact, the " +
      "feed reads the commit as no logical change, and AS-OF before " +
      "the DROP still serves the column with its data") {
    val dir = seed()
    spark.sql(s"ALTER TABLE graft_dc.`$dir`.merge DROP COLUMN extra")
    assert(Apply.currentCommit(spark, dir) == 2L,
      "one DROP COLUMN must be one ledgered commit")
    val cur = spark.sql(s"SELECT * FROM graft_dc.`$dir`.merge")
    assert(cur.columns.toSeq == Seq("id", "ticker", "_version"),
      s"the declaration must narrow: ${cur.columns.toSeq}")
    assert(cur.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq ==
      Seq((1L, "t1", 10L), (2L, "t2", 10L), (3L, "t3", 10L)),
      "every row must survive the projection rewrite")
    // PHYSICAL: the live generation's parquet no longer carries the
    // column (the rewrite is real, not a read-side mask)
    val phys = spark.read.option("mergeSchema", "true")
      .parquet(Apply.snapshotBucketDirs(spark, dir, None): _*)
    assert(!phys.columns.contains("extra"),
      s"the rewrite must drop the column physically: ${phys.columns.toSeq}")
    // the feed: a physical rewrite is no logical change
    val slice = spark.read.format("graft").option("path", dir)
      .option("table", "changes.merge")
      .option("sinceCommit", "1").option("untilCommit", "2").load()
    assert(slice.count() == 0L,
      "a DROP COLUMN commit must read as empty in the change feed")
    // AS-OF before the drop: old declaration, old data
    val old = spark.sql(
      s"SELECT * FROM graft_dc.`$dir`.merge VERSION AS OF 1")
    assert(old.columns.toSeq == Seq("id", "ticker", "extra", "_version"),
      s"AS-OF 1 must serve the pre-DROP declaration: ${old.columns.toSeq}")
    assert(old.filter(col("id") === 2L).select(col("extra")).head
      .getString(0) == "x2",
      "AS-OF must serve the dropped column's DATA, not just its name")
    // schema_history carries both declarations
    val hist = spark.sql(
      s"CALL graft_dc.system.schema_history(store => '$dir')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist.map(_._1) == Seq(0L, 2L), s"history commits: $hist")
    assert(hist.head._2.contains("extra") && !hist.last._2.contains("extra"))
    // still writable with the narrowed declaration
    spark.sql(s"INSERT INTO graft_dc.`$dir`.merge VALUES (4, 't4', 11)")
    assert(Apply.currentCommit(spark, dir) == 3L)
  }

  test("the fold axes are untouchable and missing columns refuse — " +
      "except under IF EXISTS, which no-ops") {
    val dir = seed()
    val e1 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_dc.`$dir`.merge DROP COLUMN id"))
    assert(chain(e1).exists(_.contains("fold axes")),
      chain(e1).mkString(" <- "))
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_dc.`$dir`.merge DROP COLUMN _version"))
    assert(chain(e2).exists(_.contains("fold axes")),
      chain(e2).mkString(" <- "))
    val e3 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_dc.`$dir`.merge DROP COLUMN nope"))
    assert(chain(e3).exists(m => m.contains("not exist") ||
      m.contains("do not exist") || m.contains("missing") ||
      m.toUpperCase.contains("UNRESOLVED")), chain(e3).mkString(" <- "))
    spark.sql(
      s"ALTER TABLE graft_dc.`$dir`.merge DROP COLUMN IF EXISTS nope")
    assert(Apply.currentCommit(spark, dir) == 1L,
      "refused/vacuous drops must not commit")
    assert(spark.sql(s"SELECT * FROM graft_dc.`$dir`.merge")
      .columns.toSeq == Seq("id", "ticker", "extra", "_version"))
  }

  test("migrate_schema_history archives the floor declaration for a " +
      "pre-versioning table, idempotently — AS-OF then answers " +
      "uniformly") {
    catalogReady
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // a table seeded by the LIBRARY fold only: no sidecar, no history
    val dir = Files.createTempDirectory("graftdcmig").toString + "/t"
    val rows = (1L to 3L).map(i =>
      DcEnv("INSERT", i, DcAfter(i, s"t$i", s"x$i"), 10L))
    val schema = rows.toDF().schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val ms = MemoryStream[DcEnv]
    ms.addData(rows: _*)
    val q = Apply.startMerge(ms.toDF(), dir,
      Files.createTempDirectory("graftdcmigck").toString,
      keyCol = "id", versionCol = "v", schema = schema)
    q.processAllAvailable(); q.stop()
    assert(Apply.schemaHistory(spark, dir).isEmpty,
      "a library-seeded table predates declaration versioning")
    val out = spark.sql(
      s"CALL graft_dc.system.migrate_schema_history(store => '$dir')")
      .select(col("detail")).head.getString(0)
    assert(out.contains("floor"), out)
    val hist = Apply.schemaHistory(spark, dir)
    assert(hist.map(_._1) == Seq(1L),
      s"the floor entry must land at the current commit: $hist")
    assert(hist.head._2.fieldNames.toSeq ==
      Seq("id", "ticker", "extra", "_version"))
    // idempotent
    val again = spark.sql(
      s"CALL graft_dc.system.migrate_schema_history(store => '$dir')")
      .select(col("detail")).head.getString(0)
    assert(again.contains("already"), again)
    assert(Apply.schemaHistory(spark, dir).map(_._1) == Seq(1L))
    // the uniform contract: AS-OF the floor commit reads the baseline
    val old = spark.sql(
      s"SELECT * FROM graft_dc.`$dir`.merge VERSION AS OF 1")
    assert(old.columns.toSeq == Seq("id", "ticker", "extra", "_version"))
    assert(old.count() == 3L)
  }

  test("removableReadSchema narrows the REPLACE WHERE region scan to " +
      "cond columns plus the fold axes, structurally") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ticker", StringType),
      StructField("price", DoubleType), StructField("_version", LongType)))
    val narrow = Apply.removableReadSchema(schema, col("price") > 1.0, "id")
    assert(narrow.fieldNames.toSeq == Seq("id", "price", "_version"),
      s"cond refs ∪ fold axes, in declaration order: " +
        narrow.fieldNames.toSeq)
    val both = Apply.removableReadSchema(schema,
      col("ticker") === "a" && col("price") < 2.0, "id")
    assert(both.fieldNames.toSeq ==
      Seq("id", "ticker", "price", "_version"))
    // a condition whose references cannot be resolved against the
    // schema falls back to the full schema (never a broken read)
    val fallback = Apply.removableReadSchema(schema, col("ghost") > 0, "id")
    assert(fallback == schema)
  }
}
