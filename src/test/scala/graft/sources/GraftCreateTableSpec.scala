package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.Apply

/** SQL CREATE TABLE on the merge surface (round 14): stand up an empty
  * table entirely in SQL, read it empty (the creation-schema sidecar
  * serves the zero-path snapshot), write it through every SQL face,
  * time-travel back to the empty commit — and refuse everything that
  * would break the fold's invariants. */
class GraftCreateTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val catalogReady: Unit = spark.conf.set(
    "spark.sql.catalog.graft_ct", classOf[GraftCatalog].getName)

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  test("CREATE TABLE → empty read → INSERT → UPDATE → DELETE → " +
      "VERSION AS OF 0: the full lifecycle with no library verb") {
    catalogReady
    val dir = Files.createTempDirectory("graftct").toString + "/t"
    spark.sql(s"CREATE TABLE graft_ct.`$dir`.merge " +
      "(id BIGINT, ticker STRING, price DOUBLE, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id')")
    assert(Apply.currentCommit(spark, dir) == 0L)
    // empty read through SQL: zero rows, declared schema, key axes
    // non-nullable
    val empty = spark.sql(s"SELECT * FROM graft_ct.`$dir`.merge")
    assert(empty.count() == 0L)
    assert(empty.schema.fieldNames.toSeq ==
      Seq("id", "ticker", "price", "_version"))
    assert(!empty.schema("id").nullable && !empty.schema("_version").nullable)
    // IF NOT EXISTS on an existing table is a no-op; bare CREATE refuses
    spark.sql(s"CREATE TABLE IF NOT EXISTS graft_ct.`$dir`.merge " +
      "(id BIGINT, _version BIGINT) TBLPROPERTIES (key_col 'id')")
    val dup = intercept[Exception](spark.sql(
      s"CREATE TABLE graft_ct.`$dir`.merge " +
        "(id BIGINT, _version BIGINT) TBLPROPERTIES (key_col 'id')"))
    assert(chain(dup).exists(m => m.contains("already") ||
      m.contains("TABLE_OR_VIEW_ALREADY_EXISTS")), chain(dup).mkString(" <- "))
    // the lifecycle
    spark.sql(s"INSERT INTO graft_ct.`$dir`.merge VALUES " +
      "(1, 'a', 1.0, 10), (2, 'b', 2.0, 10), (3, 'c', 990.0, 10)")
    spark.sql(s"UPDATE graft_ct.`$dir`.merge " +
      "SET ticker = 'upd', _version = _version + 1 WHERE id = 1")
    spark.sql(s"DELETE FROM graft_ct.`$dir`.merge WHERE price > 900.0")
    val got = spark.sql(s"SELECT id, ticker, _version FROM " +
      s"graft_ct.`$dir`.merge ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "upd", 11L), (2L, "b", 10L)))
    assert(Apply.currentCommit(spark, dir) == 3L,
      "INSERT, UPDATE and DELETE must each be one ledgered commit")
    // time travel to the empty creation state
    assert(spark.sql(s"SELECT * FROM graft_ct.`$dir`.merge " +
      "VERSION AS OF 0").count() == 0L)
    // the change feed covers the WHOLE history (commit 0 stamped the
    // enabled marker)
    val feed = spark.read.format("graft").option("path", dir)
      .option("table", "changes.merge").option("sinceCommit", "0").load()
      .select(col("op"), col("_key")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed == Set(("MODIFY", 1L), ("MODIFY", 2L), ("MODIFY", 3L),
      ("REMOVE", 3L)),
      s"the lifecycle's commits must all ride the feed: $feed")
  }

  test("MERGE INTO an EMPTY created table is a valid first load " +
      "(NOT MATCHED inserts through the row-level face)") {
    catalogReady
    import spark.implicits._
    val dir = Files.createTempDirectory("graftct2").toString + "/t"
    spark.sql(s"CREATE TABLE graft_ct.`$dir`.merge " +
      "(id BIGINT, ticker STRING, price DOUBLE, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id', buckets '8')")
    Seq((7L, 7.0, 1L), (8L, 8.0, 1L)).toDF("id", "price", "v")
      .createOrReplaceTempView("graft_ct_src")
    spark.sql(
      s"""MERGE INTO graft_ct.`$dir`.merge AS t
         |USING graft_ct_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET price = s.price,
         |  _version = t._version + 1
         |WHEN NOT MATCHED THEN INSERT (id, ticker, price, _version)
         |  VALUES (s.id, 'first', s.price, s.v)""".stripMargin)
    val got = spark.sql(
      s"SELECT id, ticker FROM graft_ct.`$dir`.merge ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((7L, "first"), (8L, "first")))
    assert(Apply.currentCommit(spark, dir) == 1L)
  }

  test("CTAS: CREATE TABLE ... AS SELECT seeds through the real fold") {
    catalogReady
    import spark.implicits._
    val dir = Files.createTempDirectory("graftct3").toString + "/t"
    Seq((1L, "x", 5.0, 3L), (1L, "y", 6.0, 7L), (2L, "z", 1.0, 1L))
      .toDF("id", "ticker", "price", "_version")
      .createOrReplaceTempView("graft_ct_ctas_src")
    spark.sql(s"CREATE TABLE graft_ct.`$dir`.merge " +
      "TBLPROPERTIES (key_col 'id') AS " +
      "SELECT * FROM graft_ct_ctas_src")
    val got = spark.sql(
      s"SELECT id, ticker FROM graft_ct.`$dir`.merge ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "y"), (2L, "z")),
      s"CTAS rows must ride the versioned fold (latest per key): $got")
  }

  test("ALTER TABLE ADD COLUMNS: the new column reads NULL on old " +
      "rows, is writable by every SQL face after, and survives the " +
      "fold; renames/retypes refuse, DROP rewrites") {
    catalogReady
    val dir = Files.createTempDirectory("graftct5").toString + "/t"
    spark.sql(s"CREATE TABLE graft_ct.`$dir`.merge " +
      "(id BIGINT, price DOUBLE, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id')")
    spark.sql(s"INSERT INTO graft_ct.`$dir`.merge VALUES " +
      "(1, 1.0, 10), (2, 2.0, 10)")
    spark.sql(s"ALTER TABLE graft_ct.`$dir`.merge " +
      "ADD COLUMNS (region STRING)")
    // declared widening: NULL until data carries it
    val afterAlter = spark.sql(
      s"SELECT id, region FROM graft_ct.`$dir`.merge ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(afterAlter == Seq((1L, null), (2L, null)))
    // INSERT with the new column; UPDATE sets it on an old row
    spark.sql(s"INSERT INTO graft_ct.`$dir`.merge " +
      "(id, price, _version, region) VALUES (3, 3.0, 10, 'emea')")
    spark.sql(s"UPDATE graft_ct.`$dir`.merge " +
      "SET region = 'apac', _version = _version + 1 WHERE id = 1")
    val got = spark.sql(
      s"SELECT id, region FROM graft_ct.`$dir`.merge ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "apac"), (2L, null), (3L, "emea")),
      s"the evolved column must fold like any other: $got")
    // refusals
    def fails(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(chain(e).exists(_.toLowerCase.contains(needle.toLowerCase)),
        s"[$sql] -> ${chain(e).mkString(" <- ")}")
    }
    fails(s"ALTER TABLE graft_ct.`$dir`.merge RENAME COLUMN price TO p",
      "renames/retypes refuse")
    fails(s"ALTER TABLE graft_ct.`$dir`.merge ADD COLUMNS (price INT)",
      "already exist")
    // DROP COLUMN is no longer a refusal (round 16, r15 verdict #4 —
    // the library fold-rewrite; GraftDropColumnSpec pins the full
    // contract incl. AS-OF reads): here just the visible face — the
    // column disappears from subsequent reads
    spark.sql(s"ALTER TABLE graft_ct.`$dir`.merge DROP COLUMN price")
    assert(!spark.sql(s"SELECT * FROM graft_ct.`$dir`.merge")
      .columns.contains("price"),
      "DROP COLUMN must narrow the read schema")
  }

  test("ALTER TABLE ADD COLUMNS works on a table seeded OUTSIDE " +
      "CREATE TABLE (the current read schema becomes the baseline " +
      "declaration)") {
    catalogReady
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.cdc.{After, Env}
    val dir = Files.createTempDirectory("graftct6").toString + "/t"
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val schema = Seq(Env("INSERT", "x", After("x", "t", 1.0), ts(1)))
      .toDF().schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val ms = MemoryStream[Env]
    ms.addData(Env("INSERT", "k1", After("k1", "a", 1.0), ts(100)))
    val q = Apply.startMerge(ms.toDF(), dir,
      Files.createTempDirectory("graftct6ck").toString,
      keyCol = "id", versionCol = "ts", schema = schema)
    q.processAllAvailable(); q.stop()
    spark.sql(s"ALTER TABLE graft_ct.`$dir`.merge " +
      "ADD COLUMNS (note STRING)")
    val got = spark.sql(
      s"SELECT id, note FROM graft_ct.`$dir`.merge").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("k1", null)))
    spark.sql(s"INSERT INTO graft_ct.`$dir`.merge " +
      "(id, ticker, price, _version, note) VALUES " +
      "('k2', 'b', 2.0, TIMESTAMP '1970-01-01 00:00:01', 'n2')")
    assert(spark.sql(s"SELECT note FROM graft_ct.`$dir`.merge " +
      "WHERE id = 'k2'").head.getString(0) == "n2")
    // declaration versioning holds for legacy tables too: the ALTER
    // archived its inferred BASELINE at the pre-ALTER commit, so a
    // pre-ALTER time travel never shows the added column
    val preAlter = spark.sql(
      s"SELECT * FROM graft_ct.`$dir`.merge VERSION AS OF 1")
      .schema.fieldNames.toSeq
    assert(!preAlter.contains("note"),
      s"pre-ALTER snapshot of a legacy table must not show the added " +
        s"column: $preAlter")
  }

  test("DROP TABLE removes only a table that never held data — the " +
      "CTAS failure-cleanup path: a failed CTAS leaves NO stranded " +
      "table and the corrected CTAS retries cleanly") {
    catalogReady
    import spark.implicits._
    val dir = Files.createTempDirectory("graftct7").toString + "/t"
    // a CTAS whose write fails (NULL _version loses the fold-axis
    // guard) must clean up the created table via dropTable
    Seq((1L, "x", 5.0, Some(3L)), (2L, "y", 6.0, None))
      .toDF("id", "ticker", "price", "_version")
      .createOrReplaceTempView("graft_ct_bad_src")
    intercept[Exception](spark.sql(
      s"CREATE TABLE graft_ct.`$dir`.merge " +
        "TBLPROPERTIES (key_col 'id') AS " +
        "SELECT * FROM graft_ct_bad_src"))
    assert(!new java.io.File(s"$dir/_graft_table_meta.json").exists(),
      "a failed CTAS must not strand the created table")
    // the corrected CTAS retries cleanly on the same identifier
    spark.sql(s"CREATE TABLE graft_ct.`$dir`.merge " +
      "TBLPROPERTIES (key_col 'id') AS " +
      "SELECT * FROM graft_ct_bad_src WHERE _version IS NOT NULL")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_ct.`$dir`.merge")
      .head.getLong(0) == 1L)
    // DROP on a data-bearing table refuses loudly
    val e = intercept[Exception](spark.sql(
      s"DROP TABLE graft_ct.`$dir`.merge"))
    assert(chain(e).exists(m => m.contains("holds (or held) data") ||
      m.contains("out-of-band")), chain(e).mkString(" <- "))
    // DROP on a freshly created EMPTY table works, and CREATE reuses
    // the identifier
    val dir2 = Files.createTempDirectory("graftct8").toString + "/t"
    spark.sql(s"CREATE TABLE graft_ct.`$dir2`.merge " +
      "(id BIGINT, _version BIGINT) TBLPROPERTIES (key_col 'id')")
    spark.sql(s"DROP TABLE graft_ct.`$dir2`.merge")
    assert(!new java.io.File(s"$dir2/_graft_table_meta.json").exists())
    spark.sql(s"CREATE TABLE graft_ct.`$dir2`.merge " +
      "(id BIGINT, note STRING, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id')")
    assert(spark.sql(s"SELECT * FROM graft_ct.`$dir2`.merge")
      .schema.fieldNames.toSeq == Seq("id", "note", "_version"))
  }

  test("CREATE TABLE refuses: missing key_col, non-merge surfaces, " +
      "PARTITIONED BY, schema without _version or the key") {
    catalogReady
    val dir = Files.createTempDirectory("graftct4").toString
    def fails(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(chain(e).exists(_.toLowerCase.contains(needle.toLowerCase)),
        s"[$sql] -> ${chain(e).mkString(" <- ")}")
    }
    fails(s"CREATE TABLE graft_ct.`$dir/a`.merge (id BIGINT, _version " +
      "BIGINT)", "key_col")
    fails(s"CREATE TABLE graft_ct.`$dir/b`.`postings.doclen` " +
      "(id BIGINT, _version BIGINT) TBLPROPERTIES (key_col 'id')",
      "merge surface")
    fails(s"CREATE TABLE graft_ct.`$dir/c`.merge (id BIGINT, _version " +
      "BIGINT) PARTITIONED BY (id) TBLPROPERTIES (key_col 'id')",
      "PARTITIONED")
    fails(s"CREATE TABLE graft_ct.`$dir/d`.merge (id BIGINT) " +
      "TBLPROPERTIES (key_col 'id')", "_version")
    fails(s"CREATE TABLE graft_ct.`$dir/e`.merge (id BIGINT, _version " +
      "BIGINT) TBLPROPERTIES (key_col 'nope')", "key column")
    // none of the refusals left a table behind
    Seq("a", "b", "c", "d", "e").foreach { p =>
      assert(!new java.io.File(s"$dir/$p/_graft_table_meta.json").exists())
    }
  }

  test("CTAS is ATOMIC (round 15): a reader racing the statement sees " +
      "NO table until the commit, then the fully-loaded table — never " +
      "the created-empty intermediate") {
    catalogReady
    import spark.implicits._
    val dir = Files.createTempDirectory("graftct10").toString + "/t"
    // a deliberately slow source: each row sleeps, so the staged-write
    // window is wide enough to poll through
    spark.range(3).map { i =>
      Thread.sleep(2000); (i, s"t$i", i.toDouble, 10L)
    }.toDF("id", "ticker", "price", "_version")
      .createOrReplaceTempView("graft_ct_slow_src")
    @volatile var ctasErr: Option[Throwable] = None
    val t = new Thread(() =>
      try spark.sql(s"CREATE TABLE graft_ct.`$dir`.merge " +
        "TBLPROPERTIES (key_col 'id') AS " +
        "SELECT * FROM graft_ct_slow_src")
      catch { case e: Throwable => ctasErr = Some(e) })
    t.start()
    var sawAbsent = false
    var sawPartial: Option[Long] = None
    while (t.isAlive) {
      try {
        val n = spark.sql(
          s"SELECT count(*) AS n FROM graft_ct.`$dir`.merge")
          .head.getLong(0)
        if (n != 3L) sawPartial = Some(n)
      } catch { case _: Exception => sawAbsent = true }
      Thread.sleep(100)
    }
    t.join()
    ctasErr.foreach(throw _)
    assert(sawAbsent,
      "a reader during the CTAS window must see NO table (the " +
        "statement ran >2 s; absence was never observed)")
    assert(sawPartial.isEmpty,
      s"a reader observed a partial/empty table of $sawPartial rows — " +
        "CTAS must be creation + first load in ONE pointer move")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_ct.`$dir`.merge")
      .head.getLong(0) == 3L)
    assert(Apply.currentCommit(spark, dir) == 1L,
      "atomic CTAS: the table's FIRST commit already carries the data")
    // CTAS onto an existing table refuses BEFORE running the query
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE graft_ct.`$dir`.merge " +
        "TBLPROPERTIES (key_col 'id') AS " +
        "SELECT * FROM graft_ct_slow_src"))
    assert(chain(e).exists(m => m.contains("already") ||
      m.contains("TABLE_OR_VIEW_ALREADY_EXISTS")),
      chain(e).mkString(" <- "))
  }

  test("the DECLARATION is versioned (round 15): ALTER is its own " +
      "commit, VERSION AS OF serves the declaration as of that commit " +
      "— a pre-ALTER empty snapshot shows the pre-ALTER columns") {
    catalogReady
    val dir = Files.createTempDirectory("graftct9").toString + "/t"
    spark.sql(s"CREATE TABLE graft_ct.`$dir`.merge " +
      "(id BIGINT, price DOUBLE, _version BIGINT) " +
      "TBLPROPERTIES (key_col 'id')") // commit 0 (empty)
    spark.sql(s"INSERT INTO graft_ct.`$dir`.merge " +
      "VALUES (1, 1.0, 10)") // commit 1
    spark.sql(s"ALTER TABLE graft_ct.`$dir`.merge " +
      "ADD COLUMNS (region STRING)") // commit 2 — a real DDL commit
    assert(Apply.currentCommit(spark, dir) == 2L,
      "an ALTER must be its own ledgered commit")
    spark.sql(s"INSERT INTO graft_ct.`$dir`.merge " +
      "(id, price, _version, region) VALUES (2, 2.0, 10, 'emea')") // 3
    def colsAt(v: Long): Seq[String] = spark.sql(
      s"SELECT * FROM graft_ct.`$dir`.merge VERSION AS OF $v")
      .schema.fieldNames.toSeq
    // the EMPTY pre-ALTER snapshot: pre-ALTER declaration, no region
    assert(colsAt(0L) == Seq("id", "price", "_version"),
      s"AS OF 0 must show the CREATE-time declaration: ${colsAt(0L)}")
    // pre-ALTER data snapshot: physical schema, still no region
    assert(colsAt(1L) == Seq("id", "price", "_version"))
    // the ALTER commit itself: declaration widened, data unchanged —
    // region reads NULL on the commit-1 row
    assert(colsAt(2L) == Seq("id", "price", "_version", "region"),
      s"AS OF the ALTER commit must show the widened declaration: " +
        colsAt(2L))
    val at2 = spark.sql(s"SELECT id, region FROM graft_ct.`$dir`.merge " +
      "VERSION AS OF 2").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(at2 == Seq((1L, null)))
    // current: both rows, region carried by the late one
    val cur = spark.sql(s"SELECT id, region FROM graft_ct.`$dir`.merge " +
      "ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(cur == Seq((1L, null), (2L, "emea")))
    // the ALTER commit wrote NO change slice: the feed over its window
    // is empty (the fail-closed reader treats a missing slice dir as
    // "no logical change" — the compact/restore contract)
    val feed = spark.read.format("graft").option("path", dir)
      .option("table", "changes.merge")
      .option("sinceCommit", "1").option("untilCommit", "2").load()
    assert(feed.count() == 0L,
      "a DDL commit must contribute nothing to the change feed")
    // the declaration ledger is SQL-visible: one row per DDL commit
    val hist = spark.sql(
      s"CALL graft_ct.system.schema_history(store => '$dir')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist.map(_._1) == Seq(0L, 2L),
      s"schema_history must list the CREATE and the ALTER: $hist")
    assert(!hist.head._2.contains("region") &&
      hist.last._2.contains("region"),
      s"each row carries the declaration THAT commit published: $hist")
    // SHOW TBLPROPERTIES reports the invariants + current commit
    val props = spark.sql(
      s"SHOW TBLPROPERTIES graft_ct.`$dir`.merge").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("key_col").contains("id") &&
      props.get("buckets").contains("16") &&
      props.get("commit").contains("3"),
      s"introspection must surface key_col/buckets/commit: $props")
  }
}
