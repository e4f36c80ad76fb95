package graft

// The overwrite family's 100 TB story, measured (round 15): REPLACE
// WHERE's cost must track the REPLACED REGION, not the table — the
// region scan is a pruned parquet read (cond pushed to the scan, two
// columns plus cond's), the batch stages only the region's rows, and
// the fold rewrites only the buckets those keys hash into — while the
// full INSERT OVERWRITE is honestly O(table) (that is what the verb
// asks for). This probe stands up a 64-bucket latest-state table from
// the sf0.1 events corpus through SQL, then times:
//   A. REPLACE WHERE of ONE key's region    (1 bucket rewritten)
//   B. REPLACE WHERE of a ~10% key range    (region-sized work)
//   C. full INSERT OVERWRITE                (all buckets — baseline)
// Warm min-of-3 per statement with fresh version epochs per pass (the
// stale gate rejects non-advancing versions by design). The change
// slice row counts are the structural evidence independent of host
// timing: each statement moves exactly its region.
//
// MEASURED (round 15, sf0.1 events → 1,500 distinct keys, 64 buckets,
// local[32]):
//   seed INSERT (latest state, all buckets)   7.63 s
//   A. REPLACE WHERE one key (1 bucket)   min 2.42 s (4.04 2.52 2.42)
//   B. REPLACE WHERE ~10% key range       min 2.92 s (3.55 3.01 2.92)
//   C. full INSERT OVERWRITE (baseline)   min 3.09 s (3.09 3.42 3.42)
//   slice rows (what each statement MOVED): A = 1, B = 150, C = 1,500
// Reading: timings are monotone in region size with the ~2 s
// per-statement constant dominating at toy scale (the RowLevelProbe
// pattern); the scaling claim rests on the structural lines — the
// slice sizes ARE the region sizes, and the fold rewrites only the
// region's buckets.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object OverwriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.graft_probe",
      classOf[graft.sources.GraftCatalog].getName)
    val base = java.nio.file.Files.createTempDirectory("graftowprobe")
      .toString
    val dir = s"$base/t"
    spark.sql(s"CREATE TABLE graft_probe.`$dir`.merge (" +
      "user_id BIGINT, event_type STRING, value DOUBLE, " +
      "_version BIGINT) TBLPROPERTIES (key_col 'user_id', buckets '64')")
    graft.util.Tables.events(spark, sfDir)
      .createOrReplaceTempView("ow_probe_events")
    val latest = "SELECT user_id, event_type, value, event_id FROM (" +
      "SELECT *, row_number() OVER (PARTITION BY user_id " +
      "ORDER BY event_id DESC) AS rn FROM ow_probe_events) WHERE rn = 1"
    val t0 = System.nanoTime()
    spark.sql(s"INSERT INTO graft_probe.`$dir`.merge " +
      s"SELECT user_id, event_type, value, event_id FROM ($latest)")
    println(f"PROBE seed INSERT (latest state, all buckets) " +
      f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
    val (minKey, maxKey) = {
      val r = spark.sql(
        "SELECT min(user_id), max(user_id) FROM ow_probe_events").head
      (r.getLong(0), r.getLong(1))
    }
    val p10 = minKey + (maxKey - minKey) / 10
    // epochs are GLOBALLY monotone across statement families: region
    // statements overlap keys (minKey lives inside the 10% range and
    // the full table), so a later family must outrank every earlier
    // pass or the stale gate rejects it — by design
    var epochCounter = 0L
    def minOf3(what: String)(body: Long => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        epochCounter += 1
        val e = epochCounter * 1000000L
        val t0 = System.nanoTime()
        body(e)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $what%-40s min ${ts.min}%6.2f s  " +
        s"(runs ${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    minOf3("A. REPLACE WHERE one key (1 bucket)") { epoch =>
      spark.sql(s"INSERT INTO graft_probe.`$dir`.merge " +
        s"REPLACE WHERE user_id = $minKey " +
        s"SELECT user_id, event_type, value, event_id + $epoch " +
        s"FROM ($latest) WHERE user_id = $minKey")
    }
    minOf3("B. REPLACE WHERE ~10% key range") { epoch =>
      spark.sql(s"INSERT INTO graft_probe.`$dir`.merge " +
        s"REPLACE WHERE user_id <= $p10 " +
        s"SELECT user_id, event_type, value, event_id + $epoch " +
        s"FROM ($latest) WHERE user_id <= $p10")
    }
    minOf3("C. full INSERT OVERWRITE (baseline)") { epoch =>
      spark.sql(s"INSERT OVERWRITE graft_probe.`$dir`.merge " +
        s"SELECT user_id, event_type, value, event_id + $epoch " +
        s"FROM ($latest)")
    }
    // structural evidence independent of host timing: the rows each
    // statement actually moved (its commit's change slice)
    val last = graft.cdc.Apply.currentCommit(spark, dir)
    // commits: seed=1, A=2..4, B=5..7, C=8..10
    Seq(("A (last)", last - 6), ("B (last)", last - 3),
      ("C (last)", last)).foreach { case (what, c) =>
      val n = spark.read.format("graft").option("path", dir)
        .option("table", "changes.merge")
        .option("sinceCommit", (c - 1).toString)
        .option("untilCommit", c.toString).load().count()
      println(f"PROBE slice rows $what%-24s $n%8d")
    }
    spark.stop()
  }
}
