package graft

// Scale evidence for the round-12 CHANGE DATA FEED: a downstream
// consumer keeping up with a maintained store should pay DELTA-SIZED
// work per commit, not corpus-sized. Compare, at sf0.1 warm:
//  (a) the feed read of one fold commit (changes.postings.doclen,
//      (seed, seed+1]) — resolves to the fold's own slice dirs;
//  (b) the snapshot-diff alternative a feed-less consumer runs —
//      current doclen ANTI-JOIN the seed snapshot's doclen (both
//      resolved through format("graft") time travel), i.e. a full
//      two-snapshot scan + shuffle PER POLL regardless of delta size.
// Both produce the same delta rows; the feed's cost tracks the delta
// while the diff's tracks the corpus — the gap widens with corpus/delta
// ratio (at 100 TB with per-mille deltas it is the whole game).
// Run warm (second repetition is the signal).
//
// Round-12 numbers (sf0.1, local[32], warm): feed 0.31 s vs diff
// 0.51 s for the same 501 delta rows. The structural difference is
// what scales: the feed read opens ONE slice dir (delta-sized I/O,
// zero shuffle — the plan is a bare BatchScan), while the diff scans
// BOTH snapshots end-to-end and shuffles the anti-join — corpus-sized
// I/O per poll at a 9:1 corpus/delta ratio here, and unboundedly worse
// as the ratio grows.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object FeedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }
    // seed 90% (commit 0), fold the 10% delta (commit 1) — the q272 shape
    val docs = graft.util.Tables.documents(spark, sfDir)
    val cut = docs.agg(max(col("doc_id"))).head.getLong(0) * 9 / 10
    val dir = java.nio.file.Files.createTempDirectory("feedprobe").toString
    time("seed fold (90% corpus, commit 0)") {
      graft.text.PostingsStore.maintainBatch(docs.filter(col("doc_id") < cut),
        col("doc_id"), col("text"), dir, batchId = 0L)
      docs.filter(col("doc_id") < cut).count()
    }
    time("delta fold (10% delta, commit 1)") {
      graft.text.PostingsStore.maintainBatch(
        docs.filter(!(col("doc_id") < cut)),
        col("doc_id"), col("text"), dir, batchId = 1L)
      docs.filter(!(col("doc_id") < cut)).count()
    }
    (1 to 2).foreach { i =>
      time(s"[$i] (a) FEED read of commit 1") {
        spark.read.format("graft").option("path", dir)
          .option("table", "changes.postings.doclen")
          .option("sinceCommit", "0").load().count()
      }
      time(s"[$i] (b) SNAPSHOT DIFF current vs commit 0") {
        val cur = spark.read.format("graft").option("path", dir)
          .option("table", "postings.doclen").load()
        val seed = spark.read.format("graft").option("path", dir)
          .option("table", "postings.doclen").option("commit", "0").load()
        cur.select(col("id")).join(seed.select(col("id")),
          Seq("id"), "left_anti").count()
      }
    }
    spark.stop()
  }
}
