package graft
// Dev probe: does the persisted IVF layout (IndexStore — assigned
// partitioned by cell) actually cut I/O? Measures task-level input
// bytes/records for the partition-pruned probe vs the join-form probe
// over the SAME persisted index at sf0.1. The SkewProbe standard:
// recorded numbers, either direction.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.{IndexStore, Similarity}
import graft.util.Tables

object IndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = java.nio.file.Files.createTempDirectory("indexprobe").toString
    val embs = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
    val idx = Similarity.buildIvf(embs, col("vec_id"), col("embedding"),
      nCentroids = 16, iterations = 1, materialize = true)
    IndexStore.saveIvf(idx, dir)
    val (loaded, meta) = IndexStore.loadIvf(spark, dir)
    val query = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("q")).localCheckpoint(true)

    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val recs = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        bytes.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
        recs.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
      }
    }
    def measure(label: String)(f: => Unit): Unit = {
      bytes.set(0); recs.set(0)
      spark.sparkContext.addSparkListener(listener)
      try { f; Thread.sleep(1000) } // listener events are async
      finally spark.sparkContext.removeSparkListener(listener)
      println(f"INDEXPROBE $label%-24s bytesRead=${bytes.get()}%9d recordsRead=${recs.get()}%7d")
    }
    println(s"index: rows=${meta.rows} cells=16 nprobe=2")
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      measure("pruned (PartitionFilters)") {
        IndexStore.searchPruned(loaded, query, k = 10, nprobe = 2).collect()
      }
      measure("join-form (full scan)") {
        Similarity.ivfSearch(loaded, query, k = 10, nprobe = 2).collect()
      }
    }

    // --- fold WRITE volume (round-10 v2 slice-append): a frozen-insert
    // fold should write ~delta-sized output, not a corpus rewrite ---
    val wBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val wRecs = new java.util.concurrent.atomic.AtomicLong(0L)
    val wListener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        wBytes.addAndGet(sc.stageInfo.taskMetrics.outputMetrics.bytesWritten)
        wRecs.addAndGet(sc.stageInfo.taskMetrics.outputMetrics.recordsWritten)
      }
    }
    def measureW(label: String)(f: => Unit): Unit = {
      wBytes.set(0); wRecs.set(0)
      spark.sparkContext.addSparkListener(wListener)
      try { f; Thread.sleep(1000) }
      finally spark.sparkContext.removeSparkListener(wListener)
      println(f"INDEXPROBE $label%-28s bytesWritten=${wBytes.get()}%9d recordsWritten=${wRecs.get()}%7d")
    }
    val mDir = java.nio.file.Files.createTempDirectory("indexprobe-maint").toString
    measureW("seed fold (train, 90%)") {
      IndexStore.ivfMaintainBatch(embs.filter(col("vec_id") % 10 =!= 0),
        col("vec_id"), col("embedding"), mDir, nCentroids = 16, batchId = 0L)
    }
    measureW("insert fold (10% delta slice)") {
      IndexStore.ivfMaintainBatch(embs.filter(col("vec_id") % 10 === 0),
        col("vec_id"), col("embedding"), mDir, nCentroids = 16, batchId = 1L)
    }
    spark.stop()
  }
}
