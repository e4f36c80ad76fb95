package graft
// Dev probe: what does the cross-substrate SET COMMIT cost on top of
// the store folds it wraps? Measures, at sf0.1:
//  - raw sequential per-store folds (ledger + postings) of a delta
//    batch with NO set commit — the pre-round-11 shape that can land
//    mutually inconsistent on a crash, vs
//  - PipelineLedger.refreshAll of the identical batch into identical
//    stores — the same folds plus ONE archived manifest PUT.
// The overhead claim: the atomic set costs O(1) metadata I/O per
// batch, not a data pass. The SkewProbe standard: recorded numbers,
// either direction.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.LedgerStore
import graft.text.PostingsStore
import graft.util.{PipelineLedger, Tables}

object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PIPEPROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val cut = docs.agg(max(col("doc_id"))).head.getLong(0) * 9 / 10
    val base = docs.filter(col("doc_id") < cut)
    val delta = docs.filter(!(col("doc_id") < cut))

    // the q262/q264 store set — shared so the probe measures exactly
    // what the gates exercise (round-11 review: a drifting copy here
    // would silently measure a different set)
    def stores(dir: String): Seq[PipelineLedger.Store] =
      graft.text.TextQueries.pipelineStores(dir)

    // both arms seed on the base OUTSIDE the measured window
    val rawDir = java.nio.file.Files.createTempDirectory("pipeprobe-raw").toString
    LedgerStore.maintainBatch(base, col("doc_id"), col("text"),
      s"$rawDir/ledger", batchId = 0L)
    PostingsStore.maintainBatch(base, col("doc_id"), col("text"),
      s"$rawDir/postings", batchId = 0L)
    val setDir = java.nio.file.Files.createTempDirectory("pipeprobe-set").toString
    PipelineLedger.refreshAll(spark, setDir, base, 0L, stores(setDir))

    time("raw per-store folds (no set commit)") {
      LedgerStore.maintainBatch(delta, col("doc_id"), col("text"),
        s"$rawDir/ledger", batchId = 1L)
      PostingsStore.maintainBatch(delta, col("doc_id"), col("text"),
        s"$rawDir/postings", batchId = 1L)
    }
    time("refreshAll (same folds + set commit)") {
      PipelineLedger.refreshAll(spark, setDir, delta, 1L, stores(setDir))
    }
    time("readSet (the set pointer)") {
      PipelineLedger.readSet(spark, setDir)
    }
    spark.stop()
  }
}
