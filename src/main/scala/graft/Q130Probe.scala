package graft

// Stage-level timing for the q130 ×1.49 normalized regression flagged by
// the round-11 verdict (1.84 → 2.94 s at sf0.1, code-identical delta
// path): which of the three timed stages grew — delta shingling
// (minhashSigSets), the delta-vs-base band probe
// (minhashNearDupsDeltaFromSigs), or the label contraction
// (componentsIncremental)? Run warm (second repetition is the signal).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Q130Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.util.Tables.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }
    time("warm base (memo build)") {
      graft.text.TextQueries.incrementalBase(spark, sfDir).labels.count()
    }
    val base = graft.text.TextQueries.incrementalBase(spark, sfDir)
    val delta = docs.filter(!(col("doc_id") < base.cut))
    (1 to 2).foreach { i =>
      time(s"[$i] base.sigs probe (cached?)")(base.sigs.count())
      time(s"[$i] base.labels probe (cached?)")(base.labels.count())
      time(s"[$i] delta minhashSigSets") {
        graft.dedup.Dedup.minhashSigSets(delta, col("doc_id"), col("text"))
          .count()
      }
      val deltaSigs =
        graft.dedup.Dedup.minhashSigSets(delta, col("doc_id"), col("text"))
      time(s"[$i] delta band probe (FromSigs)") {
        graft.dedup.Dedup.minhashNearDupsDeltaFromSigs(
          base.sigs, deltaSigs, threshold = 0.5, bands = 16,
          maxBucketSize = Int.MaxValue).count()
      }
      val deltaPairs = graft.dedup.Dedup.minhashNearDupsDeltaFromSigs(
        base.sigs, deltaSigs, threshold = 0.5, bands = 16,
        maxBucketSize = Int.MaxValue)
      time(s"[$i] componentsIncremental") {
        graft.dedup.Dedup.componentsIncremental(base.labels, docs,
          col("doc_id"), deltaPairs, col("a_id"), col("b_id")).count()
      }
      time(s"[$i] full q130 line") {
        SparkEntry.queries("q130_incremental_components")(spark, sfDir)
          .count()
      }
    }
    spark.stop()
  }
}
