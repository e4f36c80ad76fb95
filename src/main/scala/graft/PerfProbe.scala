package graft

// Temporary stage-level timing probe (not part of the engine surface).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PerfProbe {
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
      println(f"PROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }
    time("warmup")(docs.count())
    time("q57 winnow (native kernel)") {
      graft.dedup.Dedup.winnowNearDups(docs, col("doc_id"), col("text"),
        minShared = 3, maxBucketSize = Int.MaxValue).count()
    }
    time("q41 ngram jaccard (doc_id<500)") {
      graft.dedup.Dedup.ngramJaccardPairs(
        docs.filter(col("doc_id") < 500), col("doc_id"), col("text"),
        col("source"), threshold = 0.08, shingleWidth = 3).count()
    }
    time("q41 ngram jaccard (2nd run)") {
      graft.dedup.Dedup.ngramJaccardPairs(
        docs.filter(col("doc_id") < 500), col("doc_id"), col("text"),
        col("source"), threshold = 0.08, shingleWidth = 3).count()
    }
    time("q41 sets pipeline only") {
      graft.dedup.Dedup.shingleRows(docs.filter(col("doc_id") < 500),
          col("doc_id"), col("text"), 3, carry = Seq("blk" -> col("source")))
        .groupBy(col("id"), col("blk"))
        .agg(sort_array(collect_set(xxhash64(col("sh")))).as("sh"))
        .agg(sum(size(col("sh")))).collect(); 0L
    }
    val setsCk = graft.dedup.Dedup.shingleRows(docs.filter(col("doc_id") < 500),
        col("doc_id"), col("text"), 3, carry = Seq("blk" -> col("source")))
      .groupBy(col("id"), col("blk"))
      .agg(sort_array(collect_set(xxhash64(col("sh")))).as("sh"))
      .localCheckpoint(true)
    time("q41 join from checkpointed sets") {
      val a = setsCk.select(col("id").as("a_id"), col("blk"), col("sh").as("a_sh"))
      val b = setsCk.select(col("id").as("b_id"), col("blk"), col("sh").as("b_sh"))
      a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
        .withColumn("jaccard",
          graft.functions.JaccardSorted.jaccard_sorted(col("a_sh"), col("b_sh")))
        .filter(col("jaccard") >= 0.08)
        .count()
    }
    spark.stop()
  }
}
