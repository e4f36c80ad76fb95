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
    time("tokens+group(id,xxhash)") {
      docs.select(col("doc_id").as("id"), explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("id"), xxhash64(col("tok")).as("h")).agg(count(lit(1))).count()
    }
    time("tokens+group(id,portable)") {
      docs.select(col("doc_id").as("id"), explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("id"), graft.text.TextFunctions.portableTokenHash(col("tok")).as("h")).agg(count(lit(1))).count()
    }
    time("sigs(xxhash64) via Aggregator") {
      graft.dedup.Dedup.simhashSignatures(docs, col("doc_id"), col("text")).count()
    }
    time("sigs(portable) via Aggregator") {
      graft.dedup.Dedup.simhashSignatures(docs, col("doc_id"), col("text"),
        graft.text.TextFunctions.portableTokenHash).count()
    }
    time("q46 full (portable, lossless bands)") {
      graft.dedup.Dedup.simhashNearDups(docs, col("doc_id"), col("text"),
        maxHamming = 6, maxBucketSize = 1000000,
        tokenHash = graft.text.TextFunctions.portableTokenHash).count()
    }
    time("q45 full (r=1)") {
      graft.dedup.Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
        threshold = 0.5, bands = 16, maxBucketSize = 1000000).count()
    }
    time("q45 shingleRows") {
      graft.dedup.Dedup.shingleRows(docs, col("doc_id"), col("text"), 3).count()
    }
    time("q45 agg sets+sigs") {
      import graft.text.TextFunctions._
      graft.dedup.Dedup.shingleRows(docs, col("doc_id"), col("text"), 3)
        .withColumn("h", pmod(hash(col("sh")).cast("long"), lit(4294967296L)))
        .groupBy(col("id"))
        .agg(collect_set(xxhash64(col("sh"))).as("vset"),
          (0 until 16).map(j => min(pmod(col("h") * minhashA(j) + minhashB(j), lit(minhashP))).as(s"sig_$j")): _*)
        .count()
    }
    time("q45 candidates (r=1)") {
      graft.dedup.Dedup.minhashCandidates(docs, col("doc_id"), col("text"),
        bands = 16, maxBucketSize = 1000000).count()
    }
    spark.stop()
  }
}
