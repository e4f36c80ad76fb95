package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Duplication-factor sweep for the signature-class dedup pipelines
  * (round-3 roadmap #7): one row per (dup factor, algorithm) so the
  * class-collapse behavior is pinned by data, not anecdote. ×f replicates
  * every document f times under fresh ids — the adversarial regime for
  * LSH banding, where identical signatures flood their buckets. Results
  * are committed as a table in SURVEY §8.13.
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.1")
      .localCheckpoint(true) // sweep timings must not re-read parquet
    println(f"${"dup"}%4s ${"docs"}%7s ${"algo"}%8s ${"pairs"}%10s ${"sec"}%7s")
    for (f <- Seq(1, 5, 20)) {
      val xf =
        if (f == 1) docs.select(col("doc_id"), col("text"))
        else (0 until f).map(i =>
            docs.select((col("doc_id") * f + i).as("doc_id"), col("text")))
          .reduce(_ unionByName _)
      val nDocs = xf.count()
      def run(algo: String)(pairs: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = pairs
        println(f"x$f%-3d $nDocs%7d $algo%8s $n%10d ${(System.nanoTime() - t0) / 1e9}%7.1f")
      }
      run("simhash") {
        graft.dedup.Dedup.simhashNearDups(
          xf, col("doc_id"), col("text"), maxHamming = 3).count()
      }
      var minhashPairs: org.apache.spark.sql.DataFrame = null
      run("minhash") {
        minhashPairs = graft.dedup.Dedup.minhashNearDups(
          xf, col("doc_id"), col("text"), threshold = 0.5)
        minhashPairs.count()
      }
      // the ledger step downstream of pair generation: a ×f duplicate
      // storm multiplies EDGES quadratically but components stay few and
      // near-clique — rounds must not grow with f (min-label convergence
      // is diameter-bound, not size-bound)
      run("comps") {
        graft.dedup.Dedup.components(
          minhashPairs, col("a_id"), col("b_id")).count()
      }
      run("winnow") {
        graft.dedup.Dedup.winnowNearDups(
          xf, col("doc_id"), col("text"), minShared = 3).count()
      }
      // substring-span dedup (q87): a duplicate storm multiplies every
      // window's row set ×f — the min<max cross-doc test and the
      // map-side-combined window groupBy must stay count-shaped, not
      // pair-shaped (output = spans, which dup factors don't multiply)
      run("spans") {
        graft.dedup.Dedup.repeatedSpans(
          xf, col("doc_id"), col("text")).count()
      }
    }
    spark.stop()
  }
}
