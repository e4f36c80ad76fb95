package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StressProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.1")
    val x20 = (0 until 20).map(i => docs.select((col("doc_id") * 20 + i).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val t0 = System.nanoTime()
    val n = graft.dedup.Dedup.simhashNearDups(x20, col("doc_id"), col("text"), maxHamming = 3).count()
    println(f"STRESS simhash x20: $n pairs in ${(System.nanoTime()-t0)/1e9}%.1f s")
    val t1 = System.nanoTime()
    val m = graft.dedup.Dedup.minhashNearDups(x20, col("doc_id"), col("text"), threshold = 0.5).count()
    println(f"STRESS minhash x20: $m pairs in ${(System.nanoTime()-t1)/1e9}%.1f s")
    spark.stop()
  }
}
