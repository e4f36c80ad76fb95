// quick scratch probe (not committed)
package graft
import org.apache.spark.sql.SparkSession
object JobLatencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    var t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.range(1).count())
    println(f"PROBE 100 trivial count jobs: ${(System.nanoTime()-t0)/1e9}%6.2f s")
    t0 = System.nanoTime()
    (1 to 50).foreach(_ => spark.range(1000).toDF("x").localCheckpoint(true))
    println(f"PROBE 50 localCheckpoints:    ${(System.nanoTime()-t0)/1e9}%6.2f s")
    t0 = System.nanoTime()
    (1 to 20).foreach(_ => spark.range(1000).toDF("x")
      .groupBy((org.apache.spark.sql.functions.col("x") % 10).as("k"))
      .count().count())
    println(f"PROBE 20 tiny shuffle jobs:   ${(System.nanoTime()-t0)/1e9}%6.2f s")
    spark.stop()
  }
}
