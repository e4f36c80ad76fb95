package graft
// Dev probe: times the named SparkEntry queries in order against sf0.1
// (repeat a name to separate cold-build from warm cost). graft.Bench is
// the driver-facing benchmark; this exists for single-query iteration.
import org.apache.spark.sql.SparkSession
object QuickTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // size-adaptive cached-plan partitioning (see Bench.scala)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sf).count()
      println(f"TIME $name%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s (n=$n)")
    }
    spark.stop()
  }
}
