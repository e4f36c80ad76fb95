package graft

// Temporary stage-level timing probe (not part of the engine surface).
// Round-16: binary-search the ~0.25 s/task fixed cost in agg stages
// over cached input (q108/q138 family).
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_PROBE_CACHE_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var taskTimeMs = 0L
    @volatile var gcMs = 0L
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
        gcMs += e.stageInfo.taskMetrics.jvmGCTime
        tasks += e.stageInfo.numTasks
      }
    })
    def time(name: String)(f: => Long): Unit = {
      taskTimeMs = 0; gcMs = 0; tasks = 0
      val t0 = System.nanoTime()
      val n = f
      Thread.sleep(120)
      println(f"PROBE $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s  task=${taskTimeMs / 1e3}%6.1f s  gc=${gcMs / 1e3}%5.1f s  ntask=$tasks%4d  (n=$n)")
    }
    val pairs = warehouse.GraphQueries.basketPairs(
        util.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey")
      .filter(col("n_ab") >= 2).persist()
    time("warm: pairs build+persist")(pairs.count())
    val e2 = pairs.select(col("u"), col("v"))
    time("A: cached scan only, no agg")(e2.count())
    time("B: union only")(
      e2.select(col("u").as("p")).unionAll(e2.select(col("v").as("p"))).count())
    time("C: one groupBy over cache") {
      e2.groupBy(col("u")).agg(count(lit(1))).count()
    }
    time("C2: one groupBy over cache (again)") {
      e2.groupBy(col("u")).agg(count(lit(1))).count()
    }
    time("D: union + groupBy") {
      e2.select(col("u").as("p")).unionAll(e2.select(col("v").as("p")))
        .groupBy(col("p")).agg(count(lit(1)).as("degree")).count()
    }
    time("E: D + second groupBy") {
      e2.select(col("u").as("p")).unionAll(e2.select(col("v").as("p")))
        .groupBy(col("p")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1))).count()
    }
    // same single groupBy but over a tiny parquet scan, for contrast
    val reg = spark.read.parquet(s"$sfDir/region.parquet")
    time("F: groupBy over 5-row parquet") {
      reg.groupBy(col("r_name")).agg(count(lit(1))).count()
    }
    // join shape (pagerank round): cache x small
    val deg = e2.select(col("u").as("src")).groupBy(col("src"))
      .agg(count(lit(1)).as("deg")).persist()
    deg.count()
    time("G: cache join cache (shuffle)") {
      e2.select(col("u").as("src"), col("v")).join(deg, Seq("src")).count()
    }
    // toggles around the HashAggregate fixed cost
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "false")
    time("H: C with twolevel map OFF") {
      e2.groupBy(col("u")).agg(count(lit(1))).count()
    }
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("I: C with wholeStage codegen OFF") {
      e2.groupBy(col("u")).agg(count(lit(1))).count()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // same agg over a 32-partition NON-cache input
    val rep = util.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).limit(4000)
      .repartition(32).localCheckpoint(true)
    time("J: groupBy over 32-part localCheckpoint") {
      rep.groupBy(col("l_orderkey")).agg(count(lit(1))).count()
    }
    time("J2: again") {
      rep.groupBy(col("l_orderkey")).agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
