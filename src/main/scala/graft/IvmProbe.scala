package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{IncrementalAgg, IncrementalDistinct, IncrementalJoin}

/** Size sweep for the incremental-view-maintenance family (the
  * GraphProbe/AbProbe pattern): base relations at |base| ∈ {100k, 1M,
  * 4M} rows, a FIXED |Δ| = 1k change window, no RNG. What the probe
  * pins by measurement:
  *
  *   1. the per-commit FOLD cost against the maintained state vs the
  *      from-scratch recompute of the same view — the IVM economics;
  *   2. that the fold's shuffle volume is Δ-sized, not base-sized
  *      (the broadcast-merge fold, cdc.IvmFold, streams the state
  *      through broadcast probes of the delta; the union+re-aggregate
  *      form it replaced re-shuffled the whole bag every commit — both
  *      forms are measured here).
  *
  * The fold necessarily WRITES the new O(base) state (any view refresh
  * does); the saving is that nothing base-sized shuffles or re-joins.
  * Local wall time hides that saving — a single-JVM shuffle runs at
  * memory speed — so the probe ALSO counts SHUFFLE-WRITE RECORDS per
  * timed block (a SparkListener over stage task metrics): shuffled
  * records are what a 1000-executor cluster pays network and disk for,
  * and the fold's count must be Δ-sized while recompute's is
  * base-sized. Results are committed as a table in SURVEY §8.22.
  */
object IvmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shuffled = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffled.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      })

    val deltaN = 1000L
    println(f"${"base"}%9s ${"op"}%12s ${"variant"}%10s ${"rows"}%9s ${"shuffled"}%10s ${"sec"}%7s")
    for (n <- Seq(100000L, 1000000L, 4000000L)) {
      // deterministic synthetic tables: ~n/10 groups, values 0..99
      def rows(m: Long): DataFrame = spark.range(m)
        .select(col("id"), (col("id") % (n / 10)).as("k"),
          (col("id") % 100).as("v"))
      val base = rows(n).localCheckpoint(true)
      // the change window: deltaN inserts on existing keys + the same
      // keys' old values deleted — an update-heavy micro-batch
      val changes = rows(deltaN)
        .select(col("k"), col("v"), lit("insert").as("_change_type"))
        .unionByName(rows(deltaN)
          .select(col("k"), (col("v") + 1).as("v"),
            lit("delete").as("_change_type")))
        .localCheckpoint(true)

      // listener events are async; settle = wait until the counter has
      // been quiet for 200 ms (the bus API is private to Spark)
      def settle(): Unit = {
        var last = -1L
        while (shuffled.get() != last) {
          last = shuffled.get(); Thread.sleep(200)
        }
      }
      def time(op: String, variant: String)(out: => Long): Unit = {
        settle()
        shuffled.set(0L)
        val t0 = System.nanoTime()
        val r = out
        val sec = (System.nanoTime() - t0) / 1e9
        settle()
        println(f"$n%9d $op%12s $variant%10s $r%9d ${shuffled.get()}%10d $sec%7.2f")
      }

      // --- COUNT(DISTINCT) maintenance ------------------------------
      val bag = IncrementalDistinct.seed(base, col("k"), col("v"))
        .localCheckpoint(true)
      time("distinct", "fold") {
        IncrementalDistinct.applyDelta(bag, changes, col("k"), col("v")).count()
      }
      time("distinct", "unionfold") {
        val w = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
        val delta = changes.select(col("k").as("key"), col("v").as("value"), w.as("m"))
          .groupBy(col("key"), col("value")).agg(sum(col("m")).as("m"))
        bag.unionByName(delta)
          .groupBy(col("key"), col("value")).agg(sum(col("m")).as("m"))
          .filter(col("m") > 0).count()
      }
      time("distinct", "recompute") {
        // the live table after the window, recomputed from scratch
        base.select(col("k"), col("v"))
          .groupBy(col("k")).agg(countDistinct(col("v"))).count()
      }

      // --- SUM/COUNT maintenance ------------------------------------
      val agg = base.select(col("k").as("key"), col("v"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
        .localCheckpoint(true)
      time("agg", "fold") {
        IncrementalAgg.applyDelta(agg, changes.withColumnRenamed("k", "key"),
          col("key"), col("v")).count()
      }
      time("agg", "recompute") {
        base.select(col("k"), col("v"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("tot")).count()
      }

      // --- JOIN maintenance -----------------------------------------
      val st = IncrementalJoin.seed(
        base.select(col("k"), col("v")), col("k"), col("v"),
        base.select(col("k"), (col("v") + 7).as("v")), col("k"), col("v"))
      val stc = IncrementalJoin.State(
        st.a.localCheckpoint(true), st.b.localCheckpoint(true),
        st.joined.localCheckpoint(true))
      time("join", "fold") {
        IncrementalJoin.applyDelta(stc, changes.withColumnRenamed("k", "key"),
          changes.limit(0).withColumnRenamed("k", "key"),
          col("key"), col("v"), col("key"), col("v")).joined.count()
      }
      time("join", "recompute") {
        val a = base.select(col("k"), col("v"))
          .groupBy(col("k"), col("v")).agg(count(lit(1)).as("m"))
        val b = base.select(col("k"), (col("v") + 7).as("v"))
          .groupBy(col("k"), col("v")).agg(count(lit(1)).as("mb"))
        a.join(b.withColumnRenamed("v", "bv"), Seq("k")).count()
      }
    }
    spark.stop()
  }
}
