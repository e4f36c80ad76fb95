package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-join A/B (the AbProbe pattern, for the equi-join cure family):
  * plain join vs full salting (`Scale.saltedJoin`) vs partial salting
  * (`Scale.skewJoin`) on (a) a pathologically skewed fact — half the
  * rows on ONE key — and (b) a uniform fact, each with AQE's runtime
  * skew mitigation on and off. Deterministic data, no RNG.
  *
  * What the sweep is expected to show (and SURVEY records):
  *  - plain + AQE-on handles the skewed SMJ fine — AQE re-splits the
  *    oversized partition; that is the honest baseline, and why
  *    `skewJoin` documents itself as the cure for the cases AQE can't
  *    touch (downstream same-key clustering, stream-stream, AQE off);
  *  - plain + AQE-off stragglers on the hot partition;
  *  - full salting fixes the straggler but taxes the UNIFORM case with
  *    a `salts`× build-side replication it never needed;
  *  - partial salting tracks salted on the skewed fact and plain on
  *    the uniform fact — the routing pays only where skew exists.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 16000000L
    val dimN = 200000L
    val dim = spark.range(dimN).select(col("id").as("k"),
      (col("id") % 97).as("attr")).localCheckpoint(true)
    // 3 of 4 rows on ONE key — a 12M-row join partition
    val skewed = spark.range(n).select(
      when(col("id") % 4 =!= 0, lit(0L)).otherwise(col("id") % dimN).as("k"),
      col("id").as("payload")).localCheckpoint(true)
    val uniform = spark.range(n).select((col("id") % dimN).as("k"),
      col("id").as("payload")).localCheckpoint(true)
    // codegen/JIT warmup outside every timed cell
    uniform.limit(100000).join(dim, "k").count()

    // the replication-tax case: a BUILD side too big to copy 16x
    val bigDim = spark.range(4000000L).select(col("id").as("k"),
      (col("id") % 97).as("attr")).localCheckpoint(true)

    println(f"${"fact"}%8s ${"dim"}%6s ${"mode"}%8s ${"aqeSkew"}%8s ${"rows"}%9s ${"sec"}%6s")
    for ((factName, fact, dimName, d) <- Seq(
           ("skewed", skewed, "200k", dim),
           ("uniform", uniform, "200k", dim),
           ("uniform", uniform, "4M", bigDim));
         aqe <- Seq(true, false);
         (mode, run) <- Seq[(String, () => DataFrame)](
           "plain" -> (() => fact.join(d, "k")),
           "salted" -> (() => graft.warehouse.Scale.saltedJoin(fact, d, "k", 16)),
           "partial" -> (() => graft.warehouse.Scale.skewJoin(fact, d, "k",
             salts = 16, hotThreshold = 1000000L)))) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        rows = run().count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$factName%8s $dimName%6s $mode%8s $aqe%8s $rows%9d $best%6.1f")
    }
    spark.stop()
  }
}
