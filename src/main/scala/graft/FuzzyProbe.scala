package graft
// Dev probe for q131 (editDistancePairs): where does the time go —
// candidate generation (segment equi-join + distinct) or the banded
// levenshtein verify — and does a lossless char-frequency pigeonhole
// pre-filter (round-8 verdict #5) pay for itself? The SkewProbe
// standard: measure, keep the negative result if it is one.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val p = graft.util.Tables.part(spark, sf)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm the table cache so stage deltas are honest
    p.count()
    val cand = graft.dedup.Dedup.editDistanceCandidates(
      p, col("p_partkey"), col("p_name"), col("p_brand"), k = 2)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val nCand = time("candidates+distinct")(cand.count())
      println(s"  candidates: $nCand")
      val nVer = time("candidates -> levenshtein")(
        cand.withColumn("dist", levenshtein(col("a_nm"), col("b_nm"), 2))
          .filter(col("dist") >= 0).count())
      println(s"  verified:   $nVer")
      val nPg = time("candidates -> pigeonhole")(
        cand.filter(graft.dedup.Dedup.charFreqL1(
          col("a_sig"), col("b_sig")) <= 4).count())
      println(s"  pigeonhole survivors: $nPg")
      val nBoth = time("pigeonhole -> levenshtein")(
        cand.filter(graft.dedup.Dedup.charFreqL1(
            col("a_sig"), col("b_sig")) <= 4)
          .withColumn("dist", levenshtein(col("a_nm"), col("b_nm"), 2))
          .filter(col("dist") >= 0).count())
      println(s"  verified after pigeonhole: $nBoth")
      // variant: verify BEFORE distinct — the banded DP is cheap per
      // candidate; deduping only the (smaller, narrower) match set may
      // beat shuffling 2M wide candidate rows through distinct
      val raw = graft.dedup.Dedup.editDistanceCandidatesRaw(
        p, col("p_partkey"), col("p_name"), col("p_brand"), k = 2)
      val nRaw = time("raw candidates (no distinct)")(raw.count())
      println(s"  raw candidates: $nRaw")
      val nVd = time("verify -> distinct")(
        raw.withColumn("dist", levenshtein(col("a_nm"), col("b_nm"), 2).cast("long"))
          .filter(col("dist") >= 0)
          .select(col("a_id"), col("b_id"), col("a_nm"), col("b_nm"), col("dist"))
          .distinct().count())
      println(s"  verified (verify-first): $nVd")
      val nLev = time("raw -> levenshtein (no distinct)")(
        raw.withColumn("dist", levenshtein(col("a_nm"), col("b_nm"), 2))
          .filter(col("dist") >= 0).count())
      println(s"  raw verified (with dups): $nLev")
      // variant: verify raw, distinct the bare id pair (16 bytes/row),
      // re-attach names by two broadcast joins, recompute dist on the
      // final 220k rows only
      val nNarrow = time("verify -> narrow distinct -> names")(
        raw.withColumn("dist", levenshtein(col("a_nm"), col("b_nm"), 2))
          .filter(col("dist") >= 0)
          .select(col("a_id"), col("b_id")).distinct()
          .join(broadcast(p.select(col("p_partkey").as("a_id"),
            col("p_name").as("a_name"))), Seq("a_id"))
          .join(broadcast(p.select(col("p_partkey").as("b_id"),
            col("p_name").as("b_name"))), Seq("b_id"))
          .withColumn("dist",
            levenshtein(col("a_name"), col("b_name"), 2).cast("long"))
          .count())
      println(s"  verified (narrow): $nNarrow")
      // variant: verify raw, then groupBy(a_id, b_id) with first()
      // aggregates — names/dist are functionally dependent on the ids,
      // map-side combine collapses duplicate alignments BEFORE the
      // shuffle, and no broadcast of the base table is assumed (the
      // narrow variant's re-attach join would shuffle the whole base
      // table once it outgrows a broadcast)
      val nGrp = time("verify -> groupBy first()")(
        raw.withColumn("dist", levenshtein(col("a_nm"), col("b_nm"), 2).cast("long"))
          .filter(col("dist") >= 0)
          .groupBy(col("a_id"), col("b_id"))
          .agg(first(col("a_nm")).as("a_name"), first(col("b_nm")).as("b_name"),
            first(col("dist")).as("dist"))
          .count())
      println(s"  verified (groupBy-first): $nGrp")
    }
    spark.stop()
  }
}
