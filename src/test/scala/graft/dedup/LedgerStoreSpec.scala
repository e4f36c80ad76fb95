package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** The persisted dedup ledger: the q130 maintenance invariant across
  * generations on disk (folded labels ≡ full recompute), exactly-once
  * batch folds, the frozen fold config, and the streaming face.
  */
class LedgerStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  // doc_id > 0: slices below are (lo, hi] ranges, so pin the corpus to
  // the same id space as the recompute ground truth
  private def docs = Tables.documents(spark, sf)
    .filter(col("doc_id") > 0)
    .select(col("doc_id"), col("text"))

  /** Full-recompute ground truth over `upTo` docs — q75's pipeline with
    * the ledger's exact config. */
  private def fullLabels(upTo: Long): Map[Long, Long] = {
    val d = docs.filter(col("doc_id") <= upTo)
    val pairs = Dedup.minhashNearDups(d, col("doc_id"), col("text"),
      threshold = 0.5, bands = 16, maxBucketSize = Int.MaxValue)
    val lbl = Dedup.components(pairs, col("a_id"), col("b_id"))
    d.join(lbl.select(col("id").as("doc_id"), col("comp")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def storedLabels(dir: String): Map[Long, Long] =
    LedgerStore.load(spark, dir)._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("batch folds maintain the q130 invariant on disk: stored labels " +
      "≡ full recompute after every generation; replays are no-ops") {
    val dir = Files.createTempDirectory("ledgerstore").toString
    def slice(lo: Long, hi: Long) =
      docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
    // seed on the first 200 docs
    assert(LedgerStore.maintainBatch(slice(0, 200), col("doc_id"),
      col("text"), dir, batchId = 0L).contains(0L))
    assert(storedLabels(dir) == fullLabels(200L))
    // fold 150 more: delta-sized work, invariant holds
    assert(LedgerStore.maintainBatch(slice(200, 350), col("doc_id"),
      col("text"), dir, batchId = 1L).contains(1L))
    assert(storedLabels(dir) == fullLabels(350L))
    // crash replay of batch 1: no-op, generation unchanged
    assert(LedgerStore.maintainBatch(slice(200, 350), col("doc_id"),
      col("text"), dir, batchId = 1L).isEmpty)
    assert(LedgerStore.load(spark, dir)._3.gen == 1L)
    // the rest of the corpus
    assert(LedgerStore.maintainBatch(slice(350, 1000), col("doc_id"),
      col("text"), dir, batchId = 2L).contains(2L))
    val m = LedgerStore.load(spark, dir)._3
    assert(m.rows == docs.count())
    assert(storedLabels(dir) == fullLabels(Long.MaxValue))
    // a mismatched fold config is refused, not silently mixed
    val e = intercept[IllegalArgumentException] {
      LedgerStore.maintainBatch(slice(0, 10), col("doc_id"), col("text"),
        dir, threshold = 0.7, batchId = 3L)
    }
    assert(e.getMessage.contains("one ledger, one signature family"))
  }

  test("postings fold path: identical pairs to the FromSigs form, and " +
      "the old side plans a partition-pruned posting scan") {
    val dir = Files.createTempDirectory("ledgerpost").toString
    LedgerStore.maintainBatch(docs.filter(col("doc_id") <= 400),
      col("doc_id"), col("text"), dir, batchId = 0L)
    val (_, sigs, m) = LedgerStore.load(spark, dir)
    // the live posting slices, as a fold reads them
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("slice") < m.slices).drop("slice")
    val deltaSigs = Dedup.minhashSigSets(
      docs.filter(col("doc_id") > 400), col("doc_id"), col("text"))
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPostings = Dedup.minhashNearDupsDeltaFromPostings(
      postings, sigs, deltaSigs, threshold = 0.5, bands = 16,
      maxBucketSize = Int.MaxValue, prefixes = m.prefixes)
    val viaSigs = Dedup.minhashNearDupsDeltaFromSigs(
      sigs, deltaSigs, threshold = 0.5, bands = 16,
      maxBucketSize = Int.MaxValue)
    assert(norm(viaPostings) == norm(viaSigs))
    // the layout's point: the old side is a static partition prune of
    // the posting table, not a full signature-store scan
    val plan = viaPostings.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bp".r.findFirstIn(plan).isDefined,
      s"posting scan not partition-pruned:\n${plan.take(1500)}")
  }

  test("streaming maintenance: the ledger follows the arriving corpus; " +
      "a loaded reader sees the full-recompute labeling") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("ledgerstream").toString
    val ckpt = Files.createTempDirectory("ledgerckpt").toString
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val ms = MemoryStream[(Long, String)]
    val q = LedgerStore.maintainStream(
      ms.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"),
      dir, ckpt)
    try {
      ms.addData(rows.take(250).toSeq: _*)
      q.processAllAvailable()
      assert(LedgerStore.load(spark, dir)._3.rows == 250L)
      ms.addData(rows.drop(250).toSeq: _*)
      q.processAllAvailable()
      assert(storedLabels(dir) == fullLabels(Long.MaxValue))
    } finally q.stop()
  }
}
