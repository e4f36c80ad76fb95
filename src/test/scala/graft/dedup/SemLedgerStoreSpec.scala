package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** The persisted semantic ledger: the q244 maintenance invariant across
  * generations on disk (stored pairs AND labels ≡ full recompute),
  * exactly-once folds, frozen hyperplane config.
  */
class SemLedgerStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def embs = Tables.embeddings(spark, sf)
    .filter(col("vec_id") > 0)
    .select(col("vec_id"), col("embedding"))

  private def fullState(upTo: Long): (Set[(Long, Long)], Map[Long, Long]) = {
    val e = embs.filter(col("vec_id") <= upTo)
    val pairs = Dedup.lshNearDups(e, col("vec_id"), col("embedding"),
      nBands = 4, planesPerBand = 4, dim = 64, threshold = 0.25)
    val lbl = Dedup.components(pairs, col("a_id"), col("b_id"))
    val full = e
      .join(lbl.select(col("id").as("vec_id"), col("comp")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("comp"), col("vec_id")).as("comp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, full)
  }

  private def stored(dir: String): (Set[(Long, Long)], Map[Long, Long]) = {
    val (_, pairs, labels, _) = SemLedgerStore.load(spark, dir)
    (pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("folds maintain the q244 invariant on disk: stored pairs and " +
      "labels ≡ full recompute after every generation") {
    val dir = Files.createTempDirectory("semledger").toString
    def slice(lo: Long, hi: Long) =
      embs.filter(col("vec_id") > lo && col("vec_id") <= hi)
    assert(SemLedgerStore.maintainBatch(slice(0, 250), col("vec_id"),
      col("embedding"), dir, batchId = 0L).contains(0L))
    val (p1, l1) = stored(dir)
    val (fp1, fl1) = fullState(250L)
    assert(p1 == fp1 && l1 == fl1)
    assert(SemLedgerStore.maintainBatch(slice(250, 499), col("vec_id"),
      col("embedding"), dir, batchId = 1L).contains(1L))
    val (p2, l2) = stored(dir)
    val (fp2, fl2) = fullState(499L)
    assert(p2 == fp2, s"pair drift: extra=${(p2 -- fp2).take(5)} " +
      s"missing=${(fp2 -- p2).take(5)}")
    assert(l2 == fl2)
    assert(SemLedgerStore.load(spark, dir)._4.rows == embs.count())
    // replay no-op + frozen config refusal
    assert(SemLedgerStore.maintainBatch(slice(250, 499), col("vec_id"),
      col("embedding"), dir, batchId = 1L).isEmpty)
    val e = intercept[IllegalArgumentException] {
      SemLedgerStore.maintainBatch(slice(0, 5), col("vec_id"),
        col("embedding"), dir, threshold = 0.5, batchId = 2L)
    }
    assert(e.getMessage.contains("one hyperplane family"))
  }

  test("upsertVecs (embedding refresh): updated vectors retire their " +
      "old copies and re-pair atomically, deletes leave, stats and " +
      "labels equal the full recompute over the refreshed corpus; " +
      "replays are no-ops; compact preserves the state") {
    val dir = Files.createTempDirectory("semupsert").toString
    assert(SemLedgerStore.maintainBatch(embs, col("vec_id"),
      col("embedding"), dir, batchId = 0L).contains(0L))

    // refresh: %10 vectors re-embed (negated — flips buckets AND
    // cosines), %17 non-updated vectors delete
    val updated = embs.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    import spark.implicits._
    val removes = embs.filter(col("vec_id") % 17 === 0 &&
      col("vec_id") % 10 =!= 0).select(col("vec_id"))
    assert(SemLedgerStore.upsertVecs(updated, col("vec_id"),
      col("embedding"), removes, dir, batchId = 1L).nonEmpty)

    // the simulated post-refresh corpus, recomputed from scratch
    val corpus = embs.filter(!(col("vec_id") % 17 === 0 &&
        col("vec_id") % 10 =!= 0))
      .filter(col("vec_id") % 10 =!= 0)
      .unionByName(updated)
    val pairsFull = Dedup.lshNearDups(corpus, col("vec_id"),
      col("embedding"), nBands = 4, planesPerBand = 4, dim = 64,
      threshold = 0.25)
    val lblFull = Dedup.components(pairsFull, col("a_id"), col("b_id"))
    val expLabels = corpus
      .join(lblFull.select(col("id").as("vec_id"), col("comp")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("comp"), col("vec_id")).as("comp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expPairs = pairsFull.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored(dir) == ((expPairs, expLabels)))
    assert(SemLedgerStore.meta(spark, dir).get.rows == expLabels.size)

    // replay of the upsert batch is a no-op
    assert(SemLedgerStore.upsertVecs(updated, col("vec_id"),
      col("embedding"), removes, dir, batchId = 1L).isEmpty)
    assert(stored(dir) == ((expPairs, expLabels)))

    // compact applies the masks physically; state identical after
    assert(SemLedgerStore.compact(spark, dir).nonEmpty)
    assert(SemLedgerStore.vacuumSlices(spark, dir) > 0)
    assert(stored(dir) == ((expPairs, expLabels)))
  }

  test("purgeVecs: decremental semantic maintenance — affected " +
      "components relabel from stored vectors, pair reads exclude " +
      "tombstones, compact makes removal physical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("semledgerpurge").toString
    def slice(lo: Long, hi: Long) =
      embs.filter(col("vec_id") > lo && col("vec_id") <= hi)
    def fullRemaining(gone: Set[Long]): (Set[(Long, Long)], Map[Long, Long]) = {
      val e = embs.filter(!col("vec_id").isin(gone.toSeq.map(java.lang.Long.valueOf): _*))
      val pairs = Dedup.lshNearDups(e, col("vec_id"), col("embedding"),
        nBands = 4, planesPerBand = 4, dim = 64, threshold = 0.25)
      val lbl = Dedup.components(pairs, col("a_id"), col("b_id"))
      val full = e
        .join(lbl.select(col("id").as("vec_id"), col("comp")),
          Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("comp"), col("vec_id")).as("comp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet, full)
    }
    SemLedgerStore.maintainBatch(slice(0, 499), col("vec_id"),
      col("embedding"), dir, batchId = 0L)
    val byComp = stored(dir)._2.groupBy(_._2)
    val multi = byComp.values.find(_.size >= 2)
      .getOrElse(fail("fixture needs a multi-vec component")).keys.toSeq.sorted
    val singleton = byComp.values.find(_.size == 1).get.keys.head
    val gone = Set(multi.head, singleton)
    assert(SemLedgerStore.purgeVecs(spark, dir,
      gone.toSeq.toDF("vec_id")).nonEmpty)
    val (fp, fl) = fullRemaining(gone)
    val (sp, sl) = stored(dir)
    assert(sp == fp, "stored pairs must exclude every pair touching a tombstone")
    assert(sl == fl, "post-purge labels must equal the recompute on remaining")
    // no-op re-purge
    assert(SemLedgerStore.purgeVecs(spark, dir,
      (gone + 999999L).toSeq.toDF("vec_id")).isEmpty)
    // compact: identity + physical removal (the tombstone slice counts
    // toward the window, so a purge alone makes the store compactable)
    assert(SemLedgerStore.compact(spark, dir).nonEmpty)
    val m = SemLedgerStore.load(spark, dir)._4
    val raw = spark.read.parquet(s"$dir/vecs")
      .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(gone.forall(!raw(_)),
      "compact must rewrite the store without the purged vectors")
    SemLedgerStore.vacuumSlices(spark, dir)
    val (_, slAfter) = stored(dir)
    assert(gone.forall(!slAfter.contains(_)))
  }

  test("compact: slice window merges, pairs/labels identical, replay " +
      "ledger preserved, vacuum retires superseded slices") {
    val dir = Files.createTempDirectory("semledgercompact").toString
    def slice(lo: Long, hi: Long) =
      embs.filter(col("vec_id") > lo && col("vec_id") <= hi)
    SemLedgerStore.maintainBatch(slice(0, 200), col("vec_id"),
      col("embedding"), dir, batchId = 0L)
    SemLedgerStore.maintainBatch(slice(200, 350), col("vec_id"),
      col("embedding"), dir, batchId = 1L)
    SemLedgerStore.maintainBatch(slice(350, 499), col("vec_id"),
      col("embedding"), dir, batchId = 2L)
    val (beforePairs, beforeLabels) = stored(dir)
    val nVecs = SemLedgerStore.load(spark, dir)._1.count()
    assert(SemLedgerStore.load(spark, dir)._4.slices == 3L)
    assert(SemLedgerStore.compact(spark, dir).contains(3L))
    val m = SemLedgerStore.load(spark, dir)._4
    assert(m.sliceBase == 3L && m.slices == 4L && m.batch == 2L)
    val (afterPairs, afterLabels) = stored(dir)
    assert(afterPairs == beforePairs && afterLabels == beforeLabels)
    assert(SemLedgerStore.load(spark, dir)._1.count() == nVecs)
    // replay of the last folded batch stays a no-op through the compact
    assert(SemLedgerStore.maintainBatch(slice(350, 499), col("vec_id"),
      col("embedding"), dir, batchId = 2L).isEmpty)
    // superseded slices stay until vacuum; vacuum removes them cleanly
    assert(new java.io.File(s"$dir/vecs/slice=0").exists())
    assert(SemLedgerStore.vacuumSlices(spark, dir) == 6)
    assert(!new java.io.File(s"$dir/vecs/slice=0").exists())
    val (vp, vl) = stored(dir)
    assert(vp == beforePairs && vl == beforeLabels)
  }
}
