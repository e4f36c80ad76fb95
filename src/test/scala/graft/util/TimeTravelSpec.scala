package graft.util

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ann.IndexStore
import graft.dedup.LedgerStore
import graft.text.{LmQueries, PostingsStore}
import graft.warehouse.GraphStore

/** Round-11 time travel on the slice stores (verdict #4): every pointer
  * commit archives under `_graft_history/commit-N.json`
  * ([[Generations.commitArchived]] — the Apply merge-table protocol one
  * level down), and each store's `loadAt`/`bm25QueryAt` resolves
  * through the archived manifest. Pinned here:
  *  - a PRE-PURGE snapshot still sees the purged rows while its slices
  *    survive (read inside the grace window);
  *  - read-after-vacuum FAILS LOUDLY (the purgeKeys fail-closed
  *    semantics — never a silent partial snapshot);
  *  - snapshot reads replay the recompute over the corpus as it was
  *    (q261 carries the oracle-gated face of the same claim).
  */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)
    .filter(col("doc_id") > 0).select(col("doc_id"), col("text"))
  private val terms = Seq("fast", "merge", "table")

  private def top(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("postings: snapshot BM25 ≡ as-it-was recompute; pre-purge " +
      "snapshot readable inside grace; vacuumed snapshot fails loudly") {
    val dir = Files.createTempDirectory("ttpostings").toString
    def slice(lo: Long, hi: Long) =
      docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
    PostingsStore.maintainBatch(slice(0, 300), col("doc_id"), col("text"),
      dir, batchId = 0L) // commit 0
    PostingsStore.maintainBatch(slice(300, 2000), col("doc_id"),
      col("text"), dir, batchId = 1L) // commit 1
    assert(PostingsStore.commits(spark, dir) == Seq(0L, 1L))
    // snapshot 0 ≡ recompute over batch-0 corpus, even though the
    // current pointer has folded past it
    assert(top(PostingsStore.bm25QueryAt(spark, dir, 0L, terms, 10)) ==
      top(LmQueries.bm25(slice(0, 300), col("doc_id"), col("text"),
        terms, 10)))
    // purge a top doc (commit 2): the PRE-PURGE snapshot 1 still sees it
    val victim = PostingsStore.bm25Query(spark, dir, terms, 10)
      .head().getLong(0)
    PostingsStore.purgeDocs(spark, dir, Seq(victim).toDF("doc_id"))
    assert(top(PostingsStore.bm25QueryAt(spark, dir, 1L, terms, 10)) ==
      top(LmQueries.bm25(slice(0, 2000), col("doc_id"), col("text"),
        terms, 10)),
      "the pre-purge snapshot must still see the purged doc")
    // compact (commit 3) + vacuum: snapshots 0–2 lose their dirs and
    // fail loudly; the current read stays exact
    PostingsStore.compact(spark, dir)
    PostingsStore.vacuumSlices(spark, dir)
    val e = intercept[IllegalArgumentException] {
      PostingsStore.bm25QueryAt(spark, dir, 0L, terms, 10).collect()
    }
    assert(e.getMessage.contains("no longer readable"))
    assert(top(PostingsStore.bm25Query(spark, dir, terms, 10)) ==
      top(LmQueries.bm25(
        slice(0, 2000).filter(col("doc_id") =!= victim),
        col("doc_id"), col("text"), terms, 10)))
    // an unknown snapshot id names the available ones
    val e2 = intercept[RuntimeException] {
      PostingsStore.bm25QueryAt(spark, dir, 99L, terms, 10)
    }
    assert(e2.getMessage.contains("no committed snapshot 99"))
  }

  test("a crashed vacuum fails snapshot reads loudly via the intent " +
      "marker; finishing the vacuum clears it") {
    val dir = Files.createTempDirectory("ttvacuumcrash").toString
    def slice(lo: Long, hi: Long) =
      docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
    PostingsStore.maintainBatch(slice(0, 200), col("doc_id"), col("text"),
      dir, batchId = 0L) // commit 0
    PostingsStore.maintainBatch(slice(200, 400), col("doc_id"),
      col("text"), dir, batchId = 1L) // commit 1
    PostingsStore.compact(spark, dir)  // commit 2, window [2,3)
    // simulate gcSlices dying mid-sweep: the intent marker is on disk
    // (cutoff = the current sliceBase) but some old slices survive
    Hfs.writeStringAtomic(
      new org.apache.hadoop.fs.Path(s"$dir/_graft_vacuum_intent.json"),
      """{"cutoff": 2}""", Hfs.conf(spark))
    val e = intercept[IllegalArgumentException] {
      PostingsStore.bm25QueryAt(spark, dir, 0L, terms, 10).collect()
    }
    assert(e.getMessage.contains("crashed mid-sweep"))
    // the CURRENT read is unaffected (its window starts at the cutoff)
    assert(PostingsStore.bm25Query(spark, dir, terms, 10).count() > 0)
    // re-running the vacuum finishes the sweep and clears the marker;
    // old snapshots now fail with the normal vacuumed message
    PostingsStore.vacuumSlices(spark, dir)
    assert(!new java.io.File(s"$dir/_graft_vacuum_intent.json").exists())
    val e2 = intercept[IllegalArgumentException] {
      PostingsStore.bm25QueryAt(spark, dir, 0L, terms, 10).collect()
    }
    assert(e2.getMessage.contains("no longer readable"))
  }

  test("ledger: loadAt returns the exact past labeling; generation " +
      "retention makes old snapshots fail loudly") {
    val dir = Files.createTempDirectory("ttledger").toString
    def slice(lo: Long, hi: Long) =
      docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
    LedgerStore.maintainBatch(slice(0, 150), col("doc_id"), col("text"),
      dir, batchId = 0L) // commit 0, gen 0
    val labels0 = LedgerStore.load(spark, dir)._1.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    LedgerStore.maintainBatch(slice(150, 300), col("doc_id"), col("text"),
      dir, batchId = 1L) // commit 1, gen 1
    assert(LedgerStore.commits(spark, dir) == Seq(0L, 1L))
    val (lblAt0, sigsAt0, mAt0) = LedgerStore.loadAt(spark, dir, 0L)
    assert(mAt0.gen == 0L)
    assert(lblAt0.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == labels0)
    assert(sigsAt0.count() == slice(0, 150).count())
    // default retainGens=2 keeps gens {1,2} after the next fold — gen 0
    // drops and snapshot 0 fails loudly
    assert(LedgerStore.maintainBatch(slice(300, 450), col("doc_id"),
      col("text"), dir, batchId = 2L).nonEmpty) // commit 2; gc cuts gen 0
    val e = intercept[IllegalArgumentException] {
      LedgerStore.loadAt(spark, dir, 0L)
    }
    assert(e.getMessage.contains("generation retention"))
    // the still-retained snapshot 1 reads fine
    assert(LedgerStore.loadAt(spark, dir, 1L)._3.gen == 1L)
  }

  test("graph: loadAt returns the exact past counts; pre-purge snapshot " +
      "sees purged baskets; vacuumed snapshot fails loudly") {
    val dir = Files.createTempDirectory("ttgraph").toString
    GraphStore.maintainBatch(
      Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("ord", "item"),
      col("ord"), col("item"), dir, batchId = 0L) // commit 0
    GraphStore.maintainBatch(
      Seq((3L, 10L), (3L, 11L)).toDF("ord", "item"),
      col("ord"), col("item"), dir, batchId = 1L) // commit 1
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs(GraphStore.loadAt(spark, dir, 0L)._2)
      == Set((10L, 11L, 2L)))
    assert(pairs(GraphStore.loadAt(spark, dir, 1L)._2)
      == Set((10L, 11L, 3L)))
    // purge basket 1 (commit 2): snapshot 1 still counts it
    GraphStore.purgeOrders(spark, dir, Seq(1L).toDF("ord"))
    assert(pairs(GraphStore.load(spark, dir)._2) == Set((10L, 11L, 2L)))
    assert(pairs(GraphStore.loadAt(spark, dir, 1L)._2)
      == Set((10L, 11L, 3L)))
    GraphStore.compact(spark, dir)
    GraphStore.vacuumSlices(spark, dir)
    val e = intercept[IllegalArgumentException] {
      GraphStore.loadAt(spark, dir, 0L)
    }
    assert(e.getMessage.contains("no longer readable"))
  }

  test("ivf: loadIvfAt probes the index as of a past commit; vacuumed " +
      "slice windows fail loudly") {
    val dir = Files.createTempDirectory("ttivf").toString
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("vid"), col("embedding").as("v"))
    IndexStore.ivfMaintainBatch(vecs.filter(col("vid") < 200),
      col("vid"), col("v"), dir, nCentroids = 4, batchId = 0L) // commit 0
    IndexStore.ivfMaintainBatch(
      vecs.filter(col("vid") >= 200 && col("vid") < 260),
      col("vid"), col("v"), dir, nCentroids = 4, batchId = 1L) // commit 1
    val (idxAt0, mAt0) = IndexStore.loadIvfAt(spark, dir, 0L)
    assert(mAt0.slices == 1L &&
      idxAt0.assigned.count() == vecs.filter(col("vid") < 200).count(),
      "snapshot 0 must probe exactly the seed vectors")
    IndexStore.compactAssigned(spark, dir) // commit 2
    IndexStore.vacuumAssignedSlices(spark, dir)
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadIvfAt(spark, dir, 0L)
    }
    assert(e.getMessage.contains("no longer readable"))
    // current read unaffected
    assert(IndexStore.loadIvf(spark, dir)._1.assigned.count()
      == vecs.filter(col("vid") < 260).count())
  }

  test("ivf-pq: loadIvfPqAt reads the composite index as of a past " +
      "commit; retention-dropped generations fail loudly") {
    val dir = Files.createTempDirectory("ttivfpq").toString
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("vid"), col("embedding").as("v"))
    IndexStore.ivfPqMaintainBatch(vecs.filter(col("vid") < 200),
      col("vid"), col("v"), dir, nCells = 4, m = 8, ksub = 16,
      batchId = 0L) // commit 0, gen 0
    IndexStore.ivfPqMaintainBatch(
      vecs.filter(col("vid") >= 200 && col("vid") < 230),
      col("vid"), col("v"), dir, nCells = 4, m = 8, ksub = 16,
      batchId = 1L) // commit 1, gen 1 (below doubling: frozen insert)
    assert(IndexStore.pqCommits(spark, dir) == Seq(0L, 1L))
    val (idx0, m0) = IndexStore.loadIvfPqAt(spark, dir, 0L)
    assert(m0.gen == 0L &&
      idx0.codes.count() == vecs.filter(col("vid") < 200).count(),
      "snapshot 0 must hold exactly the seed codes")
    // a third fold's retention GC (retainGens=2 keeps gens {1,2})
    // drops gen 0 — its snapshot fails loudly
    IndexStore.ivfPqMaintainBatch(
      vecs.filter(col("vid") >= 230 && col("vid") < 260),
      col("vid"), col("v"), dir, nCells = 4, m = 8, ksub = 16,
      batchId = 2L) // commit 2, gen 2
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadIvfPqAt(spark, dir, 0L)
    }
    assert(e.getMessage.contains("generation retention"))
    assert(IndexStore.loadIvfPqAt(spark, dir, 1L)._2.gen == 1L)
  }
}
