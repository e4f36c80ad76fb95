package graft.util

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.text.PostingsStore

/** Cross-process writer fencing (round-11 verdict #4): the JVM write
  * lock cannot see a second PROCESS, so "single-writer by contract" is
  * replaced with a lease-epoch fencing token checked at pointer-PUT
  * time. The spec's "two processes" are a thread inside the production
  * verb path ([[Maintenance.withLeasedWriteLock]] →
  * [[Generations.commitArchived]]) and a foreign claimant that calls
  * [[WriterLease.acquire]] directly — exactly what a second JVM would
  * execute, with none of this JVM's monitors shielding it. */
class WriterLeaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("lost-update race: a writer fenced mid-verb by a second process " +
      "fails LOUDLY at its pointer PUT and the store state is unchanged") {
    val dir = Files.createTempDirectory("leaserace").toString
    val meta = "_graft_test_meta.json"
    // committed baseline at commit 0 (a verb that ran to completion)
    Maintenance.withLeasedWriteLock("test", spark, dir) {
      Generations.commitArchived(spark, dir, meta,
        """{"format": "test-v1", "batch": 0, "commit": 0}""", 0L)
    }

    val verbEntered = new CountDownLatch(1)
    val foreignAcquired = new CountDownLatch(1)
    @volatile var verbError: Throwable = null
    // "process A": a verb that read the manifest, computed a fold, and
    // is about to publish — the foreign acquisition lands in between
    val a = new Thread(() => {
      try Maintenance.withLeasedWriteLock("test", spark, dir) {
        verbEntered.countDown()
        assert(foreignAcquired.await(30, TimeUnit.SECONDS))
        Generations.commitArchived(spark, dir, meta,
          """{"format": "test-v1", "batch": 1, "commit": 1}""", 1L)
      } catch { case t: Throwable => verbError = t }
    })
    a.start()
    assert(verbEntered.await(30, TimeUnit.SECONDS))
    // "process B" acquires the store (no JVM monitor involved — a
    // second JVM's entry point is exactly this call)
    val b = WriterLease.acquire(spark, dir)
    foreignAcquired.countDown()
    a.join(30000)

    assert(verbError != null, "the fenced writer must fail, not publish")
    assert(verbError.getMessage.contains("FENCED"),
      s"loud fencing error expected, got: ${verbError.getMessage}")
    // the loser's manifest never landed: pointer AND history still at 0
    val body = Generations.readPointer(spark, dir, meta).get
    assert(body.contains("\"commit\": 0"))
    assert(Generations.listCommits(spark, dir, meta) == Seq(0L))
    // the winner commits fine under its lease
    WriterLease.holding(b) {
      Generations.commitArchived(spark, dir, meta,
        """{"format": "test-v1", "batch": 1, "commit": 1}""", 1L)
    }
    assert(Generations.listCommits(spark, dir, meta) == Seq(0L, 1L))
  }

  test("epoch-collision token mismatch fails the commit loudly") {
    val dir = Files.createTempDirectory("leasetoken").toString
    val lease = WriterLease.acquire(spark, dir)
    // simulate the local-FS double-create collision: another claimant's
    // token ends up owning this epoch file
    Hfs.writeStringAtomic(
      new HPath(s"$dir/_graft_lease/epoch-${lease.epoch}"),
      "someone-elses-token", Hfs.conf(spark))
    val e = intercept[Exception](
      WriterLease.holding(lease) {
        Generations.commit(spark, dir, "_m.json", "{}")
      })
    assert(e.getMessage.contains("FENCED") &&
      e.getMessage.contains("token mismatch"))
  }

  test("no wedging: writers in two sessions hand the lease off " +
      "sequentially through a real store, every commit lands, and the " +
      "epoch ledger stays bounded") {
    val dir = Files.createTempDirectory("leasehandoff").toString
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") > 0).select(col("doc_id"), col("text"))
    // alternate writers; a crashed/stale previous holder never blocks
    // the next acquisition (no expiry to wait out)
    PostingsStore.maintainBatch(docs.filter(col("doc_id") <= 150),
      col("doc_id"), col("text"), dir, batchId = 0L)
    PostingsStore.maintainBatch(
      docs.filter(col("doc_id") > 150 && col("doc_id") <= 300),
      col("doc_id"), col("text"), dir, batchId = 1L)
    val m = PostingsStore.meta(spark, dir).get
    assert(m.batch == 1L && m.commit == 1L)
    assert(PostingsStore.commits(spark, dir) == Seq(0L, 1L))
    // epoch ledger pruned to a bounded window
    val epochs = Hfs.list(new HPath(s"$dir/_graft_lease"),
      Hfs.conf(spark)).length
    assert(epochs >= 1 && epochs <= 12, s"unbounded lease ledger: $epochs")
    // the two extra sessions are writers too: their verbs acquire fresh
    // epochs and commit — monotone handoff, no deadlock, no expiry wait
    PostingsStore.purgeDocs(s1, dir,
      s1.range(1, 2).toDF("id"))
    PostingsStore.compact(s2, dir)
    assert(PostingsStore.meta(spark, dir).get.commit > 1L)
  }
}
