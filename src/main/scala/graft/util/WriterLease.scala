package graft.util

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** CROSS-PROCESS writer fencing for the persisted stores (round-11
  * verdict #4): [[Maintenance.withWriteLock]] serializes mutating verbs
  * within one JVM, but two PROCESSES writing the same store dir were
  * "single-writer by contract" — a contract a misconfigured second
  * pipeline silently breaks by clobbering the pointer (a LOST commit).
  * This replaces the contract with a fencing token:
  *
  *  - A monotone EPOCH ledger lives under `dir/_graft_lease/`: each
  *    `epoch-N` file is claimed with a no-overwrite create, so exactly
  *    one writer owns epoch N (its random token is the file body).
  *  - Every mutating verb ACQUIRES the next epoch on entry
  *    ([[Maintenance.withLease]] wires this into the store verbs).
  *  - Every pointer PUT ([[Generations.commit]]/`commitArchived`, the
  *    merge table's meta write) CHECKS the held lease first: if a newer
  *    epoch exists — another process acquired the store since this verb
  *    began — the PUT aborts LOUDLY instead of publishing a manifest
  *    computed from a stale read (the classic lost-update: both writers
  *    read commit C, both fold, the second PUT silently erases the
  *    first). The loser's work is discarded before it becomes the
  *    pointer; its replay (the stores' batch ledgers) lands on the
  *    winner's state.
  *
  * There is NO expiry and NO blocking: acquisition always succeeds by
  * bumping the epoch (fencing the previous holder), so a crashed writer
  * never wedges the store — the next writer just supersedes it. Two
  * live writers therefore ping-pong loudly rather than deadlock or
  * silently interleave; that is the intended failure mode for a
  * configuration error, not a supported topology.
  *
  * Honesty about plain-FS primitives: between the check and the PUT
  * there is a residual window no filesystem-only scheme closes (closing
  * it needs a put-if-absent commit object or an external CAS — the same
  * trade Delta Lake's LogStore documents for S3). The window is
  * microseconds against verbs that run for seconds, and every detected
  * conflict fails loudly; on HDFS-like stores the epoch claim itself is
  * atomic server-side.
  */
object WriterLease {

  private val LeaseDir = "_graft_lease"
  private val EpochRe = "epoch-([0-9]+)".r
  /** Epoch files below max-KeepEpochs are pruned on acquire. */
  private val KeepEpochs = 8L

  final case class Lease(dir: String, epoch: Long, token: String)

  /** One canonical spelling per store dir — lease keys must match
    * between a verb's acquire site (raw user string) and the pointer-
    * PUT check site (which may hold a Hadoop `Path` round-trip). */
  private def norm(dir: String): String = new HPath(dir).toString

  private def leasePath(dir: String, epoch: Long) =
    new HPath(s"$dir/$LeaseDir/epoch-$epoch")

  private def epochsOf(dir: String,
      hc: org.apache.hadoop.conf.Configuration): Seq[Long] =
    Hfs.list(new HPath(s"$dir/$LeaseDir"), hc)
      .toSeq.map(_.getPath.getName)
      .collect { case EpochRe(n) => n.toLong }.sorted

  /** Claim the next epoch for `dir` — always succeeds (bounded retries
    * absorb concurrent claimants racing for the same number), fencing
    * any previous holder at ITS next pointer PUT. */
  def acquire(spark: SparkSession, dir: String): Lease = {
    val hc = Hfs.conf(spark)
    val nd = norm(dir)
    val token = java.util.UUID.randomUUID().toString
    var next = epochsOf(nd, hc).lastOption.map(_ + 1).getOrElse(0L)
    var won = false
    var attempts = 0
    while (!won) {
      attempts += 1
      require(attempts <= 50,
        s"could not claim a writer lease for $nd after 50 epochs — " +
          "pathological contention; is a tight loop acquiring this store?")
      try { Hfs.createExclusive(leasePath(nd, next), token, hc); won = true }
      catch { case _: java.io.IOException => next += 1 }
    }
    // prune ancient epochs (bounded ledger; never the one just claimed)
    epochsOf(nd, hc).filter(_ < next - KeepEpochs)
      .foreach(e => Hfs.delete(leasePath(nd, e), hc))
    Lease(nd, next, token)
  }

  /** Fail loudly if `lease` is no longer the NEWEST claim on its dir —
    * called immediately before every pointer PUT. */
  def check(lease: Lease,
      hc: org.apache.hadoop.conf.Configuration): Unit = {
    val newest = epochsOf(lease.dir, hc).lastOption.getOrElse(
      sys.error(s"writer lease ledger for ${lease.dir} vanished while " +
        s"epoch ${lease.epoch} was held — refusing to commit blind"))
    require(newest <= lease.epoch, s"FENCED: this writer's lease on " +
      s"${lease.dir} (epoch ${lease.epoch}) was superseded by epoch " +
      s"$newest — another process acquired the store after this verb " +
      "began. Aborting the commit to avoid publishing a manifest " +
      "computed from a stale read; re-run the verb (store batch " +
      "ledgers make replays safe).")
    val held = Hfs.readString(leasePath(lease.dir, lease.epoch), hc)
    require(held == lease.token, s"FENCED: writer lease epoch " +
      s"${lease.epoch} on ${lease.dir} is held by another process " +
      "(token mismatch — two claimants collided on one epoch; exactly " +
      "one owns it). Aborting the commit; re-run the verb.")
  }

  // ---- held-lease propagation to the pointer-PUT site ----
  // The verb's body (fold/purge/compact/vacuum) runs on the caller's
  // thread and performs the pointer PUT on that same thread, so a
  // ThreadLocal map from store dir to held lease lets Generations.commit
  // validate without threading a Lease through every store signature.

  private val held = new ThreadLocal[Map[String, Lease]] {
    override def initialValue(): Map[String, Lease] = Map.empty
  }

  /** The lease this thread holds for `dir`, if inside [[holding]]. */
  def heldFor(dir: String): Option[Lease] = held.get.get(norm(dir))

  /** Run `body` with `lease` registered for pointer-PUT checks on this
    * thread (reentrancy and nested different-dir verbs both compose —
    * the map is per-thread and restored on exit). */
  def holding[T](lease: Lease)(body: => T): T = {
    val prev = held.get
    held.set(prev + (lease.dir -> lease))
    try body finally held.set(prev)
  }

  /** [[check]] the lease this thread holds for `dir`, if any — the hook
    * [[Generations.commit]]/`commitArchived` and the merge table's meta
    * writer call before every pointer PUT. Verbs outside
    * [[Maintenance.withLeasedWriteLock]] (single-writer utilities,
    * tests) carry no lease and skip the check. */
  def checkHeld(dir: String,
      hc: org.apache.hadoop.conf.Configuration): Unit =
    heldFor(dir).foreach(check(_, hc))

  /** [[checkHeld]] resolving the Hadoop conf from the session. */
  def checkHeld(spark: SparkSession, dir: String): Unit =
    checkHeld(dir, Hfs.conf(spark))
}
