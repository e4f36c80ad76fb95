package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Generations

/** Persisted TEXT DEDUP LEDGER with incremental maintenance — the
  * [[graft.ann.IndexStore]] discipline applied to the repo's most-probed
  * maintained state (the q75/q130 pairs→components pipeline): the
  * per-document canonical labeling and the MinHash signature store live
  * on disk as generation-stamped parquet, a batch of NEW documents folds
  * in with DELTA-SIZED work (delta shingling → delta pairs against the
  * stored signatures, [[Dedup.minhashNearDupsDeltaFromSigs]] — no
  * old×old candidate work, no base re-shingling → label contraction,
  * [[Dedup.componentsIncremental]]), and each fold publishes through the
  * one-object atomic manifest-pointer commit with deferred GC. The
  * streaming face is exactly-once via the batch-id ledger (the
  * IndexStore contract). LedgerStoreSpec pins the q130 invariant across
  * the store: folded labels ≡ a full recompute over all documents.
  *
  * Layout (v3 — slice-appended stores with a compactable window):
  * {{{
  *   dir/_graft_ledger_meta.json  <- the pointer (+ frozen fold config
  *                                   + the live slice window)
  *   dir/sigs/slice=B/            <- parquet (id, vset, sig_0..sig_{k-1})
  *   dir/postings/slice=B/bp=P/   <- parquet (bucket, id)
  *   dir/gen=G/labels/            <- parquet (id, comp)
  * }}}
  *
  * The signature and posting stores are APPEND-ONLY IMMUTABLE SLICES —
  * one per fold, written before the pointer commit; the manifest's
  * slice window `[sliceBase, slices)` is what makes them live (a
  * crashed fold's orphan slice is invisible: readers prune to the
  * window). A fold therefore WRITES only its delta slice plus the
  * labels, instead of rewriting the whole signature/posting store into
  * every generation — at 100 TB that is the difference between
  * delta-sized maintenance I/O and a full-store copy per micro-batch.
  * At streaming cadence the window still accretes one slice per fold,
  * so [[compact]] periodically rewrites it into one merged slice
  * (advancing `sliceBase` atomically) and [[vacuumSlices]] retires the
  * superseded dirs after a grace window. The labels table is the one
  * full rewrite per fold (2 longs/doc): a contraction can relabel ANY
  * old document, so the labeling is inherently global state.
  *
  * The postings tree is the production fold layout
  * ([[Dedup.minhashPostings]]): a delta fold reads ONLY the partition
  * prefixes its bucket keys touch (a bounded driver fetch of ≤
  * `prefixes` ints drives static partition pruning on `bp`, composing
  * with the `slice` liveness prune) instead of re-deriving band keys
  * from a full signature-store scan — the scan volume tracks the
  * delta's bucket spread, not the corpus.
  *
  * The fold config (threshold‰, k, bands) freezes at seed time and rides
  * the manifest: a ledger is only meaningful under ONE signature family,
  * so later folds refuse a mismatched config instead of silently mixing
  * incompatible pair sets.
  */
object LedgerStore {

  private val MetaName = "_graft_ledger_meta.json"
  // v4 (round 11): + commit id / history archive.
  // v5 (round 12): SLICE-ORDERED tombstones — a purged/slice=S row
  // masks only sig/posting rows with slice < S, so [[upsertDocs]] can
  // retire a document's old copy and land its re-ingested one in ONE
  // atomic commit (the postings-v3 / semantic-v5 rule). Pure purge
  // flows read identically; cross-build reads fail loudly as a
  // version mismatch.
  private val Format = "graft-dedup-v5"

  /** v3 (round 10): `sliceBase` — the live slice window's lower bound.
    * [[compact]] rewrites the live slices `[sliceBase, slices)` into one
    * merged slice and advances the base past them in a single pointer
    * commit, so long-running [[maintainStream]] folds no longer grow an
    * unbounded slice/partition-dir population that every `liveSigs`
    * union must open (the round-9 "thousands of slices per day" gap).
    * Retired slices stay on disk for readers holding the pre-compact
    * pointer until an explicit [[vacuumSlices]] — the Apply
    * compact-then-deferred-GC contract. */
  /** Since round 11 every meta also carries `commit` — the monotone
    * snapshot id behind [[loadAt]]/[[commits]] time travel (pointer
    * bodies archive under `_graft_history/` via
    * [[Generations.commitArchived]]). */
  final case class Meta(format: String, gen: Long, rows: Long, batch: Long,
      thresholdPerMille: Int, k: Int, bands: Int, prefixes: Int,
      maxBucket: Int, sliceBase: Long, slices: Long, commit: Long)

  private val MetaRe =
    ("""\{"format": "([^"]+)", "gen": ([0-9]+), "rows": ([0-9]+), """ +
      """"batch": (-?[0-9]+), "thresholdPerMille": ([0-9]+), """ +
      """"k": ([0-9]+), "bands": ([0-9]+), "prefixes": ([0-9]+), """ +
      """"maxBucket": ([0-9]+), """ +
      """"sliceBase": ([0-9]+), "slices": ([0-9]+), """ +
      """"commit": ([0-9]+)\}""").r

  private def parseMeta(dir: String, body: String): Meta = body match {
    case MetaRe(f, g, n, b, t, k, bd, px, mb, sb, sl, c) =>
      Meta(f, g.toLong, n.toLong, b.toLong, t.toInt, k.toInt, bd.toInt,
        px.toInt, mb.toInt, sb.toLong, sl.toLong, c.toLong)
    case other => sys.error(
      Generations.unparseableMsg(s"$dir (ledger manifest)", other, Format))
  }

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    Generations.readPointer(spark, dir, MetaName).map(parseMeta(dir, _))

  private def commitMeta(spark: SparkSession, dir: String, m: Meta): Unit =
    Generations.commitArchived(spark, dir, MetaName,
      s"""{"format": "$Format", "gen": ${m.gen}, "rows": ${m.rows}, """ +
        s""""batch": ${m.batch}, """ +
        s""""thresholdPerMille": ${m.thresholdPerMille}, """ +
        s""""k": ${m.k}, "bands": ${m.bands}, """ +
        s""""prefixes": ${m.prefixes}, "maxBucket": ${m.maxBucket}, """ +
        s""""sliceBase": ${m.sliceBase}, """ +
        s""""slices": ${m.slices}, """ +
        s""""commit": ${m.commit}}""",
      m.commit)

  /** Tombstoned doc ids (the [[purgeDocs]] ledger): slices in the live
    * window; empty when no purge ever ran OR every tombstone slice has
    * been vacuumed (the dir then exists but holds no slice dirs —
    * schema inference would fail on it). */
  private def livePurged(spark: SparkSession, dir: String,
      m: Meta): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/purged")
    val hc = graft.util.Hfs.conf(spark)
    val hasSlices = graft.util.Hfs.exists(p, hc) &&
      graft.util.Hfs.list(p, hc).exists(_.getPath.getName.startsWith("slice="))
    if (hasSlices)
      spark.read.parquet(s"$dir/purged")
        .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
        .select(col("id"), col("slice").cast("long").as("_tomb"))
    else {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("id", "_tomb")
    }
  }

  /** The LIVE signature store under the v5 SLICE-ORDERED mask: a
    * tombstone at slice S masks only copies OLDER than it — an
    * [[upsertDocs]] re-landed signature (data slice above its own
    * tombstone) stays visible; pure purges read exactly as v4. */
  private def liveSigs(spark: SparkSession, dir: String, m: Meta): DataFrame = {
    val tomb = livePurged(spark, dir, m)
      .select(col("id").as("_tid"), col("_tomb"))
    spark.read.parquet(s"$dir/sigs")
      .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
      .join(tomb, col("id") === col("_tid") && col("_tomb") > col("slice"),
        "left_anti")
      .drop("slice")
  }

  private def livePostings(spark: SparkSession, dir: String,
      m: Meta): DataFrame = {
    val tomb = livePurged(spark, dir, m)
      .select(col("id").as("_tid"), col("_tomb"))
    spark.read.parquet(s"$dir/postings")
      .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
      .join(tomb, col("id") === col("_tid") && col("_tomb") > col("slice"),
        "left_anti")
      .drop("slice")
  }

  /** Write ONE fold's outputs: the delta slice (sigs + bp-partitioned
    * postings — immutable, appended under `slice=<meta.slices-1>`), the
    * new FULL labels generation, then the pointer commit that makes all
    * of it live at once; deferred GC on label generations only (slices
    * are the store). */
  private def publish(spark: SparkSession, dir: String, labels: DataFrame,
      deltaSigs: DataFrame, deltaPostings: DataFrame, meta: Meta,
      retainGens: Int): Long = {
    val sliceId = meta.slices - 1
    // claim the id: a crashed PURGE may have left an orphan tombstone
    // slice here, which this fold's commit would otherwise make live
    // (round-10 ADVICE — the claimSlice contract)
    Generations.claimSlice(spark, dir, Seq("purged"), sliceId)
    deltaSigs.write.mode("overwrite")
      .parquet(s"$dir/sigs/slice=$sliceId")
    deltaPostings.write.mode("overwrite").partitionBy("bp")
      .parquet(s"$dir/postings/slice=$sliceId")
    labels.write.mode("overwrite").parquet(s"$dir/gen=${meta.gen}/labels")
    val n = spark.read.parquet(s"$dir/gen=${meta.gen}/labels").count()
    commitMeta(spark, dir, meta.copy(rows = n, commit = meta.commit + 1))
    Generations.gc(spark, dir, meta.gen - (retainGens - 1))
    meta.gen
  }

  /** OPTIMIZE for the slice stores (round-9 verdict #2, the
    * [[graft.cdc.Apply.compact]] analog): rewrite the live slice window
    * into ONE merged slice per store and advance `sliceBase` past the
    * old slices through the same atomic pointer commit — labels, batch
    * ledger, and fold config ride along unchanged, so replay safety and
    * data identity are preserved (LedgerStoreSpec pins both). Readers
    * holding the pre-compact pointer keep scanning their intact slices
    * until [[vacuumSlices]]; a crash before the commit leaves an orphan
    * merged slice that is invisible (outside every committed window) and
    * gets overwritten by the next compact. Returns the merged slice id,
    * or None when the window already holds ≤ 1 slice. */
  def compact(spark: SparkSession, dir: String): Option[Long] = {
    // purge/fold/compact serialize on the per-(store, dir) monitor
    // (round-11 verdict #5); cross-process stays single-writer
    graft.util.Maintenance.withLeasedWriteLock("LedgerStore", spark, dir) {
    readMeta(spark, dir) match {
      case Some(m) if m.slices - m.sliceBase > 1 =>
        val merged = m.slices
        Generations.claimSlice(spark, dir, Seq("purged"), merged)
        liveSigs(spark, dir, m).write.mode("overwrite")
          .parquet(s"$dir/sigs/slice=$merged")
        livePostings(spark, dir, m).write.mode("overwrite").partitionBy("bp")
          .parquet(s"$dir/postings/slice=$merged")
        commitMeta(spark, dir,
          m.copy(sliceBase = merged, slices = merged + 1,
            commit = m.commit + 1))
        Some(merged)
      case _ => None
    }
    }
  }

  /** Deferred slice GC: delete slice dirs strictly below the CURRENT
    * manifest's `sliceBase` — non-live under the current and every later
    * pointer. Run after a grace window once pre-compact readers have
    * moved on (the Apply deferred-GC contract). Returns dirs removed. */
  def vacuumSlices(spark: SparkSession, dir: String): Int =
    readMeta(spark, dir).map { m =>
      Generations.gcSlices(spark, dir, Seq("sigs", "postings", "purged"),
        m.sliceBase)
    }.getOrElse(0)

  /** DECREMENTAL ledger maintenance — delete documents from the
    * persisted dedup state (the [[graft.cdc.Apply.purgeKeys]]
    * right-to-be-forgotten verb for the LLM-pipeline substrate; round
    * 10). Deletion is the hard direction of IVM for a components
    * labeling: removing a doc can SPLIT its component, so the affected
    * components relabel from their remaining members' stored signatures
    * — delta-sized work (pairs among the affected members only; every
    * other component is untouched, because components are closed under
    * the pair relation, so no cross-component pair can appear).
    * EXACTNESS CAVEAT: that closure argument needs the UNCAPPED profile
    * (`maxBucket = Int.MaxValue`, the oracle default); under a
    * hot-bucket cap a dropped cross-component pair could exist, and the
    * decremental relabel is the same best-effort the capped forward
    * fold already is.
    *
    * Mechanics: the purged ids land as a TOMBSTONE slice
    * (`purged/slice=S` — the sig/posting slices stay immutable; every
    * live read anti-joins the tombstones), the relabeled labels publish
    * as the next generation, and one atomic pointer commit makes both
    * visible. Later folds cannot pair against purged docs (their
    * postings are tombstone-filtered). PHYSICAL removal lands at
    * [[compact]]: the merged slice is written from the tombstone-
    * filtered live view, and the superseded tombstones fall out of the
    * window with the old slices ([[vacuumSlices]] then deletes the
    * bytes). Purging ids that are absent (or already purged) is a
    * no-op. Returns the published generation. */
  def purgeDocs(spark: SparkSession, dir: String, docIds: DataFrame,
      retainGens: Int = 2): Option[Long] = {
    graft.util.Maintenance.withLeasedWriteLock("LedgerStore", spark, dir) {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed ledger at $dir (missing $MetaName)"))
    val labels = spark.read.parquet(s"$dir/gen=${m.gen}/labels")
    val targets = docIds.select(docIds.columns.head)
      .toDF("id").distinct()
      .join(labels.select(col("id")), Seq("id"), "left_semi")
      .localCheckpoint(true)
    if (targets.isEmpty) return None
    // affected components and their REMAINING members
    val comps = labels.join(targets, Seq("id"), "left_semi")
      .select(col("comp")).distinct()
    val members = labels.join(comps, Seq("comp"), "left_semi")
      .join(targets, Seq("id"), "left_anti")
      .select(col("id"))
    // relabel the affected members from their stored signatures: pairs
    // among the members (the FromSigs form with an empty old side is
    // exactly "all pairs within"), then min-label components
    val sigsM = liveSigs(spark, dir, m)
      .join(members, Seq("id"), "left_semi").localCheckpoint(true)
    val pairs = Dedup.minhashNearDupsDeltaFromSigs(
      sigsM.limit(0), sigsM,
      m.thresholdPerMille / 1000.0, m.k, m.bands,
      maxBucketSize = m.maxBucket)
    val lbl = Dedup.components(pairs, col("a_id"), col("b_id"))
    val relabeled = members
      .join(lbl.select(col("id"), col("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    val newLabels = labels.join(comps, Seq("comp"), "left_anti")
      .select(col("id"), col("comp"))
      .unionByName(relabeled)
    // tombstone slice + labels generation + one atomic commit. Claim the
    // id first: a crashed fold's orphan data slices here must not become
    // live when this commit advances the window.
    val sliceId = m.slices
    Generations.claimSlice(spark, dir, Seq("sigs", "postings"), sliceId)
    targets.write.mode("overwrite").parquet(s"$dir/purged/slice=$sliceId")
    val gen = m.gen + 1
    newLabels.write.mode("overwrite").parquet(s"$dir/gen=$gen/labels")
    val n = spark.read.parquet(s"$dir/gen=$gen/labels").count()
    commitMeta(spark, dir,
      m.copy(gen = gen, rows = n, slices = sliceId + 1,
        commit = m.commit + 1))
    Generations.gc(spark, dir, gen - (retainGens - 1))
    Some(gen)
    }
  }

  /** DOCUMENT RE-INGEST (round 12) — [[graft.dedup.SemLedgerStore
    * .upsertVecs]]'s text twin, completing the ledger side of the
    * upsert matrix: a changed document retires its OLD signature, lands
    * the NEW one, re-pairs against the post-purge corpus, and relabels
    * affected components — atomically, in one ledgered commit (the v5
    * slice-ordered mask keeps the re-landed copy visible above its own
    * tombstone; purge-then-fold as two verbs would leave the crash
    * window where a replay purges the re-landed copy). `removeIds`
    * deletes outright; ids in both re-land. Exactness inherits
    * [[purgeDocs]]'s closure caveat: the relabel is exact in the
    * UNCAPPED profile. Returns the new generation (None for replays /
    * fully-empty batches). */
  def upsertDocs(upserts: DataFrame, id: Column, text: Column,
      removeIds: DataFrame, dir: String, retainGens: Int = 2,
      batchId: Long = -1L): Option[Long] = {
    val spark = upserts.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("LedgerStore", spark, dir) {
    val m = readMeta(spark, dir).getOrElse(sys.error(
      s"no committed ledger at $dir — upsertDocs updates an existing " +
        "ledger; seed with maintainBatch first"))
    if (batchId >= 0 && batchId <= m.batch) return None
    // one live row per id (ADVICE r12): exact duplicates collapse,
    // conflicting re-ingests fail loudly — two copies in one sig slice
    // would both sit above the tombstone and both stay visible
    val docs = graft.util.Maintenance.requireUniqueUpserts(
      upserts.select(id.as("doc_id"), text.as("text")), "doc_id",
      "dedup-ledger").localCheckpoint(true)
    // ids in both upserts and removeIds re-land (the upsert wins)
    val rem = removeIds.select(removeIds.columns.head).toDF("id")
      .distinct()
      .join(docs.select(col("doc_id").as("id")), Seq("id"), "left_anti")
      .localCheckpoint(true)
    if (docs.isEmpty && rem.isEmpty) {
      recordEmptyBatch(spark, dir, Some(m), batchId); return None
    }
    val threshold = m.thresholdPerMille / 1000.0
    val labels = spark.read.parquet(s"$dir/gen=${m.gen}/labels")
    val targets = docs.select(col("doc_id").as("id")).unionByName(rem)
      .distinct()
      .join(labels.select(col("id")), Seq("id"), "left_semi")
      .localCheckpoint(true)
    // PURGE PHASE (against the pre-commit state): affected components
    // relabel from their remaining members' stored signatures
    val comps = labels.join(targets, Seq("id"), "left_semi")
      .select(col("comp")).distinct()
    val members = labels.join(comps, Seq("comp"), "left_semi")
      .join(targets, Seq("id"), "left_anti")
      .select(col("id"))
    val sigsM = liveSigs(spark, dir, m)
      .join(members, Seq("id"), "left_semi").localCheckpoint(true)
    val pairsM = Dedup.minhashNearDupsDeltaFromSigs(
      sigsM.limit(0), sigsM, threshold, m.k, m.bands,
      maxBucketSize = m.maxBucket)
    val lblM = Dedup.components(pairsM, col("a_id"), col("b_id"))
    val relabeled = members
      .join(lblM.select(col("id"), col("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    val labelsAfterPurge = labels.join(comps, Seq("comp"), "left_anti")
      .select(col("id"), col("comp"))
      .unionByName(relabeled).localCheckpoint(true)
    val sigsAfterPurge = liveSigs(spark, dir, m)
      .join(targets, Seq("id"), "left_anti")
    val postingsAfterPurge = livePostings(spark, dir, m)
      .join(targets, Seq("id"), "left_anti")
    // FOLD PHASE: the new signatures pair against the post-purge corpus
    // through the pruned posting path (the maintainBatch production fold)
    val deltaSigs = Dedup.minhashSigSets(docs, col("doc_id"), col("text"),
      k = m.k).localCheckpoint(true)
    val deltaPairs = Dedup.minhashNearDupsDeltaFromPostings(
      postingsAfterPurge, sigsAfterPurge, deltaSigs, threshold, m.k,
      m.bands, maxBucketSize = m.maxBucket, prefixes = m.prefixes)
      .localCheckpoint(true)
    val allIds = labelsAfterPurge.select(col("id"))
      .unionByName(docs.select(col("doc_id").as("id"))).distinct()
    val newLabels = Dedup.componentsIncremental(
      labelsAfterPurge, allIds, col("id"), deltaPairs,
      col("a_id"), col("b_id"))
    // WRITES: tombstone slice first (the mask covers only OLDER
    // slices), sig/posting slices above it, labels, ONE commit
    var next = m.slices
    if (!targets.isEmpty) {
      Generations.claimSlice(spark, dir, Seq("sigs", "postings"), next)
      targets.write.mode("overwrite").parquet(s"$dir/purged/slice=$next")
      next += 1
    }
    if (!docs.isEmpty) {
      Generations.claimSlice(spark, dir, Seq("purged"), next)
      deltaSigs.write.mode("overwrite").parquet(s"$dir/sigs/slice=$next")
      Dedup.minhashPostings(deltaSigs, m.k, m.bands, m.prefixes)
        .select(col("bucket"), col("id"), col("bp"))
        .write.mode("overwrite").partitionBy("bp")
        .parquet(s"$dir/postings/slice=$next")
      next += 1
    }
    if (next == m.slices) { // nothing live to retire, nothing to land
      recordEmptyBatch(spark, dir, Some(m), batchId); return None
    }
    val gen = m.gen + 1
    newLabels.write.mode("overwrite").parquet(s"$dir/gen=$gen/labels")
    val n = spark.read.parquet(s"$dir/gen=$gen/labels").count()
    commitMeta(spark, dir, m.copy(gen = gen, rows = n, batch = batchId,
      slices = next, commit = m.commit + 1))
    Generations.gc(spark, dir, gen - (retainGens - 1))
    Some(gen)
    }
  }

  /** Load the current state: (labels (id, comp), LIVE signature store
    * — the slice union, liveness-pruned — and meta). Probe-ready —
    * `labels` is the q75-shaped ledger face. */
  def load(spark: SparkSession, dir: String): (DataFrame, DataFrame, Meta) = {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed ledger at $dir (missing $MetaName)"))
    require(m.format == Format, s"$dir holds '${m.format}', expected $Format")
    (spark.read.parquet(s"$dir/gen=${m.gen}/labels"),
      liveSigs(spark, dir, m), m)
  }

  /** The current manifest, for callers pinning snapshots
    * ([[graft.util.PipelineLedger]]) without loading the frames. */
  def meta(spark: SparkSession, dir: String): Option[Meta] =
    readMeta(spark, dir)

  /** Committed snapshot ids available for [[loadAt]], ascending. */
  def commits(spark: SparkSession, dir: String): Seq[Long] =
    Generations.listCommits(spark, dir, MetaName)

  /** The archived manifest of snapshot `commit`. */
  /** CHANGE-FEED resolution (round 12 — `changes.ledger.{sigs,
    * postings,purged}` through `format("graft")`): the slice dirs
    * commits `(since, until]` appended — signature replication,
    * bucket-posting replication, deletion propagation; compacts emit
    * nothing; labels rewrite per generation and are not feed-able. */
  def changeDirs(spark: SparkSession, dir: String, sub: String,
      since: Long, until: Long): (Seq[String], String) = {
    require(Set("sigs", "postings", "purged")(sub),
      s"unknown ledger table '$sub'")
    Generations.changeSliceDirs(spark, dir, sub,
      Seq("sigs", "postings", "purged"),
      c => if (c < 0L) (0L, 0L) else {
        val m = metaAt(spark, dir, c); (m.sliceBase, m.slices)
      }, since, until)
  }

  def metaAt(spark: SparkSession, dir: String, commit: Long): Meta =
    parseMeta(s"$dir@$commit",
      Generations.readPointerAt(spark, dir, MetaName, commit).getOrElse(sys.error(
        s"$dir has no committed snapshot $commit " +
          s"(available: ${commits(spark, dir).mkString(", ")})")))

  /** TIME-TRAVEL [[load]] — the ledger AS OF a committed snapshot id
    * (labels, live signature store, meta, each resolved through the
    * archived manifest): a pre-purge snapshot still sees the purged
    * docs while its slices and label generation survive. Fails loudly
    * once [[vacuumSlices]] retired the window or the generation
    * retention dropped the labels — the fail-closed
    * [[graft.cdc.Apply.readMergeTableAt]] contract, never a silent
    * partial read. */
  def loadAt(spark: SparkSession, dir: String,
      commit: Long): (DataFrame, DataFrame, Meta) = {
    val m = metaAt(spark, dir, commit)
    Generations.requireSlicesReadable(spark, dir,
      Seq("sigs", "postings", "purged"), m.sliceBase, m.slices,
      s"snapshot $commit")
    val labelsDir = s"$dir/gen=${m.gen}/labels"
    require(graft.util.Hfs.exists(
        new org.apache.hadoop.fs.Path(labelsDir), graft.util.Hfs.conf(spark)),
      s"snapshot $commit of $dir is no longer readable: gen=${m.gen} " +
        "was dropped by generation retention (raise retainGens to keep it)")
    (spark.read.parquet(labelsDir), liveSigs(spark, dir, m), m)
  }

  /** ADVICE r11: a ledgered batch the tombstone screen (or the batch
    * itself) left EMPTY must still record its batch id — returning
    * without a commit leaves the batch unledgered, so after a
    * compact+vacuum drops the tombstones, a streaming replay of that
    * batch (restart before the checkpoint committed) would re-fold and
    * resurrect the purged docs. A no-op pointer bump (batch advanced,
    * data untouched) keeps the replay guard `batchId <= m.batch`
    * suppressing the re-fold. */
  private def recordEmptyBatch(spark: SparkSession, dir: String,
      prev: Option[Meta], batchId: Long): Unit =
    prev.foreach { m =>
      if (batchId >= 0 && batchId > m.batch)
        commitMeta(spark, dir, m.copy(batch = batchId, commit = m.commit + 1))
    }

  /** Fold one batch of NEW documents (id, text) into the persisted
    * ledger. First batch seeds (freezing the fold config in the
    * manifest); later batches pay DELTA-SIZED work only. Empty batches
    * and crash-replayed batch ids are no-ops. Returns the published
    * generation. `maxBucketSize` is the hot-bucket candidate cap
    * (round-9 verdict #5: production corpora need it on the persisted
    * path too — an adversarial boilerplate bucket otherwise makes one
    * fold quadratic). The default keeps the oracle profile (no cap —
    * the q248 invariant is exact equality with a full recompute); the
    * cap FREEZES in the manifest like the signature family, because a
    * ledger folded under varying caps has no single recompute it is
    * equivalent to. LedgerStoreSpec pins capped-on-disk ≡
    * capped-in-memory on a hot-bucket fixture. */
  def maintainBatch(batch: DataFrame, id: Column, text: Column,
      dir: String, threshold: Double = 0.5, k: Int = 16, bands: Int = 16,
      prefixes: Int = 64, retainGens: Int = 2,
      batchId: Long = -1L, maxBucketSize: Int = Int.MaxValue): Option[Long] = {
    val spark = batch.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("LedgerStore", spark, dir) {
    val docs = batch.select(id.as("doc_id"), text.as("text"))
    if (docs.isEmpty) { recordEmptyBatch(spark, dir, readMeta(spark, dir), batchId); return None }
    val perMille = math.round(threshold * 1000).toInt
    readMeta(spark, dir) match {
      case None =>
        val sigs = Dedup.minhashSigSets(docs, col("doc_id"), col("text"),
          k = k).localCheckpoint(true)
        val pairs = Dedup.minhashNearDupsDeltaFromSigs(
          sigs.limit(0), sigs, threshold, k, bands,
          maxBucketSize = maxBucketSize)
        val labels = Dedup.componentsIncremental(
          // empty base labeling: every doc starts as its own component
          docs.select(col("doc_id").as("id"),
            col("doc_id").as("comp")).limit(0),
          docs, col("doc_id"), pairs, col("a_id"), col("b_id"))
        Some(publish(spark, dir, labels, sigs,
          Dedup.minhashPostings(sigs, k, bands, prefixes)
            .select(col("bucket"), col("id"), col("bp")),
          Meta(Format, 0L, 0L, batchId, perMille, k, bands, prefixes,
            maxBucket = maxBucketSize, sliceBase = 0L, slices = 1L,
            commit = -1L),
          retainGens))
      case Some(m) if batchId >= 0 && batchId <= m.batch =>
        None // crash replay of an already-folded batch
      case Some(m) =>
        require(m.thresholdPerMille == perMille && m.k == k &&
            m.bands == bands && m.prefixes == prefixes &&
            m.maxBucket == maxBucketSize,
          s"ledger at $dir was seeded with (threshold=${m.thresholdPerMille}" +
            s"‰, k=${m.k}, bands=${m.bands}, prefixes=${m.prefixes}, " +
            s"maxBucket=${m.maxBucket}); " +
            s"refusing a mismatched fold ($perMille‰, $k, $bands, " +
            s"$prefixes, $maxBucketSize) — one ledger, one signature family")
        val (labels, sigs, _) = load(spark, dir)
        val postings = livePostings(spark, dir, m)
        // TOMBSTONE SCREEN (round-10 ADVICE): a purged id stays purged
        // until compact+vacuum physically drop its tombstone — re-folding
        // it would re-enter the labels table while the tombstone hides
        // its signature from every pairing read.
        val screened = docs.join(
          livePurged(spark, dir, m).select(col("id").as("doc_id")),
          Seq("doc_id"), "left_anti")
        if (screened.isEmpty) { recordEmptyBatch(spark, dir, Some(m), batchId); return None }
        val deltaSigs = Dedup.minhashSigSets(screened, col("doc_id"),
          col("text"), k = k).localCheckpoint(true)
        // the production fold: the old side reads only the delta's
        // touched prefix partitions of the LIVE posting slices
        val deltaPairs = Dedup.minhashNearDupsDeltaFromPostings(
          postings, sigs, deltaSigs, threshold, k, bands,
          maxBucketSize = maxBucketSize, prefixes = prefixes)
        val allIds = labels.select(col("id"))
          .unionByName(screened.select(col("doc_id").as("id")))
        val newLabels = Dedup.componentsIncremental(
          labels, allIds, col("id"), deltaPairs, col("a_id"), col("b_id"))
        // writes: ONLY the delta slice + the labels — the stores append
        Some(publish(spark, dir, newLabels, deltaSigs,
          Dedup.minhashPostings(deltaSigs, k, bands, prefixes)
            .select(col("bucket"), col("id"), col("bp")),
          m.copy(gen = m.gen + 1, batch = batchId, slices = m.slices + 1),
          retainGens))
    }
    }
  }

  /** Continuous ledger maintenance: one [[maintainBatch]] fold per
    * micro-batch of arriving documents, exactly-once via the manifest's
    * batch-id ledger. External readers follow generations through
    * [[load]] without sharing the session. */
  def maintainStream(docs: DataFrame, id: Column, text: Column,
      dir: String, checkpoint: String, threshold: Double = 0.5,
      k: Int = 16, bands: Int = 16, prefixes: Int = 64,
      retainGens: Int = 2, maxBucketSize: Int = Int.MaxValue)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        maintainBatch(df, id, text, dir, threshold, k, bands, prefixes,
          retainGens, batchId = bid, maxBucketSize = maxBucketSize)
        ()
      }
      .start()

  /** The warehouse→TEXT-DEDUP cascade (round 14, closing the last
    * follower gap — every other maintained substrate got its
    * `changes.merge` follower in rounds 12–13): maintain this ledger
    * FROM a merge table's feed via the shared
    * [[graft.util.Cascade.followInto]] harness, exactly-once
    * end-to-end. Warehouse document updates RE-INGEST atomically
    * ([[upsertDocs]]' one-commit tombstone + re-land + relabel);
    * warehouse REMOVEs and `purgeKeys` compliance deletions propagate
    * as ledger purges — the deletion-propagation path to the dedup
    * labeling. `textOf` maps a feed row to its document text (in
    * production the stored text column or a normalization expression
    * over it). */
  def followMergeTable(spark: SparkSession, mergeDir: String, dir: String,
      checkpoint: String, textOf: Column, retainGens: Int = 2,
      sinceCommit: Long = -1L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.util.Cascade.followInto(spark, mergeDir, checkpoint, sinceCommit,
      (ups, rem, bid) => {
        upsertDocs(ups.select(col("_key").as("doc_id"), textOf.as("text")),
          col("doc_id"), col("text"), rem.toDF("doc_id"), dir, retainGens,
          batchId = bid)
        ()
      })

  /** The committed snapshot id produced by LEDGERED batch `batchId` —
    * the pin a cross-store set manifest records (ADVICE r11: the
    * store's CURRENT commit can be later than the batch's fold commit
    * when a compact/purge ran since — pinning current would claim "as
    * of batch B" while naming a post-maintenance state). −1 when the
    * store has no committed state at all (an empty seed batch). */
  def commitForBatch(spark: SparkSession, dir: String,
      batchId: Long): Long =
    if (readMeta(spark, dir).isEmpty) -1L
    else Generations.foldCommitForBatch(spark, dir, MetaName, batchId)

  /** The labels table's data dir for a committed snapshot (commit =
    * None → current) — the path behind [[load]]/[[loadAt]]'s first
    * frame, public for the DataSource V2 catalog face
    * ([[graft.sources.GraftTables]]). Fail-closed once generation
    * retention dropped the snapshot's gen dir. */
  def labelsDir(spark: SparkSession, dir: String,
      commit: Option[Long]): String = {
    val m = commit.map(metaAt(spark, dir, _)).orElse(readMeta(spark, dir))
      .getOrElse(sys.error(s"no committed ledger at $dir"))
    require(m.format == Format, Generations.unparseableMsg(dir,
      s"""{"format": "${m.format}"}""", Format))
    val p = s"$dir/gen=${m.gen}/labels"
    require(graft.util.Hfs.exists(new org.apache.hadoop.fs.Path(p),
        graft.util.Hfs.conf(spark)),
      s"snapshot ${commit.getOrElse("current")} of $dir is no longer " +
        s"readable: $p was dropped by generation retention")
    p
  }
}
