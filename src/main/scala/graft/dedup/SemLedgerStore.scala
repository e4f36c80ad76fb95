package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Generations

/** Persisted SEMANTIC (embedding) dedup ledger — [[LedgerStore]]'s twin
  * for the q102/q212/q244 sign-LSH pipeline, completing the set: every
  * maintained substrate in the repo (text ledger, IVF/IVF-PQ indexes,
  * semantic ledger) now has a generation-stamped on-disk face with
  * incremental folds. State: the vectors (the banded hyperplane keys
  * are a pure recomputable projection — cheaper to re-derive than to
  * store), the PAIR LEDGER, and the canonical labeling. A batch of new
  * vectors folds in via
  * [[Dedup.lshNearDupsDelta]] — only buckets containing a new vector
  * produce candidate work, no old×old — then label contraction
  * ([[Dedup.componentsIncremental]]). The fold config (bands, planes
  * per band, dim, threshold‰) freezes in the manifest at seed time; the
  * streaming face is exactly-once via the batch-id ledger.
  * SemLedgerStoreSpec pins the q244 invariant across generations on
  * disk: stored pairs ∪ labels ≡ a full recompute.
  *
  * Layout (v2 — slice-appended stores, the [[LedgerStore]] discipline):
  * {{{
  *   dir/_graft_semledger_meta.json   <- pointer + config + live slice count
  *   dir/vecs/slice=B/    <- parquet (id, v)          (immutable, per fold)
  *   dir/pairs/slice=B/   <- parquet (a_id, b_id, cosine)   (immutable)
  *   dir/gen=G/labels/    <- parquet (id, comp)   (full rewrite per fold)
  * }}}
  * A fold writes only its delta slices + the labels; the manifest's
  * slice count is the liveness boundary (orphan slices from a crashed
  * fold are invisible). Labels are the one inherently global rewrite —
  * a contraction can relabel any old vector.
  */
object SemLedgerStore {

  private val MetaName = "_graft_semledger_meta.json"
  // v4 (round 11): + commit id / history archive.
  // v5 (round 12): SLICE-ORDERED tombstones — a purged/slice=S row
  // masks only vec/pair rows with slice < S, so [[upsertVecs]] can
  // retire a vector's old copy and land its re-embedded one in ONE
  // atomic commit (the postings-v3 rule). Pure purge flows read
  // identically (a purge's tombstone is always newer than the rows it
  // targets); cross-build reads fail loudly as a version mismatch.
  private val Format = "graft-semdedup-v5"

  /** v3: `sliceBase` — the live slice window's lower bound; see
    * [[LedgerStore.Meta]] (the text twin) for the compaction contract. */
  /** Since round 11 every meta also carries `commit` — the monotone
    * snapshot id behind [[loadAt]]/[[commits]] time travel (the
    * [[LedgerStore]] protocol). */
  final case class Meta(format: String, gen: Long, rows: Long, batch: Long,
      thresholdPerMille: Int, nBands: Int, planesPerBand: Int, dim: Int,
      sliceBase: Long, slices: Long, commit: Long)

  private val MetaRe =
    ("""\{"format": "([^"]+)", "gen": ([0-9]+), "rows": ([0-9]+), """ +
      """"batch": (-?[0-9]+), "thresholdPerMille": (-?[0-9]+), """ +
      """"nBands": ([0-9]+), "planesPerBand": ([0-9]+), "dim": ([0-9]+), """ +
      """"sliceBase": ([0-9]+), "slices": ([0-9]+), """ +
      """"commit": ([0-9]+)\}""").r

  private def parseMeta(dir: String, body: String): Meta = body match {
    case MetaRe(f, g, n, b, t, nb, ppb, d, sb, sl, c) =>
      Meta(f, g.toLong, n.toLong, b.toLong, t.toInt, nb.toInt,
        ppb.toInt, d.toInt, sb.toLong, sl.toLong, c.toLong)
    case other => sys.error(
      Generations.unparseableMsg(s"$dir (semantic-ledger manifest)", other,
        Format))
  }

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    Generations.readPointer(spark, dir, MetaName).map(parseMeta(dir, _))

  private def commitMeta(spark: SparkSession, dir: String, m: Meta): Unit =
    Generations.commitArchived(spark, dir, MetaName,
      s"""{"format": "$Format", "gen": ${m.gen}, "rows": ${m.rows}, """ +
        s""""batch": ${m.batch}, """ +
        s""""thresholdPerMille": ${m.thresholdPerMille}, """ +
        s""""nBands": ${m.nBands}, """ +
        s""""planesPerBand": ${m.planesPerBand}, "dim": ${m.dim}, """ +
        s""""sliceBase": ${m.sliceBase}, "slices": ${m.slices}, """ +
        s""""commit": ${m.commit}}""",
      m.commit)


  /** Tombstones (id, _tomb = the tombstone's slice id) — the
    * [[purgeVecs]]/[[upsertVecs]] ledger; empty when no purge ran or
    * every tombstone slice was vacuumed. */
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

  /** The live vectors under the v5 SLICE-ORDERED mask: a tombstone at
    * slice S masks only copies OLDER than it — an [[upsertVecs]]
    * re-landed vector (data slice above its own tombstone) stays
    * visible; pure purges read exactly as v4. */
  private def liveVecs(spark: SparkSession, dir: String, m: Meta): DataFrame = {
    val tomb = livePurged(spark, dir, m)
      .select(col("id").as("_tid"), col("_tomb"))
    spark.read.parquet(s"$dir/vecs")
      .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
      .join(tomb, col("id") === col("_tid") && col("_tomb") > col("slice"),
        "left_anti")
      .drop("slice")
  }

  /** The live pair ledger: a pair drops iff EITHER endpoint carries a
    * tombstone newer than the pair's slice — old pairs of an updated
    * vector (computed from the retired embedding) mask out, the upsert
    * fold's new pairs (written above the tombstone) survive. */
  private def livePairs(spark: SparkSession, dir: String, m: Meta): DataFrame = {
    val tomb = livePurged(spark, dir, m)
      .select(col("id").as("_tid"), col("_tomb"))
    spark.read.parquet(s"$dir/pairs")
      .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
      .join(tomb, col("a_id") === col("_tid") && col("_tomb") > col("slice"),
        "left_anti")
      .join(tomb, col("b_id") === col("_tid") && col("_tomb") > col("slice"),
        "left_anti")
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  private def publish(spark: SparkSession, dir: String, deltaVecs: DataFrame,
      deltaPairs: DataFrame, labels: DataFrame, meta: Meta,
      retainGens: Int): Long = {
    val sliceId = meta.slices - 1
    // claim the id: a crashed purge's orphan tombstone slice here must
    // not become live under this fold's commit (round-10 ADVICE)
    Generations.claimSlice(spark, dir, Seq("purged"), sliceId)
    deltaVecs.write.mode("overwrite").parquet(s"$dir/vecs/slice=$sliceId")
    deltaPairs.write.mode("overwrite").parquet(s"$dir/pairs/slice=$sliceId")
    labels.write.mode("overwrite").parquet(s"$dir/gen=${meta.gen}/labels")
    val n = spark.read.parquet(s"$dir/gen=${meta.gen}/labels").count()
    commitMeta(spark, dir, meta.copy(rows = n, commit = meta.commit + 1))
    Generations.gc(spark, dir, meta.gen - (retainGens - 1))
    meta.gen
  }

  /** [[LedgerStore.compact]]'s embedding twin: merge the live slice
    * window of both stores into one slice each and advance `sliceBase`
    * in a single atomic pointer commit — labels, batch ledger, and fold
    * config unchanged; superseded slices stay for pre-compact readers
    * until [[vacuumSlices]]. Returns the merged slice id, or None when
    * the window already holds ≤ 1 slice. */
  def compact(spark: SparkSession, dir: String): Option[Long] =
    // purge/fold/compact serialize on the per-(store, dir) monitor
    // (round-11 verdict #5); cross-process stays single-writer
    graft.util.Maintenance.withLeasedWriteLock("SemLedgerStore", spark, dir) {
    readMeta(spark, dir) match {
      case Some(m) if m.slices - m.sliceBase > 1 =>
        val merged = m.slices
        Generations.claimSlice(spark, dir, Seq("purged"), merged)
        // merged slices are written from the TOMBSTONE-FILTERED views:
        // purged rows leave the store physically, and the superseded
        // tombstone slices fall out of the window with the old slices
        liveVecs(spark, dir, m).write.mode("overwrite")
          .parquet(s"$dir/vecs/slice=$merged")
        livePairs(spark, dir, m).write.mode("overwrite")
          .parquet(s"$dir/pairs/slice=$merged")
        commitMeta(spark, dir,
          m.copy(sliceBase = merged, slices = merged + 1,
            commit = m.commit + 1))
        Some(merged)
      case _ => None
    }
    }

  /** Deferred slice GC below the current `sliceBase` — run after a
    * grace window (the Apply deferred-GC contract). */
  def vacuumSlices(spark: SparkSession, dir: String): Int =
    readMeta(spark, dir).map { m =>
      Generations.gcSlices(spark, dir, Seq("vecs", "pairs", "purged"),
        m.sliceBase)
    }.getOrElse(0)

  /** Load the current state: (LIVE vectors, LIVE pair ledger — slice
    * unions, liveness-pruned, tombstone-filtered — current labels,
    * meta). */
  def load(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, Meta) = {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed semantic ledger at $dir (missing $MetaName)"))
    require(m.format == Format, s"$dir holds '${m.format}', expected $Format")
    (liveVecs(spark, dir, m),
      livePairs(spark, dir, m),
      spark.read.parquet(s"$dir/gen=${m.gen}/labels"), m)
  }

  /** The current manifest, for callers pinning snapshots
    * ([[graft.util.PipelineLedger]]) without loading the frames. */
  def meta(spark: SparkSession, dir: String): Option[Meta] =
    readMeta(spark, dir)

  /** The labels table's data dir for a committed snapshot (commit =
    * None → current) — the exact frame [[load]]/[[loadAt]] serve third
    * (labels rewrite whole per fold/purge, so the gen dir needs no
    * tombstone screen), public for the DataSource V2 catalog face
    * ([[graft.sources.GraftTables]]). Fail-closed once generation
    * retention dropped the snapshot's gen dir. */
  def labelsDir(spark: SparkSession, dir: String,
      commit: Option[Long]): String = {
    val m = commit.map(metaAt(spark, dir, _)).orElse(readMeta(spark, dir))
      .getOrElse(sys.error(s"no committed semantic ledger at $dir"))
    require(m.format == Format, s"$dir holds '${m.format}', expected $Format")
    val p = s"$dir/gen=${m.gen}/labels"
    require(graft.util.Hfs.exists(new org.apache.hadoop.fs.Path(p),
        graft.util.Hfs.conf(spark)),
      s"snapshot ${commit.getOrElse("current")} of $dir is no longer " +
        s"readable: gen=${m.gen} was dropped by generation retention")
    p
  }

  /** Committed snapshot ids available for [[loadAt]], ascending. */
  def commits(spark: SparkSession, dir: String): Seq[Long] =
    Generations.listCommits(spark, dir, MetaName)

  /** The archived manifest of snapshot `commit`. */
  /** CHANGE-FEED resolution (round 12 — consumed through
    * `format("graft")` as `changes.sem.{vecs,pairs,purged}`): the
    * slice dirs commits `(since, until]` appended. The `pairs` feed is
    * the stream of NEWLY-DISCOVERED near-duplicate pairs per fold —
    * what a downstream dedup consumer actually wants — `vecs` is
    * embedding replication, `purged` deletion propagation; a compact
    * (rewrite of rows already flowed) emits nothing. Labels are NOT
    * feed-able: they rewrite per generation (a snapshot, not a delta).
    */
  def changeDirs(spark: SparkSession, dir: String, sub: String,
      since: Long, until: Long): (Seq[String], String) = {
    require(Set("vecs", "pairs", "purged")(sub),
      s"unknown semantic-ledger table '$sub'")
    Generations.changeSliceDirs(spark, dir, sub,
      Seq("vecs", "pairs", "purged"),
      c => if (c < 0L) (0L, 0L) else {
        val m = metaAt(spark, dir, c); (m.sliceBase, m.slices)
      }, since, until)
  }

  def metaAt(spark: SparkSession, dir: String, commit: Long): Meta =
    parseMeta(s"$dir@$commit",
      Generations.readPointerAt(spark, dir, MetaName, commit).getOrElse(sys.error(
        s"$dir has no committed snapshot $commit " +
          s"(available: ${commits(spark, dir).mkString(", ")})")))

  /** TIME-TRAVEL [[load]] — the semantic ledger AS OF a committed
    * snapshot id; fails loudly once vacuum/generation retention dropped
    * the snapshot's dirs (the [[LedgerStore.loadAt]] contract). */
  def loadAt(spark: SparkSession, dir: String, commit: Long)
      : (DataFrame, DataFrame, DataFrame, Meta) = {
    val m = metaAt(spark, dir, commit)
    Generations.requireSlicesReadable(spark, dir,
      Seq("vecs", "pairs", "purged"), m.sliceBase, m.slices,
      s"snapshot $commit")
    val labelsDir = s"$dir/gen=${m.gen}/labels"
    require(graft.util.Hfs.exists(
        new org.apache.hadoop.fs.Path(labelsDir), graft.util.Hfs.conf(spark)),
      s"snapshot $commit of $dir is no longer readable: gen=${m.gen} " +
        "was dropped by generation retention (raise retainGens to keep it)")
    (liveVecs(spark, dir, m), livePairs(spark, dir, m),
      spark.read.parquet(labelsDir), m)
  }

  /** [[LedgerStore.purgeDocs]]'s embedding twin — decremental semantic-
    * ledger maintenance: affected components relabel from their
    * remaining members' STORED VECTORS (the banded sign-LSH pipeline
    * restricted to the members — exact under the same pair-closure
    * argument, the ledger's uncapped profile), purged ids land as a
    * tombstone slice filtering every live read (vectors AND pairs —
    * later folds cannot pair against purged vectors), [[compact]] makes
    * the removal physical. No-op for absent/already-purged ids. */
  def purgeVecs(spark: SparkSession, dir: String, vecIds: DataFrame,
      retainGens: Int = 2): Option[Long] = {
    graft.util.Maintenance.withLeasedWriteLock("SemLedgerStore", spark, dir) {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed semantic ledger at $dir (missing $MetaName)"))
    val labels = spark.read.parquet(s"$dir/gen=${m.gen}/labels")
    val targets = vecIds.select(vecIds.columns.head)
      .toDF("id").distinct()
      .join(labels.select(col("id")), Seq("id"), "left_semi")
      .localCheckpoint(true)
    if (targets.isEmpty) return None
    val comps = labels.join(targets, Seq("id"), "left_semi")
      .select(col("comp")).distinct()
    val members = labels.join(comps, Seq("comp"), "left_semi")
      .join(targets, Seq("id"), "left_anti")
      .select(col("id"))
    val vecsM = liveVecs(spark, dir, m)
      .join(members, Seq("id"), "left_semi").localCheckpoint(true)
    val pairsM = Dedup.lshNearDups(vecsM, col("id"), col("v"),
      m.nBands, m.planesPerBand, m.dim, m.thresholdPerMille / 1000.0)
    val lbl = Dedup.components(pairsM, col("a_id"), col("b_id"))
    val relabeled = members
      .join(lbl.select(col("id"), col("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    val newLabels = labels.join(comps, Seq("comp"), "left_anti")
      .select(col("id"), col("comp"))
      .unionByName(relabeled)
    val sliceId = m.slices
    // claim the id: a crashed fold's orphan data slices must not become
    // live when this commit advances the window
    Generations.claimSlice(spark, dir, Seq("vecs", "pairs"), sliceId)
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

  /** EMBEDDING REFRESH (round 12) — the verb the canonical LLM-ops
    * flow needs: after a model upgrade, documents re-embed, and the
    * semantic ledger must retire each vector's OLD copy, land the NEW
    * one, and re-derive the pair ledger + labels — atomically, in one
    * ledgered commit ([[graft.text.PostingsStore.upsertBatch]]'s
    * semantics on the embedding substrate). Purge-then-fold as two
    * verbs would leave a crash window where a replay purges the
    * re-landed copy (purge has no ledger); here one commit carries the
    * tombstone slice, the new vec/pair slices ABOVE it (the v5
    * slice-ordered mask keeps them visible), the relabeled components,
    * and the batch ledger.
    *
    * Labels re-derive in two steps against the pre-commit state: the
    * purge relabel ([[purgeVecs]]'s pair-closure recompute over the
    * affected components minus the targets), then the incremental fold
    * contraction over the new vectors' delta pairs — exact under the
    * same closure argument both parent verbs carry. `removeIds` deletes
    * outright; ids in both re-land (the upsert wins). Returns the new
    * generation (None for replays / fully-empty batches). */
  def upsertVecs(upserts: DataFrame, id: Column, vec: Column,
      removeIds: DataFrame, dir: String, retainGens: Int = 2,
      batchId: Long = -1L): Option[Long] = {
    val spark = upserts.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("SemLedgerStore", spark, dir) {
    val m = readMeta(spark, dir).getOrElse(sys.error(
      s"no committed semantic ledger at $dir — upsertVecs updates an " +
        "existing ledger; seed with maintainBatch first"))
    if (batchId >= 0 && batchId <= m.batch) return None
    // one live row per id (ADVICE r12): exact duplicates collapse,
    // conflicting re-embeddings fail loudly — two copies in one data
    // slice would both sit above the tombstone and both stay visible
    val newVecs = graft.util.Maintenance.requireUniqueUpserts(
      upserts.select(id.as("id"), vec.as("v")), "id", "semantic-ledger")
      .localCheckpoint(true)
    // an id in both upserts and removeIds re-lands (the upsert wins) —
    // drop the overlap HERE so the contract is the verb's, not an
    // accident of downstream set algebra
    val rem = removeIds.select(removeIds.columns.head).toDF("id")
      .distinct()
      .join(newVecs.select(col("id")), Seq("id"), "left_anti")
      .localCheckpoint(true)
    if (newVecs.isEmpty && rem.isEmpty) {
      recordEmptyBatch(spark, dir, Some(m), batchId); return None
    }
    val threshold = m.thresholdPerMille / 1000.0
    val labels = spark.read.parquet(s"$dir/gen=${m.gen}/labels")
    val targets = newVecs.select(col("id")).unionByName(rem).distinct()
      .join(labels.select(col("id")), Seq("id"), "left_semi")
      .localCheckpoint(true)
    // PURGE PHASE (computed against the pre-commit state): affected
    // components relabel from their remaining members' stored vectors
    val comps = labels.join(targets, Seq("id"), "left_semi")
      .select(col("comp")).distinct()
    val members = labels.join(comps, Seq("comp"), "left_semi")
      .join(targets, Seq("id"), "left_anti")
      .select(col("id"))
    // The purge-relabel chain (LSH over the affected components'
    // remaining members + a components fixpoint) and the FOLD-phase
    // delta-pair chain (LSH of the new vectors against the post-purge
    // corpus) are INDEPENDENT — neither reads the other's result — and
    // both are long sequences of tiny jobs (round 17, measured: the
    // whole refresh fold ran 134 sequential jobs carrying 4.3 summed
    // task-seconds in 27 s of wall at sf0.01). Run them from two driver
    // threads so one chain's jobs back-fill the other's idle cores
    // (guide §2.6); results and the commit sequence are unchanged.
    val (labelsAfterPurge, deltaPairs) = {
      val rs = graft.util.Par.all(Seq[() => DataFrame](
        () => {
          val vecsM = liveVecs(spark, dir, m)
            .join(members, Seq("id"), "left_semi").localCheckpoint(true)
          val pairsM = Dedup.lshNearDups(vecsM, col("id"), col("v"),
            m.nBands, m.planesPerBand, m.dim, threshold)
          val lblM = Dedup.components(pairsM, col("a_id"), col("b_id"))
          val relabeled = members
            .join(lblM.select(col("id"), col("comp")), Seq("id"), "left")
            .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
          labels.join(comps, Seq("comp"), "left_anti")
            .select(col("id"), col("comp"))
            .unionByName(relabeled).localCheckpoint(true)
        },
        () => {
          // FOLD PHASE: the new vectors pair against the post-purge corpus
          val vecsAfterPurge = liveVecs(spark, dir, m)
            .join(targets, Seq("id"), "left_anti")
          Dedup.lshNearDupsDelta(vecsAfterPurge, newVecs,
            col("id"), col("v"), m.nBands, m.planesPerBand, m.dim,
            threshold).localCheckpoint(true)
        }))
      (rs(0), rs(1))
    }
    val allIds = labelsAfterPurge.select(col("id"))
      .unionByName(newVecs.select(col("id"))).distinct()
    val newLabels = Dedup.componentsIncremental(
      labelsAfterPurge, allIds, col("id"), deltaPairs,
      col("a_id"), col("b_id"))
    // WRITES: tombstone slice first (the mask covers only OLDER
    // slices), new vec/pair slices above it, labels, ONE commit
    var next = m.slices
    if (!targets.isEmpty) {
      Generations.claimSlice(spark, dir, Seq("vecs", "pairs"), next)
      targets.write.mode("overwrite").parquet(s"$dir/purged/slice=$next")
      next += 1
    }
    if (!newVecs.isEmpty) {
      Generations.claimSlice(spark, dir, Seq("purged"), next)
      newVecs.write.mode("overwrite").parquet(s"$dir/vecs/slice=$next")
      deltaPairs.write.mode("overwrite").parquet(s"$dir/pairs/slice=$next")
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

  /** The warehouse→EMBEDDINGS cascade (round 13, completing the
    * [[graft.text.PostingsStore.followMergeTable]] path beyond text):
    * maintain this semantic ledger FROM a merge table's `changes.merge`
    * feed, exactly-once end-to-end — the feed replays uncommitted commit
    * windows from its checkpoint, and [[upsertVecs]]'s ledger absorbs
    * the replays. Warehouse updates RE-EMBED and re-enter the near-dup
    * closure atomically; warehouse REMOVEs and `purgeKeys` compliance
    * deletions propagate as ledger purges — the deletion-propagation
    * path to embeddings. `embedOf` is the RE-EMBED HOOK: a Column
    * mapping a feed row to its `Array[Float]` vector (in production a
    * model-serving expression/UDF over the document columns; tests and
    * gates use a deterministic projection). Ordering is by (commit,
    * _version) — the table's serialization axis first, so a RESTORE
    * commit's reinstated rows win their window. */
  def followMergeTable(spark: SparkSession, mergeDir: String, dir: String,
      checkpoint: String, embedOf: Column, retainGens: Int = 2,
      sinceCommit: Long = -1L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.util.Cascade.followInto(spark, mergeDir, checkpoint, sinceCommit,
      (ups, rem, bid) => {
        upsertVecs(ups.select(col("_key").as("id"), embedOf.as("v")),
          col("id"), col("v"), rem.toDF("id"), dir, retainGens,
          batchId = bid)
        ()
      })

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

  /** Fold one batch of NEW vectors (id, embedding) into the persisted
    * ledger; first batch seeds and freezes the config. Empty batches
    * and crash-replayed batch ids are no-ops. */
  def maintainBatch(batch: DataFrame, id: Column, vec: Column,
      dir: String, threshold: Double = 0.25, nBands: Int = 4,
      planesPerBand: Int = 4, dim: Int = 64, retainGens: Int = 2,
      batchId: Long = -1L): Option[Long] = {
    val spark = batch.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("SemLedgerStore", spark, dir) {
    val vecs = batch.select(id.as("id"), vec.as("v")).localCheckpoint(true)
    if (vecs.isEmpty) { recordEmptyBatch(spark, dir, readMeta(spark, dir), batchId); return None }
    val perMille = math.round(threshold * 1000).toInt
    readMeta(spark, dir) match {
      case None =>
        val pairs = Dedup.lshNearDupsDelta(vecs.limit(0), vecs,
          col("id"), col("v"), nBands, planesPerBand, dim, threshold)
        val labels = Dedup.componentsIncremental(
          vecs.select(col("id"), col("id").as("comp")).limit(0),
          vecs, col("id"), pairs, col("a_id"), col("b_id"))
        Some(publish(spark, dir, vecs, pairs, labels,
          Meta(Format, 0L, 0L, batchId, perMille, nBands, planesPerBand,
            dim, sliceBase = 0L, slices = 1L, commit = -1L), retainGens))
      case Some(m) if batchId >= 0 && batchId <= m.batch =>
        None // crash replay of an already-folded batch
      case Some(m) =>
        require(m.thresholdPerMille == perMille && m.nBands == nBands &&
            m.planesPerBand == planesPerBand && m.dim == dim,
          s"semantic ledger at $dir was seeded with " +
            s"(${m.thresholdPerMille}‰, ${m.nBands}×${m.planesPerBand}, " +
            s"dim ${m.dim}); refusing a mismatched fold — one ledger, " +
            "one hyperplane family")
        val (oldVecs, _, oldLabels, _) = load(spark, dir)
        // TOMBSTONE SCREEN (round-10 ADVICE): purged ids stay purged
        // until compact+vacuum; re-folding one would re-enter the labels
        // while the tombstone hides its vector from every pairing read
        val screened = vecs.join(livePurged(spark, dir, m).select("id"),
          Seq("id"), "left_anti").localCheckpoint(true)
        if (screened.isEmpty) { recordEmptyBatch(spark, dir, Some(m), batchId); return None }
        val deltaPairs = Dedup.lshNearDupsDelta(oldVecs, screened,
          col("id"), col("v"), nBands, planesPerBand, dim, threshold)
          .localCheckpoint(true)
        val allIds = oldLabels.select(col("id"))
          .unionByName(screened.select(col("id")))
        val newLabels = Dedup.componentsIncremental(
          oldLabels, allIds, col("id"), deltaPairs,
          col("a_id"), col("b_id"))
        // writes: ONLY the delta slices + the labels — the stores append
        Some(publish(spark, dir, screened, deltaPairs, newLabels,
          m.copy(gen = m.gen + 1, batch = batchId, slices = m.slices + 1),
          retainGens))
    }
    }
  }

  /** Continuous semantic-ledger maintenance: one fold per micro-batch
    * of arriving vectors, exactly-once via the batch-id ledger. */
  def maintainStream(vecs: DataFrame, id: Column, vec: Column,
      dir: String, checkpoint: String, threshold: Double = 0.25,
      nBands: Int = 4, planesPerBand: Int = 4, dim: Int = 64,
      retainGens: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        maintainBatch(df, id, vec, dir, threshold, nBands, planesPerBand,
          dim, retainGens, batchId = bid)
        ()
      }
      .start()

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
}
