package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Generations

/** Version-stamped PERSISTED index format (SURVEY §9.10 follow-on): a
  * refreshed IVF index publishes to a directory through the same
  * manifest-pointer commit discipline as the merge table
  * ([[graft.cdc.Apply]]) — so an index maintenance job (the doubling-
  * policy rebuild) can hand a new index to running readers without any
  * shared session, and a crashed writer leaves readers untouched.
  *
  * Layout (v2 — a generation is a re-train EPOCH; frozen-insert folds
  * append slices inside it instead of rewriting the table):
  * {{{
  *   dir/_graft_index_meta.json      <- the pointer (gen, rows, baseRows,
  *                                      batch, sliceBase, slices)
  *   dir/gen=G/centroids/            <- parquet (cell, c)
  *   dir/gen=G/assigned/slice=S/     <- parquet (vid, v), PARTITIONED BY
  *                                      cell; slice 0 = the train, S>0 =
  *                                      one frozen-insert fold each
  * }}}
  *
  * A new generation's data dirs are invisible until the one-object
  * atomic meta flip ([[graft.util.Generations.commit]] — the
  * object-store PUT);
  * superseded generations are deleted only AFTER the flip and only
  * beyond a retention window, so a reader holding the previous meta
  * keeps scanning intact files (the Apply deferred-GC contract).
  *
  * The assigned table is written `partitionBy("cell")` — the
  * [[Similarity]] scaladoc's "assignment column doubles as a partition
  * key" claim made physical: [[searchPruned]] filters on the probed
  * cell ids (bounded driver metadata — the centroid ranking), which
  * plans as STATIC partition pruning — whole files of non-probed cells
  * are never opened (`PartitionFilters` in the scan, pinned by
  * IndexStoreSpec). At 100 TB a probe reads ~nprobe/nCentroids of the
  * files instead of scanning everything into a join.
  */
object IndexStore {

  private val MetaName = "_graft_index_meta.json"
  // v3 (round 11): + commit id / history archive.
  // v4 (round 13): SLICE-ORDERED tombstones — a purged/slice=S row masks
  // only assigned rows with slice < S, so [[upsertVectors]] can retire a
  // vector's old copy and land its refreshed one in ONE atomic commit
  // (the postings-v3 / semledger-v5 rule). Pure purge flows read
  // identically (a purge's tombstone is always newer than the rows it
  // targets); a pre-round-13 dir fails loudly as a version mismatch.
  private val Format = "graft-ivf-v4"

  /** `rows` = vectors in this generation; `baseRows` = rows at the last
    * RE-TRAIN — the denominator of the doubling refresh policy (a grown
    * publish carries its base forward; a rebuild resets base = rows).
    * `batch` = the streaming batch id whose fold produced this
    * generation (−1 for non-streaming publishes) — the idempotent-
    * foreachBatch ledger: a crash-replayed batch id ≤ `batch` is a
    * no-op instead of a double insert.
    *
    * v2 (round 10): `slices` — the live slice count of the generation's
    * assigned store. A generation is the re-train EPOCH the round-9
    * verdict sketched (#3): its centroids are frozen, so a
    * frozen-insert fold APPENDS one delta slice
    * (`gen=G/assigned/slice=S`, still cell-partitioned inside) and
    * bumps `slices` in the same pointer commit — delta-sized write I/O
    * — while only a doubling re-train opens a new generation and
    * resets the slice space (reassignment invalidates every stored
    * cell id, so the old slices cannot be reused). A crashed fold's
    * orphan slice is outside the committed count and invisible. */
  /** Since round 11 every meta also carries `commit` — the monotone
    * snapshot id behind [[loadIvfAt]]/[[commits]] time travel (the
    * [[graft.dedup.LedgerStore]] protocol). */
  final case class Meta(format: String, gen: Long, rows: Long,
      baseRows: Long, batch: Long, sliceBase: Long, slices: Long,
      commit: Long)

  private val MetaRe =
    ("""\{"format": "([^"]+)", "gen": ([0-9]+), "rows": ([0-9]+), """ +
      """"baseRows": ([0-9]+), "batch": (-?[0-9]+), """ +
      """"sliceBase": ([0-9]+), "slices": ([0-9]+), """ +
      """"commit": ([0-9]+)\}""").r

  private def parseMeta(dir: String, body: String): Meta = body match {
    case MetaRe(f, g, n, b, bt, sb, sl, c) =>
      Meta(f, g.toLong, n.toLong, b.toLong, bt.toLong, sb.toLong,
        sl.toLong, c.toLong)
    case other => sys.error(
      Generations.unparseableMsg(s"$dir (index manifest)", other, Format))
  }

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    Generations.readPointer(spark, dir, MetaName).map(parseMeta(dir, _))

  private def commitMeta(spark: SparkSession, dir: String, m: Meta): Unit =
    Generations.commitArchived(spark, dir, MetaName,
      s"""{"format": "$Format", "gen": ${m.gen}, "rows": ${m.rows}, """ +
        s""""baseRows": ${m.baseRows}, "batch": ${m.batch}, """ +
        s""""sliceBase": ${m.sliceBase}, "slices": ${m.slices}, """ +
        s""""commit": ${m.commit}}""",
      m.commit)

  /** Publish `index` to `dir` as the next generation and flip the
    * pointer. Returns the committed generation id. `retainGens` ≥ 1:
    * how many generations stay on disk after the flip (readers that
    * loaded an older meta keep working until their generation ages
    * out — the deferred-GC grace window). `carryBaseRows`: a GROWN
    * publish passes the previous base so the doubling denominator
    * survives the commit; omitted = this publish IS a (re)train, base
    * resets to the row count. */
  def saveIvf(index: Similarity.IvfIndex, dir: String,
      retainGens: Int = 2, carryBaseRows: Option[Long] = None,
      batchId: Long = -1L): Long = {
    require(retainGens >= 1, s"retainGens must be >= 1, got $retainGens")
    val spark = index.assigned.sparkSession
    // publish/fold/purge/compact serialize on the per-(store, dir)
    // monitor (round-11 verdict #5 — reentrant for the fold's internal
    // publish); cross-process stays single-writer by contract
    graft.util.Maintenance.withLeasedWriteLock("IndexStore", spark, dir) {
    val prev = readMeta(spark, dir)
    prev.foreach(m => require(m.format == Format,
      s"$dir holds a '${m.format}' index; refusing to overwrite with $Format"))
    val gen = prev.map(_.gen + 1).getOrElse(0L)
    // 1. write the new generation's data — invisible, nothing points at
    // it. The assigned store lands as the epoch's slice 0; later
    // frozen-insert folds append slice 1, 2, … without touching it.
    index.centroids.write.mode("overwrite")
      .parquet(s"$dir/gen=$gen/centroids")
    index.assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/gen=$gen/assigned/slice=0")
    // count the rows that were WRITTEN (a plain re-count of the input
    // frame would re-run its whole lineage when unmaterialized)
    val n = spark.read.parquet(s"$dir/gen=$gen/assigned").count()
    // 2. the commit: one atomic pointer PUT; 3. deferred GC after it
    commitMeta(spark, dir,
      Meta(Format, gen, n, carryBaseRows.getOrElse(n), batchId,
        sliceBase = 0L, slices = 1L,
        commit = prev.map(_.commit + 1).getOrElse(0L)))
    Generations.gc(spark, dir, gen - (retainGens - 1))
    gen
    }
  }

  /** Load the CURRENT generation. The returned index is probe-ready
    * ([[Similarity.ivfSearch]] works as-is); [[searchPruned]] adds the
    * partition-pruned scan path the layout exists for. Also returns the
    * meta so a maintenance caller can seed the growth policy
    * (`Maintenance.noteBaseSize(..., meta.baseRows)`). */
  /** Tombstones (vid, _tomb = the tombstone's slice id) of the CURRENT
    * generation (the [[purgeVectors]]/[[upsertVectors]] ledger) —
    * tombstones live inside the gen dir, so a re-train (which trains
    * from the filtered view) sheds them with the old generation. Since
    * v4 the slice id rides along: a tombstone masks only assigned rows
    * in slices OLDER than it, so an upsert's re-landed copy (written
    * above its own tombstone) stays visible. */
  private def livePurged(spark: SparkSession, dir: String,
      m: Meta): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/gen=${m.gen}/purged")
    val hc = graft.util.Hfs.conf(spark)
    val hasSlices = graft.util.Hfs.exists(p, hc) &&
      graft.util.Hfs.list(p, hc).exists(_.getPath.getName.startsWith("slice="))
    if (hasSlices)
      spark.read.parquet(s"$dir/gen=${m.gen}/purged")
        .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
        .select(col("vid"), col("slice").cast("long").as("_tomb"))
    else {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("vid", "_tomb")
    }
  }

  def loadIvf(spark: SparkSession, dir: String): (Similarity.IvfIndex, Meta) =
    loadIvfOn(spark, dir,
      readMeta(spark, dir).getOrElse(
        sys.error(s"no committed index at $dir (missing $MetaName)")))

  private def loadIvfOn(spark: SparkSession, dir: String,
      m: Meta): (Similarity.IvfIndex, Meta) = {
    require(m.format == Format, s"$dir holds '${m.format}', expected $Format")
    val centroids = spark.read.parquet(s"$dir/gen=${m.gen}/centroids")
    // liveness prune on the slice partition column (an orphan slice from
    // a crashed fold is outside the committed count); `slice` and `cell`
    // are BOTH partition dirs, so a probe's cell filter still plans the
    // static PartitionFilters prune the layout exists for. v4 mask: a
    // tombstone hides only OLDER slices — an upsert's re-landed copy
    // (data slice above its own tombstone) stays visible.
    val tomb = livePurged(spark, dir, m)
      .select(col("vid").as("_tid"), col("_tomb"))
    val assigned = spark.read.parquet(s"$dir/gen=${m.gen}/assigned")
      .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
      .join(tomb, col("vid") === col("_tid") && col("_tomb") > col("slice"),
        "left_anti")
      .select(col("vid"), col("v"), col("cell"))
    (Similarity.IvfIndex(centroids, assigned), m)
  }

  /** The current manifest, for callers pinning snapshots
    * ([[graft.util.PipelineLedger]]) without loading the frames. */
  def meta(spark: SparkSession, dir: String): Option[Meta] =
    readMeta(spark, dir)

  /** Committed snapshot ids available for [[loadIvfAt]], ascending. */
  def commits(spark: SparkSession, dir: String): Seq[Long] =
    Generations.listCommits(spark, dir, MetaName)

  /** The live slice data dirs of IVF table `sub` ("assigned" |
    * "purged") for a committed snapshot (commit = None → current), plus
    * the base path that keeps `slice`/`cell` as partition columns —
    * public for the DataSource V2 catalog face
    * ([[graft.sources.GraftTables]]): explicit slice paths pin the
    * snapshot's live window (a crashed fold's orphan slice is outside
    * it), and the hive layout keeps `cell` prunable by Catalyst — a
    * probe's cell filter through raw SQL plans the same static
    * PartitionFilters cut `searchPruned` gets. May return no dirs for
    * "purged" (no purge ever ran). Fail-closed on a half-vacuumed
    * window or a retention-dropped generation. */
  def ivfDirs(spark: SparkSession, dir: String, sub: String,
      commit: Option[Long]): (Seq[String], String) = {
    require(Set("assigned", "purged")(sub), s"unknown ivf table '$sub'")
    val m = commit.map(metaAt(spark, dir, _)).orElse(readMeta(spark, dir))
      .getOrElse(sys.error(s"no committed index at $dir"))
    require(m.format == Format, s"$dir holds '${m.format}', expected $Format")
    Generations.requireSlicesReadable(spark, dir,
      Seq(s"gen=${m.gen}/assigned", s"gen=${m.gen}/purged"),
      m.sliceBase, m.slices, s"snapshot ${commit.getOrElse("current")}")
    val hc = graft.util.Hfs.conf(spark)
    val base = s"$dir/gen=${m.gen}/$sub"
    val dirs = (m.sliceBase until m.slices)
      .map(s => s"$base/slice=$s")
      .filter(p => graft.util.Hfs.exists(
        new org.apache.hadoop.fs.Path(p), hc))
    (dirs, base)
  }

  /** The archived manifest of snapshot `commit`. */
  def metaAt(spark: SparkSession, dir: String, commit: Long): Meta =
    parseMeta(s"$dir@$commit",
      Generations.readPointerAt(spark, dir, MetaName, commit).getOrElse(sys.error(
        s"$dir has no committed snapshot $commit " +
          s"(available: ${commits(spark, dir).mkString(", ")})")))

  /** TIME-TRAVEL [[loadIvf]] — the index AS OF a committed snapshot id
    * (a pre-purge snapshot still probes the purged vectors while its
    * slices survive; a pre-re-train snapshot probes the OLD epoch while
    * its generation survives retention). Fails loudly once the
    * snapshot's generation or slice dirs are gone — the fail-closed
    * [[graft.cdc.Apply.readMergeTableAt]] contract. */
  def loadIvfAt(spark: SparkSession, dir: String,
      commit: Long): (Similarity.IvfIndex, Meta) = {
    val m = metaAt(spark, dir, commit)
    require(graft.util.Hfs.exists(
        new org.apache.hadoop.fs.Path(s"$dir/gen=${m.gen}"),
        graft.util.Hfs.conf(spark)),
      s"snapshot $commit of $dir is no longer readable: gen=${m.gen} " +
        "was dropped by generation retention (raise retainGens to keep it)")
    Generations.requireSlicesReadable(spark, dir,
      Seq(s"gen=${m.gen}/assigned", s"gen=${m.gen}/purged"),
      m.sliceBase, m.slices, s"snapshot $commit")
    loadIvfOn(spark, dir, m)
  }

  /** DECREMENTAL index maintenance — remove vectors from the persisted
    * IVF index (the purge verb on the ANN substrate; search over the
    * remaining vectors is trivially exact — no cross-row semantics to
    * repair, unlike the dedup ledgers). Purged ids land as a tombstone
    * slice INSIDE the current generation (a re-train sheds them with
    * it); `rows` decrements in the same atomic commit so the doubling
    * denominator stays honest; [[compactAssigned]] makes the removal
    * physical. No-op for absent ids. Returns vectors removed. */
  def purgeVectors(spark: SparkSession, dir: String,
      vecIds: DataFrame): Long = {
    graft.util.Maintenance.withLeasedWriteLock("IndexStore", spark, dir) {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed index at $dir (missing $MetaName)"))
    val (idx, _) = loadIvf(spark, dir)
    val targets = vecIds.select(vecIds.columns.head).toDF("vid").distinct()
      .join(idx.assigned.select(col("vid")), Seq("vid"), "left_semi")
      .localCheckpoint(true)
    val n = targets.count()
    if (n == 0L) return 0L
    val sliceId = m.slices
    // claim the id: a crashed fold's orphan assigned slice here must not
    // become live when this commit advances the window — its vectors
    // would enter every probe while `rows` never counted them, and the
    // fold's replay would re-insert at S+1 (round-10 ADVICE)
    Generations.claimSlice(spark, dir, Seq(s"gen=${m.gen}/assigned"), sliceId)
    targets.write.mode("overwrite")
      .parquet(s"$dir/gen=${m.gen}/purged/slice=$sliceId")
    commitMeta(spark, dir, m.copy(rows = m.rows - n, slices = sliceId + 1,
      commit = m.commit + 1))
    n
    }
  }

  /** VECTOR REFRESH (round 13) — the last cell of the upsert matrix
    * ([[graft.text.PostingsStore.upsertBatch]] /
    * [[graft.dedup.LedgerStore.upsertDocs]] /
    * [[graft.dedup.SemLedgerStore.upsertVecs]] on the IVF index): after
    * a model upgrade re-embeds documents, the index must retire each
    * vector's OLD copy, land the NEW one (assigned against the FROZEN
    * centroids — one broadcast-argmin pass over the delta), and adjust
    * `rows` by exactly −old +new — atomically, in ONE ledgered commit.
    * [[purgeVectors]]-then-[[ivfMaintainBatch]] as two verbs leaves a
    * crash window: purge has no batch ledger, so a replay between the
    * two commits purges the re-landed copy (or the fold's tombstone
    * screen silently drops the re-insert). Here one commit carries the
    * tombstone slice, the re-assigned data slice ABOVE it (the v4
    * slice-ordered mask keeps it visible), the stats delta, and the
    * batch id.
    *
    * `removeIds` deletes outright; ids in both re-land (the upsert
    * wins). Previously-purged ids re-enter through an upsert (the verb
    * sets the id's current state — unlike the plain fold, whose screen
    * keeps purges sticky). The doubling re-train policy is NOT
    * evaluated here — an upsert is a refresh, roughly row-neutral; the
    * next [[ivfMaintainBatch]] fold checks the policy against the
    * updated `rows`/`baseRows`. Returns the new commit id (None for
    * replays / no-op batches). */
  def upsertVectors(upserts: DataFrame, id: Column, vec: Column,
      removeIds: DataFrame, dir: String, batchId: Long = -1L)
      : Option[Long] = {
    val spark = upserts.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("IndexStore", spark, dir) {
    val m = readMeta(spark, dir).getOrElse(sys.error(
      s"no committed index at $dir — upsertVectors updates an existing " +
        "index; seed with saveIvf/ivfMaintainBatch first"))
    if (batchId >= 0 && batchId <= m.batch) return None
    // one live row per vid (ADVICE r12): exact duplicates collapse,
    // conflicting re-embeddings fail loudly — two copies in one data
    // slice would both sit above the tombstone and both probe
    val newVecs = graft.util.Maintenance.requireUniqueUpserts(
      upserts.select(id.as("vid"), vec.as("v")), "vid", "ivf-index")
      .localCheckpoint(true)
    // ids in both upserts and removeIds re-land (the upsert wins)
    val rem = removeIds.select(removeIds.columns.head).toDF("vid")
      .distinct()
      .join(newVecs.select(col("vid")), Seq("vid"), "left_anti")
      .localCheckpoint(true)
    if (newVecs.isEmpty && rem.isEmpty) {
      recordEmptyBatch(spark, dir, Some(m), batchId); return None
    }
    val (idx, _) = loadIvf(spark, dir)
    // retire the LIVE copies of everything incoming or removed —
    // absent/already-purged ids need no tombstone (their re-land, if
    // any, is a plain insert above the existing mask)
    val targets = newVecs.select(col("vid")).unionByName(rem)
      .join(idx.assigned.select(col("vid")), Seq("vid"), "left_semi")
      .localCheckpoint(true)
    val nGone = targets.count()
    // tombstone slice first (the mask covers only OLDER slices), then
    // the re-assigned data slice above it — ids only claimed for dirs
    // actually written (the crashed-sibling orphan rule)
    var next = m.slices
    if (nGone > 0L) {
      Generations.claimSlice(spark, dir, Seq(s"gen=${m.gen}/assigned"), next)
      targets.write.mode("overwrite")
        .parquet(s"$dir/gen=${m.gen}/purged/slice=$next")
      next += 1
    }
    var dn = 0L
    if (!newVecs.isEmpty) {
      Generations.claimSlice(spark, dir, Seq(s"gen=${m.gen}/purged"), next)
      Similarity.assignDelta(idx, newVecs, col("vid"), col("v"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/gen=${m.gen}/assigned/slice=$next")
      dn = spark.read
        .parquet(s"$dir/gen=${m.gen}/assigned/slice=$next").count()
      next += 1
    }
    if (next == m.slices) { // nothing live to retire, nothing to land
      recordEmptyBatch(spark, dir, Some(m), batchId); return None
    }
    val commit = m.commit + 1
    commitMeta(spark, dir, m.copy(rows = m.rows - nGone + dn,
      batch = batchId, slices = next, commit = commit))
    Some(commit)
    }
  }

  /** The warehouse→ANN-INDEX cascade (round 13): maintain this
    * persisted IVF index FROM a merge table's `changes.merge` feed,
    * exactly-once end-to-end — built on [[upsertVectors]]'s one-commit
    * atomicity, so a warehouse UPDATE re-embeds and re-assigns its
    * vector with no purge-then-insert crash window, and warehouse
    * REMOVEs / `purgeKeys` compliance deletions propagate as index
    * tombstones. `embedOf` is the RE-EMBED HOOK (see
    * [[graft.dedup.SemLedgerStore.followMergeTable]]). Ordering is by
    * (commit, _version) so a RESTORE commit's reinstated rows win
    * their window. */
  def followMergeTable(spark: SparkSession, mergeDir: String, dir: String,
      checkpoint: String, embedOf: Column, sinceCommit: Long = -1L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.util.Cascade.followInto(spark, mergeDir, checkpoint, sinceCommit,
      (ups, rem, bid) => {
        upsertVectors(ups.select(col("_key").as("vid"), embedOf.as("v")),
          col("vid"), col("v"), rem.toDF("vid"), dir, batchId = bid)
        ()
      })
  /** ADVICE r11: a ledgered batch the tombstone screen (or the batch
    * itself) left EMPTY must still record its batch id — returning
    * without a commit leaves the batch unledgered, so after maintenance
    * drops the tombstones, a streaming replay of that batch would
    * re-fold and resurrect the purged vectors. A no-op pointer bump
    * (batch advanced, data untouched) keeps the replay guard
    * `batchId <= m.batch` suppressing the re-fold. */
  private def recordEmptyBatch(spark: SparkSession, dir: String,
      prev: Option[Meta], batchId: Long): Unit =
    prev.foreach { m =>
      if (batchId >= 0 && batchId > m.batch)
        commitMeta(spark, dir, m.copy(batch = batchId, commit = m.commit + 1))
    }

  /** [[recordEmptyBatch]]'s composite-side twin. */
  private def recordEmptyPqBatch(spark: SparkSession, dir: String,
      prev: Option[PqMeta], batchId: Long): Unit =
    prev.foreach { pm =>
      if (batchId >= 0 && batchId > pm.batch)
        Generations.commitArchived(spark, dir, PqMetaName,
          s"""{"format": "$PqFormat", "gen": ${pm.gen}, "rows": ${pm.rows}, """ +
            s""""m": ${pm.m}, "subDim": ${pm.subDim}, """ +
            s""""baseRows": ${pm.baseRows}, """ +
            s""""batch": $batchId, "commit": ${pm.commit + 1}}""",
          pm.commit + 1)
    }


  /** Fold ONE batch of vectors into the persisted index — the complete
    * maintenance step a continuous ingest runs per micro-batch, built
    * from the round's three pieces: frozen-quantizer insert (one
    * broadcast-argmin pass over the batch, [[Similarity.ivfInsert]]),
    * the measured "rebuild after doubling" policy (DriftProbe / SURVEY
    * §9.9 — rows ≥ growthFactor × baseRows re-trains from the assigned
    * table, which HOLDS every vector, so no external corpus is needed),
    * and the manifest-pointer commit. First batch seeds gen 0 by
    * training. Returns (generation, rebuilt?). Empty batches are a
    * no-op (foreachBatch delivers them), and so is a batch id ≤ the
    * manifest's recorded `batch` — the idempotent-foreachBatch ledger
    * that makes the stream EXACTLY-ONCE: after a crash between publish
    * and checkpoint commit, the replayed batch would otherwise
    * re-insert its vectors (the fold is NOT naturally idempotent). A
    * manual (batchId = −1) fold resets the ledger — do not interleave
    * manual folds into a streaming-maintained index while its query is
    * live.
    *
    * v2 fold I/O (round-9 verdict #3, closing the declared trade): a
    * frozen-insert fold writes ONLY its delta's assigned rows as the
    * generation's next slice ([[Similarity.assignDelta]] — one
    * broadcast-argmin pass, cell-partitioned files) and bumps `slices`
    * in the pointer commit — the generation dir is otherwise untouched,
    * so fold write volume tracks the delta (IndexProbe measures it).
    * Only the doubling re-train rewrites: it reassigns every vector,
    * which invalidates the old slices wholesale, so it opens a fresh
    * generation with slice 0 (the epoch reset).
    *
    * CONTRACT — the plain fold is APPEND-ONLY of NEW ids (the sibling
    * stores' adjudicated rule): a batch id already in the index
    * DUPLICATES if never tombstoned and is SCREENED (by id presence in
    * the tombstone ledger, deliberately not by the v4 slice order) if
    * it ever was — purges stay sticky through plain re-folds, and a
    * refresh of any existing id, tombstone history or not, must go
    * through [[upsertVectors]], which retires the live copy and lands
    * the new one in one commit (IndexStoreSpec pins both faces). */
  def ivfMaintainBatch(batch: DataFrame, id: Column, vec: Column,
      dir: String, nCentroids: Int, growthFactor: Double = 2.0,
      retainGens: Int = 2, batchId: Long = -1L): Option[(Long, Boolean)] = {
    val spark = batch.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("IndexStore", spark, dir) {
    val vecs = batch.select(id.as("vid"), vec.as("v"))
    if (vecs.isEmpty) { recordEmptyBatch(spark, dir, readMeta(spark, dir), batchId); return None }
    readMeta(spark, dir) match {
      case None =>
        val seeded = Similarity.buildIvf(vecs, col("vid"), col("v"),
          nCentroids, iterations = 1, materialize = true)
        Some((saveIvf(seeded, dir, retainGens, batchId = batchId), true))
      case Some(m) if batchId >= 0 && batchId <= m.batch =>
        None // crash replay of an already-folded batch: no-op
      case Some(m) =>
        val (idx, _) = loadIvf(spark, dir)
        // TOMBSTONE SCREEN (round-10 ADVICE): a purged vid stays purged
        // until a re-train or compact sheds its tombstone — re-inserting
        // it would bump `rows` while the tombstone hides the vector from
        // every probe, permanently skewing the doubling denominator
        val screened = vecs.join(livePurged(spark, dir, m),
          Seq("vid"), "left_anti")
        if (screened.isEmpty) { recordEmptyBatch(spark, dir, Some(m), batchId); return None }
        // claim the id: a crashed purge's orphan tombstone slice here
        // must not become live under this fold's commit
        Generations.claimSlice(spark, dir, Seq(s"gen=${m.gen}/purged"),
          m.slices)
        // delta-sized write: assign the batch against the frozen
        // centroids and append it as the generation's next slice —
        // invisible until the pointer commit bumps the count
        Similarity.assignDelta(idx, screened, col("vid"), col("v"))
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$dir/gen=${m.gen}/assigned/slice=${m.slices}")
        val dn = spark.read
          .parquet(s"$dir/gen=${m.gen}/assigned/slice=${m.slices}").count()
        val n = m.rows + dn
        if (n.toDouble >= m.baseRows.toDouble * growthFactor) {
          // doubling re-train: read every slice INCLUDING the just-
          // written (still-uncommitted) one directly (minus tombstones —
          // purged vectors must not re-enter through a re-train; the v4
          // slice-ordered mask keeps upsert-re-landed copies in),
          // retrain, publish a fresh generation; the orphan slice dies
          // with its gen's GC
          val tombR = livePurged(spark, dir, m)
            .select(col("vid").as("_tid"), col("_tomb"))
          val all = spark.read.parquet(s"$dir/gen=${m.gen}/assigned")
            .filter(col("slice") >= m.sliceBase && col("slice") <= m.slices)
            .join(tombR,
              col("vid") === col("_tid") && col("_tomb") > col("slice"),
              "left_anti")
            .select(col("vid"), col("v"))
          val retrained = Similarity.buildIvf(all, col("vid"), col("v"),
            nCentroids, iterations = 1, materialize = true)
          Some((saveIvf(retrained, dir, retainGens, batchId = batchId), true))
        } else {
          commitMeta(spark, dir,
            m.copy(rows = n, batch = batchId, slices = m.slices + 1,
              commit = m.commit + 1))
          Some((m.gen, false))
        }
    }
    }
  }

  /** OPTIMIZE for the maintained generation's assigned-slice window
    * (the [[graft.dedup.LedgerStore.compact]] verb on the index side):
    * merge the live slices into ONE cell-partitioned slice and advance
    * `sliceBase` in the same atomic pointer commit — rows, base, and
    * the batch ledger ride along unchanged, so replay safety and
    * search results are preserved (IndexStoreSpec pins both).
    * Superseded slices stay for pre-compact readers until
    * [[vacuumAssignedSlices]]. A re-train makes this moot (it opens a
    * fresh generation at slice 0); compact serves the long-lived
    * below-threshold index that folds forever without doubling. */
  def compactAssigned(spark: SparkSession, dir: String): Option[Long] =
    graft.util.Maintenance.withLeasedWriteLock("IndexStore", spark, dir) {
    readMeta(spark, dir) match {
      case Some(m) if m.slices - m.sliceBase > 1 =>
        val merged = m.slices
        Generations.claimSlice(spark, dir, Seq(s"gen=${m.gen}/purged"),
          merged)
        val (idx, _) = loadIvf(spark, dir)
        idx.assigned.write.mode("overwrite").partitionBy("cell")
          .parquet(s"$dir/gen=${m.gen}/assigned/slice=$merged")
        commitMeta(spark, dir, m.copy(sliceBase = merged,
          slices = merged + 1, commit = m.commit + 1))
        Some(merged)
      case _ => None
    }
    }

  /** Deferred slice GC below the current window base (current
    * generation only — old generations die whole via [[saveIvf]]'s
    * retention GC). */
  def vacuumAssignedSlices(spark: SparkSession, dir: String): Int =
    readMeta(spark, dir).map { m =>
      Generations.gcSlices(spark, dir,
        Seq(s"gen=${m.gen}/assigned", s"gen=${m.gen}/purged"), m.sliceBase)
    }.getOrElse(0)

  /** Continuous index maintenance: start a streaming query folding
    * `vecs` (a STREAMING DataFrame with the id/vec columns) into the
    * persisted index at `dir`, one [[ivfMaintainBatch]] per micro-batch.
    * Exactly-once: the manifest records each fold's batch id, so a
    * batch replayed after a crash between publish and checkpoint commit
    * is recognized and skipped instead of double-inserting its vectors
    * (the standard idempotent-foreachBatch ledger). */
  def ivfMaintainStream(vecs: DataFrame, id: Column, vec: Column,
      dir: String, checkpoint: String, nCentroids: Int,
      growthFactor: Double = 2.0, retainGens: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        ivfMaintainBatch(df, id, vec, dir, nCentroids, growthFactor,
          retainGens, batchId = bid)
        ()
      }
      .start()

  // ---- the composite (IVF-PQ) index, persisted ----

  private val PqMetaName = "_graft_ivfpq_meta.json"
  private val PqFormat = "graft-ivfpq-v3" // v3 (round 11): + commit id / history archive

  private val PqMetaRe =
    ("""\{"format": "([^"]+)", "gen": ([0-9]+), "rows": ([0-9]+), """ +
      """"m": ([0-9]+), "subDim": ([0-9]+), "baseRows": ([0-9]+), """ +
      """"batch": (-?[0-9]+), "commit": ([0-9]+)\}""").r

  /** v2 (round 10): `baseRows` (the doubling-policy denominator) and
    * `batch` (the exactly-once streaming ledger) moved INTO the manifest
    * from the v1 sidecar `_graft_ivfpq_maint.json` — the sidecar was
    * committed AFTER the data pointer flipped, so a crash between the
    * two PUTs left a new generation live against a stale batch id and
    * the replayed batch double-inserted its vectors. One pointer, one
    * atomic PUT, data + ledger indivisible (the [[Meta]] contract the
    * plain-IVF store always had). */
  /** Since round 11 the PQ manifest also carries `commit` — the
    * monotone snapshot id behind [[loadIvfPqAt]]/[[pqCommits]] (the
    * [[Meta]] protocol on the composite side). */
  final case class PqMeta(format: String, gen: Long, rows: Long,
      m: Int, subDim: Int, baseRows: Long, batch: Long, commit: Long)

  private def parsePqMeta(dir: String, body: String): PqMeta = body match {
    case PqMetaRe(f, g, n, m, sd, b, bt, c) =>
      PqMeta(f, g.toLong, n.toLong, m.toInt, sd.toInt, b.toLong,
        bt.toLong, c.toLong)
    case other => sys.error(
      Generations.unparseableMsg(s"$dir (ivfpq manifest)", other, PqFormat))
  }

  private def readPqMeta(spark: SparkSession, dir: String): Option[PqMeta] =
    Generations.readPointer(spark, dir, PqMetaName).map(parsePqMeta(dir, _))

  /** Persist the COMPOSITE index — the one a 100 TB deployment actually
    * stores (codes are ~4·subDim× smaller than vectors): coarse cells
    * and per-subspace codebooks land as bounded parquet metadata tables
    * (nCells and m·ksub rows), the per-row codes table partitions by
    * cell so [[Similarity.ivfPqSearchAdc]]'s existing cell filter gets
    * the same static-pruning I/O cut [[searchPruned]] measures. Same
    * generation + atomic-pointer + deferred-GC discipline as
    * [[saveIvf]]. */
  def saveIvfPq(index: Similarity.IvfPqIndex, dir: String,
      retainGens: Int = 2,
      sideTables: Seq[(String, DataFrame)] = Nil,
      carryBaseRows: Option[Long] = None, batchId: Long = -1L): Long = {
    require(retainGens >= 1, s"retainGens must be >= 1, got $retainGens")
    val spark = index.codes.sparkSession
    import spark.implicits._
    graft.util.Maintenance.withLeasedWriteLock("IndexStore", spark, dir) {
    val prev = readPqMeta(spark, dir)
    prev.foreach(m => require(m.format == PqFormat,
      s"$dir holds a '${m.format}' index; refusing to overwrite with $PqFormat"))
    val gen = prev.map(_.gen + 1).getOrElse(0L)
    index.cells.map { case (cell, c) => (cell, c.toSeq) }
      .toDF("cell", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/gen=$gen/cells")
    (for {
      sub <- 0 until index.pq.m
      (c, code) <- index.pq.codebooks(sub).zipWithIndex
    } yield (sub, code, c.toSeq)).toDF("sub", "code", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/gen=$gen/codebooks")
    index.codes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/gen=$gen/codes")
    // side tables (e.g. the maintenance loop's raw vectors) land INSIDE
    // the generation BEFORE the pointer commit — a crash between them
    // cannot publish a generation missing its tables
    sideTables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/gen=$gen/$name") }
    // count what was written, not the (possibly lazy) input frame
    val n = spark.read.parquet(s"$dir/gen=$gen/codes").count()
    val commit = prev.map(_.commit + 1).getOrElse(0L)
    Generations.commitArchived(spark, dir, PqMetaName,
      s"""{"format": "$PqFormat", "gen": $gen, "rows": $n, """ +
        s""""m": ${index.pq.m}, "subDim": ${index.pq.subDim}, """ +
        s""""baseRows": ${carryBaseRows.getOrElse(n)}, """ +
        s""""batch": $batchId, "commit": $commit}""",
      commit)
    Generations.gc(spark, dir, gen - (retainGens - 1))
    gen
    }
  }

  /** Load the current composite generation: the two quantizer tables
    * come back as bounded driver metadata (the dtab pattern), the codes
    * table as the partitioned scan. The embedded PqIndex's own codes
    * frame is the cell-less projection, so pqSearchAdc also works.
    *
    * No pruned-search variant is needed here:
    * [[Similarity.ivfPqSearchAdc]] already filters `cell IN (probed)`
    * before the explode, and over THIS layout that predicate is a
    * static partition filter — the probed-share file skipping comes
    * free (IndexStoreSpec pins the PartitionFilters plan). */
  def loadIvfPq(spark: SparkSession, dir: String)
      : (Similarity.IvfPqIndex, PqMeta) =
    loadIvfPqOn(spark, dir,
      readPqMeta(spark, dir).getOrElse(
        sys.error(s"no committed index at $dir (missing $PqMetaName)")))

  /** Committed composite-index snapshot ids, ascending. */
  def pqCommits(spark: SparkSession, dir: String): Seq[Long] =
    Generations.listCommits(spark, dir, PqMetaName)

  /** The archived PQ manifest of snapshot `commit`. */
  def pqMetaAt(spark: SparkSession, dir: String, commit: Long): PqMeta =
    parsePqMeta(s"$dir@$commit",
      Generations.readPointerAt(spark, dir, PqMetaName, commit).getOrElse(sys.error(
        s"$dir has no committed snapshot $commit " +
          s"(available: ${pqCommits(spark, dir).mkString(", ")})")))

  /** TIME-TRAVEL [[loadIvfPq]] — the composite index AS OF a committed
    * snapshot id; fails loudly once generation retention dropped the
    * snapshot's dirs (the [[loadIvfAt]] contract on the PQ side —
    * completing the matrix: every persisted substrate in the repo is
    * snapshot-readable). */
  def loadIvfPqAt(spark: SparkSession, dir: String,
      commit: Long): (Similarity.IvfPqIndex, PqMeta) = {
    val m = pqMetaAt(spark, dir, commit)
    require(graft.util.Hfs.exists(
        new org.apache.hadoop.fs.Path(s"$dir/gen=${m.gen}"),
        graft.util.Hfs.conf(spark)),
      s"snapshot $commit of $dir is no longer readable: gen=${m.gen} " +
        "was dropped by generation retention (raise retainGens to keep it)")
    loadIvfPqOn(spark, dir, m)
  }

  private def loadIvfPqOn(spark: SparkSession, dir: String,
      m: PqMeta): (Similarity.IvfPqIndex, PqMeta) = {
    require(m.format == PqFormat, s"$dir holds '${m.format}', expected $PqFormat")
    val cells = spark.read.parquet(s"$dir/gen=${m.gen}/cells")
      .collect().map(r => (r.getAs[Number](0).intValue(),
        r.getSeq[Double](1).toArray)).sortBy(_._1).toIndexedSeq
    val cbRows = spark.read.parquet(s"$dir/gen=${m.gen}/codebooks")
      .collect().map(r => (r.getAs[Number](0).intValue(),
        r.getAs[Number](1).intValue(), r.getSeq[Double](2).toArray))
    val codebooks = (0 until m.m).map { sub =>
      cbRows.filter(_._1 == sub).sortBy(_._2).map(_._3).toIndexedSeq
    }
    val codes = spark.read.parquet(s"$dir/gen=${m.gen}/codes")
      .select(col("vid"), col("codes"), col("cell"))
    (Similarity.IvfPqIndex(cells,
      Similarity.PqIndex(m.m, m.subDim, codebooks,
        codes.select(col("vid"), col("codes"))),
      codes), m)
  }

  /** [[ivfMaintainBatch]]'s composite-index twin: fold one batch into
    * the persisted IVF-PQ index — frozen-quantizer coarse-assign +
    * residual encode ([[Similarity.ivfPqInsert]]), the doubling-policy
    * re-train ([[Similarity.buildIvfPq]] needs the RAW vectors, which
    * PQ codes cannot reconstruct, so this store keeps a vecs table
    * alongside the codes — the honest cost of a retrainable compressed
    * index; a deployment that accepts frozen-forever quantizers can
    * drop it), and a generation publish per fold with the exactly-once
    * batch-id ledger. Since v2 the ledger (rows/baseRows/batch) rides
    * IN the manifest, so one atomic pointer PUT commits data and
    * ledger together — a crash can never publish a generation whose
    * recorded batch id lags its data (the double-insert window the v1
    * sidecar had). */
  def ivfPqMaintainBatch(batch: DataFrame, id: Column, vec: Column,
      dir: String, nCells: Int, m: Int, ksub: Int,
      growthFactor: Double = 2.0, retainGens: Int = 2,
      batchId: Long = -1L): Option[(Long, Boolean)] = {
    val spark = batch.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("IndexStore", spark, dir) {
    val vecs = batch.select(id.as("vid"), vec.as("v")).localCheckpoint(true)
    if (vecs.isEmpty) { recordEmptyPqBatch(spark, dir, readPqMeta(spark, dir), batchId); return None }
    readPqMeta(spark, dir) match {
      case Some(pm) if batchId >= 0 && batchId <= pm.batch =>
        None // crash replay of an already-folded batch
      case None =>
        val seeded = Similarity.buildIvfPq(vecs, col("vid"), col("v"),
          nCells, m, ksub, materialize = true)
        val gen = saveIvfPq(seeded, dir, retainGens,
          sideTables = Seq("vecs" -> vecs), batchId = batchId)
        Some((gen, true))
      case Some(pm) =>
        val (idx, _) = loadIvfPq(spark, dir)
        val oldVecs = spark.read.parquet(s"$dir/gen=${pm.gen}/vecs")
          .localCheckpoint(true) // survives its generation's GC
        val allVecs = oldVecs.unionByName(vecs)
        val n = pm.rows + vecs.count()
        if (n.toDouble >= pm.baseRows.toDouble * growthFactor) {
          val retrained = Similarity.buildIvfPq(allVecs,
            col("vid"), col("v"), nCells, m, ksub, materialize = true)
          val gen = saveIvfPq(retrained, dir, retainGens,
            sideTables = Seq("vecs" -> allVecs), batchId = batchId)
          Some((gen, true))
        } else {
          val grown = Similarity.ivfPqInsert(idx, vecs,
            col("vid"), col("v"), materialize = true)
          val gen = saveIvfPq(grown, dir, retainGens,
            sideTables = Seq("vecs" -> allVecs),
            carryBaseRows = Some(pm.baseRows), batchId = batchId)
          Some((gen, false))
        }
    }
    }
  }

  /** [[followMergeTable]]'s composite twin: the `changes.merge` feed
    * maintaining the persisted IVF-PQ store through
    * [[upsertPqVectors]] — retired codes, frozen-quantizer re-encodes,
    * and the rewritten raw-vecs side table publish per feed window,
    * exactly-once via the same offsets + batch ledger. */
  def followMergeTablePq(spark: SparkSession, mergeDir: String,
      dir: String, checkpoint: String, embedOf: Column,
      retainGens: Int = 2, sinceCommit: Long = -1L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.util.Cascade.followInto(spark, mergeDir, checkpoint, sinceCommit,
      (ups, rem, bid) => {
        upsertPqVectors(ups.select(col("_key").as("vid"), embedOf.as("v")),
          col("vid"), col("v"), rem.toDF("vid"), dir, retainGens,
          batchId = bid)
        ()
      })

  /** [[upsertVectors]]'s composite-index twin — VECTOR REFRESH on the
    * persisted IVF-PQ store: retire the old copies of incoming/removed
    * ids, encode the new vectors against the FROZEN coarse cells and
    * codebooks ([[Similarity.ivfPqInsert]] over the pruned index — one
    * broadcast-assign + broadcast-encode pass over the delta), and
    * publish — atomically by construction, because the PQ store
    * publishes whole generations through one pointer PUT that carries
    * data, stats (`rows` recounted from the written codes = −old +new),
    * and the batch ledger together. The raw-vecs side table is rewritten
    * minus the retired ids so a later doubling re-train trains on the
    * post-refresh corpus. `removeIds` deletes outright; ids in both
    * re-land (the upsert wins). No re-train here — the next
    * [[ivfPqMaintainBatch]] fold checks the doubling policy. Returns the
    * published generation (None for replays / no-op batches). */
  def upsertPqVectors(upserts: DataFrame, id: Column, vec: Column,
      removeIds: DataFrame, dir: String, retainGens: Int = 2,
      batchId: Long = -1L): Option[Long] = {
    val spark = upserts.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("IndexStore", spark, dir) {
    val pm = readPqMeta(spark, dir).getOrElse(sys.error(
      s"no committed index at $dir — upsertPqVectors updates an existing " +
        "index; seed with saveIvfPq/ivfPqMaintainBatch first"))
    if (batchId >= 0 && batchId <= pm.batch) return None
    val newVecs = graft.util.Maintenance.requireUniqueUpserts(
      upserts.select(id.as("vid"), vec.as("v")), "vid", "ivfpq-index")
      .localCheckpoint(true)
    // ids in both upserts and removeIds re-land (the upsert wins)
    val rem = removeIds.select(removeIds.columns.head).toDF("vid")
      .distinct()
      .join(newVecs.select(col("vid")), Seq("vid"), "left_anti")
      .localCheckpoint(true)
    if (newVecs.isEmpty && rem.isEmpty) {
      recordEmptyPqBatch(spark, dir, Some(pm), batchId); return None
    }
    // survives its generation's GC (and the new gen's publish)
    val oldVecs = spark.read.parquet(s"$dir/gen=${pm.gen}/vecs")
      .localCheckpoint(true)
    val targets = newVecs.select(col("vid")).unionByName(rem)
      .join(oldVecs.select(col("vid")), Seq("vid"), "left_semi")
      .localCheckpoint(true)
    if (newVecs.isEmpty && targets.isEmpty) { // removes of absent ids
      recordEmptyPqBatch(spark, dir, Some(pm), batchId); return None
    }
    val (idx, _) = loadIvfPq(spark, dir)
    val keptCodes = idx.codes.join(targets, Seq("vid"), "left_anti")
    val pruned = Similarity.IvfPqIndex(idx.cells,
      idx.pq.copy(codes = keptCodes.select(col("vid"), col("codes"))),
      keptCodes)
    val refreshed =
      if (newVecs.isEmpty) pruned
      else Similarity.ivfPqInsert(pruned, newVecs, col("vid"), col("v"),
        materialize = true)
    val allVecs = oldVecs.join(targets, Seq("vid"), "left_anti")
      .unionByName(newVecs)
    Some(saveIvfPq(refreshed, dir, retainGens,
      sideTables = Seq("vecs" -> allVecs),
      carryBaseRows = Some(pm.baseRows), batchId = batchId))
    }
  }

  /** Continuous composite-index maintenance — [[ivfMaintainStream]]'s
    * IVF-PQ twin, exactly-once via the manifest's batch-id ledger. */
  def ivfPqMaintainStream(vecs: DataFrame, id: Column, vec: Column,
      dir: String, checkpoint: String, nCells: Int, m: Int, ksub: Int,
      growthFactor: Double = 2.0, retainGens: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        ivfPqMaintainBatch(df, id, vec, dir, nCells, m, ksub,
          growthFactor, retainGens, batchId = bid)
        ()
      }
      .start()

  /** IVF probe over a PERSISTED index via static partition pruning: the
    * cell ranking is centroid-table-sized driver metadata (the
    * ivfSearchAuto fetch pattern), and the resulting `cell IN (...)`
    * filter prunes whole partition directories at planning time — the
    * scan touches only the probed cells' files. Result ≡
    * [[Similarity.ivfSearch]] on the same index (same cells, same
    * cosine, same ties). */
  def searchPruned(index: Similarity.IvfIndex, query: DataFrame, k: Int,
      nprobe: Int = 2): DataFrame = {
    import Similarity.cosine
    val probed = index.centroids
      .crossJoin(broadcast(query))
      .withColumn("sim", cosine(col("c"), col("q")))
      .orderBy(col("sim").desc, col("cell"))
      .limit(nprobe)
      .select(col("cell"))
      .collect().map(_.getAs[Number](0).intValue()).toSeq
    index.assigned
      .filter(col("cell").isin(probed: _*))
      .crossJoin(broadcast(query))
      .withColumn("cosine", cosine(col("v"), col("q")))
      .select(col("vid").as("nn_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("nn_id"))
      .limit(k)
  }

  /** The committed snapshot id produced by LEDGERED batch `batchId` —
    * the pin a cross-store set manifest records (ADVICE r11). −1 when
    * the store has no committed state at all. */
  def commitForBatch(spark: SparkSession, dir: String,
      batchId: Long): Long =
    if (readMeta(spark, dir).isEmpty) -1L
    else Generations.foldCommitForBatch(spark, dir, MetaName, batchId)

  /** [[commitForBatch]]'s composite-index twin. */
  def pqCommitForBatch(spark: SparkSession, dir: String,
      batchId: Long): Long =
    if (readPqMeta(spark, dir).isEmpty) -1L
    else Generations.foldCommitForBatch(spark, dir, PqMetaName, batchId)
}
