package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Generations

/** Persisted GRAPH SUBSTRATE with incremental maintenance — the disk
  * face of q239's maintained co-purchase edge state, completing the
  * maintained-substrate set on the graph side (text ledger →
  * [[graft.dedup.LedgerStore]], semantic ledger → SemLedgerStore, ANN →
  * IndexStore, retrieval → [[graft.text.PostingsStore]]; the edge table
  * every graph-analytics query probes → here).
  *
  * Layout — a DELTA-STORE (LSM-shaped): pair COUNTS are a merge, not an
  * append, so a fold persists only its Δ-counts slice and readers merge
  * at load; [[compact]] folds the window into one pre-aggregated slice.
  * {{{
  *   dir/_graft_graph_meta.json  <- pointer (batch ledger + slice window)
  *   dir/items/slice=S/          <- parquet (ord, item)   (the fold's lines)
  *   dir/pairs/slice=S/          <- parquet (u, v, dn)    (the fold's Δ-counts)
  * }}}
  *
  * A fold runs the bilinear expansion ([[GraphQueries.edgeDelta]]:
  * base ⋈ Δ restricted to touched baskets ∪ C(Δ, 2)) against the LIVE
  * items store and appends both slices before one atomic pointer
  * commit; write volume tracks the delta. Readers apply the
  * co-occurrence threshold at probe time (state keeps all counts — a
  * pair at 1 must be able to cross the floor later). Replays are no-ops
  * via the batch-id ledger. Contract: a line item folds exactly once
  * (disjoint delta batches — the LedgerStore/PostingsStore identity
  * rule).
  */
object GraphStore {

  private val MetaName = "_graft_graph_meta.json"
  // v3 (round 11): + commit id / history archive.
  // v4 (round 13): SLICE-ORDERED tombstones — a purged/slice=S basket
  // masks only item slices < S, so [[upsertOrders]] can retire a
  // basket's old lines and land its refreshed ones in ONE atomic
  // commit (the ivf-v4 / postings-v3 rule). Pure purge flows read
  // identically (a purge's tombstone is always newer than the lines it
  // targets); a pre-round-13 dir fails loudly as a format mismatch.
  private val Format = "graft-graph-v4"

  /** v2: `prefixes` — the basket-hash partition fan of the items store
    * (`items/slice=S/op=P`, op = hash(ord) mod prefixes; frozen at seed
    * like every store layout constant). A fold's base-side read prunes
    * to its delta's touched prefixes — the LedgerStore bucket-prefix
    * trick on the basket axis — so the "base side probes only the
    * touched baskets" claim is static partition pruning, not a
    * corpus-wide scan followed by a semi-join. */
  /** Since round 11 every meta also carries `commit` — the monotone
    * snapshot id behind [[loadAt]]/[[commits]] time travel (the
    * [[graft.dedup.LedgerStore]] protocol). */
  final case class Meta(format: String, batch: Long, prefixes: Int,
      sliceBase: Long, slices: Long, commit: Long)

  private val MetaRe =
    ("""\{"format": "([^"]+)", "batch": (-?[0-9]+), """ +
      """"prefixes": ([0-9]+), """ +
      """"sliceBase": ([0-9]+), "slices": ([0-9]+), """ +
      """"commit": ([0-9]+)\}""").r

  private def parseMeta(dir: String, body: String): Meta = body match {
    case MetaRe(f, b, px, sb, sl, c) =>
      Meta(f, b.toLong, px.toInt, sb.toLong, sl.toLong, c.toLong)
    case other => sys.error(
      Generations.unparseableMsg(s"$dir (graph manifest)", other, Format))
  }

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    Generations.readPointer(spark, dir, MetaName).map(parseMeta(dir, _))

  private def commitMeta(spark: SparkSession, dir: String, m: Meta): Unit =
    Generations.commitArchived(spark, dir, MetaName,
      s"""{"format": "$Format", "batch": ${m.batch}, """ +
        s""""prefixes": ${m.prefixes}, """ +
        s""""sliceBase": ${m.sliceBase}, "slices": ${m.slices}, """ +
        s""""commit": ${m.commit}}""",
      m.commit)

  /** Basket-hash partition key: pure function of the basket id. */
  private def opOf(ord: Column, prefixes: Int): Column =
    pmod(xxhash64(ord), lit(prefixes.toLong)).cast("int")

  private def live(spark: SparkSession, dir: String, sub: String,
      m: Meta): DataFrame =
    spark.read.parquet(s"$dir/$sub")
      .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
      .drop("slice")

  /** Tombstoned basket ids with their tombstone slice (the
    * [[purgeOrders]]/[[upsertOrders]] ledger) — since v4 the slice id
    * rides along: a tombstone masks only item slices OLDER than it, so
    * an upsert's re-landed basket (written above its own tombstone)
    * stays visible. */
  private def livePurgedOrds(spark: SparkSession, dir: String,
      m: Meta): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/purged")
    val hc = graft.util.Hfs.conf(spark)
    val hasSlices = graft.util.Hfs.exists(p, hc) &&
      graft.util.Hfs.list(p, hc).exists(_.getPath.getName.startsWith("slice="))
    if (hasSlices)
      spark.read.parquet(s"$dir/purged")
        .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
        .select(col("ord"), col("slice").cast("long").as("_tomb"))
    else {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("ord", "_tomb")
    }
  }

  /** The v4 mask: drop item lines whose basket has a NEWER tombstone. */
  private def maskItems(items: DataFrame, tomb: DataFrame): DataFrame =
    items.join(tomb.select(col("ord").as("_tord"), col("_tomb")),
        col("ord") === col("_tord") && col("_tomb") > col("slice"),
        "left_anti")
      .select(col("ord"), col("item"))

  /** The live basket lines minus tombstoned baskets. */
  private def liveItems(spark: SparkSession, dir: String, m: Meta): DataFrame =
    maskItems(
      spark.read.parquet(s"$dir/items")
        .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
        .select(col("ord"), col("item"), col("slice")),
      livePurgedOrds(spark, dir, m))

  /** The fold's BASE-side read, pruned to the prefixes a delta's
    * baskets touch (≤ `prefixes` driver ints — bounded metadata): every
    * line of a basket lives in ONE `op` partition, so the prune is
    * lossless and the scan volume tracks the delta's basket spread, not
    * the corpus (GraphStoreSpec pins the PartitionFilters plan). */
  private[warehouse] def baseItemsFor(spark: SparkSession, dir: String,
      deltaOrds: DataFrame): DataFrame = {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed graph store at $dir (missing $MetaName)"))
    val ops = deltaOrds.select(
        opOf(col(deltaOrds.columns.head), m.prefixes).as("op"))
      .distinct().collect().map(_.getInt(0)).toSeq
    maskItems(
      spark.read.parquet(s"$dir/items")
        .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
        .filter(col("op").isin(ops.map(Integer.valueOf): _*))
        .select(col("ord"), col("item"), col("slice")),
      livePurgedOrds(spark, dir, m))
  }

  def meta(spark: SparkSession, dir: String): Option[Meta] =
    readMeta(spark, dir)

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

  /** Fold one batch of NEW basket lines (ord, item) into the store:
    * Δ-pair expansion against the live items, two appended slices, one
    * atomic commit. Empty batches and crash replays are no-ops. */
  def maintainBatch(batch: DataFrame, ord: Column, item: Column,
      dir: String, batchId: Long = -1L,
      prefixes: Int = 64): Option[Long] = {
    val spark = batch.sparkSession
    // purge/fold/compact serialize on the per-(store, dir) monitor
    // (round-11 verdict #5); cross-process stays single-writer
    graft.util.Maintenance.withLeasedWriteLock("GraphStore", spark, dir) {
    val items = batch.select(ord.as("ord"), item.as("item"))
    if (items.isEmpty) { recordEmptyBatch(spark, dir, readMeta(spark, dir), batchId); return None }
    val prev = readMeta(spark, dir)
    prev match {
      case Some(m) if batchId >= 0 && batchId <= m.batch => return None
      case Some(m) => require(m.prefixes == prefixes,
        s"graph store at $dir was seeded with prefixes=${m.prefixes}; " +
          s"refusing a mismatched fold ($prefixes) — one store, one layout")
      case None => ()
    }
    val m = prev.getOrElse(
      Meta(Format, -1L, prefixes, sliceBase = 0L, slices = 0L,
        commit = -1L))
    // TOMBSTONE SCREEN (round-10 ADVICE): a purged basket stays purged
    // until compact+vacuum; re-folding its lines would add pair counts
    // while the tombstone hides the lines from every items read, so the
    // merged counts would disagree with the live lines.
    val screened = prev.fold(items)(m0 =>
      items.join(livePurgedOrds(spark, dir, m0), Seq("ord"), "left_anti"))
    if (prev.isDefined && screened.isEmpty) { recordEmptyBatch(spark, dir, prev, batchId); return None }
    val baseItems =
      if (m.slices == m.sliceBase)
        items.limit(0) // seed: no live items yet
      else baseItemsFor(spark, dir, screened.select(col("ord")))
    val sliceId = m.slices
    // claim the id: a crashed purge's orphan tombstone slice here must
    // not become live under this fold's commit
    Generations.claimSlice(spark, dir, Seq("purged"), sliceId)
    GraphQueries.edgeDelta(baseItems, screened, "ord", "item")
      .write.mode("overwrite").parquet(s"$dir/pairs/slice=$sliceId")
    screened.withColumn("op", opOf(col("ord"), prefixes))
      .write.mode("overwrite").partitionBy("op")
      .parquet(s"$dir/items/slice=$sliceId")
    commitMeta(spark, dir, m.copy(batch = batchId, slices = sliceId + 1,
      commit = m.commit + 1))
    Some(sliceId)
    }
  }

  /** Continuous substrate maintenance: one fold per micro-batch,
    * exactly-once via the manifest's batch-id ledger. `prefixes` must
    * match the store's seeded fan (forwarded to every fold — round-10
    * ADVICE: the hard-coded default killed streams over stores seeded
    * with any other fan). */
  def maintainStream(lines: DataFrame, ord: Column, item: Column,
      dir: String, checkpoint: String, prefixes: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    lines.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        maintainBatch(df, ord, item, dir, batchId = bid,
          prefixes = prefixes)
        ()
      }
      .start()

  /** Load the current state: (live items, MERGED pair counts (u, v,
    * n_ab) — the Δ-slices aggregated; the read-side merge is the
    * delta-store trade [[compact]] amortizes). Readers apply their
    * co-occurrence floor on n_ab. */
  def load(spark: SparkSession, dir: String): (DataFrame, DataFrame, Meta) = {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed graph store at $dir (missing $MetaName)"))
    require(m.format == Format, s"$dir holds '${m.format}', expected $Format")
    (liveItems(spark, dir, m),
      live(spark, dir, "pairs", m)
        .groupBy(col("u"), col("v")).agg(sum(col("dn")).as("n_ab"))
        .filter(col("n_ab") =!= 0L), m)
  }

  /** Committed snapshot ids available for [[loadAt]], ascending. */
  def commits(spark: SparkSession, dir: String): Seq[Long] =
    Generations.listCommits(spark, dir, MetaName)

  /** The archived manifest of snapshot `commit`. */
  def metaAt(spark: SparkSession, dir: String, commit: Long): Meta =
    parseMeta(s"$dir@$commit",
      Generations.readPointerAt(spark, dir, MetaName, commit).getOrElse(sys.error(
        s"$dir has no committed snapshot $commit " +
          s"(available: ${commits(spark, dir).mkString(", ")})")))

  /** TIME-TRAVEL [[load]] — the graph substrate AS OF a committed
    * snapshot id (items and merged pair counts resolved through the
    * archived manifest's slice window): a pre-purge snapshot still sees
    * the purged baskets while its slices survive. Fails loudly once
    * [[vacuumSlices]] retired the window — the fail-closed
    * [[graft.cdc.Apply.readMergeTableAt]] contract. */
  def loadAt(spark: SparkSession, dir: String,
      commit: Long): (DataFrame, DataFrame, Meta) = {
    val m = metaAt(spark, dir, commit)
    Generations.requireSlicesReadable(spark, dir,
      Seq("items", "pairs", "purged"), m.sliceBase, m.slices,
      s"snapshot $commit")
    (liveItems(spark, dir, m),
      live(spark, dir, "pairs", m)
        .groupBy(col("u"), col("v")).agg(sum(col("dn")).as("n_ab"))
        .filter(col("n_ab") =!= 0L), m)
  }

  /** Merge the live window into ONE slice per store — the pair slice
    * lands PRE-AGGREGATED, so post-compact loads skip the read-side
    * merge for everything up to the compaction point. Atomic window
    * advance; ledger unchanged; superseded slices stay until
    * [[vacuumSlices]]. */
  def compact(spark: SparkSession, dir: String): Option[Long] =
    graft.util.Maintenance.withLeasedWriteLock("GraphStore", spark, dir) {
    readMeta(spark, dir) match {
      case Some(m) if m.slices - m.sliceBase > 1 =>
        val merged = m.slices
        Generations.claimSlice(spark, dir, Seq("purged"), merged)
        live(spark, dir, "pairs", m)
          .groupBy(col("u"), col("v")).agg(sum(col("dn")).as("dn"))
          .filter(col("dn") =!= 0L)
          .write.mode("overwrite").parquet(s"$dir/pairs/slice=$merged")
        liveItems(spark, dir, m)
          .withColumn("op", opOf(col("ord"), m.prefixes))
          .write.mode("overwrite").partitionBy("op")
          .parquet(s"$dir/items/slice=$merged")
        commitMeta(spark, dir, m.copy(sliceBase = merged,
          slices = merged + 1, commit = m.commit + 1))
        Some(merged)
      case _ => None
    }
    }

  /** Deferred slice GC below the current window base. */
  def vacuumSlices(spark: SparkSession, dir: String): Int =
    readMeta(spark, dir).map { m =>
      Generations.gcSlices(spark, dir, Seq("items", "pairs", "purged"),
        m.sliceBase)
    }.getOrElse(0)

  /** DECREMENTAL substrate maintenance — remove whole BASKETS (the
    * user-data purge unit: every pair lives within one basket, so a
    * basket's removal is self-contained). The delta-store makes the
    * decrement natural: one NEGATIVE Δ-count slice — exactly the purged
    * baskets' internal pair multiset, recomputed from the stored lines
    * — cancels their contributions in the read-side merge (zeroed pairs
    * drop at load), and the basket ids land as a tombstone slice
    * filtering the items reads, so later folds cannot pair against
    * purged lines. [[compact]] then makes the removal physical (the
    * pre-aggregated merge excludes zeros and the tombstoned lines).
    * No-op for absent/already-purged baskets. Returns the slice id. */
  def purgeOrders(spark: SparkSession, dir: String,
      ords: DataFrame): Option[Long] = {
    graft.util.Maintenance.withLeasedWriteLock("GraphStore", spark, dir) {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed graph store at $dir (missing $MetaName)"))
    val targets = ords.select(ords.columns.head).toDF("ord").distinct()
      .join(liveItems(spark, dir, m).select(col("ord")), Seq("ord"),
        "left_semi")
      .localCheckpoint(true)
    if (targets.isEmpty) return None
    // pruned read: the purged baskets' prefixes only
    val goneLines = baseItemsFor(spark, dir, targets)
      .join(targets, Seq("ord"), "left_semi").localCheckpoint(true)
    val sliceId = m.slices
    // claim the id: a crashed fold's orphan items slice must not become
    // live when this commit advances the window (pairs is overwritten
    // below — overwrite is the claim)
    Generations.claimSlice(spark, dir, Seq("items"), sliceId)
    GraphQueries.edgeDelta(goneLines.limit(0), goneLines, "ord", "item")
      .select(col("u"), col("v"), (-col("dn")).as("dn"))
      .write.mode("overwrite").parquet(s"$dir/pairs/slice=$sliceId")
    targets.write.mode("overwrite").parquet(s"$dir/purged/slice=$sliceId")
    commitMeta(spark, dir, m.copy(slices = sliceId + 1,
      commit = m.commit + 1))
    Some(sliceId)
    }
  }

  /** BASKET REFRESH (round 13) — the graph store's cell of the upsert
    * matrix: when a warehouse order CHANGES (lines added/removed), the
    * co-purchase graph must retire the basket's old pairs and land its
    * new ones atomically. The delta-store layout makes this pure
    * differential algebra in ONE ledgered commit over two slice ids:
    * slice S carries the tombstone (v4 slice-ordered: masks only older
    * item slices) plus the NEGATIVE Δ-pairs cancelling the retired
    * lines; slice S+1 carries the new lines and their POSITIVE Δ-pairs
    * (replacement semantics — the new basket pairs against itself
    * only, its old lines being retired in the same commit). Summing
    * the pairs feed therefore keeps maintaining exact edge weights
    * through updates, with nothing new for consumers to learn.
    * `removeOrds` deletes baskets outright; an ord in both re-lands
    * (the upsert wins); previously-purged baskets re-enter through an
    * upsert. `upserts` carries (ord, item) LINES — exact duplicate
    * lines collapse (a basket is a line SET here; both engines and the
    * oracle must agree on multiplicity, and at-least-once producers
    * re-deliver). Returns the first slice written (None for replays /
    * no-op batches). */
  def upsertOrders(upserts: DataFrame, ord: Column, item: Column,
      removeOrds: DataFrame, dir: String, batchId: Long = -1L)
      : Option[Long] = {
    val spark = upserts.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("GraphStore", spark, dir) {
    val m = readMeta(spark, dir).getOrElse(sys.error(
      s"no committed graph store at $dir — upsertOrders updates an " +
        "existing store; seed with maintainBatch first"))
    if (batchId >= 0 && batchId <= m.batch) return None
    val lines = upserts.select(ord.as("ord"), item.as("item"))
      .distinct().localCheckpoint(true)
    val rem = removeOrds.select(removeOrds.columns.head).toDF("ord")
      .distinct()
      .join(lines.select(col("ord")), Seq("ord"), "left_anti")
      .localCheckpoint(true)
    if (lines.isEmpty && rem.isEmpty) {
      recordEmptyBatch(spark, dir, Some(m), batchId); return None
    }
    // retire the LIVE baskets among incoming/removed — absent or
    // already-purged ords need no tombstone (their re-land, if any, is
    // a plain insert above the existing mask)
    val targets = lines.select(col("ord")).distinct().unionByName(rem)
      .join(liveItems(spark, dir, m).select(col("ord")), Seq("ord"),
        "left_semi")
      .localCheckpoint(true)
    var next = m.slices
    if (!targets.isEmpty) {
      // tombstone + cancelling negatives, one slice id
      val goneLines = baseItemsFor(spark, dir, targets)
        .join(targets, Seq("ord"), "left_semi").localCheckpoint(true)
      Generations.claimSlice(spark, dir, Seq("items"), next)
      GraphQueries.edgeDelta(goneLines.limit(0), goneLines, "ord", "item")
        .select(col("u"), col("v"), (-col("dn")).as("dn"))
        .write.mode("overwrite").parquet(s"$dir/pairs/slice=$next")
      targets.write.mode("overwrite").parquet(s"$dir/purged/slice=$next")
      next += 1
    }
    if (!lines.isEmpty) {
      // the re-landed/new baskets + their pairs, one slice id above
      Generations.claimSlice(spark, dir, Seq("purged"), next)
      GraphQueries.edgeDelta(lines.limit(0), lines, "ord", "item")
        .write.mode("overwrite").parquet(s"$dir/pairs/slice=$next")
      lines.withColumn("op", opOf(col("ord"), m.prefixes))
        .write.mode("overwrite").partitionBy("op")
        .parquet(s"$dir/items/slice=$next")
      next += 1
    }
    if (next == m.slices) { // removes of absent baskets only
      recordEmptyBatch(spark, dir, Some(m), batchId); return None
    }
    commitMeta(spark, dir, m.copy(batch = batchId, slices = next,
      commit = m.commit + 1))
    Some(m.slices)
    }
  }

  /** The warehouse→GRAPH cascade: maintain this store FROM a merge
    * table's `changes.merge` feed (the
    * [[graft.text.PostingsStore.followMergeTable]] family, via the
    * shared [[graft.util.Cascade.followInto]] harness) — warehouse
    * order updates refresh their baskets atomically
    * ([[upsertOrders]]), REMOVEs and `purgeKeys` compliance deletions
    * cancel their pairs, exactly-once end-to-end. `itemsOf` maps a
    * feed row to its item ARRAY (the order's basket). A MODIFY whose
    * basket is EMPTY or NULL explodes to zero lines, so its ord would
    * reach [[upsertOrders]] in neither upserts nor removeOrds and its
    * old pairs would silently stay live (ADVICE r13) — the verb's
    * contract is "sets the id's current state", so empty-basket keys
    * are routed into removeOrds and retired in the same commit. */
  def followMergeTable(spark: SparkSession, mergeDir: String, dir: String,
      checkpoint: String, itemsOf: Column, sinceCommit: Long = -1L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.util.Cascade.followInto(spark, mergeDir, checkpoint, sinceCommit,
      (ups, rem, bid) => applyFeedWindow(ups, rem, dir, itemsOf, bid))

  /** ONE feed window into [[upsertOrders]] — shared by
    * [[followMergeTable]] and the set-cascade follower
    * ([[graft.util.Cascade.graphFollower]]), so the empty-basket rule
    * above cannot drift between the two paths (the round-13 followInto
    * lesson, one level down). */
  private[graft] def applyFeedWindow(ups: DataFrame, rem: DataFrame,
      dir: String, itemsOf: Column, batchId: Long): Unit = {
    val keyed = ups.select(col("_key").as("ord"), itemsOf.as("items"))
    val emptied = keyed
      .filter(col("items").isNull || size(col("items")) === 0)
      .select(col("ord"))
    upsertOrders(
      keyed.select(col("ord"), explode(col("items")).as("item")),
      col("ord"), col("item"),
      rem.toDF("ord").unionByName(emptied), dir, batchId = batchId)
    ()
  }

  /** CHANGE-FEED resolution (round 12 — the
    * [[graft.text.PostingsStore.changeDirs]] analog on the graph
    * substrate, consumed through `format("graft")` as
    * `changes.graph.{pairs,items,purged}`): the slice dirs commits
    * `(since, until]` appended. The delta-store layout makes the
    * `pairs` feed DIFFERENTIAL in the differential-dataflow sense — a
    * fold's slice carries positive Δ-counts, a purge's slice carries
    * the NEGATIVE Δ-counts that cancel the purged baskets, so a
    * downstream consumer maintains exact edge weights by summing `dn`
    * over the feed; a compact (physical pre-aggregation of already-
    * flowed rows) contributes nothing. */
  def changeDirs(spark: SparkSession, dir: String, sub: String,
      since: Long, until: Long): (Seq[String], String) = {
    require(Set("items", "pairs", "purged")(sub),
      s"unknown graph-store table '$sub'")
    Generations.changeSliceDirs(spark, dir, sub,
      Seq("items", "pairs", "purged"),
      c => if (c < 0L) (0L, 0L) else {
        val m = metaAt(spark, dir, c); (m.sliceBase, m.slices)
      }, since, until)
  }

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
