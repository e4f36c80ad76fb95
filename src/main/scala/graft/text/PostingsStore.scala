package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Generations

/** Persisted INVERTED INDEX with incremental maintenance — the retrieval
  * stack's disk face, completing the set of maintained substrates (text
  * dedup ledger → [[graft.dedup.LedgerStore]], semantic ledger →
  * [[graft.dedup.SemLedgerStore]], ANN indexes →
  * [[graft.ann.IndexStore]]; BM25 → here). q215's `LmQueries.bm25`
  * recomputes tokenization and postings from the corpus every run; a
  * production retrieval deployment tokenizes each document ONCE, at
  * ingest, and serves every query from the stored postings. This store
  * is that shape, under the repo's shared commit discipline:
  *
  * Layout (the LedgerStore v3 slice-window pattern):
  * {{{
  *   dir/_graft_postings_meta.json  <- pointer (+ corpus stats + window)
  *   dir/postings/slice=S/tp=P/     <- parquet (term, id, tf)
  *   dir/doclen/slice=S/            <- parquet (id, dl)
  * }}}
  *
  * A fold tokenizes ONLY its delta batch ([[TextFunctions.tokens]] — the
  * exact q215 tokenizer, so stored postings replay the recompute
  * bit-for-bit), appends one immutable slice per store, and commits the
  * updated corpus statistics (`nDocs`, `totTokens` — BM25's N and avgdl
  * numerator) in the same atomic pointer PUT as the slice count: stats
  * and postings can never disagree. Replays are no-ops via the batch-id
  * ledger; [[compact]]/[[vacuumSlices]] bound the slice population.
  *
  * The postings partition by `tp` — a term-hash prefix — so a query's
  * term filter becomes a STATIC partition prune: [[bm25Query]] computes
  * its ≤|terms| prefix values driver-side and opens only those
  * partitions of the live slices, never the whole index (the
  * IndexStore.searchPruned / LedgerStore bucket-prefix pattern on the
  * term axis). `tp` is internal layout only and never crosses an oracle.
  *
  * Contract (shared with LedgerStore): each document folds exactly once
  * — delta batches are disjoint; a doc re-folded under a new batch id
  * would double its postings (upstream dedup owns identity, as in every
  * warehouse ingest path here).
  */
object PostingsStore {

  private val MetaName = "_graft_postings_meta.json"
  // v2 (round 11): + commit id / history archive.
  // v3 (round 12): tombstones are SLICE-ORDERED — a purged/slice=S row
  // masks only data rows with slice < S, so [[upsertBatch]] can retire
  // a document's old copy and land its new one in ONE atomic commit
  // (UPDATE maintenance). For stores that never re-fold a purged id —
  // everything v2 allowed — the semantics are identical (a purge's
  // tombstone is always newer than every row it targets), but a v2
  // build reading a v3 store would hide upserted rows, so the format
  // is bumped and cross-build reads fail loudly.
  private val Format = "graft-postings-v3"

  /** v2 (round 11): `commit` — the monotone snapshot id. Every pointer
    * flip archives its body under `_graft_history/commit-<id>.json`
    * (the [[graft.cdc.Apply]] time-travel protocol via
    * [[Generations.commitArchived]]), so [[bm25QueryAt]] can answer
    * from any still-readable past snapshot. */
  final case class Meta(format: String, batch: Long, nDocs: Long,
      totTokens: Long, prefixes: Int, sliceBase: Long, slices: Long,
      commit: Long)

  private val MetaRe =
    ("""\{"format": "([^"]+)", "batch": (-?[0-9]+), "nDocs": ([0-9]+), """ +
      """"totTokens": ([0-9]+), "prefixes": ([0-9]+), """ +
      """"sliceBase": ([0-9]+), "slices": ([0-9]+), """ +
      """"commit": ([0-9]+)\}""").r

  private def parseMeta(dir: String, body: String): Meta = body match {
    case MetaRe(f, b, nd, tt, px, sb, sl, c) =>
      Meta(f, b.toLong, nd.toLong, tt.toLong, px.toInt, sb.toLong,
        sl.toLong, c.toLong)
    case other => sys.error(
      Generations.unparseableMsg(s"$dir (postings manifest)", other, Format))
  }

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    Generations.readPointer(spark, dir, MetaName).map(parseMeta(dir, _))

  private def commitMeta(spark: SparkSession, dir: String, m: Meta): Unit =
    Generations.commitArchived(spark, dir, MetaName,
      s"""{"format": "$Format", "batch": ${m.batch}, "nDocs": ${m.nDocs}, """ +
        s""""totTokens": ${m.totTokens}, "prefixes": ${m.prefixes}, """ +
        s""""sliceBase": ${m.sliceBase}, "slices": ${m.slices}, """ +
        s""""commit": ${m.commit}}""",
      m.commit)

  /** Term-prefix partition key: a pure function of the term (every
    * posting of a term lives in ONE prefix — the minhashPostings `bp`
    * argument applied to terms). Internal layout only. */
  private def tp(term: Column, prefixes: Int): Column =
    pmod(xxhash64(term), lit(prefixes.toLong)).cast("int")

  /** Live rows of `sub` under manifest `m` with SLICE-ORDERED tombstone
    * masking (v3): a tombstone at slice S masks a data row iff the
    * row's slice is OLDER (`< S`) — still an id-equi join, the range
    * term rides as a residual predicate. A [[purgeDocs]] tombstone is
    * newer than every row it targets, so pure purge flows read exactly
    * as v2; an [[upsertBatch]]'s re-landed copy (data slice above its
    * own tombstone slice) stays visible. */
  private def live(spark: SparkSession, dir: String, sub: String,
      m: Meta): DataFrame = {
    val rows = spark.read.parquet(s"$dir/$sub")
      .filter(col("slice") >= m.sliceBase && col("slice") < m.slices)
    rows.as("r")
      .join(livePurged(spark, dir, m).as("p"),
        col("r.id") === col("p.id") && col("p._tomb") > col("r.slice"),
        "left_anti")
      .drop("slice")
  }

  /** Tombstones (id, _tomb = the tombstone's slice id) — the
    * [[purgeDocs]]/[[upsertBatch]] ledger; empty when no purge ran or
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

  /** The current manifest, for callers composing their own scoring. */
  def meta(spark: SparkSession, dir: String): Option[Meta] =
    readMeta(spark, dir)

  /** The live (id, dl) rows — the masked read face (consumers
    * composing their own scoring, and the upsert/cascade specs). */
  def docLengths(spark: SparkSession, dir: String): DataFrame =
    live(spark, dir, "doclen",
      readMeta(spark, dir).getOrElse(sys.error(
        s"no committed postings store at $dir (missing $MetaName)")))

  /** [[docLengths]] AS OF a committed snapshot id — the pinned-read
    * face a cross-store set composition needs ([[bm25QueryAt]]'s
    * masked-doclen sibling; same fail-closed retention contract). */
  def docLengthsAt(spark: SparkSession, dir: String,
      commit: Long): DataFrame = {
    val m = metaAt(spark, dir, commit)
    Generations.requireSlicesReadable(spark, dir,
      Seq("doclen", "purged"), m.sliceBase, m.slices,
      s"snapshot $commit")
    live(spark, dir, "doclen", m)
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

  /** Fold one batch of NEW documents (id, text) into the store: delta
    * tokenization only, one appended slice per table, corpus stats and
    * batch ledger in the same atomic commit. Returns the slice id, None
    * for empty batches and crash replays. */
  def maintainBatch(batch: DataFrame, id: Column, text: Column,
      dir: String, prefixes: Int = 64, batchId: Long = -1L): Option[Long] = {
    val spark = batch.sparkSession
    // purge/fold/compact all read-modify-write the pointer: serialize
    // in-process writers on the per-(store, dir) monitor (round-11
    // verdict #5 — a purge racing a fold could claim the fold's slice
    // id mid-write; cross-process remains single-writer by contract)
    graft.util.Maintenance.withLeasedWriteLock("PostingsStore", spark, dir) {
    val docs = batch.select(id.as("id"), text.as("text"))
    if (docs.isEmpty) { recordEmptyBatch(spark, dir, readMeta(spark, dir), batchId); return None }
    val prev = readMeta(spark, dir)
    prev match {
      case Some(m) if batchId >= 0 && batchId <= m.batch => return None
      case Some(m) => require(m.prefixes == prefixes,
        s"postings store at $dir was seeded with prefixes=${m.prefixes}; " +
          s"refusing a mismatched fold ($prefixes) — one store, one layout")
      case None => ()
    }
    val m = prev.getOrElse(
      Meta(Format, -1L, 0L, 0L, prefixes, sliceBase = 0L, slices = 0L,
        commit = -1L))
    // TOMBSTONE SCREEN (round-10 ADVICE): a purged id stays purged until
    // a compact physically removes its tombstone — re-folding it would
    // increment nDocs/totTokens while the still-live tombstone hides its
    // postings from every read, permanently skewing BM25's N/avgdl. The
    // delete-then-reingest flow is: purge → compact → vacuum → re-fold —
    // or ONE atomic [[upsertBatch]], the verb that retires the old copy
    // itself (round 12) and therefore needs no screen.
    val screened = prev.fold(docs)(m0 =>
      docs.join(livePurged(spark, dir, m0), Seq("id"), "left_anti"))
    if (prev.isDefined && screened.isEmpty) { recordEmptyBatch(spark, dir, prev, batchId); return None }
    val toks = screened.select(col("id"),
      explode(TextFunctions.tokens(col("text"))).as("term"))
    val sliceId = m.slices
    // claim the id: a crashed PURGE may have left an orphan tombstone
    // slice here, which this commit would otherwise make live
    Generations.claimSlice(spark, dir, Seq("purged"), sliceId)
    // postings land TERM-SORTED inside each prefix partition: parquet
    // row-group min/max stats on `term` then make the query's term
    // filter skip row groups within the pruned partitions too (the
    // Z-order lesson applied to the term axis — at sf0.1 each partition
    // is one row group and this is moot; at 100 TB it is the difference
    // between reading a prefix's whole postings and its query terms')
    toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("tp", tp(col("term"), prefixes))
      .repartition(col("tp")).sortWithinPartitions(col("tp"), col("term"))
      .write.mode("overwrite").partitionBy("tp")
      .parquet(s"$dir/postings/slice=$sliceId")
    toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
      .write.mode("overwrite").parquet(s"$dir/doclen/slice=$sliceId")
    // stats from what was WRITTEN (not the possibly-lazy input), then
    // the one atomic commit carrying stats + ledger + window together
    val stats = spark.read.parquet(s"$dir/doclen/slice=$sliceId")
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    commitMeta(spark, dir, m.copy(batch = batchId,
      nDocs = m.nDocs + stats.getLong(0),
      totTokens = m.totTokens + stats.getLong(1),
      slices = sliceId + 1, commit = m.commit + 1))
    Some(sliceId)
    }
  }

  /** ATOMIC UPDATE/DELETE maintenance (round 12) — the verb a CDC
    * consumer needs: one ledgered commit that (a) retires the CURRENT
    * copy of every incoming or removed id (a tombstone slice — the v3
    * slice-ordered mask), (b) lands the new copies as a data slice
    * ABOVE the tombstones, and (c) adjusts the corpus statistics by
    * exactly −old +new. Plain [[maintainBatch]] forbids re-folding
    * (each doc folds once — its screen stands unchanged); updates go
    * through HERE, where the verb itself retires the old copy so
    * nothing double-counts. Atomicity is what makes the cascade
    * exactly-once: purge-then-fold as two verbs would let a crash
    * replay purge the re-folded copy (the fold's ledger suppresses the
    * re-fold but purge has no ledger) — one commit, one replay guard.
    *
    * `upserts` holds the docs to (re)index, `removeIds` the ids to
    * delete outright. Returns the data slice id (None for replays and
    * fully-empty batches). */
  def upsertBatch(upserts: DataFrame, id: Column, text: Column,
      removeIds: DataFrame, dir: String, prefixes: Int = 64,
      batchId: Long = -1L): Option[Long] = {
    val spark = upserts.sparkSession
    graft.util.Maintenance.withLeasedWriteLock("PostingsStore", spark, dir) {
    // one live row per id (ADVICE r12): exact duplicates collapse,
    // conflicting re-indexes fail loudly — two copies in one data slice
    // would both sit above the tombstone, stay visible, and double-count
    // in nDocs/totTokens
    val docs = graft.util.Maintenance.requireUniqueUpserts(
      upserts.select(id.as("id"), text.as("text")), "id", "postings-store")
      .localCheckpoint(true)
    // ids in both upserts and removeIds re-land (the upsert wins)
    val rem = removeIds.select(removeIds.columns.head).toDF("id")
      .distinct()
      .join(docs.select(col("id")), Seq("id"), "left_anti")
      .localCheckpoint(true)
    val prev = readMeta(spark, dir)
    prev match {
      case Some(m) if batchId >= 0 && batchId <= m.batch => return None
      case Some(m) => require(m.prefixes == prefixes,
        s"postings store at $dir was seeded with prefixes=${m.prefixes}; " +
          s"refusing a mismatched upsert ($prefixes) — one store, one layout")
      case None => ()
    }
    val m = prev.getOrElse(
      Meta(Format, -1L, 0L, 0L, prefixes, sliceBase = 0L, slices = 0L,
        commit = -1L))
    if (docs.isEmpty && rem.isEmpty) {
      recordEmptyBatch(spark, dir, prev, batchId); return None
    }
    // retire the LIVE copies of everything incoming or removed
    val targets =
      if (prev.isEmpty) rem.limit(0)
      else docs.select(col("id")).unionByName(rem).distinct()
        .join(live(spark, dir, "doclen", m).select(col("id")),
          Seq("id"), "left_semi")
        .localCheckpoint(true)
    val gone =
      if (prev.isEmpty) (0L, 0L)
      else {
        val g = live(spark, dir, "doclen", m)
          .join(targets, Seq("id"), "left_semi")
          .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
        (g.getLong(0), g.getLong(1))
      }
    // tombstone slice first (the mask covers only OLDER slices), then
    // the data slice above it — ids only allocated for dirs written
    var next = m.slices
    if (!targets.isEmpty) {
      Generations.claimSlice(spark, dir, Seq("postings", "doclen"), next)
      targets.write.mode("overwrite").parquet(s"$dir/purged/slice=$next")
      next += 1
    }
    val (newNd, newNt) =
      if (docs.isEmpty) (0L, 0L)
      else {
        val dataSlice = next
        Generations.claimSlice(spark, dir, Seq("purged"), dataSlice)
        val toks = docs.select(col("id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
          .withColumn("tp", tp(col("term"), prefixes))
          .repartition(col("tp")).sortWithinPartitions(col("tp"), col("term"))
          .write.mode("overwrite").partitionBy("tp")
          .parquet(s"$dir/postings/slice=$dataSlice")
        toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
          .write.mode("overwrite").parquet(s"$dir/doclen/slice=$dataSlice")
        next += 1
        val s = spark.read.parquet(s"$dir/doclen/slice=$dataSlice")
          .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
        (s.getLong(0), s.getLong(1))
      }
    if (next == m.slices) { // everything screened away: no-op bump
      recordEmptyBatch(spark, dir, prev, batchId); return None
    }
    commitMeta(spark, dir, m.copy(batch = batchId,
      nDocs = m.nDocs - gone._1 + newNd,
      totTokens = m.totTokens - gone._2 + newNt,
      slices = next, commit = m.commit + 1))
    Some(next - 1)
    }
  }

  /** The CASCADE: maintain this store FROM a merge table's
    * `changes.merge` feed — the warehouse's CDC-OUT
    * ([[graft.cdc.Apply.changeFeedDirs]]) driving the retrieval
    * index, exactly-once END-TO-END: the feed replays uncommitted
    * commit windows from its checkpoint, and [[upsertBatch]]'s ledger
    * absorbs the replays. Each micro-batch reduces to the latest
    * envelope per key (a batch may span several commits), then
    * INSERT/MODIFY upsert and REMOVE delete — warehouse updates
    * re-index atomically, warehouse purges propagate as index purges
    * (the compliance path). `textOf` maps a feed row to the text to
    * index. */
  def followMergeTable(spark: SparkSession, mergeDir: String, dir: String,
      checkpoint: String, textOf: Column, prefixes: Int = 64,
      sinceCommit: Long = -1L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.util.Cascade.followInto(spark, mergeDir, checkpoint, sinceCommit,
      (ups, rem, bid) => {
        upsertBatch(ups.select(col("_key").as("id"), textOf.as("text")),
          col("id"), col("text"), rem.toDF("id"), dir, prefixes,
          batchId = bid)
        ()
      })

  /** Continuous maintenance: one fold per micro-batch of arriving
    * documents, exactly-once via the manifest's batch-id ledger. */
  def maintainStream(docs: DataFrame, id: Column, text: Column,
      dir: String, checkpoint: String, prefixes: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        maintainBatch(df, id, text, dir, prefixes, batchId = bid)
        ()
      }
      .start()

  /** [[graft.dedup.LedgerStore.compact]]'s retrieval twin: merge the
    * live slice window into one slice per table, advance the window in
    * one atomic commit (stats and ledger unchanged). */
  def compact(spark: SparkSession, dir: String): Option[Long] =
    graft.util.Maintenance.withLeasedWriteLock("PostingsStore", spark, dir) {
    readMeta(spark, dir) match {
      case Some(m) if m.slices - m.sliceBase > 1 =>
        val merged = m.slices
        Generations.claimSlice(spark, dir, Seq("purged"), merged)
        live(spark, dir, "postings", m)
          .repartition(col("tp")).sortWithinPartitions(col("tp"), col("term"))
          .write.mode("overwrite")
          .partitionBy("tp").parquet(s"$dir/postings/slice=$merged")
        live(spark, dir, "doclen", m).write.mode("overwrite")
          .parquet(s"$dir/doclen/slice=$merged")
        commitMeta(spark, dir, m.copy(sliceBase = merged,
          slices = merged + 1, commit = m.commit + 1))
        Some(merged)
      case _ => None
    }
    }

  /** Deferred slice GC below the current window base. */
  def vacuumSlices(spark: SparkSession, dir: String): Int =
    readMeta(spark, dir).map { m =>
      Generations.gcSlices(spark, dir, Seq("postings", "doclen", "purged"),
        m.sliceBase)
    }.getOrElse(0)

  /** DECREMENTAL index maintenance — delete documents from the
    * persisted inverted index (the purge verb on the retrieval
    * substrate): purged ids land as a tombstone slice filtering every
    * live read, and the corpus statistics DECREMENT in the same atomic
    * commit — BM25's N and Σdl stay exact, so post-purge
    * [[bm25Query]] still replays the full recompute over the remaining
    * corpus bit-for-bit (df re-derives from the filtered postings; the
    * spec pins it). [[compact]] makes the removal physical. No-op for
    * absent/already-purged ids. Returns (docs removed, tokens removed). */
  def purgeDocs(spark: SparkSession, dir: String,
      docIds: DataFrame): Option[(Long, Long)] = {
    graft.util.Maintenance.withLeasedWriteLock("PostingsStore", spark, dir) {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed postings store at $dir (missing $MetaName)"))
    val targets = docIds.select(docIds.columns.head)
      .toDF("id").distinct()
      .join(live(spark, dir, "doclen", m).select(col("id")),
        Seq("id"), "left_semi")
      .localCheckpoint(true)
    if (targets.isEmpty) return None
    // the purged docs' stats, from the store itself — the decrement the
    // manifest commit carries
    val gone = live(spark, dir, "doclen", m)
      .join(targets, Seq("id"), "left_semi")
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    val (nd, nt) = (gone.getLong(0), gone.getLong(1))
    val sliceId = m.slices
    // claim the id: a crashed FOLD may have left orphan data slices here;
    // advancing the window without deleting them would make their rows
    // live (uncounted by the stats) and break the replay's overwrite
    Generations.claimSlice(spark, dir, Seq("postings", "doclen"), sliceId)
    targets.write.mode("overwrite").parquet(s"$dir/purged/slice=$sliceId")
    commitMeta(spark, dir, m.copy(
      nDocs = m.nDocs - nd, totTokens = m.totTokens - nt,
      slices = sliceId + 1, commit = m.commit + 1))
    Some((nd, nt))
    }
  }

  /** BM25 top-k served FROM THE STORE — [[LmQueries.bm25]]'s formula
    * (same rational IDF, same k1/b literals, same sorted-term IEEE
    * fold) with N and total tokens read from the manifest instead of a
    * corpus pass, and the term filter landing as a static partition
    * prune on `tp` (the ≤|terms| prefix values are computed driver-side
    * — bounded metadata). Scores are bit-identical to the full
    * recompute because every input number is: tf/df/dl from the stored
    * postings (each doc tokenized once, by the same tokenizer), N and
    * Σdl from the incrementally-maintained stats. */
  def bm25Query(spark: SparkSession, dir: String,
      terms: Seq[String], topK: Int): DataFrame =
    bm25On(spark, dir,
      readMeta(spark, dir).getOrElse(sys.error(
        s"no committed postings store at $dir (missing $MetaName)")),
      terms, topK)

  /** Committed snapshot ids available for [[bm25QueryAt]], ascending. */
  def commits(spark: SparkSession, dir: String): Seq[Long] =
    Generations.listCommits(spark, dir, MetaName)

  /** The archived manifest of snapshot `commit`. */
  def metaAt(spark: SparkSession, dir: String, commit: Long): Meta =
    parseMeta(s"$dir@$commit",
      Generations.readPointerAt(spark, dir, MetaName, commit).getOrElse(sys.error(
        s"$dir has no committed snapshot $commit " +
          s"(available: ${commits(spark, dir).mkString(", ")})")))

  /** TIME-TRAVEL BM25 — [[bm25Query]] AS OF a committed snapshot id:
    * resolves through the archived manifest exactly like the current
    * read resolves through the pointer, so the answer replays the
    * recompute over the corpus AS IT WAS at that commit (stats from the
    * archived manifest, postings from its slice window — pre-purge
    * snapshots still see the purged docs while their slices survive).
    * Readable only until [[vacuumSlices]] retires the window's dirs;
    * afterwards this fails loudly (the fail-closed
    * [[graft.cdc.Apply.readMergeTableAt]] retention contract). */
  def bm25QueryAt(spark: SparkSession, dir: String, commit: Long,
      terms: Seq[String], topK: Int): DataFrame = {
    val m = metaAt(spark, dir, commit)
    Generations.requireSlicesReadable(spark, dir,
      Seq("postings", "doclen", "purged"), m.sliceBase, m.slices,
      s"snapshot $commit")
    bm25On(spark, dir, m, terms, topK)
  }

  private def bm25On(spark: SparkSession, dir: String, m: Meta,
      terms: Seq[String], topK: Int): DataFrame = {
    import spark.implicits._
    // ≤|terms| prefix values: driver-side bounded metadata, evaluated
    // through the SAME tp expression the writer used
    val tps = terms.toDF("term").select(tp(col("term"), m.prefixes).as("tp"))
      .collect().map(_.getInt(0)).distinct.toSeq
    val tf = live(spark, dir, "postings", m)
      .filter(col("tp").isin(tps.map(Integer.valueOf): _*) &&
        col("term").isin(terms: _*))
      .select(col("id"), col("term"), col("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = live(spark, dir, "doclen", m).select(col("id"), col("dl"))
    val nD = lit(m.nDocs).cast("double"); val tD = lit(m.totTokens).cast("double")
    val tfD = col("tf").cast("double"); val dfD = col("df").cast("double")
    val dlD = col("dl").cast("double")
    val idf = (lit(2.0) * nD - lit(2.0) * dfD + lit(1.0)) /
      (lit(2.0) * dfD + lit(1.0))
    val tfPart = (lit(2.2) * tfD) /
      (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * (dlD * nD) / tD))
    tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq("id"))
      .select(col("id"), col("term"), (idf * tfPart).as("s"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"),
        array_sort(collect_list(struct(col("term"), col("s")))).as("ss"))
      .select(col("id"), col("n_terms"),
        expr("aggregate(ss, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.s)")
          .as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
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

  /** CHANGE-FEED resolution (round 12): the slice data dirs of table
    * `sub` APPENDED by the commits in `(since, until]` — the store's
    * CDC-out face, consumed by [[graft.sources.ChangeFeedTable]] both
    * as a batch delta read and as micro-batch offsets of a streaming
    * source. Commit classification is derivable from the archived
    * manifests alone (no verb log needed):
    *
    *  - a COMPACT advanced `sliceBase` — its merged slice REWRITES
    *    rows that already flowed through the feed, so it contributes
    *    NOTHING (a physical reorganization is not a change);
    *  - an empty-batch no-op bump added no slices — nothing;
    *  - a FOLD appended postings+doclen slices (row additions), a
    *    PURGE appended a purged slice (row deletions) — each commit's
    *    new ids are `[slices(c-1), slices(c))`, and which sub a verb
    *    wrote is exactly which sub's dir exists at that id.
    *
    * `since = -1` streams from genesis. Fail-closed like every
    * snapshot read: the whole change window must still be readable
    * (vacuum retires it loudly, never silently). */
  def changeDirs(spark: SparkSession, dir: String, sub: String,
      since: Long, until: Long): (Seq[String], String) = {
    require(Set("postings", "doclen", "purged")(sub),
      s"unknown postings-store table '$sub'")
    Generations.changeSliceDirs(spark, dir, sub,
      Seq("postings", "doclen", "purged"),
      c => if (c < 0L) (0L, 0L) else {
        val m = metaAt(spark, dir, c); (m.sliceBase, m.slices)
      }, since, until)
  }

  /** The live slice data dirs of table `sub` ("postings" | "doclen" |
    * "purged") for a committed snapshot (commit = None → current),
    * plus the base path that keeps `slice`/`tp` as partition columns —
    * public for the DataSource V2 catalog face
    * ([[graft.sources.GraftTables]]): explicit slice paths make the
    * snapshot window a STATIC property of the table (no slice filter
    * to push), and the hive layout keeps `tp` prunable by Catalyst.
    * Fail-closed via [[Generations.requireSlicesReadable]]. May return
    * no dirs for "purged" (no purge ever ran). */
  def sliceDirs(spark: SparkSession, dir: String, sub: String,
      commit: Option[Long]): (Seq[String], String) = {
    require(Set("postings", "doclen", "purged")(sub),
      s"unknown postings-store table '$sub'")
    val m = commit.map(metaAt(spark, dir, _)).orElse(readMeta(spark, dir))
      .getOrElse(sys.error(s"no committed postings store at $dir"))
    // every live slice id was written by exactly ONE op, so a given sub
    // holds a SUBSET of the window's ids (a purge slice has only
    // `purged/`, a fold slice only `postings/`+`doclen/`) — readability
    // checks across all three, the per-sub path set keeps what exists
    Generations.requireSlicesReadable(spark, dir,
      Seq("postings", "doclen", "purged"), m.sliceBase, m.slices,
      s"snapshot ${commit.getOrElse("current")}")
    val hc = graft.util.Hfs.conf(spark)
    val dirs = (m.sliceBase until m.slices)
      .map(s => s"$dir/$sub/slice=$s")
      .filter(p => graft.util.Hfs.exists(
        new org.apache.hadoop.fs.Path(p), hc))
    (dirs, s"$dir/$sub")
  }
}
