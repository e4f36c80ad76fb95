package graft.sources

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The store kinds a change feed can tail — each maps the shared
  * commit/slice protocol onto its own manifest ([[graft.text
  * .PostingsStore.changeDirs]], [[graft.warehouse.GraphStore
  * .changeDirs]]). `purgedProxy` names the sub whose schema stands in
  * for an empty `purged` feed (the store's id column is uniform across
  * subs by construction, so the projection is exact). */
private[sources] sealed trait FeedStore {
  def storeName: String
  def subs: Set[String]
  def currentCommit(spark: SparkSession, dir: String): Long
  def changeDirs(spark: SparkSession, dir: String, sub: String,
      since: Long, until: Long): (Seq[String], String)
  def purgedProxy: (String, Set[String])
}

private[sources] object PostingsFeed extends FeedStore {
  val storeName = "postings"
  val subs = Set("postings", "doclen", "purged")
  def currentCommit(spark: SparkSession, dir: String): Long =
    graft.text.PostingsStore.meta(spark, dir).map(_.commit).getOrElse(-1L)
  def changeDirs(spark: SparkSession, dir: String, sub: String,
      since: Long, until: Long): (Seq[String], String) =
    graft.text.PostingsStore.changeDirs(spark, dir, sub, since, until)
  val purgedProxy = ("doclen", Set("id", "slice"))
}

private[sources] object GraphFeed extends FeedStore {
  val storeName = "graph"
  val subs = Set("items", "pairs", "purged")
  def currentCommit(spark: SparkSession, dir: String): Long =
    graft.warehouse.GraphStore.meta(spark, dir).map(_.commit).getOrElse(-1L)
  def changeDirs(spark: SparkSession, dir: String, sub: String,
      since: Long, until: Long): (Seq[String], String) =
    graft.warehouse.GraphStore.changeDirs(spark, dir, sub, since, until)
  val purgedProxy = ("items", Set("ord", "slice"))
}

/** CHANGE DATA FEED over the persisted slice stores (postings + the
  * graph delta-store) — the CDC-OUT face of a CDC engine (round 12).
  * The reference's whole pipeline is
  * change capture INTO a warehouse
  * (`source/dynamodb_stream_to_kinesis_lambda/handler.py` emits change
  * events; DMS tails binlogs); the natural completion is the warehouse
  * emitting ITS OWN downstream change stream, so maintained substrates
  * can cascade (index replication, deletion propagation, cache
  * invalidation) without re-diffing snapshots:
  *
  * {{{
  *   // batch: the rows commits (since, until] appended
  *   spark.read.format("graft").option("path", dir)
  *     .option("table", "changes.postings.doclen")
  *     .option("sinceCommit", "0").load()
  *   // streaming: one micro-batch per unseen commit window,
  *   // exactly-once via checkpointed commit offsets
  *   spark.readStream.format("graft").option("path", dir)
  *     .option("table", "changes.postings.postings").load()
  * }}}
  *
  * Semantics ([[graft.util.Generations.changeSliceDirs]]): a FOLD's
  * appended slices are row ADDITIONS, a PURGE's tombstone slice is row
  * DELETIONS on the `purged` feed (and on the graph store's `pairs`
  * feed its NEGATIVE Δ-counts — a genuinely differential stream:
  * summing `dn` maintains exact edge weights), and a COMPACT — a
  * physical rewrite of rows that already flowed through the feed —
  * emits NOTHING. Offsets are COMMIT IDS: the archived manifests make every
  * `(start, end]` window a pure function of immutable history, so a
  * restarted stream replays exactly the uncommitted window and nothing
  * else (the store's own batch-id ledger discipline, mirrored on the
  * read side). Vacuumed windows fail LOUDLY at resolution — a feed can
  * lag at most as far as slice retention, never silently skip.
  *
  * Reading delegates to Spark's parquet machinery (the
  * [[GraftTables]] pattern): each window's slice dirs become a stock
  * parquet batch, so the vectorized reader applies unchanged. The
  * DELTA face claims no filter/column pushdown — deltas are the
  * bounded small side by design; full-history analytical reads with
  * pruning go through the snapshot surfaces (`table = postings.*`).
  */
final class ChangeFeedTable(spark: SparkSession, dir: String,
    store: FeedStore, sub: String, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  require(store.subs(sub),
    s"unknown change feed 'changes.${store.storeName}.$sub' " +
      s"(supported: changes.${store.storeName}." +
      s"{${store.subs.toSeq.sorted.mkString(",")}})")

  override def name(): String =
    s"graft:changes.${store.storeName}.$sub:$dir"

  /** The feed's row shape — the store format's slice schema, inferred
    * from slices ON DISK (not just the live window: a change read may
    * reach slices a compact moved the window past). The `purged` feed
    * is subscribable BEFORE any purge ran (the deletion-propagation
    * consumer's natural start state): its slices hold exactly the
    * store's id column, so the shape projects from `doclen`'s. */
  override lazy val schema: StructType = {
    val own = ChangeFeed.existingSliceDirs(spark, dir, sub)
    if (own.nonEmpty) ChangeFeed.parquetSchema(spark, dir, sub, own)
    else if (sub == "purged") {
      val (proxy, keep) = store.purgedProxy
      val px = ChangeFeed.existingSliceDirs(spark, dir, proxy)
      require(px.nonEmpty,
        s"$dir holds no slices at all — seed the store before " +
          "subscribing to its change feed")
      StructType(ChangeFeed.parquetSchema(spark, dir, proxy, px)
        .filter(f => keep(f.name)))
    } else sys.error(
      s"$dir/$sub holds no slices — seed the store before " +
        "subscribing to its change feed")
  }

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(
      scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val since = Option(options.get("sinceCommit")).map(_.toLong).getOrElse(-1L)
    val until = Option(options.get("untilCommit")).map(_.toLong)
    new ChangeFeedScanBuilder(spark, dir, store, sub, schema, since, until)
  }
}

private[sources] final class ChangeFeedScanBuilder(spark: SparkSession,
    dir: String, store: FeedStore, sub: String, schema: StructType,
    since: Long, until: Option[Long]) extends ScanBuilder {
  override def build(): Scan =
    new ChangeFeedScan(spark, dir, store, sub, schema, since, until)
}

private[sources] final class ChangeFeedScan(spark: SparkSession,
    dir: String, store: FeedStore, sub: String, schema: StructType,
    since: Long, until: Option[Long]) extends Scan {

  override def readSchema(): StructType = schema

  override def description(): String =
    s"graft change feed $dir/$sub (${since}, ${until.getOrElse("current")}]"

  /** Batch delta read: the rows commits `(since, until]` appended,
    * `until` defaulting to the current commit. */
  override def toBatch: Batch = {
    // default until = current; an explicit bad window still fails loudly
    val hi = until.getOrElse(
      math.max(since, store.currentCommit(spark, dir)))
    val (dirs, base) = store.changeDirs(spark, dir, sub, since, hi)
    if (dirs.isEmpty) ChangeFeed.EmptyBatch
    else ChangeFeed.parquetBatch(spark, dir, sub, schema, dirs, base)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new ChangesStream(spark, dir, store, sub, schema, since)
}

/** Commit-id offset: the checkpointed position of a [[ChangesStream]].
  * Equality is structural — the engine plans a batch iff latest moved. */
private[sources] final case class CommitOffset(commit: Long) extends Offset {
  override def json(): String = s"""{"commit":$commit}"""
}

/** The micro-batch stream: each batch is one `(start, end]` commit
  * window resolved through [[PostingsStore.changeDirs]] and read as a
  * stock parquet batch. Offsets come from the manifest pointer; the
  * archived history makes every planned window replayable bit-for-bit
  * after a restart. */
private[sources] final class ChangesStream(spark: SparkSession,
    dir: String, store: FeedStore, sub: String, schema: StructType,
    since: Long) extends MicroBatchStream {

  override def initialOffset(): Offset = CommitOffset(since)

  override def latestOffset(): Offset =
    CommitOffset(math.max(since, store.currentCommit(spark, dir)))

  override def deserializeOffset(json: String): Offset = {
    val re = """\{"commit":(-?[0-9]+)\}""".r
    json.trim match {
      case re(c) => CommitOffset(c.toLong)
      case other => sys.error(s"unparseable change-feed offset '$other'")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[CommitOffset].commit
    val hi = end.asInstanceOf[CommitOffset].commit
    val (dirs, base) = store.changeDirs(spark, dir, sub, lo, hi)
    if (dirs.isEmpty) Array.empty
    else ChangeFeed.parquetBatch(spark, dir, sub, schema, dirs, base)
      .planInputPartitions()
  }

  /** Factory built from ONE representative slice dir and memoized:
    * parquet reader factories depend only on schemas and options,
    * never on the planned paths, so one factory serves every window —
    * and a store with thousands of slices pays one footer read, not a
    * per-batch sweep (the schema equality every window must satisfy is
    * asserted in [[ChangeFeed.parquetBatch]]). With no slices yet (a
    * pre-purge `purged` feed) every planned window is empty and the
    * factory is never invoked — fail only on use, and do NOT memoize,
    * so the first real tombstone slice builds the real factory. */
  @volatile private var cachedFactory: PartitionReaderFactory = null

  override def createReaderFactory(): PartitionReaderFactory = {
    if (cachedFactory != null) return cachedFactory
    val own = ChangeFeed.existingSliceDirs(spark, dir, sub)
    if (own.nonEmpty) {
      cachedFactory = ChangeFeed.parquetBatch(spark, dir, sub, schema,
        own.take(1), s"$dir/$sub").createReaderFactory()
      cachedFactory
    } else {
      // capture only the string: a lambda over `this` would drag the
      // whole (non-serializable) stream into the task closure
      val where = s"$dir/$sub"
      (_: InputPartition) => sys.error(
        s"change feed $where planned a non-empty batch with no " +
          "slices on disk — this cannot happen")
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] object ChangeFeed {

  /** Every `slice=` dir of `sub` still on disk — schema/factory
    * substrate (full history, not just the live window). */
  def existingSliceDirs(spark: SparkSession, dir: String,
      sub: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
    val hc = graft.util.Hfs.conf(spark)
    if (!graft.util.Hfs.exists(p, hc)) Nil
    else graft.util.Hfs.list(p, hc).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("slice=")).map(_.toString).sorted
  }

  private def opts(base: String): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(Map("basePath" -> base).asJava)

  def parquetSchema(spark: SparkSession, dir: String, sub: String,
      dirs: Seq[String]): StructType =
    ParquetTable(s"graft:changes:schema:$dir/$sub", spark,
      opts(s"$dir/$sub"), dirs, None, classOf[ParquetFileFormat]).schema

  /** One window's slice dirs as a stock parquet [[Batch]]. The store
    * format pins one writer shape per sub, so the inferred schema must
    * equal the table's — asserted, because a mismatch would misalign
    * the reader factory's columns with the plan's. */
  def parquetBatch(spark: SparkSession, dir: String, sub: String,
      schema: StructType, dirs: Seq[String], base: String): Batch = {
    val t = ParquetTable(s"graft:changes:$dir/$sub", spark, opts(base),
      dirs, None, classOf[ParquetFileFormat])
    require(t.schema == schema,
      s"change window of $dir/$sub reads schema ${t.schema.simpleString}" +
        s" but the feed's is ${schema.simpleString} — slice shapes drifted")
    t.newScanBuilder(opts(base)).build().toBatch
  }

  /** A window no commit touched: zero partitions, a factory that is
    * never invoked. */
  object EmptyBatch extends Batch {
    override def planInputPartitions(): Array[InputPartition] = Array.empty
    override def createReaderFactory(): PartitionReaderFactory =
      (_: InputPartition) => sys.error("empty change window has no rows")
  }
}
