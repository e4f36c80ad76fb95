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
  * Layout:
  * {{{
  *   dir/_graft_ledger_meta.json  <- the pointer (+ frozen fold config)
  *   dir/gen=G/labels/            <- parquet (id, comp)
  *   dir/gen=G/sigs/              <- parquet (id, vset, sig_0..sig_{k-1})
  *   dir/gen=G/postings/          <- parquet (bucket, id), PARTITIONED BY bp
  * }}}
  *
  * The postings table is the production fold layout
  * ([[Dedup.minhashPostings]]): a delta fold reads ONLY the partition
  * prefixes its bucket keys touch (a bounded driver fetch of ≤
  * `prefixes` ints drives static partition pruning) instead of
  * re-deriving band keys from a full signature-store scan — the scan
  * volume tracks the delta's bucket spread, not the corpus.
  *
  * The fold config (threshold‰, k, bands) freezes at seed time and rides
  * the manifest: a ledger is only meaningful under ONE signature family,
  * so later folds refuse a mismatched config instead of silently mixing
  * incompatible pair sets.
  */
object LedgerStore {

  private val MetaName = "_graft_ledger_meta.json"
  private val Format = "graft-dedup-v1"

  final case class Meta(format: String, gen: Long, rows: Long, batch: Long,
      thresholdPerMille: Int, k: Int, bands: Int, prefixes: Int)

  private val MetaRe =
    ("""\{"format": "([^"]+)", "gen": ([0-9]+), "rows": ([0-9]+), """ +
      """"batch": (-?[0-9]+), "thresholdPerMille": ([0-9]+), """ +
      """"k": ([0-9]+), "bands": ([0-9]+), "prefixes": ([0-9]+)\}""").r

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    Generations.readPointer(spark, dir, MetaName).map {
      case MetaRe(f, g, n, b, t, k, bd, px) =>
        Meta(f, g.toLong, n.toLong, b.toLong, t.toInt, k.toInt, bd.toInt,
          px.toInt)
      case other => sys.error(
        s"unparseable ledger manifest at $dir/$MetaName: '${other.take(120)}' " +
          "(refusing to guess — the pointer is the commit)")
    }

  private def publish(spark: SparkSession, dir: String, labels: DataFrame,
      sigs: DataFrame, postings: DataFrame, meta: Meta,
      retainGens: Int): Long = {
    labels.write.mode("overwrite").parquet(s"$dir/gen=${meta.gen}/labels")
    sigs.write.mode("overwrite").parquet(s"$dir/gen=${meta.gen}/sigs")
    postings.write.mode("overwrite").partitionBy("bp")
      .parquet(s"$dir/gen=${meta.gen}/postings")
    val n = spark.read.parquet(s"$dir/gen=${meta.gen}/labels").count()
    Generations.commit(spark, dir, MetaName,
      s"""{"format": "$Format", "gen": ${meta.gen}, "rows": $n, """ +
        s""""batch": ${meta.batch}, """ +
        s""""thresholdPerMille": ${meta.thresholdPerMille}, """ +
        s""""k": ${meta.k}, "bands": ${meta.bands}, """ +
        s""""prefixes": ${meta.prefixes}}""")
    Generations.gc(spark, dir, meta.gen - (retainGens - 1))
    meta.gen
  }

  /** Load the current generation: (labels (id, comp), signature store,
    * meta). Probe-ready — `labels` is the q75-shaped ledger face. */
  def load(spark: SparkSession, dir: String): (DataFrame, DataFrame, Meta) = {
    val m = readMeta(spark, dir).getOrElse(
      sys.error(s"no committed ledger at $dir (missing $MetaName)"))
    require(m.format == Format, s"$dir holds '${m.format}', expected $Format")
    (spark.read.parquet(s"$dir/gen=${m.gen}/labels"),
      spark.read.parquet(s"$dir/gen=${m.gen}/sigs"), m)
  }

  /** Fold one batch of NEW documents (id, text) into the persisted
    * ledger. First batch seeds (freezing the fold config in the
    * manifest); later batches pay DELTA-SIZED work only. Empty batches
    * and crash-replayed batch ids are no-ops. Returns the published
    * generation. Caps are disabled (maxBucketSize = MaxValue) — the
    * ledger's invariant is exact equality with a full recompute; a
    * capped production profile composes by passing the cap through. */
  def maintainBatch(batch: DataFrame, id: Column, text: Column,
      dir: String, threshold: Double = 0.5, k: Int = 16, bands: Int = 16,
      prefixes: Int = 64, retainGens: Int = 2,
      batchId: Long = -1L): Option[Long] = {
    val spark = batch.sparkSession
    val docs = batch.select(id.as("doc_id"), text.as("text"))
    if (docs.isEmpty) return None
    val perMille = math.round(threshold * 1000).toInt
    readMeta(spark, dir) match {
      case None =>
        val sigs = Dedup.minhashSigSets(docs, col("doc_id"), col("text"),
          k = k).localCheckpoint(true)
        val pairs = Dedup.minhashNearDupsDeltaFromSigs(
          sigs.limit(0), sigs, threshold, k, bands,
          maxBucketSize = Int.MaxValue)
        val labels = Dedup.componentsIncremental(
          // empty base labeling: every doc starts as its own component
          docs.select(col("doc_id").as("id"),
            col("doc_id").as("comp")).limit(0),
          docs, col("doc_id"), pairs, col("a_id"), col("b_id"))
        Some(publish(spark, dir, labels, sigs,
          Dedup.minhashPostings(sigs, k, bands, prefixes),
          Meta(Format, 0L, 0L, batchId, perMille, k, bands, prefixes),
          retainGens))
      case Some(m) if batchId >= 0 && batchId <= m.batch =>
        None // crash replay of an already-folded batch
      case Some(m) =>
        require(m.thresholdPerMille == perMille && m.k == k &&
            m.bands == bands && m.prefixes == prefixes,
          s"ledger at $dir was seeded with (threshold=${m.thresholdPerMille}" +
            s"‰, k=${m.k}, bands=${m.bands}, prefixes=${m.prefixes}); " +
            s"refusing a mismatched fold ($perMille‰, $k, $bands, " +
            s"$prefixes) — one ledger, one signature family")
        val (labels, sigs, _) = load(spark, dir)
        val postings = spark.read.parquet(s"$dir/gen=${m.gen}/postings")
        val deltaSigs = Dedup.minhashSigSets(docs, col("doc_id"), col("text"),
          k = k).localCheckpoint(true)
        // the production fold: the old side reads only the delta's
        // touched prefix partitions of the posting table
        val deltaPairs = Dedup.minhashNearDupsDeltaFromPostings(
          postings, sigs, deltaSigs, threshold, k, bands,
          maxBucketSize = Int.MaxValue, prefixes = prefixes)
        val allIds = labels.select(col("id"))
          .unionByName(docs.select(col("doc_id").as("id")))
        val newLabels = Dedup.componentsIncremental(
          labels, allIds, col("id"), deltaPairs, col("a_id"), col("b_id"))
        Some(publish(spark, dir, newLabels, sigs.unionByName(deltaSigs),
          postings.select(col("bucket"), col("id"), col("bp")).unionByName(
            Dedup.minhashPostings(deltaSigs, k, bands, prefixes)
              .select(col("bucket"), col("id"), col("bp"))),
          m.copy(gen = m.gen + 1, batch = batchId), retainGens))
    }
  }

  /** Continuous ledger maintenance: one [[maintainBatch]] fold per
    * micro-batch of arriving documents, exactly-once via the manifest's
    * batch-id ledger. External readers follow generations through
    * [[load]] without sharing the session. */
  def maintainStream(docs: DataFrame, id: Column, text: Column,
      dir: String, checkpoint: String, threshold: Double = 0.5,
      k: Int = 16, bands: Int = 16, prefixes: Int = 64,
      retainGens: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        maintainBatch(df, id, text, dir, threshold, k, bands, prefixes,
          retainGens, batchId = bid)
        ()
      }
      .start()
}
