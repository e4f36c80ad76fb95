package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics operators (SURVEY.md §2.8 T6/T7/T10, §2.3 J8):
  * event-time windows under watermarks, built-in session windows, custom
  * sessionization state, and stream-stream joins.
  *
  * The reference has no event-time processing at all (processing-time
  * only, T6) — these are the [W] warehouse-surface extensions, built on
  * Structured Streaming so the same code runs continuously at scale:
  * state lives in the checkpointed state store, partitioned by group key,
  * never on the driver.
  */
object StreamOps {

  /** T7: tumbling event-time window counts/sums with a watermark bounding
    * state retention (late rows beyond the delay are dropped). */
  def tumblingAgg(events: DataFrame, delay: String = "10 minutes", width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** T7: sliding window (width, slide). */
  def slidingAgg(events: DataFrame, width: String = "1 hour", slide: String = "15 minutes",
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** T10: built-in gap-based session window. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes", delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  // ---- custom state machine (flatMapGroupsWithState) ----

  final case class Evt(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Int, total_value: Double)

  /** T10: hand-rolled sessionization — a session closes inline when the
    * gap since the previous event exceeds `gapSeconds`, or via event-time
    * timeout once the watermark passes last+gap (trailing sessions). Shows
    * the custom-state seam (the reference's "state" was an S3 prefix; here
    * it's the partitioned, checkpointed state store — watermark-bounded,
    * so state size is O(active users), not O(history)). */
  def sessionize(events: Dataset[Evt], gapSeconds: Long = 1800,
      delay: String = "10 minutes")(
      implicit enc1: org.apache.spark.sql.Encoder[SessionState],
      enc2: org.apache.spark.sql.Encoder[ClosedSession],
      enc3: org.apache.spark.sql.Encoder[Long]): Dataset[ClosedSession] = {

    def fn(userId: Long, rows: Iterator[Evt], state: GroupState[SessionState]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(ClosedSession(userId, new java.sql.Timestamp(s.start * 1000), s.n, s.total))
      }
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val sec = e.ts.getTime / 1000
        state.getOption match {
          case Some(s) if sec - s.last > gapSeconds =>
            closed += ClosedSession(userId, new java.sql.Timestamp(s.start * 1000), s.n, s.total)
            state.update(SessionState(sec, sec, 1, e.value))
          case Some(s) =>
            state.update(SessionState(s.start, sec, s.n + 1, s.total + e.value))
          case None =>
            state.update(SessionState(sec, sec, 1, e.value))
        }
      }
      state.getOption.foreach { s =>
        // EventTimeTimeout rejects timestamps at or below the current
        // watermark — a straggler user whose last event is older than
        // watermark-gap would crash the query (round-2 advice). Clamp to
        // just past the watermark: the session is already overdue and the
        // timeout fires on the next batch.
        val target = (s.last + gapSeconds) * 1000
        state.setTimeoutTimestamp(math.max(target, state.getCurrentWatermarkMs() + 1))
      }
      closed.iterator
    }

    import org.apache.spark.sql.Encoders
    events
      .withWatermark("ts", delay)
      .as(Encoders.product[Evt])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** T10, modern API: the same sessionizer on Spark 4's transformWithState
    * (StatefulProcessor + typed ValueState). Functionally equivalent to
    * [[sessionize]]; this is the forward-compatible state API (state TTL,
    * multiple named states). Requires the RocksDB state store provider —
    * set spark.sql.streaming.stateStore.providerClass to
    * o.a.s.sql.execution.streaming.state.RocksDBStateStoreProvider (the
    * HDFS-backed default store has no column families). */
  class SessionProcessor(gapSeconds: Long,
      stateTtl: Option[java.time.Duration] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Evt, ClosedSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var state: ValueState[SessionState] = _
    @transient private var useTimers: Boolean = false

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // state TTL (processing-time based): idle per-user state is evicted
      // by the store itself — at 100 TB this bounds state to ACTIVE users
      // even when a key never sends another event to trigger gap logic
      state = getHandle.getValueState[SessionState](
        "session", E.product[SessionState],
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
      useTimers = timeMode == TimeMode.EventTime()
    }

    private def close(userId: Long, s: SessionState) =
      ClosedSession(userId, new java.sql.Timestamp(s.start * 1000), s.n, s.total)

    override def handleInputRows(
        userId: Long, rows: Iterator[Evt],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val sec = e.ts.getTime / 1000
        (if (state.exists()) Some(state.get()) else None) match {
          case Some(s) if sec - s.last > gapSeconds =>
            closed += close(userId, s)
            state.update(SessionState(sec, sec, 1, e.value))
          case Some(s) =>
            state.update(SessionState(s.start, sec, s.n + 1, s.total + e.value))
          case None =>
            state.update(SessionState(sec, sec, 1, e.value))
        }
      }
      // event-time timer: close the trailing session once the watermark
      // passes last + gap (re-registered per batch; newer events push it)
      if (useTimers && state.exists()) {
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer((state.get().last + gapSeconds) * 1000)
      }
      closed.iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!state.exists()) return Iterator.empty
      val s = state.get()
      state.clear()
      Iterator(close(userId, s))
    }
  }

  /** transformWithState-based sessionization entry point.
    * `eventTimeTimers = true` (requires `withWatermark` upstream) also
    * closes trailing sessions when the watermark passes last + gap —
    * full parity with [[sessionize]]'s timeout behavior. */
  def sessionizeTws(events: Dataset[Evt], gapSeconds: Long = 1800,
      eventTimeTimers: Boolean = false,
      stateTtl: Option[java.time.Duration] = None): Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.TimeMode
    import org.apache.spark.sql.{Encoders => E}
    require(!(eventTimeTimers && stateTtl.nonEmpty),
      "state TTL is processing-time based (TimeMode.ProcessingTime); it cannot " +
        "be combined with event-time timers in one processor")
    implicit val closedEnc: org.apache.spark.sql.Encoder[ClosedSession] =
      E.product[ClosedSession]
    val timeMode =
      if (eventTimeTimers) TimeMode.EventTime()
      else if (stateTtl.nonEmpty) TimeMode.ProcessingTime()
      else TimeMode.None()
    events
      .groupByKey(_.user_id)(E.scalaLong)
      .transformWithState(
        new SessionProcessor(gapSeconds, stateTtl),
        timeMode,
        OutputMode.Append())
  }

  /** Dedup-at-ingest: drop repeat deliveries of the same key as the
    * stream lands — the streaming face of the exact-dedup ledger, and
    * the at-source fix for the duplicate accumulation the reference
    * documents on its MODIFY path (README.md:30: every MODIFY event
    * appends another copy into Redshift).
    *
    * `dropDuplicatesWithinWatermark` keys the state store on the id
    * columns and EXPIRES entries once the watermark passes — bounded
    * state, so it runs forever at 100 TB/day ingest rates, versus plain
    * `dropDuplicates` on a stream whose state grows without bound. The
    * contract is deliberately the weaker one a bounded dedup can honor:
    * duplicates arriving within the watermark delay of each other are
    * suppressed; a duplicate arriving later than the delay is treated as
    * new (at that point the upstream retention, not the dedup, is wrong). */
  def dedupWithinWatermark(
      events: DataFrame, idCols: Seq[String], tsCol: String = "ts",
      delay: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming decontamination at ingest — the stream-static face of
    * q77's `CorpusQueries.contaminationLedger`: every arriving document
    * is scored against the eval-suite shingle table BEFORE it lands in
    * the training corpus, the gate a continuously-fed corpus needs (a
    * batch sweep only catches leakage after the fact).
    *
    * Designed to need NO state store: shingling is the stateless HOF
    * [[graft.text.TextFunctions.shingles]] (a single projection — no
    * window, no explode on the stream side), and instead of explode →
    * stream-static join → re-aggregate (a stateful per-doc aggregation,
    * append-unsupported without an event-time window), the distinct
    * eval shingles collapse to ONE static row that broadcasts, and the
    * per-document hit count is `array_intersect` INSIDE the row. An eval suite is KBs–MBs against
    * a 100 TB stream — the same small-side contract the batch ledger
    * declares — so the operator stays a pure per-row projection:
    * append-mode, embarrassingly parallel at any ingest rate, identical
    * counts to the batch ledger (StreamOpsSpec pins the parity).
    *
    * Output per document: (id, n_shared_ngrams, is_contaminated). */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, id: Column,
      text: Column, evalText: Column, n: Int = 3,
      threshold: Int = 5, keep: Seq[(String, Column)] = Nil): DataFrame = {
    import graft.text.TextFunctions.shingles
    val evalSh = evalDocs
      .select(explode(shingles(evalText, n)).as("sh"))
      .distinct()
      .agg(collect_list(col("sh")).as("eval_sh"))
    docs
      .select(Seq(id.as("id"), shingles(text, n).as("shs"))
        ++ keep.map { case (nm, c) => c.as(nm) }: _*)
      .crossJoin(broadcast(evalSh))
      .select(Seq(col("id"),
        size(array_intersect(col("shs"), col("eval_sh"))).cast("long")
          .as("n_shared_ngrams"))
        ++ keep.map { case (nm, _) => col(nm) }: _*)
      .withColumn("is_contaminated", col("n_shared_ngrams") >= threshold)
  }

  final case class BudgetState(cum: Long)
  final case class DocTok(doc_id: Long, ts: java.sql.Timestamp,
      source: String, n_tokens: Long)
  final case class CorpusAdmit(doc_id: Long, source: String, n_tokens: Long,
      cum_tokens: Long, admitted: Boolean)

  /** Streaming corpus build at ingest — the q219 flagship's streaming
    * face: every arriving document passes the Gopher quality gate, the
    * eval-suite decontamination screen, exact dedup within the
    * watermark, and a cumulative per-source token budget, all in ONE
    * continuous query. A batch corpus build (q219) sweeps the corpus
    * after the fact; this admits or flags each document AS IT LANDS,
    * which is what a continuously-fed training corpus needs.
    *
    * Stage contract, in order:
    *   1. quality — [[graft.text.CorpusQueries.gopherFlags]], a pure
    *      projection (stateless, embarrassingly parallel);
    *   2. decontamination — [[decontaminate]]'s broadcast eval-shingle
    *      row (stateless stream-static);
    *   3. exact dedup — `dropDuplicatesWithinWatermark` on the
    *      [[graft.text.TextFunctions.fingerprint]] key (state bounded
    *      by the delay; a duplicate arriving later than the delay is
    *      upstream retention's problem — the dedupWithinWatermark
    *      contract);
    *   4. budget — flatMapGroupsWithState keyed by SOURCE: state is one
    *      long (cumulative admitted-stream tokens), rows fold in
    *      event-time order within each batch, and over-budget documents
    *      are emitted FLAGGED rather than dropped (the quotaEnforce
    *      audit pattern). NoTimeout: a corpus budget never expires —
    *      state is O(#sources), the one stateful stage whose state does
    *      not grow with volume.
    *
    * Batch-stream parity is weaker than q219's in exactly two declared
    * ways: dedup keeps the FIRST ARRIVAL (q219's ledger keeps the min
    * doc_id), and the budget folds in arrival order (q219 cuts in
    * salted-shuffle order) — both are the honest streaming contract,
    * and StreamOpsSpec pins the replay equivalence under those rules.
    *
    * Cross-batch straggler caveat: rows sort by event time WITHIN a
    * micro-batch; a straggler folding in a later batch charges the
    * budget at its arrival position (same contract as quotaEnforce). */
  /** Stages 1–3 of the streaming corpus build (quality → decontaminate →
    * exact dedup within the watermark), shared by [[corpusBuildStream]]
    * and the near-dup-gated [[corpusBuildStreamNd]]. Keeps `text` so the
    * near-dup face can derive signatures. */
  private def corpusGate(docs: DataFrame, evalDocs: DataFrame,
      minWords: Long, maxWords: Long, contamN: Int, contamThreshold: Int,
      delay: String, carry: Seq[String] = Nil): DataFrame = {
    import graft.text.{CorpusQueries, TextFunctions}
    val keep = Seq("ts" -> col("ts"), "source" -> col("source"),
      "text" -> col("text")) ++ carry.map(c => c -> col(c))
    val quality = CorpusQueries
      .gopherFlags(docs, col("doc_id"), col("text"), minWords, maxWords, keep)
      .filter(col("passes"))
    val clean = decontaminate(quality, evalDocs, col("id"), col("text"),
        col("text"), contamN, contamThreshold, keep)
      .filter(!col("is_contaminated"))
    clean
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("id").as("doc_id") +: col("ts") +: col("source") +:
        col("text") +: carry.map(col): _*)
  }

  def corpusBuildStream(docs: DataFrame, evalDocs: DataFrame,
      budgetPerSource: Long, minWords: Long = 5L, maxWords: Long = 5000L,
      contamN: Int = 3, contamThreshold: Int = 5,
      delay: String = "10 minutes"): Dataset[CorpusAdmit] = {
    import graft.text.TextFunctions
    val deduped = corpusGate(docs, evalDocs, minWords, maxWords,
        contamN, contamThreshold, delay)
      .select(col("doc_id"), col("ts"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))

    def fn(source: String, rows: Iterator[DocTok],
        state: GroupState[BudgetState]): Iterator[CorpusAdmit] = {
      var cum = state.getOption.map(_.cum).getOrElse(0L)
      val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).map { r =>
        cum += r.n_tokens
        CorpusAdmit(r.doc_id, source, r.n_tokens, cum,
          cum <= budgetPerSource)
      }
      state.update(BudgetState(cum))
      out.iterator
    }
    import org.apache.spark.sql.Encoders
    implicit val encIn: org.apache.spark.sql.Encoder[DocTok] =
      Encoders.product[DocTok]
    implicit val encState: org.apache.spark.sql.Encoder[BudgetState] =
      Encoders.product[BudgetState]
    implicit val encOut: org.apache.spark.sql.Encoder[CorpusAdmit] =
      Encoders.product[CorpusAdmit]
    implicit val encKey: org.apache.spark.sql.Encoder[String] =
      Encoders.STRING
    deduped
      .as[DocTok]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  final case class GateRow(doc_id: Long, ts: java.sql.Timestamp,
      source: String, n_tokens: Long, sig: Seq[Long], band: Int, bucket: Int)
  final case class GateVote(doc_id: Long, ts: java.sql.Timestamp,
      source: String, n_tokens: Long, dup_here: Boolean)
  final case class CorpusAdmitNd(doc_id: Long, source: String, n_tokens: Long,
      cum_tokens: Long, admitted: Boolean, near_dup: Boolean)

  /** Per-bucket near-dup VOTE — the [[NearDupProcessor]] scheme recast
    * for ADMISSION instead of pair reporting: each (band, bucket) group
    * emits every arriving doc row with `dup_here` = "a similar EARLIER
    * arrival is a live member of this bucket". No band-ownership dedup —
    * a doc's `bands` votes are OR-reduced downstream, which is how
    * multi-band recall survives keyed state (a pair may collide in band
    * 2 only; band 2's vote carries it). Every doc is stored regardless
    * of its own dup status (groups are independent — no cross-band
    * coordination exists to suppress storage; the batch-replay contract
    * mirrors this). */
  class NearDupVoteProcessor(threshold: Double, k: Int, maxBucket: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Int), GateRow, GateVote] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var members: ListState[SigEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[SigEntry](
        "gate_members", E.product[SigEntry], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Int), rows: Iterator[GateRow],
        timerValues: TimerValues): Iterator[GateVote] = {
      var ds = members.get().map(e => (e.doc_id, e.sig)).toSeq
      val out = scala.collection.mutable.ArrayBuffer[GateVote]()
      rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { row =>
        val dup = ds.exists { case (oid, osig) =>
          oid != row.doc_id &&
            osig.zip(row.sig).count { case (a, b) => a == b }.toDouble / k >=
              threshold
        }
        out += GateVote(row.doc_id, row.ts, row.source, row.n_tokens, dup)
        if (ds.size < maxBucket && !ds.exists(_._1 == row.doc_id)) {
          ds = ds :+ ((row.doc_id, row.sig))
          members.appendValue(SigEntry(row.doc_id, row.sig))
        }
      }
      out.iterator
    }
  }

  /** [[corpusBuildStream]] with a NEAR-duplicate gate chained between
    * exact dedup and the budget fold (round-8 verdict #6): the same
    * MinHash-LSH signature scheme as [[nearDupDetect]], run as a
    * transformWithState vote stage keyed by (band, bucket) — requires
    * the RocksDB provider — whose per-doc votes are OR-reduced inside
    * the source-keyed budget fold (a doc's `bands` vote rows ride the
    * same micro-batch, so the reduction is batch-local and exact).
    *
    * Declared first-arrival contract, on top of corpusBuildStream's:
    * a doc is `near_dup` iff some EARLIER-ARRIVED doc (by event time,
    * then id) shares a band bucket with it at signature agreement ≥
    * `ndThreshold`. Near-dup docs are emitted FLAGGED and do NOT charge
    * the budget (they never enter the corpus; the quotaEnforce
    * audit-not-drop pattern). Detection reaches only members still in
    * state (per-bucket cap `maxBucket`), and a flagged doc still BLOCKS
    * later similar docs — suppressing its membership would need
    * cross-band coordination no keyed state store offers; the batch
    * replay in StreamOpsSpec pins exactly this contract. */
  def corpusBuildStreamNd(docs: DataFrame, evalDocs: DataFrame,
      budgetPerSource: Long, minWords: Long = 5L, maxWords: Long = 5000L,
      contamN: Int = 3, contamThreshold: Int = 5,
      delay: String = "10 minutes", ndThreshold: Double = 0.7,
      k: Int = 16, bands: Int = 4,
      maxBucket: Int = 50): Dataset[CorpusAdmitNd] = {
    import graft.text.TextFunctions
    val gated = corpusGate(docs, evalDocs, minWords, maxWords,
        contamN, contamThreshold, delay)
      .select(col("doc_id"), col("ts"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.minhashSignature(
          TextFunctions.shingles(col("text"), 3), k).as("sig"))
    budgetFoldNd(
      textNearDupVotes(gated, ndThreshold, k, bands, maxBucket),
      budgetPerSource)
  }

  /** The text near-dup VOTE stage shared by [[corpusBuildStreamNd]] and
    * [[corpusBuildStreamFull]] (round-11 review: a hand-copy of this
    * pipeline in each entry point would silently diverge): banded
    * MinHash keys → per-(band, bucket) transformWithState votes. Input
    * needs (doc_id, ts, source, n_tokens, sig); extra columns pass
    * through untouched. The eventTimeColumnName overload re-declares
    * `ts` as the output's event time so a downstream stateful fold is
    * plannable after this stateful stage (Spark 4 chained-stateful
    * contract). */
  private def textNearDupVotes(gated: DataFrame, ndThreshold: Double,
      k: Int, bands: Int, maxBucket: Int): Dataset[GateVote] = {
    import org.apache.spark.sql.{Encoders => E}
    import graft.text.TextFunctions
    implicit val voteEnc: org.apache.spark.sql.Encoder[GateVote] =
      E.product[GateVote]
    gated
      .withColumn("bk", TextFunctions.lshBandKeys(col("sig"), k, bands))
      .select(col("doc_id"), col("ts"), col("source"), col("n_tokens"),
        col("sig"), posexplode(col("bk")).as(Seq("band", "bucket")))
      .as(E.product[GateRow])
      .groupByKey(r => (r.band, r.bucket))(E.product[(Int, Int)])
      .transformWithState(
        new NearDupVoteProcessor(ndThreshold, k, maxBucket),
        "ts", OutputMode.Append())
  }

  /** The per-source token-budget fold shared by [[corpusBuildStreamNd]]
    * and [[corpusBuildStreamFull]]: vote rows collapse under (doc_id,
    * ts) — one group per DOCUMENT (round-9 advice: a bare doc_id
    * groupBy merged two distinct docs sharing an id in the same
    * micro-batch, silently dropping one row and never charging its
    * tokens). A document's token count is the MAX over its votes (all
    * text votes carry the true count; embedding votes carry the −1
    * sentinel, so max recovers the count in both topologies); a
    * document is near-dup — excluded, never charged — if ANY vote says
    * so. Within a batch rows fold in event-time order. */
  private def budgetFoldNd(votes: Dataset[GateVote],
      budgetPerSource: Long): Dataset[CorpusAdmitNd] = {
    import org.apache.spark.sql.{Encoders => E}
    def fn(source: String, rows: Iterator[GateVote],
        state: GroupState[BudgetState]): Iterator[CorpusAdmitNd] = {
      var cum = state.getOption.map(_.cum).getOrElse(0L)
      val out = rows.toSeq
        .groupBy(r => (r.doc_id, r.ts)).toSeq
        .map { case ((id, ts), vs) =>
          (id, ts, vs.map(_.n_tokens).max, vs.exists(_.dup_here)) }
        .sortBy { case (id, ts, _, _) => (ts.getTime, id) }
        .map { case (id, _, nt, dup) =>
          if (dup) CorpusAdmitNd(id, source, nt, cum,
            admitted = false, near_dup = true)
          else {
            cum += nt
            CorpusAdmitNd(id, source, nt, cum,
              cum <= budgetPerSource, near_dup = false)
          }
        }
      state.update(BudgetState(cum))
      out.iterator
    }
    implicit val admitEnc: org.apache.spark.sql.Encoder[CorpusAdmitNd] =
      E.product[CorpusAdmitNd]
    implicit val stEnc: org.apache.spark.sql.Encoder[BudgetState] =
      E.product[BudgetState]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = E.STRING
    votes
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** The FLAGSHIP streaming corpus build with BOTH dedup gates (round-11
    * verdict #7): [[corpusBuildStreamNd]]'s text near-dup vote stage AND
    * [[embCorpusBuildStream]]'s embedding (semantic) near-dup vote stage
    * applied to ONE arriving stream of (doc_id, ts, source, text,
    * embedding) rows — quality → decontaminate → exact-fingerprint dedup
    * → two parallel banded vote stages over the same gated stream (text
    * MinHash-LSH buckets; sign-LSH embedding buckets — each a
    * transformWithState keyed by (band, bucket), re-declaring `ts` per
    * the Spark 4 chained-stateful contract) → one per-source token
    * budget fold over the UNION of both vote streams. A document is
    * near-dup (excluded, tokens never charged) if EITHER gate votes dup;
    * within a batch rows fold in event-time order, so admission order is
    * stable (StreamOpsSpec pins batch-replay parity with both gates
    * applied).
    *
    * Embedding votes carry `n_tokens = -1` as a sentinel; the collapse
    * takes each document's token count from its text votes (max over
    * the group). Input rows must carry a non-null `embedding`. */
  def corpusBuildStreamFull(docs: DataFrame, evalDocs: DataFrame,
      budgetPerSource: Long, minWords: Long = 5L, maxWords: Long = 5000L,
      contamN: Int = 3, contamThreshold: Int = 5,
      delay: String = "10 minutes", ndThreshold: Double = 0.7,
      k: Int = 16, bands: Int = 4, maxBucket: Int = 50,
      embThreshold: Double = 0.25, embBands: Int = 4, embPlanes: Int = 4,
      dim: Int = 64): Dataset[CorpusAdmitNd] = {
    import org.apache.spark.sql.{Encoders => E}
    import graft.text.TextFunctions
    val gated = corpusGate(docs, evalDocs, minWords, maxWords,
        contamN, contamThreshold, delay, carry = Seq("embedding"))
      .select(col("doc_id"), col("ts"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.minhashSignature(
          TextFunctions.shingles(col("text"), 3), k).as("sig"),
        col("embedding").as("v"))
    implicit val voteEnc: org.apache.spark.sql.Encoder[GateVote] =
      E.product[GateVote]
    implicit val embVoteEnc: org.apache.spark.sql.Encoder[EmbGateVote] =
      E.product[EmbGateVote]
    // branch 1: text near-dup votes (the shared corpusBuildStreamNd
    // stage — the extra `v` column passes through untouched)
    val textVotes = textNearDupVotes(gated, ndThreshold, k, bands,
      maxBucket)
    // branch 2: embedding near-dup votes (the embCorpusBuildStream
    // stage) over the SAME gated stream, re-keyed by sign-LSH buckets;
    // −1 tokens is the sentinel the shared budget fold's max-collapse
    // resolves against the text votes' true count
    val embVotes = gated
      .withColumn("buckets", transform(
        graft.ann.Similarity.bandKeys(col("v"), embBands, embPlanes, dim),
        s => s.getField("bucket")))
      .select(col("doc_id").as("vec_id"), col("ts"), col("source"),
        col("v"), posexplode(col("buckets")).as(Seq("band", "bucket")))
      .as(E.product[EmbGateRow])
      .groupByKey(r => (r.band, r.bucket))(E.product[(Int, Int)])
      .transformWithState(new EmbVoteProcessor(embThreshold, maxBucket),
        "ts", OutputMode.Append())
      .map(v => GateVote(v.vec_id, v.ts, v.source, -1L, v.dup_here))
    budgetFoldNd(textVotes.union(embVotes), budgetPerSource)
  }

  final case class BurstState(open: Map[Long, Long], history: Seq[(Long, Long)])
  final case class BurstAlert(event_type: String, hour_epoch: Long, n: Long,
    baseline_n: Long, baseline_hours: Long, burst: Boolean)

  final case class HourSketch(hour: Long, users: Map[Long, Long], decs: Long)
  final case class LeadState(hours: Seq[HourSketch])
  final case class LeaderRow(event_type: String, hour_epoch: Long, rank: Int,
    user_id: Long, count_lo: Long, count_hi: Long)

  final case class QuotaState(windowStart: Long, n: Long)
  final case class Admitted(user_id: Long, ts: java.sql.Timestamp,
      admitted: Boolean, n_in_window: Long)

  final case class SigRow(doc_id: Long, ts: java.sql.Timestamp,
      sig: Seq[Long], band: Int, bucket: Int)
  final case class BucketDocs(docs: Seq[(Long, Seq[Long])])
  final case class NearDupHit(a_id: Long, b_id: Long,
      ts: java.sql.Timestamp, sim: Double)

  /** Streaming near-duplicate DETECTION — the MinHash-LSH dedup stack
    * (q45) at ingest: each arriving document gets its per-row MinHash
    * signature and banded LSH bucket keys (the SAME deterministic
    * permutation family and banding as the batch pipeline —
    * `TextFunctions.minhashSignature` / `lshBandKeys`, pure row
    * expressions, no shuffle before the state stage); each (band,
    * bucket) key holds the signatures of its recent members, and an
    * arrival emits a hit against every stored member whose SIGNATURE
    * AGREEMENT fraction ≥ `threshold`. Multi-band double-fires are
    * suppressed INSIDE the operator: both signatures are in hand, so
    * each group emits a pair only when its OWN band is the pair's
    * first component-equal band — exactly one group owns any pair, no
    * second stateful stage (a chained pair-key dedup trips Spark's
    * global-watermark correctness checker), and bucket-hash collisions
    * without component equality are filtered for free.
    *
    * Declared weaker contract vs batch q45 (the dedupWithinWatermark
    * pattern): similarity is the SIGNATURE-estimated Jaccard (state
    * keeps 16 longs per doc, never shingle sets), detection reaches
    * only members still in state (per-bucket cap `maxBucket` — the
    * batch hot-bucket cap — and event-time retention `retainMs` past a
    * bucket's last arrival, so state is bounded by live buckets × cap
    * regardless of stream length), and within a batch rows fold in
    * event-time order. StreamOpsSpec pins hits ≡ the batch pairing of
    * the same signature scheme across batches, and that multi-band
    * collisions emit ONE pair. */
  def nearDupDetect(docs: DataFrame, threshold: Double = 0.7, k: Int = 16,
      bands: Int = 4, maxBucket: Int = 50,
      delay: String = "10 minutes",
      retainMs: Long = 10L * 60L * 1000L): Dataset[NearDupHit] = {
    import org.apache.spark.sql.Encoders
    import graft.text.TextFunctions
    val sigs = docs.select(col("doc_id"), col("ts"),
        TextFunctions.minhashSignature(
          TextFunctions.shingles(col("text"), 3), k).as("sig"))
      .withColumn("bk", TextFunctions.lshBandKeys(col("sig"), k, bands))
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(col("bk")).as(Seq("band", "bucket")))
      .withWatermark("ts", delay)

    val rPerBand = k / bands
    def firstMatchBand(a: Seq[Long], b: Seq[Long]): Option[Int] =
      (0 until bands).find { bi =>
        a.slice(bi * rPerBand, bi * rPerBand + rPerBand) ==
          b.slice(bi * rPerBand, bi * rPerBand + rPerBand)
      }

    def fn(key: (Int, Int), rows: Iterator[SigRow],
        state: GroupState[BucketDocs]): Iterator[NearDupHit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var ds = state.getOption.map(_.docs).getOrElse(Seq.empty)
      val out = scala.collection.mutable.ArrayBuffer[NearDupHit]()
      val ordered = rows.toSeq.sortBy(row => (row.ts.getTime, row.doc_id))
      ordered.foreach { row =>
        ds.foreach { case (oid, osig) =>
          if (oid != row.doc_id) {
            val eq = osig.zip(row.sig).count { case (a, b) => a == b }
            val sim = eq.toDouble / k.toDouble
            if (sim >= threshold &&
                firstMatchBand(osig, row.sig).contains(key._1))
              out += NearDupHit(math.min(oid, row.doc_id),
                math.max(oid, row.doc_id), row.ts, sim)
          }
        }
        if (ds.size < maxBucket && !ds.exists(_._1 == row.doc_id))
          ds = ds :+ ((row.doc_id, row.sig))
      }
      state.update(BucketDocs(ds))
      // retention anchored to the bucket's latest EVENT time (the
      // quotaEnforce pattern — a first-batch watermark of 0 would
      // otherwise schedule the timeout in 1970 and evict fresh state),
      // clamped above the watermark as the API requires
      state.setTimeoutTimestamp(math.max(ordered.last.ts.getTime + retainMs,
        state.getCurrentWatermarkMs() + 1))
      out.iterator
    }

    sigs.as(Encoders.product[SigRow])
      .groupByKey(r => (r.band, r.bucket))(Encoders.product[(Int, Int)])
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)(
        Encoders.product[BucketDocs], Encoders.product[NearDupHit])
  }

  final case class SigEntry(doc_id: Long, sig: Seq[Long])

  /** The [[nearDupDetect]] logic as a Spark 4 StatefulProcessor — the
    * CLUSTER-SCALE state layer (round-8 verdict #1): transformWithState
    * requires the RocksDB state store provider, whose spill-to-disk
    * column families are the difference between working and OOM at
    * 100 TB ingest, and its per-bucket members live in a ListState whose
    * TTL evicts STALE MEMBERS INDIVIDUALLY (the store's native
    * processing-time TTL — no timer bookkeeping, no whole-bucket drop on
    * timeout like the fMGWS form's event-time timeout; an old member
    * expires even while new arrivals keep its bucket hot, which is the
    * tighter retention contract). Pair emission, signature similarity,
    * first-matching-band ownership, the per-bucket cap and in-batch
    * event-time ordering are IDENTICAL to [[nearDupDetect]] —
    * StreamOpsSpec pins both faces against the same batch pairing. */
  class NearDupProcessor(threshold: Double, k: Int, bands: Int,
      maxBucket: Int, stateTtl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Int), SigRow, NearDupHit] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var members: ListState[SigEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[SigEntry](
        "members", E.product[SigEntry],
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: (Int, Int), rows: Iterator[SigRow],
        timerValues: TimerValues): Iterator[NearDupHit] = {
      val rPerBand = k / bands
      def firstMatchBand(a: Seq[Long], b: Seq[Long]): Option[Int] =
        (0 until bands).find { bi =>
          a.slice(bi * rPerBand, bi * rPerBand + rPerBand) ==
            b.slice(bi * rPerBand, bi * rPerBand + rPerBand)
        }
      // bounded materialization: the cap guards this list, never volume
      var ds = members.get().map(e => (e.doc_id, e.sig)).toSeq
      val out = scala.collection.mutable.ArrayBuffer[NearDupHit]()
      rows.toSeq.sortBy(row => (row.ts.getTime, row.doc_id)).foreach { row =>
        ds.foreach { case (oid, osig) =>
          if (oid != row.doc_id) {
            val eq = osig.zip(row.sig).count { case (a, b) => a == b }
            val sim = eq.toDouble / k.toDouble
            if (sim >= threshold &&
                firstMatchBand(osig, row.sig).contains(key._1))
              out += NearDupHit(math.min(oid, row.doc_id),
                math.max(oid, row.doc_id), row.ts, sim)
          }
        }
        if (ds.size < maxBucket && !ds.exists(_._1 == row.doc_id)) {
          ds = ds :+ ((row.doc_id, row.sig))
          members.appendValue(SigEntry(row.doc_id, row.sig))
        }
      }
      out.iterator
    }
  }

  /** [[nearDupDetect]] on the transformWithState/RocksDB state layer —
    * see [[NearDupProcessor]] for what changes (member-level TTL
    * retention) and what is pinned identical. `stateTtl` enables
    * processing-time TTL on the bucket members (a TimeMode.ProcessingTime
    * query never self-terminates — tests drive it by polling committed
    * offsets, the sessionizeTws TTL pattern); None keeps state until the
    * cap, TimeMode.None. */
  def nearDupDetectTws(docs: DataFrame, threshold: Double = 0.7, k: Int = 16,
      bands: Int = 4, maxBucket: Int = 50,
      stateTtl: Option[java.time.Duration] = None): Dataset[NearDupHit] = {
    import org.apache.spark.sql.streaming.TimeMode
    import org.apache.spark.sql.{Encoders => E}
    import graft.text.TextFunctions
    val sigs = docs.select(col("doc_id"), col("ts"),
        TextFunctions.minhashSignature(
          TextFunctions.shingles(col("text"), 3), k).as("sig"))
      .withColumn("bk", TextFunctions.lshBandKeys(col("sig"), k, bands))
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(col("bk")).as(Seq("band", "bucket")))
    implicit val hitEnc: org.apache.spark.sql.Encoder[NearDupHit] =
      E.product[NearDupHit]
    sigs.as(E.product[SigRow])
      .groupByKey(r => (r.band, r.bucket))(E.product[(Int, Int)])
      .transformWithState(
        new NearDupProcessor(threshold, k, bands, maxBucket, stateTtl),
        if (stateTtl.nonEmpty) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  final case class EmbRow(vec_id: Long, ts: java.sql.Timestamp,
      v: Seq[Float], buckets: Seq[Int], band: Int, bucket: Int)
  final case class EmbEntry(vec_id: Long, v: Seq[Float], buckets: Seq[Int])
  final case class EmbNearDupHit(a_id: Long, b_id: Long,
      ts: java.sql.Timestamp, cosine: Double)

  /** [[nearDupDetectTws]]'s EMBEDDING-SPACE twin — the q102/q244
    * sign-LSH near-dup stack (Dedup.lshNearDups) at ingest: each
    * arriving vector gets its banded hyperplane buckets (the SAME
    * deterministic [[graft.ann.Similarity.planes]] family — bandKeys is
    * a pure projection), each (band, bucket) group holds recent
    * members' vectors, and an arrival emits a hit against every stored
    * member with EXACT cosine ≥ `threshold` (the verify is exact here —
    * state carries the vectors, unlike the minhash face's
    * signature-estimated similarity). Multi-band double-fires suppress
    * by first-matching-band ownership over the carried bucket arrays
    * (array index = band, bandKeys is band-ascending). The in-processor
    * cosine replays VecDot's exact op order — per-component double
    * upcast, left-to-right folds, dp/(√na·√nb) — so threshold decisions
    * match the batch operator bit-for-bit. Same RocksDB/ListState/TTL
    * state contract as [[NearDupProcessor]]. */
  class EmbNearDupProcessor(threshold: Double, maxBucket: Int,
      stateTtl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Int), EmbRow, EmbNearDupHit] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var members: ListState[EmbEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[EmbEntry](
        "emb_members", E.product[EmbEntry],
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dp += x * y; na += x * x; nb += y * y; i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }

    override def handleInputRows(key: (Int, Int), rows: Iterator[EmbRow],
        timerValues: TimerValues): Iterator[EmbNearDupHit] = {
      var ds = members.get().map(e => (e.vec_id, e.v, e.buckets)).toSeq
      val out = scala.collection.mutable.ArrayBuffer[EmbNearDupHit]()
      rows.toSeq.sortBy(r => (r.ts.getTime, r.vec_id)).foreach { row =>
        ds.foreach { case (oid, ov, obks) =>
          if (oid != row.vec_id) {
            val cos = cosine(ov, row.v)
            val owner = obks.indices
              .find(i => obks(i) == row.buckets(i)).contains(key._1)
            if (cos >= threshold && owner)
              out += EmbNearDupHit(math.min(oid, row.vec_id),
                math.max(oid, row.vec_id), row.ts, cos)
          }
        }
        if (ds.size < maxBucket && !ds.exists(_._1 == row.vec_id)) {
          ds = ds :+ ((row.vec_id, row.v, row.buckets))
          members.appendValue(EmbEntry(row.vec_id, row.v, row.buckets))
        }
      }
      out.iterator
    }
  }

  /** Streaming embedding near-dup detection entry point — columns
    * (vec_id, ts, embedding). Defaults mirror the q102 batch config. */
  def embNearDupDetectTws(embs: DataFrame, threshold: Double = 0.25,
      nBands: Int = 4, planesPerBand: Int = 4, dim: Int = 64,
      maxBucket: Int = 50,
      stateTtl: Option[java.time.Duration] = None): Dataset[EmbNearDupHit] = {
    import org.apache.spark.sql.streaming.TimeMode
    import org.apache.spark.sql.{Encoders => E}
    val keyed = embs
      .select(col("vec_id"), col("ts"), col("embedding").as("v"))
      .withColumn("buckets", transform(
        graft.ann.Similarity.bandKeys(col("v"), nBands, planesPerBand, dim),
        s => s.getField("bucket")))
      .select(col("vec_id"), col("ts"), col("v"), col("buckets"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
    implicit val hitEnc: org.apache.spark.sql.Encoder[EmbNearDupHit] =
      E.product[EmbNearDupHit]
    keyed.as(E.product[EmbRow])
      .groupByKey(r => (r.band, r.bucket))(E.product[(Int, Int)])
      .transformWithState(
        new EmbNearDupProcessor(threshold, maxBucket, stateTtl),
        if (stateTtl.nonEmpty) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  final case class EmbGateRow(vec_id: Long, ts: java.sql.Timestamp,
      source: String, v: Seq[Float], band: Int, bucket: Int)
  final case class EmbGateVote(vec_id: Long, ts: java.sql.Timestamp,
      source: String, dup_here: Boolean)
  final case class EmbVecEntry(vec_id: Long, v: Seq[Float])
  final case class EmbCorpusAdmit(vec_id: Long, source: String,
      cum_vecs: Long, admitted: Boolean, near_dup: Boolean)

  /** [[NearDupVoteProcessor]]'s embedding twin: each (band, bucket)
    * group emits every arriving vector with `dup_here` = "an
    * EARLIER-arrived vector is a live member of this bucket at EXACT
    * cosine ≥ threshold" (the verify is exact — state carries vectors,
    * the [[EmbNearDupProcessor]] contract). No band-ownership dedup:
    * the per-vector votes are OR-reduced in the downstream budget fold.
    * Every vector is stored regardless of its own dup status, up to the
    * per-bucket cap. */
  class EmbVoteProcessor(threshold: Double, maxBucket: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, Int), EmbGateRow, EmbGateVote] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var members: ListState[EmbVecEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[EmbVecEntry](
        "emb_gate_members", E.product[EmbVecEntry], TTLConfig.NONE)

    private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dp += x * y; na += x * x; nb += y * y; i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }

    override def handleInputRows(key: (Int, Int), rows: Iterator[EmbGateRow],
        timerValues: TimerValues): Iterator[EmbGateVote] = {
      var ds = members.get().map(e => (e.vec_id, e.v)).toSeq
      val out = scala.collection.mutable.ArrayBuffer[EmbGateVote]()
      rows.toSeq.sortBy(r => (r.ts.getTime, r.vec_id)).foreach { row =>
        val dup = ds.exists { case (oid, ov) =>
          oid != row.vec_id && cosine(ov, row.v) >= threshold }
        out += EmbGateVote(row.vec_id, row.ts, row.source, dup)
        if (ds.size < maxBucket && !ds.exists(_._1 == row.vec_id)) {
          ds = ds :+ ((row.vec_id, row.v))
          members.appendValue(EmbVecEntry(row.vec_id, row.v))
        }
      }
      out.iterator
    }
  }

  /** Streaming EMBEDDING corpus build (round-9 verdict #8, closing the
    * set: [[corpusBuildStreamNd]] gates text near-dups at ingest; this
    * is its embedding twin): every arriving vector — columns (vec_id,
    * ts, source, embedding) — passes the banded sign-LSH semantic
    * near-dup gate (the q102/q212 scheme as an [[EmbVoteProcessor]]
    * vote stage on RocksDB) and a cumulative per-source VECTOR budget.
    * Semantic near-dups are emitted FLAGGED and never charge the budget
    * (they don't enter the corpus — the SemDeDup admission face of the
    * quotaEnforce audit-not-drop pattern).
    *
    * First-arrival contract, mirroring corpusBuildStreamNd's: a vector
    * is `near_dup` iff some EARLIER-arrived vector (event time, then
    * id) shares a band bucket with it at exact cosine ≥ `threshold`;
    * detection reaches only members still in state (per-bucket cap),
    * and a flagged vector still BLOCKS later similars. The budget
    * folds non-dup vectors in (ts, id) order per source. StreamOpsSpec
    * pins batch-replay parity under exactly these rules. */
  def embCorpusBuildStream(embs: DataFrame, budgetPerSource: Long,
      threshold: Double = 0.25, nBands: Int = 4, planesPerBand: Int = 4,
      dim: Int = 64, maxBucket: Int = 50,
      delay: String = "10 minutes"): Dataset[EmbCorpusAdmit] = {
    import org.apache.spark.sql.{Encoders => E}
    val keyed = embs
      .select(col("vec_id"), col("ts"), col("source"),
        col("embedding").as("v"))
      .withWatermark("ts", delay)
      .withColumn("buckets", transform(
        graft.ann.Similarity.bandKeys(col("v"), nBands, planesPerBand, dim),
        s => s.getField("bucket")))
      .select(col("vec_id"), col("ts"), col("source"), col("v"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
    implicit val voteEnc: org.apache.spark.sql.Encoder[EmbGateVote] =
      E.product[EmbGateVote]
    // the eventTimeColumnName overload re-declares `ts` so the stateful
    // budget fold is plannable after this stateful stage (the Spark 4
    // chained-stateful contract corpusBuildStreamNd documents)
    val votes = keyed.as(E.product[EmbGateRow])
      .groupByKey(r => (r.band, r.bucket))(E.product[(Int, Int)])
      .transformWithState(new EmbVoteProcessor(threshold, maxBucket),
        "ts", OutputMode.Append())

    def fn(source: String, rows: Iterator[EmbGateVote],
        state: GroupState[BudgetState]): Iterator[EmbCorpusAdmit] = {
      var cum = state.getOption.map(_.cum).getOrElse(0L)
      val out = rows.toSeq
        .groupBy(r => (r.vec_id, r.ts)).toSeq // one group per VECTOR
        .map { case ((id, _), votes) =>
          (id, votes.head, votes.exists(_.dup_here)) }
        .sortBy { case (id, v, _) => (v.ts.getTime, id) }
        .map { case (id, v, dup) =>
          if (dup) EmbCorpusAdmit(id, source, cum,
            admitted = false, near_dup = true)
          else {
            cum += 1
            EmbCorpusAdmit(id, source, cum,
              cum <= budgetPerSource, near_dup = false)
          }
        }
      state.update(BudgetState(cum))
      out.iterator
    }
    implicit val admitEnc: org.apache.spark.sql.Encoder[EmbCorpusAdmit] =
      E.product[EmbCorpusAdmit]
    implicit val stEnc: org.apache.spark.sql.Encoder[BudgetState] =
      E.product[BudgetState]
    implicit val keyEnc: org.apache.spark.sql.Encoder[String] = E.STRING
    votes.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  final case class Chg(user_id: Long, ts: java.sql.Timestamp,
      value: String, op: String)
  final case class BagState(m: Map[String, Long])
  final case class DistinctCount(user_id: Long, n_distinct: Long, n_rows: Long)

  /** Streaming COUNT(DISTINCT) maintenance — q229's Gupta–Mumick
    * support bag ([[graft.cdc.IncrementalDistinct]]) as a stateful
    * stream over a change feed (op = insert | delete; an update is its
    * delete+insert pair). State per key is the value→multiplicity map —
    * the same footprint the batch bag carries for that key, bounded by
    * the key's live distinct values, never its event history. Each
    * micro-batch emits the key's refreshed (n_distinct, n_rows) row —
    * the streaming materialized view.
    *
    * Parity contract (StreamOpsSpec pins it): for a WELL-FORMED feed
    * (every delete matches a live row — the CDC producer contract),
    * the final counts equal the batch fold of the same windows; rows
    * fold in event-time order within a batch, and a delete that finds
    * no live copy is forgotten, exactly like the batch bag's m > 0
    * filter. NoTimeout: view state lives as long as the key — the one
    * stateful op here whose state is the product, not a cache. */
  def distinctMaintain(changes: Dataset[Chg])(
      implicit enc1: org.apache.spark.sql.Encoder[BagState],
      enc2: org.apache.spark.sql.Encoder[DistinctCount],
      enc3: org.apache.spark.sql.Encoder[Long]): Dataset[DistinctCount] = {

    def fn(user: Long, rows: Iterator[Chg],
        state: GroupState[BagState]): Iterator[DistinctCount] = {
      var m = state.getOption.map(_.m).getOrElse(Map.empty[String, Long])
      rows.toSeq.sortBy(_.ts.getTime).foreach { c =>
        val d = if (c.op == "insert") 1L else -1L
        val nm = m.getOrElse(c.value, 0L) + d
        m = if (nm > 0) m.updated(c.value, nm) else m - c.value
      }
      if (m.isEmpty) state.remove() else state.update(BagState(m))
      Iterator.single(DistinctCount(user, m.size.toLong, m.values.sum))
    }

    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Per-key quota enforcement at ingest: each user may admit at most
    * `maxPerWindow` events per tumbling `windowSeconds` window; excess
    * events are emitted FLAGGED rather than dropped, so the caller
    * chooses between filtering (rate limiting) and auditing (abuse
    * reports) from one stream. The state per key is two longs — the
    * current window and its admit count — overwritten when the window
    * rolls and evicted by event-time timeout once the watermark passes
    * the window end, so state size is O(active keys), never O(history).
    * Within a micro-batch rows are processed in event-time order, which
    * keeps the admit sequence deterministic for a given batch plan
    * (cross-batch stragglers count against whichever window is current
    * when they arrive — the same weaker-but-bounded contract as
    * [[dedupWithinWatermark]]). */
  def quotaEnforce(events: Dataset[Evt], maxPerWindow: Int = 3,
      windowSeconds: Long = 3600, delay: String = "10 minutes")(
      implicit enc1: org.apache.spark.sql.Encoder[QuotaState],
      enc2: org.apache.spark.sql.Encoder[Admitted],
      enc3: org.apache.spark.sql.Encoder[Long]): Dataset[Admitted] = {

    def fn(userId: Long, rows: Iterator[Evt],
        state: GroupState[QuotaState]): Iterator[Admitted] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val out = rows.toSeq.sortBy(_.ts.getTime).map { e =>
        val sec = e.ts.getTime / 1000
        val w = sec - (sec % windowSeconds)
        val s = state.getOption.filter(_.windowStart == w)
          .getOrElse(QuotaState(w, 0))
        val n = s.n + 1
        state.update(QuotaState(w, n))
        Admitted(userId, e.ts, n <= maxPerWindow, n)
      }
      state.getOption.foreach { s =>
        val target = (s.windowStart + windowSeconds) * 1000
        state.setTimeoutTimestamp(math.max(target, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    import org.apache.spark.sql.Encoders
    events
      .withWatermark("ts", delay)
      .as(Encoders.product[Evt])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming burst detection — q193's batch semantics as a stateful
    * stream: per event type, an hour finalizes once the watermark passes
    * its end and is flagged when its count runs > `factor`× the mean of
    * the preceding ≤24 finalized hours (the division cleared:
    * n·hours > bn·factor — exact integers, batch-parity with q193's
    * gate). State per key is the OPEN hour counts plus a ≤24-entry
    * finalized history — bounded regardless of event volume; stragglers
    * for an already-finalized hour are dropped (the quotaEnforce
    * straggler contract — the watermark is the completeness promise).
    * Hours finalize via event-time timeout even if the key goes quiet. */
  def burstDetect(events: Dataset[Evt], factor: Long = 3,
      delay: String = "10 minutes")(
      implicit enc1: org.apache.spark.sql.Encoder[BurstState],
      enc2: org.apache.spark.sql.Encoder[BurstAlert],
      enc3: org.apache.spark.sql.Encoder[String]): Dataset[BurstAlert] = {

    def fn(eventType: String, rows: Iterator[Evt],
        state: GroupState[BurstState]): Iterator[BurstAlert] = {
      val s = state.getOption.getOrElse(BurstState(Map.empty, Seq.empty))
      val wmSec = state.getCurrentWatermarkMs() / 1000
      var open = s.open
      rows.foreach { e =>
        val h = e.ts.getTime / 1000 / 3600 * 3600
        if (h + 3600 > wmSec) // not already finalized
          open = open.updated(h, open.getOrElse(h, 0L) + 1L)
      }
      val (done, still) = open.partition { case (h, _) => h + 3600 <= wmSec }
      var hist = s.history
      val out = done.toSeq.sortBy(_._1).map { case (h, n) =>
        val base = hist.filter { case (bh, _) => bh >= h - 86400 && bh < h }
        val bn = base.map(_._2).sum
        val bh = base.size.toLong
        hist = (hist :+ ((h, n))).filter(_._1 >= h - 82800)
        BurstAlert(eventType, h, n, bn, bh, bh > 0 && n * bh > bn * factor)
      }
      state.update(BurstState(still, hist))
      if (still.nonEmpty) {
        val target = (still.keys.min + 3600) * 1000
        state.setTimeoutTimestamp(
          math.max(target, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    import org.apache.spark.sql.Encoders
    events
      .withWatermark("ts", delay)
      .as(Encoders.product[Evt])
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming per-hour top-k leaderboard with BOUNDED state: per event
    * type, who were the k most active users in each hour, emitted once
    * the watermark finalizes the hour (burstDetect's finalization
    * contract — stragglers drop, event-time timers close quiet keys).
    *
    * The scale problem this solves: exact per-hour counts need
    * O(distinct users per open hour) state, which at 100 TB is the whole
    * user table per key. Instead each open hour keeps a Misra–Gries
    * summary of `counters` slots: hit → increment; miss with a free
    * slot → insert at 1; miss when full → decrement ALL slots (zeros
    * evicted) with the arrival conceptually CANCELLED against that
    * decrement round — the arriving user is not inserted — and the
    * sketch's decrement count d incremented (classic Misra–Gries).
    * Guarantees: stored ≤ true ≤ stored+d,
    * d ≤ n/(counters+1), and every user with true count > n/(counters+1)
    * still holds a slot — so the emitted top-k is exact whenever the
    * k-th/(k+1)-th true-count gap exceeds d (the spec pins both the
    * exact regime and the bounds under forced eviction). Emitted rows
    * carry [count_lo, count_hi] so downstream sees the uncertainty.
    * State per key is O(open hours × counters) regardless of volume. */
  def leaderboard(events: Dataset[Evt], k: Int = 3, counters: Int = 64,
      delay: String = "10 minutes")(
      implicit enc1: org.apache.spark.sql.Encoder[LeadState],
      enc2: org.apache.spark.sql.Encoder[LeaderRow],
      enc3: org.apache.spark.sql.Encoder[String]): Dataset[LeaderRow] = {

    def mgAdd(sk: HourSketch, user: Long): HourSketch =
      sk.users.get(user) match {
        case Some(c) => sk.copy(users = sk.users.updated(user, c + 1))
        case None if sk.users.size < counters =>
          sk.copy(users = sk.users.updated(user, 1L))
        case None =>
          val dec = sk.users.collect { case (u, c) if c > 1 => (u, c - 1) }
          HourSketch(sk.hour, dec, sk.decs + 1)
      }

    def fn(eventType: String, rows: Iterator[Evt],
        state: GroupState[LeadState]): Iterator[LeaderRow] = {
      val wmSec = state.getCurrentWatermarkMs() / 1000
      var hours = state.getOption
        .map(_.hours.map(h => h.hour -> h).toMap).getOrElse(Map.empty[Long, HourSketch])
      rows.foreach { e =>
        val h = e.ts.getTime / 1000 / 3600 * 3600
        if (h + 3600 > wmSec) // already-finalized hours: straggler, drop
          hours = hours.updated(h,
            mgAdd(hours.getOrElse(h, HourSketch(h, Map.empty, 0L)), e.user_id))
      }
      val (done, still) = hours.partition { case (h, _) => h + 3600 <= wmSec }
      val out = done.toSeq.sortBy(_._1).flatMap { case (h, sk) =>
        sk.users.toSeq.sortBy { case (u, c) => (-c, u) }.take(k).zipWithIndex
          .map { case ((u, c), i) =>
            LeaderRow(eventType, h, i + 1, u, c, c + sk.decs) }
      }
      if (still.isEmpty) state.remove()
      else {
        state.update(LeadState(still.values.toSeq))
        state.setTimeoutTimestamp(math.max(
          (still.keys.min + 3600) * 1000, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    import org.apache.spark.sql.Encoders
    events
      .withWatermark("ts", delay)
      .as(Encoders.product[Evt])
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** J8: stream-stream join — purchases correlated with the same user's
    * clicks in the preceding hour. Watermarks bound both join-state sides. */
  def purchaseClickJoin(events: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", delay)
    purchases.join(
      clicks,
      expr("""p_user = c_user AND
              click_ts <= purchase_ts AND
              click_ts >= purchase_ts - INTERVAL 1 HOUR"""))
  }

  /** Stream-stream LEFT OUTER join: like [[purchaseClickJoin]] but a
    * purchase with NO preceding click still emits — with null click
    * columns — once the watermark proves no matching click can arrive.
    * This is the semantic the inner join can't give: "every purchase,
    * attributed if possible". The null-padded row is emitted only after
    * `purchase_ts + delay` passes the click watermark (state for the
    * purchase side must be provably complete), so results trail the
    * inner join by up to the watermark delay — the correctness/latency
    * trade outer stream joins buy. Both state stores stay bounded by the
    * same watermark + time-range condition as the inner form. */
  def purchaseClickLeftJoin(events: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", delay)
    purchases.join(
      clicks,
      expr("""p_user = c_user AND
              click_ts <= purchase_ts AND
              click_ts >= purchase_ts - INTERVAL 1 HOUR"""),
      "left_outer")
  }

  /** FULL-outer stream-stream join — the reconciliation shape: every
    * purchase AND every click emits exactly once, matched when the
    * time-range condition holds, null-padded otherwise. Spark requires a
    * watermark-bounded time-range (or equality) condition on BOTH sides
    * for full outer so both state stores provably complete; each
    * unmatched row emits once its own side's watermark passes it. This
    * completes the streaming join matrix next to the inner (J8) and
    * left-outer (J8b) forms. */
  def purchaseClickFullJoin(events: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", delay)
    purchases.join(
      clicks,
      expr("""p_user = c_user AND
              click_ts <= purchase_ts AND
              click_ts >= purchase_ts - INTERVAL 1 HOUR"""),
      "full_outer")
  }

  /** Pipeline observability: attach named metrics to a (streaming or
    * batch) DataFrame without a second pass — `Dataset.observe` computes
    * the aggregates inside the existing plan and surfaces them per
    * micro-batch in `StreamingQueryProgress.observedMetrics`. This is
    * the production answer to "how many rows / how much value flowed
    * this batch" — a separate monitoring query would double-read the
    * source and could never see exactly the same batch boundaries. */
  def observed(events: DataFrame, name: String = "ingest_metrics"): DataFrame =
    events.observe(name,
      count(lit(1)).as("n_rows"),
      sum(col("value")).as("total_value"),
      max(col("ts")).as("max_ts"))

  /** Chained windowed aggregation — hourly totals rolled up to daily in
    * ONE streaming query (two stateful operators in append mode;
    * `window_time` re-derives an event-time column from the finalized
    * hourly window so the second aggregation can watermark on it). The
    * alternative is two queries glued by a sink+source hop; the chain
    * keeps exactly-once semantics and one checkpoint. Each hourly window
    * finalizes when the watermark passes it, then flows into its day's
    * running state — daily rows emit a watermark-delay after the day
    * closes. */
  def hourlyDailyRollup(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .groupBy(window(window_time(col("window")), "1 day"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), sum(col("v")).as("total_value"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n_events"), col("total_value"))
}
