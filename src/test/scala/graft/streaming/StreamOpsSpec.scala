package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, row_number, sum}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamOps.Evt

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append")(feed: => Unit): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    feed
    q.awaitTermination()
    spark.table(name)
  }

  test("T7: tumbling windows close as the watermark advances; late rows dropped") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val agg = StreamOps.tumblingAgg(ms.toDF(), delay = "10 minutes", width = "1 hour")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    // hour-0 events, then jump past hour 1 + delay to close hour 0
    ms.addData(Evt(1, t(5), "click", 1.0), Evt(1, t(20), "click", 2.0))
    q.processAllAvailable()
    ms.addData(Evt(1, t(75), "click", 4.0)) // advances watermark to :65
    q.processAllAvailable()
    ms.addData(Evt(1, t(6), "click", 99.0)) // late beyond watermark -> dropped
    ms.addData(Evt(1, t(200), "click", 8.0)) // closes hour-1 window
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumbling").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(2), r.getDouble(3))).toSet
    // hour-0 window: 2 events, total 3.0 (the late 99.0 never counted)
    assert(rows.exists { case (_, n, v) => n == 2 && v == 3.0 })
    assert(!rows.exists { case (_, n, v) => v == 102.0 })
  }

  test("dedup-at-ingest: repeat deliveries within the watermark suppressed, state expires") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val dd = StreamOps.dedupWithinWatermark(
      ms.toDF(), idCols = Seq("user_id", "event_type"), delay = "10 minutes")
    val q = dd.writeStream.format("memory").queryName("dedup_ingest")
      .outputMode("append").start()
    // first delivery + an immediate duplicate (same key, same batch)
    ms.addData(Evt(1, t(0), "click", 1.0), Evt(1, t(1), "click", 99.0))
    q.processAllAvailable()
    // duplicate in a LATER batch, still within the 10-min delay
    ms.addData(Evt(1, t(5), "click", 98.0))
    q.processAllAvailable()
    // advance the watermark far past the key's expiry, then redeliver:
    // the state entry is gone, so the redelivery is treated as new
    ms.addData(Evt(2, t(60), "view", 2.0))
    q.processAllAvailable()
    ms.addData(Evt(1, t(61), "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val vals = spark.table("dedup_ingest").collect()
      .filter(_.getAs[Long]("user_id") == 1L).map(_.getAs[Double]("value")).toSet
    assert(vals == Set(1.0, 3.0)) // 99.0 and 98.0 suppressed; 3.0 survived expiry
  }

  test("T10: built-in session window groups by gap") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val agg = StreamOps.sessionAgg(ms.toDF(), gap = "30 minutes", delay = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 1: two events 10 min apart (one session), then 90 min silence,
    // then one more event (second session)
    ms.addData(Evt(1, t(0), "click", 1.0), Evt(1, t(10), "view", 2.0))
    q.processAllAvailable()
    ms.addData(Evt(1, t(100), "click", 3.0))
    q.processAllAvailable()
    ms.addData(Evt(1, t(300), "click", 0.0)) // advance watermark, close all
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.contains((1L, 2L, 3.0))) // first session: 2 events, 3.0
    assert(rows.contains((1L, 1L, 3.0))) // second session: 1 event, 3.0
  }

  test("T10: custom flatMapGroupsWithState sessionization emits on gap") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val sessions = StreamOps.sessionize(ms.toDS(), gapSeconds = 1800)
    val q = sessions.toDF().writeStream.format("memory").queryName("customsessions")
      .outputMode("append").start()
    ms.addData(Evt(7, t(0), "click", 1.5), Evt(7, t(10), "view", 2.5))
    q.processAllAvailable()
    ms.addData(Evt(7, t(120), "click", 9.0)) // 110-min gap -> closes session 1
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("customsessions").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3)))
    assert(rows.contains((7L, 2, 4.0)))
  }

  test("quota enforcement: first K per window admitted, window rolls reset the count") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val out = StreamOps.quotaEnforce(ms.toDS(), maxPerWindow = 3, windowSeconds = 3600)
    val q = out.toDF().writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    // five events for user 1 inside one hour, two for user 2
    ms.addData((1 to 5).map(i => Evt(1, t(i), "click", 1.0)) ++
      Seq(Evt(2, t(1), "click", 1.0), Evt(2, t(2), "click", 1.0)): _*)
    q.processAllAvailable()
    // next hour: user 1's quota resets
    ms.addData(Evt(1, t(61), "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("quota").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getBoolean(2), r.getLong(3)))
    val u1h0 = rows.filter(r => r._1 == 1L && r._2.getTime < t(60).getTime)
    assert(u1h0.count(_._3) == 3 && u1h0.count(!_._3) == 2)
    assert(u1h0.filter(!_._3).map(_._4).sorted.toSeq == Seq(4L, 5L))
    assert(rows.filter(_._1 == 2L).forall(_._3)) // under quota
    val reset = rows.find(r => r._1 == 1L && r._2 == t(61)).get
    assert(reset._3 && reset._4 == 1L) // fresh window, count restarts
  }

  test("streaming burst: hours finalize at the watermark, >3x trailing mean flags") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val out = StreamOps.burstDetect(ms.toDS(), factor = 3, delay = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("burst")
      .outputMode("append").start()
    // click: 1 event/hour for 6 hours, then 5 in hour 6 (the burst);
    // view: steady 1/hour for 7 hours (key isolation)
    ms.addData(((0 to 5).map(k => Evt(1, t(60L * k), "click", 1.0)) ++
      (1 to 5).map(i => Evt(i.toLong, t(360), "click", 1.0)) ++
      (0 to 6).map(k => Evt(9, t(60L * k), "view", 1.0))): _*)
    q.processAllAvailable()
    ms.addData(Evt(1, t(480), "click", 1.0)) // watermark -> t(360)
    q.processAllAvailable()
    ms.addData(Evt(1, t(481), "click", 1.0)) // watermark -> t(480)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("burst").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val clicks = rows.filter(_._1 == "click").sortBy(_._2)
    assert(clicks.length == 7) // h0..h6 finalized; the sentinel hour stays open
    assert(clicks.head._5 == 0L && !clicks.head._6) // no baseline, no flag
    assert(clicks.slice(1, 6).forall(!_._6))        // steady hours stay quiet
    assert(clicks.last._3 == 5L && clicks.last._4 == 6L &&
      clicks.last._5 == 6L && clicks.last._6)       // 5 > 3 * (6/6)
    val views = rows.filter(_._1 == "view")
    assert(views.length == 7 && views.forall(!_._6)) // steady key untouched
  }

  test("streaming leaderboard: exact top-k when slots suffice; quiet key finalizes by timer") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val out = StreamOps.leaderboard(ms.toDS(), k = 3, counters = 64, delay = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("leaders")
      .outputMode("append").start()
    // hour 0 for "click": u1 x5, u2 x3, u3 x1, u4 x1
    ms.addData(((0 to 4).map(i => Evt(1, t(i.toLong), "click", 1.0)) ++
      (0 to 2).map(i => Evt(2, t(i.toLong), "click", 1.0)) ++
      Seq(Evt(3, t(3), "click", 1.0), Evt(4, t(4), "click", 1.0))): _*)
    q.processAllAvailable()
    // watermark rides DIFFERENT-type sentinels: the click key's hour must
    // close via its event-time timer, not via new click rows
    ms.addData(Evt(9, t(50), "view", 1.0))
    q.processAllAvailable()
    ms.addData(Evt(9, t(51), "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val hour0 = 1700000000L - 800L // t(0) truncated to its hour start
    val rows = spark.table("leaders").collect().map(r => (r.getString(0),
      r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val clicks = rows.filter(_._1 == "click").sortBy(_._3)
    // exact counts (no evictions): lo == hi; rank-3 tie broken by user id
    assert(clicks.toSeq == Seq(
      ("click", hour0, 1, 1L, 5L, 5L),
      ("click", hour0, 2, 2L, 3L, 3L),
      ("click", hour0, 3, 3L, 1L, 1L)))
  }

  test("streaming leaderboard: Misra-Gries eviction keeps the heavy hitter with honest bounds") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val out = StreamOps.leaderboard(ms.toDS(), k = 3, counters = 2, delay = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("leaders_mg")
      .outputMode("append").start()
    // u1 x4 + u2 + u3 through 2 slots: every arrival order of this batch
    // converges to sketch {u1 -> 3}, one decrement round
    ms.addData((Seq.fill(4)(Evt(1, t(0), "click", 1.0)) ++
      Seq(Evt(2, t(1), "click", 1.0), Evt(3, t(2), "click", 1.0))): _*)
    q.processAllAvailable()
    ms.addData(Evt(9, t(50), "click", 1.0))
    q.processAllAvailable()
    ms.addData(Evt(9, t(51), "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val hour0 = 1700000000L - 800L
    val rows = spark.table("leaders_mg").collect().map(r => (r.getString(0),
      r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .filter(_._2 == hour0)
    // only the heavy hitter survives; true count 4 inside [lo, hi]
    assert(rows.toSeq == Seq(("click", hour0, 1, 1L, 3L, 4L)))
  }

  test("streaming leaderboard ≡ batch q207 on finalized hours (replayed events table)") {
    implicit val ctx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val evts = graft.util.Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Evt].collect().toSeq
    val maxTs = evts.map(_.ts.getTime).max
    val ms = MemoryStream[Evt]
    // counters >> distinct users/hour -> the MG sketch is exact (lo == hi)
    val out = StreamOps.leaderboard(ms.toDS(), k = 3, counters = 4096,
      delay = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("leaders_parity")
      .outputMode("append").start()
    ms.addData(evts: _*)
    q.processAllAvailable()
    // two far-future sentinels: watermark lags a batch, so the second
    // push moves it past every real hour; quiet keys close via timers
    ms.addData(Evt(0, new Timestamp(maxTs + 86400000L), "sentinel", 0.0))
    q.processAllAvailable()
    ms.addData(Evt(0, new Timestamp(maxTs + 86500000L), "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()
    val streaming = spark.table("leaders_parity")
      .filter(col("event_type") =!= "sentinel")
      .select(col("hour_epoch"), col("event_type"), col("rank").cast("long"),
        col("user_id"), col("count_lo"), col("count_hi"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // exact regime: certainty interval collapses
    assert(streaming.forall(x => x._5 == x._6))
    val batch = graft.warehouse.EventQueries.queries("q207_hourly_topk")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(4))).toSet
    assert(streaming == batch,
      s"missing=${(batch -- streaming).take(5)} extra=${(streaming -- batch).take(5)}")
  }

  test("T10 modern: transformWithState sessionizer matches the fMGWS one") {
    implicit val ctx = spark.sqlContext
    // transformWithState needs a column-family-capable state store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Evt]
      val sessions = StreamOps.sessionizeTws(ms.toDS(), gapSeconds = 1800)
      val q = sessions.toDF().writeStream.format("memory").queryName("twssessions")
        .outputMode("append").start()
      ms.addData(Evt(9, t(0), "click", 1.5), Evt(9, t(10), "view", 2.5))
      q.processAllAvailable()
      ms.addData(Evt(9, t(120), "click", 9.0)) // gap closes session 1
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("twssessions").collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3)))
      assert(rows.contains((9L, 2, 4.0)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("T10 modern + TTL: idle state is evicted, later events start fresh sessions") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Evt]
      val sessions = StreamOps.sessionizeTws(ms.toDS(), gapSeconds = 1800,
        stateTtl = Some(java.time.Duration.ofSeconds(1)))
      // A TimeMode.ProcessingTime query never self-terminates (the engine
      // schedules micro-batches continuously to evict state), so neither
      // processAllAvailable nor Trigger.AvailableNow returns — poll the
      // committed source offset and stop the query explicitly instead.
      val ckpt = java.nio.file.Files.createTempDirectory("twsttl").toString
      // memory sink can't recover from a checkpoint; foreachBatch can
      val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, Double)]
      def runUpTo(target: Long): Unit = {
        val q = sessions.toDF().writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.collect().foreach(r => out.add((r.getLong(0), r.getInt(2), r.getDouble(3))))
          }
          .outputMode("append").option("checkpointLocation", ckpt).start()
        val deadline = System.currentTimeMillis + 120000
        def caughtUp = Option(q.lastProgress).flatMap(p =>
          scala.util.Try(p.sources.head.endOffset.trim.toLong).toOption)
          .exists(_ >= target)
        while (!caughtUp && System.currentTimeMillis < deadline) Thread.sleep(100)
        assert(caughtUp, "stream did not consume its input within 120s")
        q.stop()
      }
      val o1 = ms.addData(Evt(5, t(0), "click", 1.5))
      runUpTo(o1.json.trim.toLong)
      Thread.sleep(2500) // wall-clock TTL expires the idle state
      // one batch: post-expiry event starts a FRESH session (t0 state is
      // gone despite being within the event-time gap), far event closes it
      val o2 = ms.addData(Evt(5, t(10), "view", 2.5), Evt(5, t(3000), "click", 9.0))
      runUpTo(o2.json.trim.toLong)
      val rows = out.toArray(Array.empty[(Long, Int, Double)])
      // with TTL the closed session holds only the post-expiry event;
      // without TTL it would have absorbed t(0) too -> (5, 2, 4.0)
      assert(rows.contains((5L, 1, 2.5)), rows.mkString(","))
      assert(!rows.contains((5L, 2, 4.0)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("T10 modern + timers: trailing session closes when watermark passes gap") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Evt]
      val withWm = ms.toDF().withWatermark("ts", "1 minute")
        .as(org.apache.spark.sql.Encoders.product[Evt])
      val sessions = StreamOps.sessionizeTws(withWm, gapSeconds = 1800,
        eventTimeTimers = true)
      val q = sessions.toDF().writeStream.format("memory").queryName("twstimers")
        .outputMode("append").start()
      ms.addData(Evt(11, t(0), "click", 1.0), Evt(11, t(5), "view", 2.0))
      q.processAllAvailable()
      // no gap-closing event — only the watermark advances (other user)
      ms.addData(Evt(12, t(200), "click", 0.0))
      q.processAllAvailable()
      ms.addData(Evt(12, t(400), "click", 0.0)) // push watermark further
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("twstimers").collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3)))
      assert(rows.contains((11L, 2, 3.0))) // closed by timer, not by an event
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("J8: stream-stream join matches clicks within the preceding hour") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val joined = StreamOps.purchaseClickJoin(ms.toDF(), delay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    ms.addData(
      Evt(1, t(0), "click", 0.0),
      Evt(1, t(30), "purchase", 10.0), // matches click at t0
      Evt(2, t(10), "click", 0.0),
      Evt(2, t(200), "purchase", 5.0)) // click 190 min earlier: no match
    q.processAllAvailable()
    ms.addData(Evt(9, t(400), "click", 0.0)) // advance watermarks
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjoin").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("p_user") == 1L)
  }

  test("J8b: left-outer stream-stream join null-pads unmatched purchases") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val joined = StreamOps.purchaseClickLeftJoin(ms.toDF(), delay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssljoin")
      .outputMode("append").start()
    ms.addData(
      Evt(1, t(0), "click", 0.0),
      Evt(1, t(30), "purchase", 10.0), // matches click at t0
      Evt(2, t(10), "click", 0.0),
      Evt(2, t(200), "purchase", 5.0)) // click 190 min earlier: NO match
    q.processAllAvailable()
    // the unmatched row emits only once the watermark proves completeness
    ms.addData(Evt(9, t(400), "click", 0.0), Evt(9, t(400), "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssljoin").collect()
    val matched = rows.filter(r => !r.isNullAt(r.fieldIndex("c_user")))
    val unmatched = rows.filter(r => r.isNullAt(r.fieldIndex("c_user")))
    // user 1's purchase matches its click; user 9's matches its own
    // same-timestamp click (added to advance the watermark)
    assert(matched.map(_.getAs[Long]("p_user")).toSet == Set(1L, 9L))
    // user 2's purchase emits WITH NULL click columns instead of vanishing
    assert(unmatched.map(_.getAs[Long]("p_user")).contains(2L))
  }

  test("J8c: full-outer stream-stream join emits both unmatched sides") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val joined = StreamOps.purchaseClickFullJoin(ms.toDF(), delay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssfjoin")
      .outputMode("append").start()
    ms.addData(
      Evt(1, t(0), "click", 0.0),
      Evt(1, t(30), "purchase", 10.0),  // matched pair
      Evt(2, t(200), "purchase", 5.0),  // purchase with no click in range
      Evt(3, t(210), "click", 0.0))     // click with no purchase at all
    q.processAllAvailable()
    // advance both watermarks far enough to flush the unmatched state
    ms.addData(Evt(9, t(600), "click", 0.0), Evt(9, t(600), "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssfjoin").collect()
    def pUser(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(r.fieldIndex("p_user"))) -1L else r.getAs[Long]("p_user")
    def cUser(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(r.fieldIndex("c_user"))) -1L else r.getAs[Long]("c_user")
    // matched: user 1 and the watermark-advancing user 9
    assert(rows.filter(r => pUser(r) >= 0 && cUser(r) >= 0)
      .map(pUser).toSet == Set(1L, 9L))
    // purchase-only row survives with null click columns...
    assert(rows.filter(r => cUser(r) < 0).map(pUser).toSet == Set(2L))
    // ...and the click-only row survives with null purchase columns —
    // the side the left-outer form (J8b) drops
    assert(rows.filter(r => pUser(r) < 0).map(cUser).toSet == Set(3L))
  }

  test("observe: per-batch metrics ride the existing plan") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val q = StreamOps.observed(ms.toDF()).writeStream
      .format("memory").queryName("observed").outputMode("append").start()
    ms.addData(Evt(1, t(0), "click", 2.0), Evt(2, t(1), "click", 3.0))
    q.processAllAvailable()
    val metrics = q.recentProgress
      .flatMap(p => Option(p.observedMetrics.get("ingest_metrics")))
      .filter(_.getAs[Long]("n_rows") > 0)
    assert(metrics.nonEmpty)
    assert(metrics.last.getAs[Long]("n_rows") == 2L)
    assert(metrics.last.getAs[Double]("total_value") == 5.0)
    q.stop()
  }

  test("T7b: chained hourly->daily windowed aggregation in one query") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val rolled = StreamOps.hourlyDailyRollup(ms.toDF(), delay = "10 minutes")
    val q = rolled.writeStream.format("memory").queryName("rollup")
      .outputMode("append").start()
    // day 0: clicks in two different hours plus one purchase
    ms.addData(
      Evt(1, t(5), "click", 1.0),    // hour 0
      Evt(2, t(70), "click", 2.0),   // hour 1
      Evt(3, t(80), "purchase", 5.0))
    q.processAllAvailable()
    // finalizing a chained agg takes one watermark hop per stage: the
    // first advance closes day-0's HOURS (they emit downstream), the
    // second closes day 0 itself once those hourly rows have advanced
    // the second stage's watermark
    ms.addData(Evt(9, t(60 * 24 * 2), "click", 0.0))
    q.processAllAvailable()
    ms.addData(Evt(9, t(60 * 24 * 4), "click", 0.0))
    q.processAllAvailable()
    ms.addData(Evt(9, t(60 * 24 * 6), "click", 0.0))
    q.processAllAvailable()
    q.stop()
    // day windows are UTC-aligned; all three day-0 events land in the
    // window containing t(0)
    val day0 = spark.table("rollup").collect()
      .filter { r =>
        val start = r.getAs[Timestamp]("day_start").getTime
        start <= t(0).getTime && t(0).getTime < start + 86400000L
      }
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))).toMap
    // both hours of day-0 clicks combined into ONE daily row
    assert(day0("click") == ((2L, 3.0)))
    assert(day0("purchase") == ((1L, 5.0)))
  }

  test("streaming decontamination matches the batch contamination ledger") {
    implicit val ctx = spark.sqlContext
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val evalDocs = Seq(evalText).toDF("text")
    val train = Seq(
      (2L, evalText),                                          // full leak
      (3L, "alpha beta gamma delta epsilon omega psi chi phi"), // partial
      (4L, "one two three four five six seven eight nine ten"), // disjoint
      (5L, "a b")                                               // < n tokens
    )
    // batch reference from q77's ledger (same n/threshold)
    val ledgerDocs = ((1L, evalText, true) +: train.map { case (i, tx) => (i, tx, false) })
      .toDF("doc_id", "text", "is_eval")
    val expect = graft.text.CorpusQueries.contaminationLedger(
        ledgerDocs, col("doc_id"), col("text"), col("is_eval"),
        n = 3, threshold = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // streaming ingest of the same train docs, two micro-batches
    val ms = MemoryStream[(Long, String)]
    val out = StreamOps.decontaminate(
      ms.toDF().toDF("doc_id", "text"), evalDocs,
      col("doc_id"), col("text"), col("text"), n = 3, threshold = 5)
    val q = out.writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    ms.addData(train.take(2): _*)
    q.processAllAvailable()
    ms.addData(train.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("decon")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == expect)
    assert(got(2L)._2 && !got(3L)._2 && got(4L) == ((0L, false)))
    assert(got(5L) == ((0L, false))) // sub-shingle doc scores 0, not null
  }

  test("streaming corpus build: quality, decontamination, dedup and budget compose; batch replay parity") {
    implicit val ctx = spark.sqlContext
    val evalText = "evaluation benchmark question with the answer key inside the box"
    val evalDocs = Seq(evalText).toDF("text")
    val d1 = "the quick brown fox jumps over a lazy sleeping dog"
    val d5 = "a calm river flows in the green quiet valley today"
    val d6 = "the old ship sails to the cold north sea port"
    val d7 = "with warm wind the kite rises over the small town"
    val batch1 = Seq(
      (1L, t(0), "s1", d1),
      (2L, t(1), "s1", "too short here"),    // quality gate drops
      (3L, t(2), "s1", evalText))            // contamination screen drops
    val batch2 = Seq(
      (4L, t(3), "s1", "  The QUICK brown fox jumps over a lazy sleeping dog  "), // dup of d1 after normalization
      (5L, t(4), "s1", d5))
    val batch3 = Seq(
      (6L, t(5), "s1", d6),                  // cum 30 > 25: flagged
      (7L, t(6), "s2", d7))                  // other source: own budget
    val ms = MemoryStream[(Long, Timestamp, String, String)]
    val out = StreamOps.corpusBuildStream(
      ms.toDF().toDF("doc_id", "ts", "source", "text"), evalDocs,
      budgetPerSource = 25L, minWords = 5L, maxWords = 50L)
    val q = out.writeStream.format("memory").queryName("corpus_build")
      .outputMode("append").start()
    ms.addData(batch1: _*); q.processAllAvailable()
    ms.addData(batch2: _*); q.processAllAvailable()
    ms.addData(batch3: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("corpus_build").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, "s1", 10L, 10L, true),
      (5L, "s1", 10L, 20L, true),
      (6L, "s1", 10L, 30L, false),
      (7L, "s2", 10L, 10L, true)))

    // batch replay under the SAME streaming contract (first-arrival
    // dedup, event-time budget fold): quality + decontaminate + min-ts
    // fingerprint dedup + per-source running sum.
    import org.apache.spark.sql.expressions.Window
    val all = (batch1 ++ batch2 ++ batch3).toDF("doc_id", "ts", "source", "text")
    val keep = Seq("ts" -> col("ts"), "source" -> col("source"),
      "text" -> col("text"))
    val qual = graft.text.CorpusQueries.gopherFlags(
        all, col("doc_id"), col("text"), 5L, 50L, keep)
      .filter(col("passes"))
    val clean = StreamOps.decontaminate(qual, evalDocs, col("id"),
        col("text"), col("text"), 3, 5, keep)
      .filter(!col("is_contaminated"))
      .withColumn("fp", graft.text.TextFunctions.fingerprint(col("text")))
    val wFp = Window.partitionBy(col("fp")).orderBy(col("ts"), col("id"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("ts"), col("id"))
    val replay = clean
      .withColumn("arr", row_number().over(wFp)).filter(col("arr") === 1)
      .withColumn("n_tokens",
        graft.text.TextFunctions.tokenCount(col("text")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wSrc))
      .select(col("id"), col("source"), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= 25L).as("admitted"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(replay == got)
  }

  test("streaming near-dup detection ≡ batch LSH pairing of the same " +
      "signature scheme; multi-band collisions emit one pair") {
    implicit val ctx = spark.sqlContext
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, t(0), a),
      (2L, t(2), a.replace("upsilon", "omega")), // near-clone of d1
      (3L, t(3), "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen"), // unrelated
      (4L, t(5), a)) // exact copy of d1
    // batch reference: same signatures, same banding, same threshold
    import graft.text.TextFunctions
    val ref = docs.toDF("doc_id", "ts", "text")
      .select(col("doc_id"),
        TextFunctions.minhashSignature(
          TextFunctions.shingles(col("text"), 3), 16).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val expected = (for {
      (ai, asig) <- ref; (bi, bsig) <- ref if ai < bi
      shared = (0 until 4).exists(b =>
        asig.slice(b * 4, b * 4 + 4) == bsig.slice(b * 4, b * 4 + 4))
      sim = asig.zip(bsig).count { case (x, y) => x == y } / 16.0
      if shared && sim >= 0.7
    } yield (ai, bi)).toSet
    // the exact copy MUST pair with its original; the unrelated doc not
    assert(expected.contains((1L, 4L)))
    assert(!expected.exists { case (x, y) => x == 3L || y == 3L })

    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.nearDupDetect(
      ms.toDF().toDF("doc_id", "ts", "text"), threshold = 0.7)
    val q = out.writeStream.format("memory").queryName("near_dup")
      .outputMode("append").start()
    ms.addData(docs(0)); q.processAllAvailable()
    ms.addData(docs(1), docs(2)); q.processAllAvailable()
    ms.addData(docs(3)); q.processAllAvailable()
    q.stop()
    val rows = spark.table("near_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // one emission per pair, even when several bands collide (the
    // identical d1/d4 signatures share ALL four band buckets)
    assert(rows.length == rows.toSet.size)
    assert(rows.toSet == expected)
  }

  test("near-dup-gated streaming corpus build: flagged dups block later " +
      "similars but never charge the budget; batch replay parity") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evalText = "evaluation benchmark question with the answer key inside the box"
      val evalDocs = Seq(evalText).toDF("text")
      // 20 tokens, >= 2 distinct Gopher stopwords ("the", "a") so the
      // quality gate admits it (the Greek-letter corpus used by the
      // detection tests has none and Gopher drops it)
      val a = "the quick brown fox jumps over a lazy dog while bright " +
        "stars shine above the quiet sleeping village at night"
      val aNd = a.replace("village", "hamlet") // NEAR-dup of a, not exact
      val d6 = "the old ship sails to the cold north sea port"
      val d7 = "with warm wind the kite rises over the small town"
      val d8 = "a calm river flows in the green quiet valley today"
      val batch1 = Seq(
        (1L, t(0), "s1", a),
        (2L, t(1), "s1", "too short here"), // quality gate drops
        (3L, t(2), "s1", evalText))         // contamination screen drops
      val batch2 = Seq(
        (4L, t(3), "s1", "  " + a.toUpperCase + "  "), // EXACT dup: dedup drops
        (5L, t(4), "s1", aNd))              // near-dup: flagged, no charge
      val batch3 = Seq(
        (6L, t(5), "s1", d6),               // cum 30 <= 35: admitted
        (7L, t(6), "s1", d7),               // cum 40 > 35: over budget
        (8L, t(7), "s2", d8))               // other source: own budget
      val ms = MemoryStream[(Long, Timestamp, String, String)]
      val out = StreamOps.corpusBuildStreamNd(
        ms.toDF().toDF("doc_id", "ts", "source", "text"), evalDocs,
        budgetPerSource = 35L, minWords = 5L, maxWords = 50L)
      val q = out.toDF().writeStream.format("memory").queryName("corpus_nd")
        .outputMode("append").start()
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
      ms.addData(batch3: _*); q.processAllAvailable()
      q.stop()
      val got = spark.table("corpus_nd").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5))).toSet
      assert(got == Set(
        (1L, "s1", 20L, 20L, true, false),
        (5L, "s1", 20L, 20L, false, true),  // flagged; cum UNCHANGED
        (6L, "s1", 10L, 30L, true, false),  // budget never saw doc 5
        (7L, "s1", 10L, 40L, false, false), // over budget, not a dup
        (8L, "s2", 10L, 10L, true, false)))

      // independent batch replay of the declared contract: gate stages,
      // then "near_dup iff an earlier (ts, id) arrival shares a band
      // bucket at signature agreement >= threshold", then the budget
      // fold over non-dup docs in (ts, id) order per source.
      import org.apache.spark.sql.expressions.Window
      import graft.text.TextFunctions
      val all = (batch1 ++ batch2 ++ batch3).toDF("doc_id", "ts", "source", "text")
      val keep = Seq("ts" -> col("ts"), "source" -> col("source"),
        "text" -> col("text"))
      val qual = graft.text.CorpusQueries.gopherFlags(
          all, col("doc_id"), col("text"), 5L, 50L, keep)
        .filter(col("passes"))
      val clean = StreamOps.decontaminate(qual, evalDocs, col("id"),
          col("text"), col("text"), 3, 5, keep)
        .filter(!col("is_contaminated"))
        .withColumn("fp", TextFunctions.fingerprint(col("text")))
      val wFp = Window.partitionBy(col("fp")).orderBy(col("ts"), col("id"))
      val survivors = clean
        .withColumn("arr", row_number().over(wFp)).filter(col("arr") === 1)
        .select(col("id"), col("ts"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextFunctions.minhashSignature(
            TextFunctions.shingles(col("text"), 3), 16).as("sig"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
          r.getLong(3), r.getSeq[Long](4)))
        .sortBy { case (id, ts, _, _, _) => (ts.getTime, id) }
      def similar(x: Seq[Long], y: Seq[Long]): Boolean =
        (0 until 4).exists(b => x.slice(b * 4, b * 4 + 4) == y.slice(b * 4, b * 4 + 4)) &&
          x.zip(y).count { case (p, q2) => p == q2 } / 16.0 >= 0.7
      val cums = scala.collection.mutable.Map.empty[String, Long]
      val replay = survivors.zipWithIndex.map { case ((id, _, src, nt, sig), i) =>
        val dup = survivors.take(i).exists { case (_, _, _, _, osig) =>
          similar(osig, sig) }
        if (dup) (id, src, nt, cums.getOrElse(src, 0L), false, true)
        else {
          val c = cums.getOrElse(src, 0L) + nt
          cums(src) = c
          (id, src, nt, c, c <= 35L, false)
        }
      }.toSet
      assert(replay == got)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState near-dup detection on RocksDB ≡ the fMGWS face " +
      "and the batch pairing; multi-band collisions emit one pair") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
      val docs = Seq(
        (1L, t(0), a),
        (2L, t(2), a.replace("upsilon", "omega")), // near-clone of d1
        (3L, t(3), "one two three four five six seven eight nine ten " +
          "eleven twelve thirteen fourteen fifteen sixteen"), // unrelated
        (4L, t(5), a)) // exact copy of d1
      import graft.text.TextFunctions
      val ref = docs.toDF("doc_id", "ts", "text")
        .select(col("doc_id"),
          TextFunctions.minhashSignature(
            TextFunctions.shingles(col("text"), 3), 16).as("sig"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      val expected = (for {
        (ai, asig) <- ref; (bi, bsig) <- ref if ai < bi
        shared = (0 until 4).exists(b =>
          asig.slice(b * 4, b * 4 + 4) == bsig.slice(b * 4, b * 4 + 4))
        sim = asig.zip(bsig).count { case (x, y) => x == y } / 16.0
        if shared && sim >= 0.7
      } yield (ai, bi)).toSet
      assert(expected.contains((1L, 4L)))

      val ms = MemoryStream[(Long, Timestamp, String)]
      val out = StreamOps.nearDupDetectTws(
        ms.toDF().toDF("doc_id", "ts", "text"), threshold = 0.7)
      val q = out.toDF().writeStream.format("memory").queryName("near_dup_tws")
        .outputMode("append").start()
      ms.addData(docs(0)); q.processAllAvailable()
      ms.addData(docs(1), docs(2)); q.processAllAvailable()
      ms.addData(docs(3)); q.processAllAvailable()
      q.stop()
      val rows = spark.table("near_dup_tws").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.toSet.size,
        "multi-band collisions must emit exactly one pair")
      assert(rows.toSet == expected)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("TWS near-dup + TTL: a stale bucket member is evicted by the store, " +
      "fresh members keep detecting") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
      val ms = MemoryStream[(Long, Timestamp, String)]
      val out = StreamOps.nearDupDetectTws(
        ms.toDF().toDF("doc_id", "ts", "text"), threshold = 0.7,
        stateTtl = Some(java.time.Duration.ofSeconds(1)))
      // a ProcessingTime query never self-terminates: drive it by
      // polling committed source offsets (the sessionizeTws TTL pattern)
      val ckpt = java.nio.file.Files.createTempDirectory("ndttl").toString
      val hits = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
      def runUpTo(target: Long): Unit = {
        val q = out.toDF().writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.collect().foreach(r => hits.add((r.getLong(0), r.getLong(1))))
          }
          .outputMode("append").option("checkpointLocation", ckpt).start()
        val deadline = System.currentTimeMillis + 120000
        def caughtUp = Option(q.lastProgress).flatMap(p =>
          scala.util.Try(p.sources.head.endOffset.trim.toLong).toOption)
          .exists(_ >= target)
        while (!caughtUp && System.currentTimeMillis < deadline) Thread.sleep(100)
        assert(caughtUp, "stream did not consume its input within 120s")
        q.stop()
      }
      val o1 = ms.addData((1L, t(0), a))
      runUpTo(o1.json.trim.toLong)
      Thread.sleep(2500) // wall-clock TTL expires doc 1's membership
      // doc 2 is an exact copy of the EXPIRED doc 1 -> no hit (stale
      // member gone); doc 3 copies doc 2 within the TTL -> hit (one
      // delivery: the 1 s TTL must outlive the query-restart gap a
      // second runUpTo would insert)
      val o2 = ms.addData((2L, t(10), a), (3L, t(20), a))
      runUpTo(o2.json.trim.toLong)
      val got = hits.toArray(Array.empty[(Long, Long)]).toSet
      assert(!got.contains((1L, 2L)),
        "the expired member must not pair with a later arrival")
      assert(got.contains((2L, 3L)),
        "fresh members within the TTL must keep detecting")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("embedding near-dup detection ≡ batch sign-LSH pairing (exact " +
      "cosine verify); one emission per pair under multi-band collisions") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // real embeddings, q102's batch config as ground truth
      val e = graft.util.Tables.embeddings(spark, "/root/testdata/sf0.001")
        .filter(col("vec_id") > 0 && col("vec_id") <= 30)
      val expected = graft.dedup.Dedup.lshNearDups(e, col("vec_id"),
          col("embedding"), nBands = 4, planesPerBand = 4, dim = 64,
          threshold = 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expected.nonEmpty, "fixture must contain near-dup pairs")
      val rows = e.select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
        .sortBy(_._1)
        .zipWithIndex.map { case ((id, v), i) => (id, t(i.toLong), v) }
      val ms = MemoryStream[(Long, Timestamp, Seq[Float])]
      val out = StreamOps.embNearDupDetectTws(
        ms.toDF().toDF("vec_id", "ts", "embedding"))
      val q = out.toDF().writeStream.format("memory").queryName("emb_near_dup")
        .outputMode("append").start()
      ms.addData(rows.take(10).toSeq: _*); q.processAllAvailable()
      ms.addData(rows.slice(10, 20).toSeq: _*); q.processAllAvailable()
      ms.addData(rows.drop(20).toSeq: _*); q.processAllAvailable()
      q.stop()
      val got = spark.table("emb_near_dup").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size,
        "multi-band collisions must emit exactly one pair")
      assert(got.toSet == expected,
        s"missing=${(expected -- got.toSet).take(5)} extra=${(got.toSet -- expected).take(5)}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming embedding corpus build: semantic near-dups flagged and " +
      "never charged; per-source vector budget; batch replay parity") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // basis-vector fixture: e(i) ⊥ e(j) (cosine 0 < 0.25 — never a
      // semantic dup no matter the buckets), while e(1, 2f) is e(1)'s
      // exact direction (cosine 1, identical sign buckets in all bands)
      def e(i: Int, scale: Float = 1f): Seq[Float] =
        Seq.tabulate(64)(j => if (j == i) scale else 0f)
      val batch1 = Seq((1L, t(0), "s1", e(1)), (2L, t(1), "s1", e(1, 2f)))
      val batch2 = Seq((3L, t(2), "s1", e(2)), (4L, t(3), "s1", e(3)))
      val batch3 = Seq((5L, t(4), "s1", e(4)), (6L, t(5), "s2", e(5)))
      val ms = MemoryStream[(Long, Timestamp, String, Seq[Float])]
      val out = StreamOps.embCorpusBuildStream(
        ms.toDF().toDF("vec_id", "ts", "source", "embedding"),
        budgetPerSource = 3L)
      val q = out.toDF().writeStream.format("memory").queryName("emb_corpus")
        .outputMode("append").start()
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
      ms.addData(batch3: _*); q.processAllAvailable()
      q.stop()
      val got = spark.table("emb_corpus").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getBoolean(3), r.getBoolean(4))).toSet
      assert(got == Set(
        (1L, "s1", 1L, true, false),
        (2L, "s1", 1L, false, true),  // clone: flagged, cum UNCHANGED
        (3L, "s1", 2L, true, false),  // budget never saw vec 2
        (4L, "s1", 3L, true, false),
        (5L, "s1", 4L, false, false), // over budget, not a dup
        (6L, "s2", 1L, true, false))) // other source: own budget

      // independent batch replay of the declared first-arrival contract:
      // near_dup iff an earlier (ts, id) arrival shares a band bucket at
      // exact cosine >= threshold; budget folds non-dups in (ts, id)
      // order per source
      val all = (batch1 ++ batch2 ++ batch3)
        .sortBy { case (id, ts, _, _) => (ts.getTime, id) }
      val bks = all.toDF("vec_id", "ts", "source", "embedding")
        .select(col("vec_id"), org.apache.spark.sql.functions.transform(
          graft.ann.Similarity.bandKeys(col("embedding"), 4, 4, 64),
          s => s.getField("bucket")).as("bks"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dp += x * y; na += x * x; nb += y * y; i += 1
        }
        dp / (math.sqrt(na) * math.sqrt(nb))
      }
      val cums = scala.collection.mutable.Map.empty[String, Long]
      val replay = all.zipWithIndex.map { case ((id, _, src, v), i) =>
        val dup = all.take(i).exists { case (oid, _, _, ov) =>
          bks(oid).zip(bks(id)).exists { case (x, y) => x == y } &&
            cos(ov, v) >= 0.25 }
        if (dup) (id, src, cums.getOrElse(src, 0L), false, true)
        else {
          val c = cums.getOrElse(src, 0L) + 1
          cums(src) = c
          (id, src, c, c <= 3L, false)
        }
      }.toSet
      assert(replay == got)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming distinct maintenance ≡ batch support-bag fold across " +
      "three change windows with deletes and updates") {
    import graft.streaming.StreamOps.Chg
    implicit val ctx = spark.sqlContext
    val b1 = Seq(Chg(1L, t(0), "click", "insert"), Chg(1L, t(1), "click", "insert"),
      Chg(1L, t(2), "buy", "insert"), Chg(2L, t(3), "view", "insert"))
    val b2 = Seq(Chg(1L, t(4), "click", "delete"), // one of two: count holds
      Chg(2L, t(5), "view", "delete"), Chg(2L, t(6), "buy", "insert")) // update
    val b3 = Seq(Chg(1L, t(7), "click", "delete"), // last copy: count drops
      Chg(3L, t(8), "view", "insert"))
    val ms = MemoryStream[Chg]
    val out = StreamOps.distinctMaintain(ms.toDS())
    val q = out.writeStream.format("memory").queryName("distinct_maintain")
      .outputMode("append").start()
    ms.addData(b1: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable()
    ms.addData(b3: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("distinct_maintain").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // per-batch emissions, computed by hand: the first delete of u1's
    // doubled 'click' must NOT drop n_distinct (the Gupta-Mumick case)
    assert(got == Set(
      (1L, 2L, 3L), (2L, 1L, 1L), // batch 1
      (1L, 2L, 2L),               // batch 2 (u2 re-emits (1,1))
      (1L, 1L, 1L), (3L, 1L, 1L)  // batch 3
    ))
    // batch replay through cdc.IncrementalDistinct over the same windows
    import graft.cdc.IncrementalDistinct
    var bag = IncrementalDistinct.seed(
      Seq.empty[(Long, String)].toDF("k", "v"), col("k"), col("v"))
    Seq(b1, b2, b3).foreach { b =>
      val chg = b.map(c => (c.user_id, c.value, c.op))
        .toDF("k", "v", "_change_type")
      bag = IncrementalDistinct.applyDelta(bag, chg, col("k"), col("v"))
    }
    val batchFinal = IncrementalDistinct.distinctCounts(bag).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the stream's final emission per key equals the batch fold
    assert(batchFinal == Set((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("flagship corpus build with BOTH gates: a text near-dup AND an " +
      "embedding near-dup are each flagged without charging the budget; " +
      "batch replay parity, order-stable") {
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evalText = "evaluation benchmark question with the answer key inside the box"
      val evalDocs = Seq(evalText).toDF("text")
      val a = "the quick brown fox jumps over a lazy dog while bright " +
        "stars shine above the quiet sleeping village at night"
      val aNd = a.replace("village", "hamlet") // text NEAR-dup of a
      val d6 = "the old ship sails to the cold north sea port"
      val d7 = "with warm wind the kite rises over the small town"
      val d8 = "a calm river flows in the green quiet valley today"
      // embeddings: e(0) reused by doc 6 (cosine 1 — semantic dup of
      // doc 1 despite unrelated text); every other doc gets its own
      // one-hot axis (pairwise cosine 0 < 0.25 — no accidental votes)
      def e(axis: Int): Seq[Float] =
        Seq.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
      val rows = Seq(
        (1L, t(0), "s1", a, e(0)),
        (2L, t(1), "s1", "too short here", e(10)), // quality drop
        (3L, t(2), "s1", evalText, e(11)),         // contamination drop
        (4L, t(3), "s1", "  " + a.toUpperCase + "  ", e(12)), // exact dup
        (5L, t(4), "s1", aNd, e(13)),              // TEXT near-dup
        (6L, t(5), "s1", d6, e(0)),                // EMBEDDING near-dup
        (7L, t(6), "s1", d7, e(14)),               // admitted: 6 not charged
        (8L, t(7), "s2", d8, e(15)))               // own source budget
      val ms = MemoryStream[(Long, Timestamp, String, String, Seq[Float])]
      val out = StreamOps.corpusBuildStreamFull(
        ms.toDF().toDF("doc_id", "ts", "source", "text", "embedding"),
        evalDocs, budgetPerSource = 35L, minWords = 5L, maxWords = 50L)
      val q = out.toDF().writeStream.format("memory").queryName("corpus_full")
        .outputMode("append").start()
      ms.addData(rows.take(3): _*); q.processAllAvailable()
      ms.addData(rows.slice(3, 5): _*); q.processAllAvailable()
      ms.addData(rows.drop(5): _*); q.processAllAvailable()
      q.stop()
      val got = spark.table("corpus_full").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5))).toSet
      assert(got == Set(
        (1L, "s1", 20L, 20L, true, false),
        (5L, "s1", 20L, 20L, false, true), // text gate; cum UNCHANGED
        (6L, "s1", 10L, 20L, false, true), // EMB gate; cum UNCHANGED
        (7L, "s1", 10L, 30L, true, false), // within budget: 6 never charged
        (8L, "s2", 10L, 10L, true, false)))

      // independent batch replay with BOTH gate contracts: near_dup iff
      // an earlier (ts, id) survivor is text-similar (shared MinHash
      // band + signature agreement >= 0.7) OR embedding-similar (shared
      // sign-LSH band bucket + exact cosine >= 0.25); then the budget
      // fold over non-dup docs in (ts, id) order per source.
      import org.apache.spark.sql.expressions.Window
      import graft.text.TextFunctions
      val all = rows.toDF("doc_id", "ts", "source", "text", "embedding")
      val keep = Seq("ts" -> col("ts"), "source" -> col("source"),
        "text" -> col("text"), "embedding" -> col("embedding"))
      val qual = graft.text.CorpusQueries.gopherFlags(
          all, col("doc_id"), col("text"), 5L, 50L, keep)
        .filter(col("passes"))
      val clean = StreamOps.decontaminate(qual, evalDocs, col("id"),
          col("text"), col("text"), 3, 5, keep)
        .filter(!col("is_contaminated"))
        .withColumn("fp", TextFunctions.fingerprint(col("text")))
      val wFp = Window.partitionBy(col("fp")).orderBy(col("ts"), col("id"))
      val survivors = clean
        .withColumn("arr", row_number().over(wFp)).filter(col("arr") === 1)
        .select(col("id"), col("ts"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextFunctions.minhashSignature(
            TextFunctions.shingles(col("text"), 3), 16).as("sig"),
          org.apache.spark.sql.functions.transform(
            graft.ann.Similarity.bandKeys(col("embedding"), 4, 4, 64),
            s => s.getField("bucket")).as("ebuckets"),
          col("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
          r.getLong(3), r.getSeq[Long](4), r.getSeq[Int](5),
          r.getSeq[Float](6)))
        .sortBy { case (id, ts, _, _, _, _, _) => (ts.getTime, id) }
      def textSim(x: Seq[Long], y: Seq[Long]): Boolean =
        (0 until 4).exists(b =>
          x.slice(b * 4, b * 4 + 4) == y.slice(b * 4, b * 4 + 4)) &&
          x.zip(y).count { case (p, q2) => p == q2 } / 16.0 >= 0.7
      def embSim(bx: Seq[Int], by: Seq[Int],
          vx: Seq[Float], vy: Seq[Float]): Boolean = {
        val shared = bx.zip(by).exists { case (p, q2) => p == q2 }
        val dp = vx.zip(vy).map { case (p, q2) => p.toDouble * q2 }.sum
        val nx = math.sqrt(vx.map(p => p.toDouble * p).sum)
        val ny = math.sqrt(vy.map(p => p.toDouble * p).sum)
        shared && dp / (nx * ny) >= 0.25
      }
      val cums = scala.collection.mutable.Map.empty[String, Long]
      val replay = survivors.zipWithIndex.map {
        case ((id, _, src, nt, sig, eb, v), i) =>
          val dup = survivors.take(i).exists {
            case (_, _, _, _, osig, oeb, ov) =>
              textSim(osig, sig) || embSim(oeb, eb, ov, v) }
          if (dup) (id, src, nt, cums.getOrElse(src, 0L), false, true)
          else {
            val c = cums.getOrElse(src, 0L) + nt
            cums(src) = c
            (id, src, nt, c, c <= 35L, false)
          }
      }.toSet
      assert(replay == got)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
