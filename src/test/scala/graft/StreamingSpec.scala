package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.EventStreams

/** Structured Streaming surface (SURVEY §2.11 — an extension; built-in
  * Spark semantics are definitional). Strategy: every transform is a
  * plain DataFrame function, so we validate the streaming execution
  * against the batch execution of the same function on the same rows.
  */
class StreamingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  private def sampleEvents = {
    import spark.implicits._
    (0 until 200).map { i =>
      EventStreams.Event(i.toLong, new Timestamp(1700000000000L + i * 60000L),
        (i % 7).toLong, s"type${i % 3}", i * 0.5)
    }.toDF()
  }

  test("hourly rollup: streaming result equals batch result on the same rows") {
    import spark.implicits._
    val batch = EventStreams.hourlyRollup(sampleEvents)
      .as[(Timestamp, String, Long, Double)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.hourlyRollup(mem.toDF())
      .writeStream.format("memory").queryName("rollup_test")
      .outputMode("complete").start()
    try {
      mem.addData(sampleEvents.as[EventStreams.Event].collect().toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("rollup_test")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      streamed shouldBe batch
    } finally q.stop()
  }

  test("session windows close after the gap") {
    import spark.implicits._
    // two bursts for user 1, 2 hours apart -> 2 sessions
    val rows = (Seq(0L, 1L, 2L) ++ Seq(7200L, 7201L)).map { s =>
      EventStreams.Event(s, new Timestamp(1700000000000L + s * 1000L), 1L, "t", 1.0)
    }.toDF()
    val sessions = EventStreams.sessionWindows(rows).collect()
    sessions.length shouldBe 2
    sessions.map(_.getLong(2)).sorted.toSeq shouldBe Seq(2L, 3L)
  }

  test("streaming dedup emits first row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(sampleEvents.as[EventStreams.Event].collect().toIndexedSeq)
      q.processAllAvailable()
      // 7 users x 3 types = 21 distinct keys
      spark.table("dedup_test").count() shouldBe 21
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join on the same rows") {
    import spark.implicits._
    // clicks at t+0m per user; purchases at +10m (user 1, inside the
    // 30m window), +45m (user 2, outside), and user 3 with no click
    val base = 1700000000000L
    def ev(id: Long, user: Long, tpe: String, offsetMin: Long) =
      EventStreams.Event(id, new Timestamp(base + offsetMin * 60000L), user, tpe, 1.0)
    val rows = Seq(
      ev(1, 1, "click", 0), ev(2, 1, "purchase", 10),
      ev(3, 2, "click", 0), ev(4, 2, "purchase", 45),
      ev(5, 3, "purchase", 5),
      // advance the watermark far past every window
      ev(6, 9, "click", 600))
    val batch = EventStreams.clickPurchaseJoin(rows.toDF())
      .as[(Long, Long, Long)].collect().toSet
    batch shouldBe Set((1L, 1L, 2L)) // only user 1 converts in-window

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.clickPurchaseJoin(mem.toDF())
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      spark.table("ssjoin_test").as[(Long, Long, Long)].collect().toSet shouldBe batch
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits unmatched clicks after the watermark") {
    import spark.implicits._
    val base = 1700000000000L
    def ev(id: Long, user: Long, tpe: String, offsetMin: Long) =
      EventStreams.Event(id, new Timestamp(base + offsetMin * 60000L), user, tpe, 1.0)
    val rows = Seq(
      ev(1, 1, "click", 0), ev(2, 1, "purchase", 10), // matched
      ev(3, 2, "click", 0))                           // never converts
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.clickPurchaseJoin(mem.toDF(), joinType = "leftOuter")
      .writeStream.format("memory").queryName("ssjoin_outer_test")
      .outputMode("append").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      // the null-extended row for user 2 can only be emitted once the
      // watermark passes its join window — and the query watermark is
      // the MIN over both sides' watermark operators, so the far-future
      // ticks must flow through BOTH branches (a click alone leaves the
      // purchase side's watermark at the epoch and blocks the emission).
      // Two tick batches: the watermark computed from batch N's data
      // takes effect in batch N+1
      mem.addData(Seq(ev(99, 9, "click", 600), ev(100, 9, "purchase", 650)))
      q.processAllAvailable()
      mem.addData(Seq(ev(101, 8, "click", 700), ev(102, 8, "purchase", 750)))
      q.processAllAvailable()
      val got = spark.table("ssjoin_outer_test")
        .as[(Long, Long, Option[Long])].collect().toSet
      got should contain((1L, 1L, Some(2L)))
      got should contain((2L, 3L, None))
    } finally q.stop()
  }

  test("stateful sessionization fold accumulates per-user state") {
    import spark.implicits._
    val evs = (0 until 5).map(i =>
      EventStreams.Event(i.toLong, new Timestamp(1700000000000L + i * 1000L), 1L, "t", 2.0))
    val first = EventStreams.foldEvents(None, 1L, evs.take(3).iterator)
    first.n_events shouldBe 3L
    first.total_value shouldBe 6.0
    val second = EventStreams.foldEvents(Some(first), 1L, evs.drop(3).iterator)
    second.n_events shouldBe 5L
    second.total_value shouldBe 10.0
    second.last_seen_ms shouldBe 1700000004000L
  }

  // This build's micro-batch engine never satisfies processAllAvailable
  // while processing-time timers are registered (see EventStreams
  // scaladoc + graft.StreamingProbe), so the arbitrary-state drives
  // below poll the sink with a deadline instead of awaiting — the exec
  // nodes themselves run fine and emit correct sessions.
  private def driveSessions(name: String,
      start: MemoryStream[EventStreams.Event] => org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = start(mem).writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // users 1 and 2: 3 and 2 events, then silence -> both close
      val burst = Seq(
        EventStreams.Event(0L, new Timestamp(1700000000000L), 1L, "t", 2.0),
        EventStreams.Event(1L, new Timestamp(1700000001000L), 1L, "t", 2.0),
        EventStreams.Event(2L, new Timestamp(1700000002000L), 1L, "t", 2.0),
        EventStreams.Event(3L, new Timestamp(1700000003000L), 2L, "t", 5.0),
        EventStreams.Event(4L, new Timestamp(1700000004000L), 2L, "t", 5.0))
      mem.addData(burst)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var tick = 100L
      def closed() = spark.table(name).filter(col("user_id").isin(1L, 2L)).count()
      while (closed() < 2 && System.nanoTime() < deadline) {
        // keep batches flowing so expired timers are processed, using a
        // bystander user whose own session never closes within the test
        mem.addData(Seq(EventStreams.Event(1000L + tick,
          new Timestamp(1700000100000L + tick * 1000L), 99L, "tick", 0.0)))
        tick += 1
        Thread.sleep(250)
      }
      val rows = spark.table(name).filter(col("user_id").isin(1L, 2L))
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      rows shouldBe Array((1L, 3L, 6.0), (2L, 2L, 10.0))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions end-to-end (guarded drive)") {
    val mille = 500L
    driveSessions("fmgws_sessions",
      mem => EventStreams.statefulSessions(mem.toDS(), gapMs = mille).toDF())
  }

  test("transformWithState sessionization closes sessions end-to-end (guarded drive)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try driveSessions("tws_sessions",
      mem => EventStreams.twsSessions(mem.toDS(), gapMs = 500L).toDF())
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("event-time sessionization: out-of-order stream equals the batch session_window oracle") {
    import spark.implicits._
    val gapMs = 300000L // 5-minute gap
    val base = 1700000000000L
    // user 1: two sessions (0/60/120s and 3600/3660s); user 2: one (30/90s)
    val evs = Seq(
      (0L, 0L, 1L), (1L, 60L, 1L), (2L, 120L, 1L),
      (3L, 3600L, 1L), (4L, 3660L, 1L),
      (5L, 30L, 2L), (6L, 90L, 2L)
    ).map { case (id, sec, user) =>
      EventStreams.Event(id, new Timestamp(base + sec * 1000L), user, "t", 1.0)
    }
    // batch oracle: built-in session_window over the same rows, same gap
    val oracle = evs.toDF()
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("user_id"), col("n"), col("v"))
      .as[(Long, Long, Double)].collect().toSeq.sorted

    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[EventStreams.Event]
    // 2h lateness bound: the watermark stays below every event above
    // while they arrive OUT OF ORDER across batches; the far-future
    // pusher then advances it past all pending closes
    val q = EventStreams.twsSessionsEventTime(mem.toDS(), gapMs, delay = "2 hours")
      .toDF().writeStream.format("memory").queryName("et_sessions")
      .outputMode("append").start()
    try {
      // processAllAvailable hangs for any transformWithState query on
      // this build (see driveSessions note) — add data and poll only.
      // Batch coalescing is harmless: the merge is order-insensitive
      // and the 2h lateness bound keeps the watermark below every event.
      mem.addData(evs(2), evs(0), evs(4)) // 120s, 0s, 3660s
      mem.addData(evs(1), evs(3), evs(5), evs(6)) // 60s, 3600s, 30s, 90s
      // push the watermark past every close (6h - 2h delay = 4h)
      var tick = 0L
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def closed() = spark.table("et_sessions").filter(col("user_id").isin(1L, 2L)).count()
      while (closed() < 3 && System.nanoTime() < deadline) {
        mem.addData(EventStreams.Event(1000L + tick,
          new Timestamp(base + 21600000L + tick * 1000L), 99L, "tick", 0.0))
        tick += 1
        Thread.sleep(250)
      }
      val got = spark.table("et_sessions").filter(col("user_id").isin(1L, 2L))
        .as[(Long, Long, Double)].collect().toSeq.sorted
      got shouldBe oracle
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("event-time session merge is order-insensitive and bridges gaps") {
    val gap = 1000L
    val evs = Seq((5000L, 1.0), (0L, 1.0), (900L, 1.0), (4100L, 1.0))
    val m = EventStreams.mergeSessions(Nil, 7L, evs, gap)
    m.map(s => (s.start_ms, s.last_ms, s.n_events)) shouldBe
      Seq((0L, 900L, 2L), (4100L, 5000L, 2L))
    // a later out-of-order event BRIDGES the two open sessions
    val m2 = EventStreams.mergeSessions(m, 7L, Seq((1800L, 1.0), (2700L, 1.0), (3500L, 1.0)), gap)
    m2.map(s => (s.start_ms, s.last_ms, s.n_events)) shouldBe Seq((0L, 5000L, 7L))
    // permuted arrival produces the identical state
    val mAll = EventStreams.mergeSessions(Nil, 7L,
      scala.util.Random.shuffle(evs ++ Seq((1800L, 1.0), (2700L, 1.0), (3500L, 1.0))), gap)
    mAll shouldBe m2
  }

  test("streaming first-seen dedup: first doc per hash passes, cross-batch dups drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[EventStreams.IngestDoc]
    val q = EventStreams.streamingFirstSeen(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    try {
      // processAllAvailable never returns for transformWithState on
      // this build (see driveSessions note) — poll the sink instead
      def awaitCount(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (spark.table("first_seen").count() < n && System.nanoTime() < deadline)
          Thread.sleep(200)
      }
      // batch 1: hash 100 arrives twice (ids 5 and 3) + hash 200 once
      mem.addData(EventStreams.IngestDoc(5L, 100L),
        EventStreams.IngestDoc(3L, 100L), EventStreams.IngestDoc(7L, 200L))
      awaitCount(2)
      // batch 2: hash 100 again (dup, dropped) + new hash 300
      mem.addData(EventStreams.IngestDoc(9L, 100L), EventStreams.IngestDoc(11L, 300L))
      awaitCount(3)
      val got = spark.table("first_seen").as[EventStreams.IngestDoc]
        .collect().map(d => d.content_hash -> d.doc_id).toMap
      got shouldBe Map(100L -> 3L, 200L -> 7L, 300L -> 11L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming decontam: keep stream equals the batch q77 keep set, exactly once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // benchmark docs + train docs: 103 shares the 4-gram "kappa lambda
    // mu nu"; 104 overlaps only a 3-gram, so it is CLEAN at n=4
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "kappa lambda mu nu xi omicron")).toDF("doc_id", "text")
    val train = Seq(
      EventStreams.StreamDoc(101L, "one two three four five six"),
      EventStreams.StreamDoc(102L, "seven eight nine ten eleven"),
      EventStreams.StreamDoc(103L, "intro kappa lambda mu nu outro"),
      EventStreams.StreamDoc(104L, "alpha beta gamma wholly different"))
    // batch oracle on the identical rows: q77's operator flags the
    // contaminated ids; the keep set is their complement
    val all = bench.union(train.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
    val contaminated = graft.pipeline.Decontam
      .bloomDecontam(all, isBench = col("doc_id") < 100, n = 4)
      .select("doc_id").as[Long].collect().toSet
    contaminated shouldBe Set(103L) // guard: the fixture exercises both branches
    val expectKeep = train.map(_.doc_id).toSet -- contaminated
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingDecontam(mem.toDS(), bench, n = 4).toDF()
      .writeStream.format("memory").queryName("decontam_keep")
      .outputMode("append").start()
    try {
      def awaitCount(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (spark.table("decontam_keep").count() < n && System.nanoTime() < deadline)
          Thread.sleep(200)
      }
      mem.addData(train(0), train(2)) // clean 101 + contaminated 103
      awaitCount(1)
      // batch 2 REDELIVERS 101 (at-least-once upstream) + the rest
      mem.addData(train(0), train(1), train(3))
      awaitCount(3)
      // sorted-seq compare (not set): a duplicate emission of 101 fails
      spark.table("decontam_keep").as[EventStreams.StreamDoc]
        .collect().map(_.doc_id).sorted.toSeq shouldBe expectKeep.toSeq.sorted
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming MG sketch: cross-batch bounded state keeps every guaranteed heavy hitter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[EventStreams.TokIn]
    val q = EventStreams.streamingHeavyHitterCandidates(mem.toDS(), k = 2).toDF()
      .writeStream.format("memory").queryName("mg_cands")
      .outputMode("append").start()
    try {
      def awaitCount(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (spark.table("mg_cands").count() < n && System.nanoTime() < deadline)
          Thread.sleep(200)
      }
      // N = 11 tokens, k = 2 → guarantee: count > N/(k+1) = 3.67
      // survives ANY arrival order. a(4) and d(4) qualify; capacity is
      // 2, so the flush snapshot is exactly {a, d} — and a arrives
      // ONLY in batch 1, so its survival proves state crossed batches.
      mem.addData(Seq("a", "a", "a", "a", "b", "c")
        .map(EventStreams.TokIn(0, _)): _*)
      mem.addData(Seq("d", "d", "d", "d", "e", EventStreams.FlushToken)
        .map(EventStreams.TokIn(0, _)): _*)
      awaitCount(2)
      spark.table("mg_cands").as[EventStreams.HHCand]
        .collect().map(_.token).sorted.toList shouldBe List("a", "d")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming MG sketch: timer-driven snapshots emit with NO flush sentinel in the input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[EventStreams.TokIn]
    val q = EventStreams.streamingHeavyHitterCandidates(mem.toDS(), k = 2,
        snapshotEveryMs = 300L).toDF()
      .writeStream.format("memory").queryName("mg_timer_cands")
      .outputMode("append").start()
    try {
      // all tokens for substream 0 go in up front — NO FlushToken ever;
      // only the periodic timer can emit its candidates. Same MG math
      // as the sentinel test: a(4) and d(4) exceed N/(k+1) = 11/3.
      mem.addData(Seq("a", "a", "a", "a", "b", "c", "d", "d", "d", "d", "e")
        .map(EventStreams.TokIn(0, _)): _*)
      // keep batches flowing via a DIFFERENT substream so substream 0
      // sees nothing further — its emission must be timer-driven
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def sub0Tokens() = spark.table("mg_timer_cands")
        .filter(col("sub") === 0).select(col("token")).distinct().count()
      var tick = 0L
      while (sub0Tokens() < 2 && System.nanoTime() < deadline) {
        mem.addData(EventStreams.TokIn(1, s"bystander$tick"))
        tick += 1
        Thread.sleep(200)
      }
      spark.table("mg_timer_cands").filter(col("sub") === 0)
        .as[EventStreams.HHCand]
        .collect().map(_.token).distinct.sorted.toList shouldBe List("a", "d")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("event-time sessionization state survives a stop/restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-recover").toString
    val gapMs = 300000L
    val base = 1700000000000L
    val evs = Seq(
      (0L, 0L, 1L), (1L, 60L, 1L), (2L, 120L, 1L),
      (3L, 3600L, 1L), (4L, 3660L, 1L),
      (5L, 30L, 2L), (6L, 90L, 2L)
    ).map { case (id, sec, user) =>
      EventStreams.Event(id, new Timestamp(base + sec * 1000L), user, "t", 1.0)
    }
    val oracle = evs.toDF()
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("user_id"), col("n"), col("v"))
      .as[(Long, Long, Double)].collect().toSeq.sorted

    // the memory sink cannot recover from a checkpoint — use the
    // fault-tolerant FILE sink, whose metadata log also makes output
    // across the restart exactly-once
    val outDir = java.nio.file.Files.createTempDirectory("graft-tws-recover-out").toString
    val mem = MemoryStream[EventStreams.Event]
    def start() =
      EventStreams.twsSessionsEventTime(mem.toDS(), gapMs, delay = "2 hours")
        .toDF().writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    def emitted() = spark.read
      .schema("user_id LONG, n_events LONG, total_value DOUBLE")
      .parquet(outDir).filter(col("user_id").isin(1L, 2L))

    // phase 1: ingest every real event, COMMIT it into RocksDB state,
    // then stop. The 2h lateness bound keeps the watermark below every
    // close, so nothing is emitted before the kill — every closed
    // session the restarted query emits can only come from state that
    // survived the restart.
    val q1 = start()
    try {
      mem.addData(evs(2), evs(0), evs(4))
      mem.addData(evs(1), evs(3), evs(5), evs(6))
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def committed() = q1.recentProgress.map(_.numInputRows).sum
      while (committed() < 7 && System.nanoTime() < deadline) Thread.sleep(200)
      committed() should be >= 7L
    } finally q1.stop()
    emitted().count() shouldBe 0L // nothing closed before the kill

    // phase 2: new query instance, same checkpoint + source; push the
    // watermark past every pending close and await the sessions
    val q2 = start()
    try {
      var tick = 0L
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (emitted().count() < 3 && System.nanoTime() < deadline) {
        mem.addData(EventStreams.Event(1000L + tick,
          new Timestamp(base + 21600000L + tick * 1000L), 99L, "tick", 0.0))
        tick += 1
        Thread.sleep(250)
      }
      val got = emitted().as[(Long, Long, Double)].collect().toSeq.sorted
      got shouldBe oracle
    } finally {
      q2.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming group sample: reservoir equals the batch top-k across batches and redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rnd = new scala.util.Random(8787L)
    val rows = for {
      lang <- Seq("en", "fr"); i <- 1 to 9
    } yield EventStreams.SampleIn(lang, i.toLong + (if (lang == "fr") 100 else 0),
      f"${rnd.nextInt(1 << 20)}%08x")
    val k = 3
    // batch reference: q87's shape — smallest (rank, doc_id) per stratum
    val expected = rows.groupBy(_.lang).flatMap { case (_, rs) =>
      rs.sortBy(r => (r.rank, r.doc_id)).take(k)
    }.toSet
    // independent cross-check through the windowed batch operator shape
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"rank", $"doc_id")
    val viaWindow = rows.toDF("lang", "doc_id", "rank")
      .withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .as[(String, Long, String, Int)].collect()
      .map(t => EventStreams.SampleIn(t._1, t._2, t._3)).toSet
    viaWindow shouldBe expected
    val (b1, b2) = rnd.shuffle(rows).splitAt(rows.length / 2)
    val mem = MemoryStream[EventStreams.SampleIn]
    val q = EventStreams.streamingGroupSample(mem.toDS(), k).toDF()
      .writeStream.format("memory").queryName("group_sample")
      .outputMode("append").start()
    try {
      def awaitCount(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (spark.table("group_sample").count() < n && System.nanoTime() < deadline)
          Thread.sleep(200)
      }
      mem.addData(b1: _*)
      mem.addData((b2 ++ b1.take(3)): _*) // b1 rows redelivered
      mem.addData(EventStreams.SampleIn("en", 0L, EventStreams.FlushToken),
        EventStreams.SampleIn("fr", 0L, EventStreams.FlushToken))
      awaitCount(2L * k)
      val got = spark.table("group_sample").as[EventStreams.SampleIn]
        .collect().toSet
      got shouldBe expected
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming funnel: hits equal the batch funnel stage times under ts-ordered batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the GraphSpec funnel fixture: decoys, gaps, and a strict-tie case
    val rows = Seq(
      (1L, "click", 50L), (1L, "view", 100L), (1L, "purchase", 150L),
      (1L, "click", 200L), (1L, "purchase", 250L), (1L, "click", 300L),
      (1L, "purchase", 400L),
      (2L, "view", 10L), (2L, "purchase", 20L),
      (3L, "click", 5L),
      (4L, "view", 70L), (4L, "click", 70L))
    val batch = graft.ops.TemporalJoins.conversionFunnel(
      rows.map { case (u, t, ms) => (u, t, new Timestamp(ms)) }
        .toDF("user_id", "event_type", "ts"),
      Seq("view", "click", "purchase"))
    val expected = batch.collect().flatMap { r =>
      (1 to 3).flatMap { st =>
        if (r.isNullAt(st)) None
        else Some((r.getLong(0), st, r.getTimestamp(st).getTime))
      }
    }.toSet
    val ordered = rows.sortBy(_._3).map { case (u, t, ms) =>
      EventStreams.FunnelIn(u, t, ms)
    }
    val (b1, b2) = ordered.splitAt(ordered.length / 2)
    val mem = MemoryStream[EventStreams.FunnelIn]
    val q = EventStreams.streamingFunnel(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("funnel_hits")
      .outputMode("append").start()
    try {
      def awaitCount(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (spark.table("funnel_hits").count() < n && System.nanoTime() < deadline)
          Thread.sleep(200)
      }
      mem.addData(b1: _*)
      // u2's view@10 and u4's view@70/strict-tie click all land in b1
      awaitCount(2)
      mem.addData(b2: _*)
      awaitCount(expected.size.toLong)
      val got = spark.table("funnel_hits").as[EventStreams.FunnelHit]
        .collect().map(h => (h.user_id, h.stage, h.ts_ms)).toSet
      got shouldBe expected
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming Count-Min cells equal the batch sketch after any batch split (linearity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      EventStreams.StreamDoc(1L, "alpha beta beta gamma"),
      EventStreams.StreamDoc(2L, "alpha delta epsilon beta"),
      EventStreams.StreamDoc(3L, "zeta eta theta alpha alpha"),
      EventStreams.StreamDoc(4L, "beta beta gamma gamma iota"))
    // batch truth: the same pipeline over ALL rows at once
    val batchCells = EventStreams.streamingCountMin(rows.toDS(), width = 64, depth = 4)
      .as[(Long, Long, Long)].collect().sorted.toList
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingCountMin(mem.toDS(), width = 64, depth = 4)
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      mem.addData(rows(0), rows(1))
      q.processAllAvailable()
      mem.addData(rows(2))
      q.processAllAvailable()
      mem.addData(rows(3))
      q.processAllAvailable()
      val streamed = spark.table("cms_cells")
        .as[(Long, Long, Long)].collect().sorted.toList
      streamed shouldBe batchCells
    } finally q.stop()
  }

  test("streaming near-dup: min-rep per doc equals the batch first-seen verdict across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // real corpus slice: word-soup docs collide plentifully at r=4
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 60)
      .as[EventStreams.StreamDoc].collect().sortBy(_.doc_id).toSeq
    val batch = graft.pipeline.Dedup
      .firstSeenNearDup(rows.toDF(), shingleN = 3, numHashes = 16, bands = 4)
      .as[(Long, Long, Long)].collect().toList
    batch.count(_._3 == 1L) should be > 0 // fixture really exercises dups
    batch.count(_._3 == 0L) should be > 0
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingNearDup(mem.toDS(),
        shingleN = 3, numHashes = 16, bands = 4)
      .writeStream.format("memory").queryName("neardup_cands")
      .outputMode("append").start()
    try {
      // in-order arrival over three batches, with batch 2 REDELIVERING
      // part of batch 1 (at-least-once upstream)
      mem.addData(rows.take(20): _*)
      q.processAllAvailable()
      mem.addData(rows.slice(10, 40): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(40): _*)
      q.processAllAvailable()
      val verdicts = spark.table("neardup_cands")
        .groupBy($"doc_id").agg(min($"rep").as("rep"))
        .as[(Long, Long)].collect().toMap
      val streamed = rows.map(d => (d.doc_id,
        verdicts.getOrElse(d.doc_id, -1L),
        if (verdicts.contains(d.doc_id)) 1L else 0L)).toList
      streamed shouldBe batch
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming simhash dedup: verdicts equal the batch first-seen verdict across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .as[EventStreams.StreamDoc].collect().sortBy(_.doc_id).toSeq
    // radius 5 / pieces 8 for collision density on the small slice;
    // the pigeonhole guarantee makes BOTH faces exact, so equality is
    // row-for-row, not recall-band
    val batch = graft.pipeline.Dedup
      .firstSeenSimhashDup(rows.toDF(), radius = 5, pieces = 8)
      .as[(Long, Long, Long)].collect().toList
    batch.count(_._3 == 1L) should be > 0 // fixture really exercises dups
    batch.count(_._3 == 0L) should be > 0
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingSimhashNearDup(mem.toDS(),
        radius = 5, pieces = 8)
      .writeStream.format("memory").queryName("simhash_verdicts")
      .outputMode("append").start()
    try {
      // in-order arrival over three batches, batch 2 REDELIVERING part
      // of batch 1 (at-least-once upstream): the bucket lists don't
      // re-append known ids and the verdict guard keeps exactly-once
      mem.addData(rows.take(20): _*)
      q.processAllAvailable()
      mem.addData(rows.slice(10, 40): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(40): _*)
      q.processAllAvailable()
      val streamed = spark.table("simhash_verdicts")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toList
      streamed shouldBe batch
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming quality scoring equals the batch gate scores, stateless across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = graft.pipeline.QualityClassifier.fit(docs)
    val rows = docs.select($"doc_id", $"text")
      .as[EventStreams.StreamDoc].collect().sortBy(_.doc_id).take(80).toSeq
    val batch = graft.pipeline.QualityClassifier.score(rows.toDF(), model)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingQualityScore(mem.toDS(), model)
      .writeStream.format("memory").queryName("quality_scores")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(30): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(30): _*)
      q.processAllAvailable()
      val streamed = spark.table("quality_scores")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .sortBy(_._1).toList
      streamed shouldBe batch
    } finally q.stop()
  }

  test("streaming curation: keep/drop verdicts equal the batch q165 composition on in-order replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = graft.pipeline.QualityClassifier.fit(docs)
    val rows = docs.select($"doc_id", $"text").filter($"doc_id" < 60)
      .as[EventStreams.StreamDoc].collect().sortBy(_.doc_id).toSeq
    // the pure row scorer is the column scan bit-for-bit
    val colScores = graft.pipeline.QualityClassifier.score(rows.toDF(), model)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    rows.map { d =>
      val (nt, nd, label, mg, pred) =
        graft.pipeline.QualityClassifier.scoreRow(d.text, model)
      (d.doc_id, nt, nd, label, mg, pred)
    }.toList shouldBe colScores
    // batch q165 composition on the same slice: per-doc (is_dup, pred, keep)
    val preds = colScores.map(r => r._1 -> r._6).toMap
    val nToks = colScores.map(r => r._1 -> r._2).toMap
    val dupOf = graft.pipeline.Dedup
      .firstSeenNearDup(rows.toDF(), shingleN = 3, numHashes = 16, bands = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val batch = rows.map { d =>
      val isDup = dupOf(d.doc_id)
      val p = preds(d.doc_id)
      (d.doc_id, isDup, p, if (p == 1L && isDup == 0L) 1L else 0L, nToks(d.doc_id))
    }.toList
    batch.count(_._4 == 1L) should be > 0 // both verdict kinds exercised
    batch.count(_._4 == 0L) should be > 0
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingCuration(mem.toDS(), model)
      .writeStream.format("memory").queryName("curation_verdicts")
      .outputMode("append").start()
    try {
      // in-order arrival over three batches, with batch 2 REDELIVERING
      // part of batch 1 (at-least-once upstream)
      mem.addData(rows.take(20): _*)
      q.processAllAvailable()
      mem.addData(rows.slice(10, 40): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(40): _*)
      q.processAllAvailable()
      val streamed = spark.table("curation_verdicts")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      streamed shouldBe batch
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming near-dup out-of-order: is_dup set equality with batch, every rep a true earlier collider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 60)
      .as[EventStreams.StreamDoc].collect().sortBy(_.doc_id).toSeq
    val batchDups = graft.pipeline.Dedup
      .firstSeenNearDup(rows.toDF(), shingleN = 3, numHashes = 16, bands = 4)
      .as[(Long, Long, Long)].collect().filter(_._3 == 1L).map(_._1).toSet
    // band buckets per doc from the SHARED fold — ground truth for
    // "rep actually collides with doc"
    val bandsOf: Map[Long, Set[(Int, Long)]] = rows.map { d =>
      d.doc_id -> graft.pipeline.Dedup.bandHashes(
        graft.pipeline.Dedup.minhashSignature(
          EventStreams.shingleSet(d.text, 3).toSeq, 16).toSeq, 4).toSet
    }.toMap
    try {
      Seq(11L, 23L, 47L).foreach { seed =>
        val shuffled = new scala.util.Random(seed).shuffle(rows)
        val mem = MemoryStream[EventStreams.StreamDoc]
        val q = EventStreams.streamingNearDup(mem.toDS(),
            shingleN = 3, numHashes = 16, bands = 4)
          .writeStream.format("memory").queryName(s"neardup_shuf_$seed")
          .outputMode("append").start()
        try {
          shuffled.grouped(13).foreach { b =>
            mem.addData(b: _*); q.processAllAvailable()
          }
          val cands = spark.table(s"neardup_shuf_$seed")
            .as[(Long, Long)].collect().toList
          // (a) the flagged-doc set equals the batch verdict exactly,
          // under ANY arrival order
          cands.map(_._1).toSet shouldBe batchDups
          // (b) every emitted rep is a TRUE earlier collider: smaller id,
          // shares >= 1 band bucket with the flagged doc
          cands.foreach { case (doc, rep) =>
            rep should be < doc
            (bandsOf(doc) intersect bandsOf(rep)) should not be empty
          }
        } finally {
          q.stop()
        }
      }
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming curation out-of-order: verdicts are append-only (no retraction), newcomers exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // two near-dup docs long enough to pass the quality rule; the
    // LATER one arrives first
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim
    val a = EventStreams.StreamDoc(1L, base)
    val b = EventStreams.StreamDoc(2L, base)
    val docs = spark.createDataFrame(Seq((1L, base), (2L, base)))
      .toDF("doc_id", "text")
    val model = graft.pipeline.QualityClassifier.fit(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingCuration(mem.toDS(), model)
      .writeStream.format("memory").queryName("curation_ooo")
      .outputMode("append").start()
    try {
      mem.addData(b) // LATER doc arrives first
      q.processAllAvailable()
      mem.addData(a)
      q.processAllAvailable()
      val verdicts = spark.table("curation_ooo")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      verdicts.map(_._1) shouldBe List(1L, 2L)
      val byDoc = verdicts.map(v => v._1 -> v).toMap
      // the newcomer's verdict is exact: doc 1 is clean (no EARLIER
      // collider exists) and its is_dup matches batch
      byDoc(1L)._2 shouldBe 0L
      // doc 2's verdict EMITTED FIRST said clean — batch says dup
      // (is_dup=1). The documented deviation: an already-emitted keep
      // verdict is not retracted; the takeover evidence for doc 2
      // arrives after its verdict fired and is dropped
      byDoc(2L)._2 shouldBe 0L
      val batchDup = graft.pipeline.Dedup
        .firstSeenNearDup(docs, 3, 16, 4)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
      batchDup(2L) shouldBe 1L // the deviation is real, and pinned
      // pred matches the row scorer on both docs, and keep composes
      // pred with the (non-retracted) dup verdict
      val expPred = graft.pipeline.QualityClassifier.scoreRow(base, model)._5
      verdicts.foreach { v =>
        v._3 shouldBe expPred
        v._4 shouldBe (if (v._3 == 1L && v._2 == 0L) 1L else 0L)
      }
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming curation corrections: a late is_dup upgrade reconciles to the batch verdict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the exact append-only-deviation scenario: the LATER near-dup doc
    // arrives first, its clean verdict fires, then the smaller doc
    // takes the buckets over
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim
    val a = EventStreams.StreamDoc(1L, base)
    val b = EventStreams.StreamDoc(2L, base)
    val docs = spark.createDataFrame(Seq((1L, base), (2L, base)))
      .toDF("doc_id", "text")
    val model = graft.pipeline.QualityClassifier.fit(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingCurationWithCorrections(mem.toDS(), model)
      .writeStream.format("memory").queryName("curation_corr")
      .outputMode("append").start()
    try {
      mem.addData(b) // LATER doc arrives first
      q.processAllAvailable()
      mem.addData(a)
      q.processAllAvailable()
      mem.addData(b) // redelivery after the takeover: no SECOND correction
      q.processAllAvailable()
      val events = spark.table("curation_corr")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toList
      // verdicts are the append-only face unchanged: one per doc,
      // doc 2's still says clean (emitted before the takeover)
      val verdicts = events.filter(_._6 == 0L).sortBy(_._1)
      verdicts.map(_._1) shouldBe List(1L, 2L)
      verdicts.find(_._1 == 2L).get._2 shouldBe 0L
      // exactly ONE correction: doc 2 upgraded to is_dup=1, keep=0
      val corrections = events.filter(_._6 == 1L)
      corrections.map(e => (e._1, e._2, e._4)) shouldBe List((2L, 1L, 0L))
      // reconciling (correction wins over verdict) recovers the batch
      // q165 composition per doc
      val batchDup = graft.pipeline.Dedup.firstSeenNearDup(docs, 3, 16, 4)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
      val expPred = graft.pipeline.QualityClassifier.scoreRow(base, model)._5
      val reconciled = events.groupBy(_._1).map { case (id, evs) =>
        id -> evs.maxBy(_._6)
      }
      Seq(1L, 2L).foreach { id =>
        val e = reconciled(id)
        e._2 shouldBe batchDup(id)
        e._3 shouldBe expPred
        e._4 shouldBe (if (expPred == 1L && batchDup(id) == 0L) 1L else 0L)
      }
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming curation corrections under TTL: a post-expiry takeover still upgrades (sentinel pred)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim
    val model = graft.pipeline.QualityClassifier.fit(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val ttl = java.time.Duration.ofSeconds(5)
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingCurationWithCorrections(mem.toDS(), model,
        ttl = ttl)
      .writeStream.format("memory").queryName("curation_corr_ttl")
      .outputMode("append").start()
    def events() = spark.table("curation_corr_ttl")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    def awaitEvents(n: Int): Unit = {
      val dl = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (events().size < n && System.nanoTime() < dl) Thread.sleep(200)
      events().size should be >= n
    }
    try {
      mem.addData(EventStreams.StreamDoc(2L, base)) // LATER doc first
      awaitEvents(1)
      val verdict2 = events().find(_._1 == 2L).get
      verdict2._2 shouldBe 0L // clean at arrival time
      // let doc 2's guard state EXPIRE, then the smaller near-dup
      // arrives and takes the buckets over
      Thread.sleep(ttl.toMillis + 1500)
      mem.addData(EventStreams.StreamDoc(1L, base))
      awaitEvents(3)
      val evs = events()
      // both verdicts fired AND the takeover still upgraded doc 2 even
      // though its guard state had expired: the takeover evidence
      // itself triggers the correction, so TTL-bounded state and
      // batch-exact is_dup/keep reconciliation compose. The expired
      // state no longer remembers pred/n_toks, so the late correction
      // carries the -1 sentinels — consumers take is_dup/keep from it
      // and pred/n_toks from the verdict row.
      evs.count(_._6 == 0L) shouldBe 2
      val corr = evs.filter(_._6 == 1L)
      corr.map(e => (e._1, e._2, e._3, e._4, e._5)) shouldBe
        List((2L, 1L, -1L, 0L, -1L))
      // reconciled composition == the batch q165 composition
      val batchDup = graft.pipeline.Dedup.firstSeenNearDup(
          Seq((1L, base), (2L, base)).toDF("doc_id", "text"), 3, 16, 4)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
      Seq(1L, 2L).foreach { id =>
        val e = evs.filter(_._1 == id).maxBy(_._6)
        e._2 shouldBe batchDup(id)
      }
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming ANN serve over the persisted index equals the batch serve row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val emb = graft.queries.QueryDsl.t(spark, "/root/testdata/sf0.001", "embeddings")
    val centers = graft.pipeline.Similarity.ivfFitCenters(emb)
    val ixDir = java.nio.file.Files.createTempDirectory("graft_stream_ivf")
      .toString + "/index"
    graft.pipeline.Similarity.ivfEncode(emb, centers).write.parquet(ixDir)
    val index = spark.read.parquet(ixDir)
    val queries = emb.filter($"vec_id" < 12)
    val batch = graft.pipeline.Similarity.ivfServe(index, centers, queries, k = 5)
      .as[(Long, Long, Long)].collect().toList
    val qvecs = queries
      .select($"vec_id", graft.pipeline.Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (id, v) => EventStreams.QueryVec(id, v) }
    val mem = MemoryStream[EventStreams.QueryVec]
    val q = EventStreams.streamingAnnServe(mem.toDS(), index, centers, k = 5)
      .writeStream.format("memory").queryName("ann_serve")
      .outputMode("append").start()
    try {
      // queries arrive across three batches; batch 1 duplicates a
      // query WITHIN the batch (at-least-once delivery), batch 2
      // REDELIVERS one across batches
      mem.addData(qvecs.take(5) :+ qvecs(2): _*)
      q.processAllAvailable()
      mem.addData(qvecs.slice(4, 9): _*)
      q.processAllAvailable()
      mem.addData(qvecs.drop(9): _*)
      q.processAllAvailable()
      val streamed = spark.table("ann_serve")
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toList
      streamed shouldBe batch
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming ANN serve with TTL-bounded guard: equals batch, holds in-window, re-serves after expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val emb = graft.queries.QueryDsl.t(spark, "/root/testdata/sf0.001", "embeddings")
    val centers = graft.pipeline.Similarity.ivfFitCenters(emb)
    val ixDir = java.nio.file.Files.createTempDirectory("graft_stream_ivf_ttl")
      .toString + "/index"
    graft.pipeline.Similarity.ivfEncode(emb, centers).write.parquet(ixDir)
    val index = spark.read.parquet(ixDir)
    val queries = emb.filter($"vec_id" < 8)
    val batch = graft.pipeline.Similarity.ivfServe(index, centers, queries, k = 5)
      .as[(Long, Long, Long)].collect().toList
    val qvecs = queries
      .select($"vec_id", graft.pipeline.Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (id, v) => EventStreams.QueryVec(id, v) }
    val ttl = java.time.Duration.ofSeconds(15)
    // phase-2 references precomputed BEFORE the stream starts, so the
    // in-window redelivery below only pays one addData + micro-batch
    // against the 15s window (collect-heavy work inside the window
    // would make the in-window assertion flaky on a loaded machine)
    val extra = emb.filter($"vec_id" === 8)
      .select($"vec_id", graft.pipeline.Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => EventStreams.QueryVec(id, v) }
    val extraBatch = graft.pipeline.Similarity
      .ivfServe(index, centers, emb.filter($"vec_id" === 8), k = 5)
      .as[(Long, Long, Long)].collect().toList
    val mem = MemoryStream[EventStreams.QueryVec]
    // a processing-time TWS query never quiesces under
    // processAllAvailable in this build — poll the sink instead
    val q = EventStreams.streamingAnnServe(mem.toDS(), index, centers,
        k = 5, ttl = ttl)
      .writeStream.format("memory").queryName("ann_serve_ttl")
      .outputMode("append").start()
    def hits() = spark.table("ann_serve_ttl")
      .as[(Long, Long, Long)].collect().toList
    def awaitHits(n: Int): Unit = {
      val dl = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (hits().size < n && System.nanoTime() < dl) Thread.sleep(200)
      hits().size should be >= n
    }
    try {
      // phase 1: serve all 8 queries (one, redelivered IN-batch)
      mem.addData(qvecs :+ qvecs(0): _*)
      awaitHits(batch.size)
      val servedAt = System.nanoTime()
      hits().sortBy(r => (r._1, r._2)) shouldBe batch
      // phase 2: IN-WINDOW cross-batch redelivery of qid 0 rides with a
      // fresh probe vector (vec 8, unseen qid) whose hits prove the
      // batch processed — the guard must still hold for qid 0
      mem.addData((extra :+ qvecs(0)): _*)
      awaitHits(batch.size + extraBatch.size)
      // the in-window assertion is only MEANINGFUL when the redelivery
      // provably landed inside the window (1s slack covers the poll
      // granularity gap between the guard write and servedAt); on a
      // loaded box where GC/scheduling pushed the micro-batch past the
      // window, skip it instead of flaking — the expiry phase below
      // still proves the TTL is real either way
      val inWindow = (System.nanoTime() - servedAt) < (ttl.toNanos - 1000000000L)
      if (inWindow)
        hits().count(_._1 == 0L) shouldBe 5 // guard held: no re-serve
      else info("machine too loaded to prove the in-window hold; skipping")
      // phase 3: redeliver qid 0 AFTER the window — the guard expired,
      // the query re-serves it with the identical rows: the state
      // bound is real and costs only a re-emit (counts are relative to
      // whatever phase 2 left, so the loaded-box skip above can't
      // cascade a flake into this phase)
      val beforeTotal = hits().size
      val q0Before = hits().count(_._1 == 0L)
      Thread.sleep(ttl.toMillis + 1500)
      mem.addData(qvecs(0))
      awaitHits(beforeTotal + 5)
      val q0 = hits().filter(_._1 == 0L)
      q0.size shouldBe (q0Before + 5)
      // every serve of qid 0 emitted the SAME 5 rows
      q0.distinct.size shouldBe 5
      q0.distinct.sortBy(_._2) shouldBe batch.filter(_._1 == 0L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming ANN serve over a GROWING index: checkpoint restart picks up appends, guard state survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val emb = graft.queries.QueryDsl.t(spark, "/root/testdata/sf0.001", "embeddings")
    val centers = graft.pipeline.Similarity.ivfFitCenters(emb)
    val base = java.nio.file.Files.createTempDirectory("graft_stream_ivf_grow").toString
    val ixDir = base + "/index"
    val ckpt = base + "/ckpt"
    val outDir = base + "/out"
    val inc1 = emb.filter($"vec_id" % 2 === 0)
    val inc2 = emb.filter($"vec_id" % 2 =!= 0)
    graft.pipeline.Similarity.ivfEncode(inc1, centers)
      .write.mode("overwrite").parquet(ixDir)
    // batch references, for ODD query ids (odd qids are never in inc1,
    // so self-exclusion can't mask growth)
    def batchServe(ix: org.apache.spark.sql.DataFrame, qid: Long) =
      graft.pipeline.Similarity.ivfServe(ix, centers,
        emb.filter($"vec_id" === qid), k = 5)
        .as[(Long, Long, Long)].collect().sortBy(_._2).toList
    val inc1Index = spark.read.parquet(ixDir)
    val beforeA = batchServe(inc1Index, 1L)
    val qv = emb
      .select($"vec_id", graft.pipeline.Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().map(r => r._1 -> r._2).toMap
    val mem = MemoryStream[EventStreams.QueryVec]
    // a running query SNAPSHOTS the static side's file listing at
    // start (measured: appends + refreshByPath are invisible to it) —
    // growing the index is a checkpoint-RESTART, which is also the
    // state-bounding restart cadence: the fault-tolerant file sink +
    // RocksDB state carry the exactly-once guards across
    def start() = EventStreams.streamingAnnServe(mem.toDS(),
        spark.read.parquet(ixDir), centers, k = 5)
      .toDF().writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    def emitted() = spark.read
      .schema("qid LONG, rank LONG, nid LONG").parquet(outDir)
    def awaitRows(cond: => Boolean): Unit = {
      val dl = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < dl) Thread.sleep(200)
      cond shouldBe true
    }
    // phase 1: serve qid 1 against the inc1-only index, then stop
    val q1 = start()
    try {
      mem.addData(EventStreams.QueryVec(1L, qv(1L)))
      awaitRows(emitted().count() == 5)
      emitted().as[(Long, Long, Long)].collect()
        .sortBy(_._2).toList shouldBe beforeA
    } finally q1.stop()
    // phase 2: GROW the index — append increment 2 (frozen centers,
    // disjoint files), exactly the q170/q172 maintenance path
    graft.pipeline.Similarity.ivfEncode(inc2, centers)
      .write.mode("append").parquet(ixDir)
    // an odd qid whose combined top-5 provably differs from inc1-only
    val combined = spark.read.parquet(ixDir)
    val qidB = (3L to 99L by 2).find { id =>
      batchServe(combined, id) != batchServe(inc1Index, id)
    }.get
    val afterB = batchServe(combined, qidB)
    afterB.exists(_._3 % 2 == 1) shouldBe true // an appended (odd) nid ranks
    // phase 3: restart from the checkpoint — the re-read static side
    // lists the grown index; a query arriving now sees appended
    // neighbors, and qid 1's redelivery still hits the surviving guard
    val q2 = start()
    try {
      mem.addData(EventStreams.QueryVec(qidB, qv(qidB)),
        EventStreams.QueryVec(1L, qv(1L))) // redelivery across restart
      awaitRows(emitted().filter($"qid" === qidB).count() == 5)
      emitted().filter($"qid" === qidB)
        .as[(Long, Long, Long)].collect().sortBy(_._2).toList shouldBe afterB
      // guard state survived the restart: qid 1 was NOT re-served, and
      // its pre-restart verdict is untouched by the growth
      emitted().filter($"qid" === 1L)
        .as[(Long, Long, Long)].collect().sortBy(_._2).toList shouldBe beforeA
    } finally {
      q2.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming ANN serve fails loudly when one qid carries two different vectors in a batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val emb = graft.queries.QueryDsl.t(spark, "/root/testdata/sf0.001", "embeddings")
    val centers = graft.pipeline.Similarity.ivfFitCenters(emb)
    val ixDir = java.nio.file.Files.createTempDirectory("graft_stream_ivf_dup")
      .toString + "/index"
    graft.pipeline.Similarity.ivfEncode(emb, centers).write.parquet(ixDir)
    val index = spark.read.parquet(ixDir)
    val v = emb.filter($"vec_id" === 0)
      .select(graft.pipeline.Similarity.asDouble($"embedding"))
      .as[Seq[Double]].head()
    // same qid, nearly identical vector: probes the same clusters, so
    // the candidate sets overlap, and every shared nid scores two
    // different sims — the contract-violation detector must fire
    val v2 = v.updated(0, v.head + 0.001)
    val mem = MemoryStream[EventStreams.QueryVec]
    val q = EventStreams.streamingAnnServe(mem.toDS(), index, centers, k = 5)
      .writeStream.format("memory").queryName("ann_serve_conflict")
      .outputMode("append").start()
    try {
      mem.addData(EventStreams.QueryVec(0L, v), EventStreams.QueryVec(0L, v2))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      chain(e).exists(c => String.valueOf(c.getMessage)
        .contains("two different vectors")) shouldBe true
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming ANN serve fails loudly on qid reuse even when the candidate sets are DISJOINT") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val emb = graft.queries.QueryDsl.t(spark, "/root/testdata/sf0.001", "embeddings")
    val centers = graft.pipeline.Similarity.ivfFitCenters(emb)
    val ixDir = java.nio.file.Files.createTempDirectory("graft_stream_ivf_disj")
      .toString + "/index"
    graft.pipeline.Similarity.ivfEncode(emb, centers).write.parquet(ixDir)
    val index = spark.read.parquet(ixDir)
    val vecs = emb.select($"vec_id",
        graft.pipeline.Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect()
    def probed(v: Seq[Double]) = graft.pipeline.Similarity
      .nearestClusters(centers, v.toArray, 4).toSet
    // find a pair whose nProbe=4 cluster sets are DISJOINT — the case
    // the old sim-mismatch detector was blind to (no shared nid can
    // score twice when no cluster is shared); the carried query
    // fingerprint must fire anyway
    val v1 = vecs.head._2
    val p1 = probed(v1)
    val v2 = vecs.find(v => (probed(v._2) & p1).isEmpty)
      .getOrElse(fail("no disjoint-probe pair in the corpus"))._2
    val mem = MemoryStream[EventStreams.QueryVec]
    val q = EventStreams.streamingAnnServe(mem.toDS(), index, centers, k = 5)
      .writeStream.format("memory").queryName("ann_serve_disjoint")
      .outputMode("append").start()
    try {
      mem.addData(EventStreams.QueryVec(0L, v1), EventStreams.QueryVec(0L, v2))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      chain(e).exists(c => String.valueOf(c.getMessage)
        .contains("two different vectors")) shouldBe true
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("curation occupancy compaction: snapshot the band index, restart a FRESH lineage from it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val model = graft.pipeline.QualityClassifier.fit(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim
    val other = "totally different words here " * 8
    val tmp = java.nio.file.Files.createTempDirectory("graft_occ_compact").toString
    val docsA = Seq(EventStreams.StreamDoc(1L, base),
      EventStreams.StreamDoc(5L, other))
    val docsB = Seq(EventStreams.StreamDoc(2L, base), // near-dup of OLD-lineage 1
      EventStreams.StreamDoc(7L, other)) // near-dup of OLD-lineage 5
    try {
      // lineage 1: process docsA, stop — its checkpoint holds the
      // (by-design-unbounded) occupancy index
      val mem1 = MemoryStream[EventStreams.StreamDoc]
      val q1 = EventStreams.streamingCuration(mem1.toDS(), model)
        .writeStream.format("memory").queryName("occ_l1")
        .option("checkpointLocation", s"$tmp/ckpt1").outputMode("append").start()
      mem1.addData(docsA: _*)
      q1.processAllAvailable(); q1.stop()
      // compact: O(|state|) read of the state store, no corpus replay
      EventStreams.occupancySnapshot(spark, s"$tmp/ckpt1")
        .write.parquet(s"$tmp/occ.parquet")
      val snap = spark.read.parquet(s"$tmp/occ.parquet")
      // one long per touched bucket: 2 unrelated docs x 4 bands
      snap.count() shouldBe 8
      snap.select($"first_doc").as[Long].collect().toSet shouldBe Set(1L, 5L)
      // lineage 2: FRESH checkpoint seeded from the snapshot — new
      // docs dedup against everything the old lineage saw
      val mem2 = MemoryStream[EventStreams.StreamDoc]
      val q2 = EventStreams.streamingCuration(mem2.toDS(), model,
          initialOccupancy = snap)
        .writeStream.format("memory").queryName("occ_l2")
        .option("checkpointLocation", s"$tmp/ckpt2").outputMode("append").start()
      mem2.addData(docsB: _*)
      q2.processAllAvailable(); q2.stop()
      val restarted = spark.table("occ_l2")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      // reference: ONE never-stopped lineage over docsA ++ docsB —
      // the restarted lineage's verdicts for the new docs must match
      val mem3 = MemoryStream[EventStreams.StreamDoc]
      val q3 = EventStreams.streamingCuration(mem3.toDS(), model)
        .writeStream.format("memory").queryName("occ_l3")
        .option("checkpointLocation", s"$tmp/ckpt3").outputMode("append").start()
      mem3.addData(docsA: _*); q3.processAllAvailable()
      mem3.addData(docsB: _*); q3.processAllAvailable(); q3.stop()
      val bIds = docsB.map(_.doc_id).toSet
      val together = spark.table("occ_l3")
        .as[(Long, Long, Long, Long, Long)].collect()
        .filter(r => bIds(r._1)).sortBy(_._1).toList
      restarted shouldBe together
      restarted.map(_._2) shouldBe List(1L, 1L) // both flagged dup
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming curation with TTL-bounded verdict guard equals the batch composition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = graft.pipeline.QualityClassifier.fit(docs)
    val rows = docs.select($"doc_id", $"text").filter($"doc_id" < 40)
      .as[EventStreams.StreamDoc].collect().sortBy(_.doc_id).toSeq
    val colScores = graft.pipeline.QualityClassifier.score(rows.toDF(), model)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    val preds = colScores.map(r => r._1 -> r._6).toMap
    val nToks = colScores.map(r => r._1 -> r._2).toMap
    val dupOf = graft.pipeline.Dedup
      .firstSeenNearDup(rows.toDF(), shingleN = 3, numHashes = 16, bands = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val batch = rows.map { d =>
      val isDup = dupOf(d.doc_id)
      val p = preds(d.doc_id)
      (d.doc_id, isDup, p, if (p == 1L && isDup == 0L) 1L else 0L, nToks(d.doc_id))
    }.toList
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingCuration(mem.toDS(), model,
        ttl = java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("curation_ttl")
      .outputMode("append").start()
    def awaitVerdicts(n: Int): Unit = {
      val dl = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("curation_ttl").count() < n && System.nanoTime() < dl)
        Thread.sleep(200)
      spark.table("curation_ttl").count() shouldBe n
    }
    try {
      // in-order arrival, batch 2 redelivers part of batch 1 inside
      // the TTL window — still exactly-once per doc
      mem.addData(rows.take(20): _*)
      awaitVerdicts(20)
      mem.addData(rows.slice(10, 40): _*)
      awaitVerdicts(40)
      val streamed = spark.table("curation_ttl")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      streamed shouldBe batch
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming near-dup: a late-arriving smaller id takes over the bucket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val a = EventStreams.StreamDoc(1L, "the quick brown fox jumps over the lazy dog tonight")
    val b = EventStreams.StreamDoc(2L, "the quick brown fox jumps over the lazy dog tonight")
    val mem = MemoryStream[EventStreams.StreamDoc]
    val q = EventStreams.streamingNearDup(mem.toDS())
      .writeStream.format("memory").queryName("neardup_ooo")
      .outputMode("append").start()
    try {
      mem.addData(b) // LATER doc arrives first
      q.processAllAvailable()
      mem.addData(a)
      q.processAllAvailable()
      val verdicts = spark.table("neardup_ooo")
        .groupBy($"doc_id").agg(min($"rep").as("rep"))
        .as[(Long, Long)].collect().toMap
      // the takeover retro-flags doc 2 against the smaller newcomer —
      // is_dup matches the batch verdict under any arrival order
      // (dup_of is only guaranteed MINIMAL for in-order arrival; see
      // the streamingNearDup contract)
      verdicts shouldBe Map(2L -> 1L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
