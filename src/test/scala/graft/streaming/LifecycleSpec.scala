package graft.streaming

import graft.SparkSpec
import graft.streaming.Lifecycle._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** W4/W5 state machine: deterministic pure-core tests for every
  * transition (including timer paths a wall clock can't drive reliably),
  * plus a MemoryStream run of the flatMapGroupsWithState wrapper for the
  * message-driven paths. */
class LifecycleSpec extends SparkSpec {

  private def discovered(ts: Long, toks: Seq[String], end: Long) =
    MarketMsg("m1", "discovered", ts, toks, end, closed = false, "", 0.0, 0.0)
  private def poll(ts: Long, closed: Boolean, status: String, no: Double, yes: Double) =
    MarketMsg("m1", "poll_result", ts, Nil, 0L, closed, status, no, yes)

  test("discover → subscribe; re-discovery with same tokens is deduped (ws_manager.py:271)") {
    val (s1, out1) = onMessages("m1", Seq(discovered(1000L, Seq("a", "b"), 900000L)), None)
    assert(out1.map(_.transition) === Seq("subscribe"))
    assert(s1.get.phase === "subscribed")
    val (s2, out2) = onMessages("m1", Seq(discovered(2000L, Seq("a", "b"), 900000L)), s1)
    assert(out2.isEmpty && s2 === s1)
  }

  test("token change unsubscribes the old market before subscribing the new") {
    val (s1, _) = onMessages("m1", Seq(discovered(1000L, Seq("a", "b"), 900000L)), None)
    val (s2, out) = onMessages("m1", Seq(discovered(2000L, Seq("c", "d"), 1800000L)), s1)
    assert(out.map(_.transition) === Seq("unsubscribe", "subscribe"))
    assert(s2.get.tokenIds === Seq("c", "d"))
  }

  test("close timer fires at end_time → awaiting_resolution with first poll at end+60s") {
    val (s1, _) = onMessages("m1", Seq(discovered(0L, Seq("a"), 900000L)), None)
    val (s2, out) = onTimeout("m1", s1.get, 900000L)
    assert(out.map(_.transition) === Seq("close"))
    assert(s2.get.phase === "awaiting_resolution")
    // DefaultTiming shards deadlines inside the reference's 10 s
    // post-boundary buffer — the first poll keeps the key's stagger
    assert(s2.get.nextActionMs ===
      900000L + FirstPollDelayMs + closeStaggerMs("m1"))
  }

  test("close deadlines shard deterministically inside the jitter buffer") {
    val t = DefaultTiming
    assert(t.closeJitterMs === 10000L) // the reference's buffer_seconds=10
    val offs = (0 until 2000).map(i => closeStaggerMs(s"m$i", t))
    assert(offs.forall(o => o >= 0L && o < t.closeJitterMs))
    // deterministic: same key → same offset, every time
    assert(offs === (0 until 2000).map(i => closeStaggerMs(s"m$i", t)))
    // sharded: the herd spreads — no 100 ms slot holds more than a few
    // percent of 2000 keys (uniform expectation: 20/slot over 100 slots)
    val worstSlot = offs.groupBy(_ / 100L).values.map(_.size).max
    assert(worstSlot <= 60, s"worst 100ms slot holds $worstSlot of 2000 keys")
    // the armed deadline and the post-close poll both carry the stagger
    val (s1, _) = onMessages("mJ", Seq(discovered(0L, Seq("a"), 900000L)), None)
    assert(s1.get.nextActionMs === 900000L + closeStaggerMs("mJ"))
    // jitter 0 (the compressed-clock test preset) disables sharding
    assert(closeStaggerMs("mJ", Timing()) === 0L)
  }

  test("poll backoff doubles 30s→300s cap and fails after 20 attempts (market_resolution.py:29-38)") {
    var st = MarketState("awaiting_resolution", Seq("a"), 900000L, 0, 960000L)
    var now = 960000L
    val delays = (0 until 6).map { _ =>
      val (ns, out) = onTimeout("m1", st, now)
      assert(out.map(_.transition) === Seq("poll_due"))
      val d = ns.get.nextActionMs - now
      st = ns.get; now = ns.get.nextActionMs
      d
    }
    assert(delays === Seq(30000L, 60000L, 120000L, 240000L, 300000L, 300000L))
    // exhaust the attempt budget
    st = st.copy(attempt = MaxAttempts)
    val (fin, out) = onTimeout("m1", st, now)
    assert(fin.isEmpty)
    assert(out.map(_.transition) === Seq("resolution_failed"))
  }

  test("resolved poll emits the winner and clears state; winner matches P7 semantics") {
    val st = Some(MarketState("awaiting_resolution", Seq("a"), 900000L, 3, 0L))
    val (fin, out) = onMessages("m1", Seq(poll(1000000L, closed = true, "resolved", 1.0, 0.0)), st)
    assert(fin.isEmpty)
    assert(out.map(t => (t.transition, t.detail)) === Seq(("resolved", "Down")))
    // unresolved poll keeps waiting
    val (still, none) = onMessages("m1", Seq(poll(1000000L, closed = true, "pending", 0.6, 0.4)), st)
    assert(still === st && none.isEmpty)
    assert(winner(0.0, 1.0) === "Up")
    assert(winner(0.4, 0.6) === "Unknown")
  }

  /** Poll the named memory sink until `pred` holds or the deadline
    * passes (queries with registered processing-time timeouts never go
    * idle, so processAllAvailable can't be used as a barrier). */
  private def awaitSink(name: String, timeoutMs: Long = 90000)(
      pred: org.apache.spark.sql.DataFrame => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!pred(spark.table(name)) && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    pred(spark.table(name))
  }

  test("end-to-end: close timer → poll_due → resolved poll result clears the market (W4/W5)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // compressed timing: close ~1 s after subscribe, first poll 300 ms
    // after close, 200 ms backoff — the full reference cycle in seconds
    val timing = Timing(firstPollDelayMs = 300L, baseBackoffMs = 200L,
      maxBackoffMs = 400L, maxAttempts = 20)
    val in = MemoryStream[MarketMsg]
    val q = Lifecycle.run(in.toDS(), timing)
      .writeStream.format("memory").queryName("lc_e2e")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      val end = System.currentTimeMillis() + 1000L
      in.addData(MarketMsg("mX", "discovered", 1L, Seq("t1"), end,
        closed = false, "", 0, 0))
      // timer path: close fires at end_time, then a poll_due at +300 ms
      assert(awaitSink("lc_e2e") { df =>
        val ts = df.as[Transition].collect().map(_.transition)
        ts.contains("close") && ts.contains("poll_due")
      }, "expected close + poll_due transitions")
      // answer the poll: resolved, No side at 1.0 → winner Down, state cleared
      in.addData(MarketMsg("mX", "poll_result", 2L, Nil, 0L,
        closed = true, "resolved", 1.0, 0.0))
      assert(awaitSink("lc_e2e") { df =>
        df.as[Transition].collect()
          .exists(t => t.transition == "resolved" && t.detail == "Down")
      }, "expected resolved transition with winner Down")
    } finally q.stop()
  }

  test("end-to-end: unanswered polls exhaust the attempt budget → resolution_failed (W5)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val timing = Timing(firstPollDelayMs = 200L, baseBackoffMs = 100L,
      maxBackoffMs = 200L, maxAttempts = 3)
    val in = MemoryStream[MarketMsg]
    val q = Lifecycle.run(in.toDS(), timing)
      .writeStream.format("memory").queryName("lc_fail")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      val end = System.currentTimeMillis() + 500L
      in.addData(MarketMsg("mY", "discovered", 1L, Seq("t1"), end,
        closed = false, "", 0, 0))
      assert(awaitSink("lc_fail") { df =>
        df.as[Transition].collect().map(_.transition).contains("resolution_failed")
      }, "expected resolution_failed after exhausted attempts")
      val ts = spark.table("lc_fail").as[Transition].collect()
      assert(ts.count(_.transition == "poll_due") === timing.maxAttempts)
      assert(ts.map(_.transition).count(_ == "close") === 1)
    } finally q.stop()
  }

  test("transformWithState form: absolute timers drive close → poll_due → resolved (RocksDB)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val timing = Timing(firstPollDelayMs = 300L, baseBackoffMs = 200L,
      maxBackoffMs = 400L, maxAttempts = 20)
    val in = MemoryStream[MarketMsg]
    val q = Lifecycle.runTws(in.toDS(), timing)
      .writeStream.format("memory").queryName("lc_tws")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      val end = System.currentTimeMillis() + 1000L
      in.addData(MarketMsg("mT", "discovered", 1L, Seq("t1"), end,
        closed = false, "", 0, 0))
      assert(awaitSink("lc_tws") { df =>
        val ts = df.as[Transition].collect().map(_.transition)
        ts.contains("close") && ts.contains("poll_due")
      }, "expected close + poll_due via registered timers")
      in.addData(MarketMsg("mT", "poll_result", 2L, Nil, 0L,
        closed = true, "resolved", 0.0, 1.0))
      assert(awaitSink("lc_tws") { df =>
        df.as[Transition].collect()
          .exists(t => t.transition == "resolved" && t.detail == "Up")
      }, "expected resolved transition with winner Up")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState: state and pending timers survive kill → restart from checkpoint (RocksDB)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the crash happens BEFORE the close timer (due at end = now + 20 s)
    // can fire: subscribe is emitted by the very first batch, so the
    // pre-crash phase needs only startup latency, leaving ~15 s of
    // margin before the timer becomes due. Post-restart the recovered
    // store must fire that timer, then the short 300 ms poll delay
    // drives the rest of the machine.
    val timing = Timing(firstPollDelayMs = 300L, baseBackoffMs = 60000L,
      maxBackoffMs = 60000L, maxAttempts = 20)
    val in = MemoryStream[MarketMsg]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lc_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_lc_out").toString + "/t"
    // the memory sink refuses checkpoint recovery — land transitions in
    // parquet via foreachBatch (recoverable) and poll the files instead
    def transitions(): Seq[Transition] =
      try spark.read.parquet(out).as[Transition].collect().toSeq
      catch { case _: org.apache.spark.sql.AnalysisException => Nil }
    def awaitFiles(timeoutMs: Long = 90000)(pred: Seq[Transition] => Boolean): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!pred(transitions()) && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      pred(transitions())
    }
    def startQ(name: String) = Lifecycle.runTws(in.toDS(), timing)
      .writeStream.queryName(name)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Transition], _: Long) =>
        b.write.mode("append").parquet(out)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    val q1 = startQ("lc_crash_a")
    try {
      val end = System.currentTimeMillis() + 20000L
      in.addData(MarketMsg("mR", "discovered", 1L, Seq("t1"), end,
        closed = false, "", 0, 0))
      // the subscription is live and its close timer (due at `end`) is
      // registered in the RocksDB store
      assert(awaitFiles()(_.map(_.transition).contains("subscribe")),
        "expected subscribe before the crash")
      // let the batch's offsets commit so the restart genuinely resumes
      // (an uncommitted batch would merely replay — the assertions below
      // hold either way, but resume is the point)
      Thread.sleep(600)
    } finally q1.stop() // crash: the close timer is still pending
    val crashWallMs = System.currentTimeMillis()
    assert(!transitions().map(_.transition).contains("close"),
      "test precondition: the close timer must not have fired pre-crash")
    val q2 = startQ("lc_crash_b")
    try {
      // engine quirk (observed flake): when every checkpointed batch was
      // COMMITTED, the restarted query resumes with committed ==
      // available and constructs no batch at all — lastExecution stays
      // null, so the stateful operator is never asked whether pending
      // processing-time timers need a batch, and the query idles until
      // NEW data arrives. Nudge it with a benign message for an
      // unrelated key: timer sweeps are per-batch and global across
      // keys, so the recovered mR timer fires in the nudged batch.
      in.addData(MarketMsg("mNudge", "discovered", 3L, Seq("tn"),
        System.currentTimeMillis() + 3600000L, closed = false, "", 0, 0))
      // the recovered incarnation must fire the pre-crash timer: state
      // (subscribed, with its close timer) survived RocksDB checkpoint
      // restore. A lost store would leave this key silent forever.
      // atMs ≥ crash time pins the emission to the restarted process;
      // the 300 ms poll delay then yields poll_due from recovered state.
      assert(awaitFiles()(_.exists(t =>
        t.transition == "close" && t.atMs >= crashWallMs)),
        "expected the pre-crash close timer to fire after restart")
      assert(awaitFiles()(_.map(_.transition).contains("poll_due")),
        "expected the first resolution poll after the recovered close")
      // and the state machine continues: a resolved poll result against
      // the RECOVERED state emits the winner and clears the market —
      // impossible if the restart had dropped state (stale polls are
      // ignored by onMessages)
      in.addData(MarketMsg("mR", "poll_result", 2L, Nil, 0L,
        closed = true, "resolved", 1.0, 0.0))
      assert(awaitFiles()(_.exists(t =>
        t.transition == "resolved" && t.detail == "Down")),
        "expected resolution against the recovered state")
    } finally {
      q2.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("flatMapGroupsWithState wrapper: subscribe transitions flow through a MemoryStream") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[MarketMsg]
    // One-shot Trigger.AvailableNow: a query with registered processing-
    // time timeouts never goes idle (it keeps running empty batches to
    // evaluate timers), so processAllAvailable would block forever.
    // Timer paths are covered by the pure onTimeout tests above.
    val end = System.currentTimeMillis() + 3600000L
    in.addData(
      MarketMsg("mA", "discovered", 1000L, Seq("t1", "t2"), end, closed = false, "", 0, 0),
      MarketMsg("mB", "discovered", 1000L, Seq("t3"), end, closed = false, "", 0, 0),
      // changed tokens for mA → unsubscribe + subscribe (folded in ts order)
      MarketMsg("mA", "discovered", 2000L, Seq("t9"), end + 900000L, closed = false, "", 0, 0))
    val q = Lifecycle.run(in.toDS())
      .writeStream.format("memory").queryName("lifecycle_out")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      // the engine keeps evaluating (far-future) timers, so don't wait for
      // termination — poll the sink until the data batch has landed
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("lifecycle_out").count() < 4 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val out = spark.table("lifecycle_out").as[Transition].collect()
      assert(out.count(t => t.marketId == "mA" && t.transition == "subscribe") === 2)
      assert(out.count(t => t.marketId == "mA" && t.transition == "unsubscribe") === 1)
      assert(out.count(t => t.marketId == "mB" && t.transition == "subscribe") === 1)
    } finally q.stop()
  }
}
