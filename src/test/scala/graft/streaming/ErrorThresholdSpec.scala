package graft.streaming

import graft.SparkSpec
import graft.streaming.ErrorThreshold._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** K4 threshold semantics (user_positions_tracker.py:134-151): an error
  * event fires only on the 5th CONSECUTIVE failure; success resets. */
class ErrorThresholdSpec extends SparkSpec {

  private def fails(k: String, from: Long, n: Int) =
    (0 until n).map(i => Probe(k, from + i, failed = true))

  test("4 consecutive failures emit nothing; the 5th emits exactly one event") {
    val (st4, out4) = step(RunState(0), fails("u1", 0L, 4), DefaultThreshold)
    assert(out4.isEmpty && st4.consecutive === 4)
    val (st5, out5) = step(RunState(0), fails("u1", 0L, 5), DefaultThreshold)
    assert(out5.map(e => (e.key, e.consecutive)) === Seq(("u1", 5)))
    assert(st5.consecutive === 0) // notify-then-reset
  }

  test("a success resets the run: 4 fails, success, 4 fails emits nothing") {
    val probes = fails("u1", 0L, 4) ++ Seq(Probe("u1", 4L, failed = false)) ++
      fails("u1", 5L, 4)
    val (st, out) = step(RunState(0), probes, DefaultThreshold)
    assert(out.isEmpty && st.consecutive === 4)
  }

  test("runs continue across micro-batches and emit once per completed run") {
    val (st1, out1) = step(RunState(0), fails("u1", 0L, 3), DefaultThreshold)
    assert(out1.isEmpty)
    val (st2, out2) = step(st1, fails("u1", 3L, 7), DefaultThreshold)
    // 3 carried + 7 new = one event at the 5th, run restarts, 5 left → second event
    assert(out2.size === 2)
    assert(st2.consecutive === 0)
  }

  test("property: event count = completed failure runs of a naive scan, any batch split") {
    val probeGen = org.scalacheck.Gen.listOfN(60,
      org.scalacheck.Gen.frequency(3 -> true, 1 -> false))
    (1 to 25).foreach { _ =>
      val flags = probeGen.sample.get
      val probes = flags.zipWithIndex.map { case (f, i) => Probe("k", i.toLong, f) }
      // model: scan with a counter that resets at threshold (notify) or success
      var run = 0; var want = 0
      flags.foreach { f =>
        if (f) { run += 1; if (run >= 3) { want += 1; run = 0 } } else run = 0
      }
      // one-shot step
      val (_, all) = step(RunState(0), probes, 3)
      assert(all.size === want)
      // split into arbitrary micro-batches: state carries, total is identical
      val cut = scala.util.Random.nextInt(probes.size + 1)
      val (s1, o1) = step(RunState(0), probes.take(cut), 3)
      val (_, o2) = step(s1, probes.drop(cut), 3)
      assert(o1.size + o2.size === want)
    }
  }

  test("transformWithState form matches: threshold fires once per run (RocksDB store)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Probe]
    val q = ErrorThreshold.runTws(in.toDS(), threshold = 3)
      .writeStream.format("memory").queryName("errtws_out")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    // a TimeMode.ProcessingTime query keeps running TTL-evaluation
    // batches, so processAllAvailable can't be used as a barrier — poll
    // the sink with a deadline instead (same pattern as LifecycleSpec)
    def awaitCount(n: Long): Boolean = {
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("errtws_out").count() < n &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      spark.table("errtws_out").count() === n
    }
    try {
      in.addData(fails("u1", 0L, 2): _*)
      in.addData(fails("u1", 2L, 1): _*) // run carried across batches → 3rd fires
      assert(awaitCount(1L), "expected exactly one threshold event")
      val out = spark.table("errtws_out").as[ErrorEvent].collect()
      assert(out.map(e => (e.key, e.consecutive)).toSeq === Seq(("u1", 3)))
      in.addData(fails("u1", 10L, 2): _*) // reset after emit: 2 more stay silent
      in.addData(fails("u2", 0L, 3): _*)  // independent key fires
      assert(awaitCount(2L), "expected u2's event and nothing more from u1")
      val all = spark.table("errtws_out").as[ErrorEvent].collect()
      assert(all.count(_.key == "u1") === 1)
      assert(all.count(_.key == "u2") === 1)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState: a mid-run counter survives kill → restart from checkpoint (RocksDB)") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Probe]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_errtws_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_errtws_out").toString + "/e"
    def events(): Seq[ErrorEvent] =
      try spark.read.parquet(out).as[ErrorEvent].collect().toSeq
      catch { case _: org.apache.spark.sql.AnalysisException => Nil }
    def awaitEvents(pred: Seq[ErrorEvent] => Boolean): Boolean = {
      val deadline = System.currentTimeMillis() + 90000
      while (!pred(events()) && System.currentTimeMillis() < deadline) Thread.sleep(100)
      pred(events())
    }
    def startQ(name: String) = ErrorThreshold.runTws(in.toDS(), threshold = 5)
      .writeStream.queryName(name).outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[ErrorEvent], _: Long) =>
        b.write.mode("append").parquet(out)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    val q1 = startQ("errtws_crash_a")
    try {
      in.addData(fails("u1", 0L, 3): _*) // run at 3 of 5 — no event yet
      // wait for the batch to process + commit (value state, no output
      // to await; the run counter is only observable via the recovery
      // assertion below)
      Thread.sleep(1500)
      assert(events().isEmpty, "no event may fire below the threshold")
    } finally q1.stop() // crash with consecutive = 3 in the store
    val q2 = startQ("errtws_crash_b")
    try {
      // 2 more failures reach 5 ONLY if the recovered store still holds
      // the pre-crash run of 3; lost state would leave the run at 2
      in.addData(fails("u1", 10L, 2): _*)
      assert(awaitEvents(_.map(e => (e.key, e.consecutive)) == Seq(("u1", 5))),
        s"expected the carried run to complete post-restart, got ${events()}")
    } finally {
      q2.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming wrapper: per-key isolation through a MemoryStream") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val in = MemoryStream[Probe]
    val q = ErrorThreshold.run(in.toDS(), threshold = 3)
      .writeStream.format("memory").queryName("errth_out")
      .outputMode(OutputMode.Append).start()
    try {
      // u1 fails 2× then succeeds; u2 fails 3× → only u2 fires
      in.addData(fails("u1", 0L, 2) ++ Seq(Probe("u1", 2L, failed = false)) ++
        fails("u2", 0L, 3): _*)
      q.processAllAvailable()
      val out = spark.table("errth_out").as[ErrorEvent].collect()
      assert(out.map(e => (e.key, e.consecutive)).toSeq === Seq(("u2", 3)))
      // u1's remaining run: 2 more fails reach 3 only if state carried — it
      // was reset by the success, so 2 fails stay silent; a 3rd fires
      in.addData(fails("u1", 10L, 2): _*)
      q.processAllAvailable()
      assert(spark.table("errth_out").count() === 1)
      in.addData(Probe("u1", 20L, failed = true))
      q.processAllAvailable()
      val all = spark.table("errth_out").as[ErrorEvent].collect()
      assert(all.count(_.key == "u1") === 1)
    } finally q.stop()
  }
}
