package graft

import graft.similarity.Similarity
import graft.streaming._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-state widening probe (r14 verdict task 5): the batch tier
  * has 1×→128× ScaleProbe evidence; this is the streaming counterpart.
  * Each monitor / streaming component is driven through its foreachBatch
  * hook with 1×, 8×, and 32× micro-batch volumes, and the probe records
  *  - per-batch wall clock (must scale ~linearly with batch volume —
  *    the monitors hold no cross-batch state on the hot path), and
  *  - the state-store footprint AFTER the run (rows + bytes), which must
  *    be bounded by batches × summary-size, NOT by stream volume: the
  *    whole store discipline is that per-batch summaries are
  *    constant-sized (MG k-entries, 1 drift row, P+1 blocklist rows,
  *    4 schema-test rows) regardless of how many rows flowed through.
  * The bounds are `require`d, not just printed — a probe run IS the
  * assertion. StreamingIvf's data store legitimately grows with the
  * corpus (it IS the index); its bounded claim is the driver state
  * (nCells centroid rows) and per-batch ingest wall, both recorded.
  * Results land in PLANS.md per round (the ScaleProbe convention). */
object StreamingScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tiers = sys.env.getOrElse("SPARK_GRAFT_PROBE_TIERS", "1,8,32")
      .split(',').map(_.trim.toInt).toSeq
    val nBatches = 4
    // optional arg: component-name substrings to probe a subset
    val only = args.headOption.map(_.split(',').toSeq)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.contains))
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString

    def storeFootprint(dir: String): (Long, Long) = {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) return (0L, 0L)
      val it = fs.listFiles(p, true)
      var bytes = 0L
      while (it.hasNext) bytes += it.next().getLen
      val rows = try spark.read.parquet(s"$dir/batches").count()
        catch { case _: Throwable => -1L }
      (rows, bytes)
    }

    // ---- per-batch inputs, scaled k×. Each batch gets fresh content
    // (batch-salted ids/rotations) so cross-batch work can't dedupe away.
    val docsBase = Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(1000).persist()
    val embBase = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").limit(2000).persist()
    val nDocs = docsBase.count(); val nEmb = embBase.count()
    val az = "abcdefghijklmnopqrstuvwxyz"
    def docBatch(k: Int, b: Int): DataFrame =
      (0 until k).map { i =>
        val r = (b * 7 + i) % 25 + 1
        docsBase.select(
          (col("doc_id") + (b * 100 + i) * 1000000L).as("doc_id"),
          translate(col("text"), az, az.drop(r) + az.take(r)).as("text"))
      }.reduce(_ unionAll _)
    def embBatch(k: Int, b: Int): DataFrame =
      (0 until k).map { i =>
        val r = (b * 5 + i) % 32 + 1
        embBase.select(
          (col("vec_id") + (b * 100 + i) * 1000000L).as("vec_id"),
          concat(slice(col("embedding"), r + 1, 100000),
            slice(col("embedding"), 1, r)).as("embedding"))
      }.reduce(_ unionAll _)
    def tokenBatch(k: Int, b: Int): DataFrame =
      spark.range(20000L * k).select(
        when(pmod(col("id"), lit(4L)) === 0,
          concat(lit("hot"), pmod(col("id"), lit(8L))))
          .otherwise(concat(lit("cold"), lit(b * 1000000L) + col("id")))
          .as("item"))

    println(f"${"component"}%-22s ${"tier"}%5s ${"batch_sec"}%10s " +
      f"${"store_rows"}%11s ${"store_KB"}%9s")
    def report(name: String, k: Int, sec: Double, rows: Long, bytes: Long): Unit =
      println(f"$name%-22s ${k + "x"}%5s $sec%10.2f $rows%11d ${bytes / 1024}%9d")

    def timeBatches(f: Int => Unit): Double = {
      val t0 = System.nanoTime()
      (0 until nBatches).foreach(f)
      (System.nanoTime() - t0) / 1e9 / nBatches
    }

    // ---- StreamingHeavyHitters: MG summaries, k-entry bound
    if (selected("heavy_hitters")) for (k <- tiers) {
      val dir = tmp("ssp_hh")
      val hh = StreamingHeavyHitters.create(dir, k = 16)
      val sec = timeBatches(b => hh.ingest(tokenBatch(k, b), b, col("item")))
      val (rows, bytes) = storeFootprint(dir)
      require(rows <= nBatches * 17L,
        s"heavy-hitters store grew past batches×(k+1): $rows rows")
      require(hh.summary(spark).size <= 16, "merged summary exceeded k")
      report("heavy_hitters", k, sec, rows, bytes)
      // retention at volume: compacting the first 3 batches must keep
      // totals exact while shrinking the store to prefix + live slot
      val seen = hh.totalSeen(spark)
      hh.compact(spark, beforeBatch = nBatches - 1L)
      require(hh.totalSeen(spark) == seen, "compaction changed totals")
      require(hh.batchesStored(spark).size == 2,
        s"expected prefix + 1 live slot, got ${hh.batchesStored(spark)}")
    }

    // ---- DriftMonitor: one (tvd, n) row per batch
    if (selected("drift_monitor")) for (k <- tiers) {
      val dir = tmp("ssp_drift")
      val dm = DriftMonitor.create(dir, embBase,
        Similarity.scaledCells(nEmb))
      val sec = timeBatches(b => dm.ingest(embBatch(k, b), b))
      val (rows, bytes) = storeFootprint(dir)
      require(rows == nBatches.toLong,
        s"drift store must hold exactly one row per batch, got $rows")
      report("drift_monitor", k, sec, rows, bytes)
    }

    // ---- BlocklistMonitor: P+1 rows per batch
    val patterns = Seq("able", "art", "can", "low", "slow", "table", "value")
    if (selected("blocklist_monitor")) for (k <- tiers) {
      val dir = tmp("ssp_block")
      val bm = BlocklistMonitor.create(dir, patterns)
      val sec = timeBatches(b => bm.ingest(docBatch(k, b), b, col("text")))
      val (rows, bytes) = storeFootprint(dir)
      require(rows == nBatches.toLong * (patterns.length + 1),
        s"blocklist store must hold (P+1) rows per batch, got $rows")
      report("blocklist_monitor", k, sec, rows, bytes)
    }

    // ---- QualityMonitor: 4 verdict rows per batch
    val parents = spark.range(1000L).toDF("pk")
    if (selected("quality_monitor")) for (k <- tiers) {
      val dir = tmp("ssp_quality")
      val qm = QualityMonitor.create(dir, parents, Seq("a", "b", "c"))
      def batchOf(b: Int): DataFrame =
        spark.range(20000L * k).select(
          (col("id") + b * 10000000L).as("event_id"),
          pmod(col("id"), lit(1200L)).as("user_id"),
          element_at(typedLit(Seq("a", "b", "c", "z")),
            pmod(col("id"), lit(4L)).cast("int") + 1).as("event_type"))
      val sec = timeBatches(b => qm.ingest(batchOf(b), b, col("event_id"),
        col("event_type"), col("user_id"), col("event_type")))
      val (rows, bytes) = storeFootprint(dir)
      require(rows == nBatches.toLong * 4,
        s"quality store must hold 4 rows per batch, got $rows")
      report("quality_monitor", k, sec, rows, bytes)
    }

    // ---- ContaminationMonitor: one summary row per batch (the x119
    // automaton pass is a zero-shuffle scan; benchmark is plan-constant)
    if (selected("contamination_monitor")) for (k <- tiers) {
      val dir = tmp("ssp_contam")
      val cm = ContaminationMonitor.create(dir, docsBase.limit(3),
        col("text"), minRun = 8L)
      val sec = timeBatches(b => cm.ingest(docBatch(k, b), b, col("text")))
      val (rows, bytes) = storeFootprint(dir)
      require(rows == nBatches.toLong,
        s"contamination store must hold exactly one row per batch, got $rows")
      report("contamination_monitor", k, sec, rows, bytes)
    }

    // ---- StreamingIvf: per-batch assign+append wall; driver state is
    // the centroid table (nCells rows) no matter the volume. The DATA
    // store grows with the corpus by design (it IS the index) — the
    // recorded store size documents that expected growth.
    if (selected("streaming_ivf")) for (k <- tiers) {
      val dir = tmp("ssp_ivf")
      val nCells = 32
      val ivf = StreamingIvf.create(dir, nCells, refineEvery = 1000)
      val sec = timeBatches(b => ivf.ingest(embBatch(k, b), b))
      val (_, bytes) = storeFootprint(dir)
      val centRows = ivf.centroidTable.map(_.count()).getOrElse(0L)
      require(centRows == nCells.toLong,
        s"IVF driver state must stay nCells rows, got $centRows")
      report("streaming_ivf", k, sec, -1L, bytes)
    }

    // ---- curationSink's curateBatch: stateless per-batch gate chain —
    // the probe records the per-batch wall slope (no store to bound;
    // the only cross-batch object is the caller's static corpus index)
    val corpusIndex = Pipelines
      .corpusNearDupIndex(docsBase, "doc_id", "text").persist()
    corpusIndex.count()
    if (selected("curate_batch")) for (k <- tiers) {
      val sec = timeBatches { b =>
        Pipelines.curateBatch(docBatch(k, b), "doc_id", "text", corpusIndex,
          gopherMinWords = 10).queryExecution.toRdd.count(); ()
      }
      report("curate_batch", k, sec, 0L, 0L)
    }

    def pctl(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) -1.0
      else xs.sorted.apply(math.min(xs.size - 1,
        math.ceil(p * xs.size).toInt - 1).max(0))

    // ---- ENGINE-measured per-batch processing latency (r15 verdict
    // task 7): the sections above time the hooks directly; this drives
    // the composed monitor stack (heavy-hitters + quality ingest per
    // micro-batch) through a REAL MemoryStream query and reads each
    // batch's triggerExecution from StreamingQueryListener progress —
    // the latency a production micro-batch actually pays, including
    // planning/offset-log/commit overhead. p95 at 1× is `require`d.
    if (selected("monitor_latency")) for (k <- tiers) {
      val lats = scala.collection.mutable.ArrayBuffer.empty[Double]
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val d = e.progress.durationMs.get("triggerExecution")
          if (d != null && e.progress.numInputRows > 0)
            lats.synchronized { lats += d.toDouble / 1000.0 }
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val hhDir = tmp("ssp_lat_hh"); val qmDir = tmp("ssp_lat_qm")
      val hh = StreamingHeavyHitters.create(hhDir, k = 16)
      val qm = QualityMonitor.create(qmDir, parents, Seq("a", "b", "c"))
      implicit val sqlc = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val nLatBatches = 6
      val q = in.toDF().writeStream
        .foreachBatch { (trigger: DataFrame, id: Long) =>
          val b = trigger.head().getLong(0).toInt
          hh.ingest(tokenBatch(k, b), id, col("item"))
          qm.ingest(spark.range(20000L * k).select(
              (col("id") + b * 10000000L).as("event_id"),
              pmod(col("id"), lit(1200L)).as("user_id"),
              element_at(typedLit(Seq("a", "b", "c", "z")),
                pmod(col("id"), lit(4L)).cast("int") + 1).as("event_type")),
            id, col("event_id"), col("event_type"), col("user_id"),
            col("event_type"))
        }
        .start()
      try (0 until nLatBatches).foreach { b =>
        in.addData(b.toLong); q.processAllAvailable()
      } finally q.stop()
      // listener events are delivered async — wait for the full set
      val deadline = System.currentTimeMillis() + 10000
      while (lats.synchronized(lats.size) < nLatBatches &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      spark.streams.removeListener(listener)
      val ls = lats.synchronized(lats.toVector)
      val (p50, p95) = (pctl(ls, 0.5), pctl(ls, 0.95))
      require(ls.size == nLatBatches, s"expected $nLatBatches progress events, got ${ls.size}")
      if (k == 1) require(p95 <= 15.0,
        f"monitor-stack p95 batch latency $p95%.2f s at 1x exceeds the 15 s bound")
      println(f"monitor_latency ${k + "x"}%5s batches=$nLatBatches " +
        f"p50=$p50%.2f s p95=$p95%.2f s")
    }

    // ---- Lifecycle state machine at width (r15 verdict task 4): W4/W5
    // is crash-tested at a handful of markets; the reference cadence
    // (96 markets/day) at 100× means thousands of CONCURRENT keys. Each
    // tier drives tier×312 markets (32× ≈ 10k) through discovery →
    // close-timer → poll → resolved on runTws (transformWithState +
    // RocksDB + absolute timers) with a compressed clock, and records
    //  - close-timer FIRE LATENCY (transition.atMs − the market's
    //    endTimeMs: how late the engine's timer machinery runs when
    //    thousands of timers go due together), p50/p95 `require`d, and
    //  - peak state rows (must equal the market count — every key
    //    concurrently holds state) and the resolved count (every key
    //    must drain; resolution clears state by construction).
    if (selected("lifecycle")) for (k <- tiers) {
      val nMarkets = 312 * k
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Sharded close deadlines (r16 verdict task 4): all markets share
      // ONE endTime (the 15-min boundary), so without jitter every close
      // timer expires in a single micro-batch — p95 24.7 s at 9984 keys,
      // and 2× more keys blows the 30 s bound. The jitter window scales
      // with the herd so no 200 ms trigger sees more than ~400 expired
      // timers; latency is measured against each key's OWN staggered
      // deadline (the SLA once deadlines are sharded). The window is a
      // compressed stand-in for production's closeJitterMs = 10 s (the
      // reference's buffer_seconds) — at the reference's real cadence 96
      // markets/day close per boundary, so 10 s covers ~100× that.
      val jitterMs = math.max(2000L, nMarkets / 2L)
      // backoff DOUBLES to a real cap (compressed 200→3200 ms, the
      // reference's 30→300 s shape): a flat 200 ms cap made every
      // unresolved market re-poll at trigger cadence, so at 64× a key's
      // whole 20-attempt budget burned in ~4 s — inside the staggered
      // poll wave — and early markets hit resolution_failed before the
      // probe's poll_results were even injected
      val timing = Lifecycle.Timing(firstPollDelayMs = 200L,
        baseBackoffMs = 200L, maxBackoffMs = 3200L, maxAttempts = 20,
        closeJitterMs = jitterMs)
      implicit val sqlc = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Lifecycle.MarketMsg]
      val sinkName = s"ssp_lc_$k"
      val q = Lifecycle.runTws(in.toDS(), timing)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("200 milliseconds"))
        .start()
      def sink(): DataFrame = spark.table(sinkName)
      def await(timeoutMs: Long)(pred: => Boolean): Boolean = {
        val dl = System.currentTimeMillis() + timeoutMs
        while (!pred && System.currentTimeMillis() < dl) Thread.sleep(100)
        pred
      }
      var peakState = 0L
      def notePeak(): Unit = {
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          peakState = math.max(peakState, p.stateOperators(0).numRowsTotal)
      }
      try {
        val endTime = System.currentTimeMillis() + 2000L
        in.addData((0 until nMarkets).map(i =>
          Lifecycle.MarketMsg(s"m$i", "discovered", 1L, Seq(s"t$i"),
            endTime, closed = false, "", 0, 0)))
        // distinct keys, not row count: repeat polls from one market
        // must not vouch for markets that never polled. Timeouts scale
        // with the tier — the full poll wave spans the jitter window
        // plus ~N×per-key processing.
        val awaitMs = 120000L + nMarkets * 10L
        require(await(awaitMs) {
          notePeak()
          sink().filter(col("transition") === "poll_due")
            .select("marketId").distinct().count() >= nMarkets
        }, s"lifecycle@${k}x: not all $nMarkets markets reached poll_due")
        in.addData((0 until nMarkets).map(i =>
          Lifecycle.MarketMsg(s"m$i", "poll_result", 2L, Nil, 0L,
            closed = true, "resolved", 0.0, 1.0)))
        require(await(awaitMs) {
          notePeak()
          sink().filter(col("transition") === "resolved").count() >= nMarkets
        }, s"lifecycle@${k}x: not all $nMarkets markets resolved")
        // fire latency vs each key's OWN staggered deadline
        // (endTime + closeStaggerMs): the engine-lateness signal, with
        // the deliberate shard offset excluded
        val closeLats = sink().filter(col("transition") === "close")
          .select(col("marketId"), col("atMs"))
          .collect().map { r =>
            (r.getLong(1) - endTime -
              Lifecycle.closeStaggerMs(r.getString(0), timing)) / 1000.0
          }.toVector
        require(closeLats.size == nMarkets,
          s"expected $nMarkets close transitions, got ${closeLats.size}")
        require(peakState == nMarkets,
          s"peak state rows $peakState != concurrent markets $nMarkets")
        val (p50, p95) = (pctl(closeLats, 0.5), pctl(closeLats, 0.95))
        require(p95 <= 30.0,
          f"close-timer p95 fire latency $p95%.2f s at ${k}x exceeds 30 s")
        println(f"lifecycle_tws ${k + "x"}%5s markets=$nMarkets%6d " +
          f"jitter=${jitterMs / 1000.0}%.1f s " +
          f"close_fire p50=$p50%.2f s p95=$p95%.2f s peak_state=$peakState%6d")
      } finally {
        q.stop()
        prev match {
          case Some(v) => spark.conf.set(providerKey, v)
          case None => spark.conf.unset(providerKey)
        }
      }
    }

    spark.stop()
  }
}
