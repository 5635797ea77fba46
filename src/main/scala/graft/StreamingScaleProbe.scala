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

    spark.stop()
  }
}
