package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming hot-key monitor: the Misra–Gries frequent-items summary
  * maintained over an unbounded stream — the streaming member of the
  * heavy-hitter pair (batch form: graft.ops.HeavyHitters / x101). A
  * crawl pipeline watches hot tokens, hot domains, and hot join keys
  * continuously; re-aggregating the full history per micro-batch would
  * grow without bound, and Spark's streaming aggregation state would
  * hold the full key cardinality. The MG summary is the bounded-state
  * answer: mergeability (Agarwal et al. 2012) is exactly the license to
  * sketch each micro-batch independently and fold summaries later.
  *
  * Design (the [[StreamingIvf]] store discipline):
  *  - '''Ingest''' (one `foreachBatch` call per micro-batch): ONE
  *    aggregation computes the batch's own k-entry MG summary + row
  *    count (shuffle is k·partitions — the batch never leaves the
  *    executors), written whole to `batches/batch=<id>` — the
  *    batch-id-addressed overwrite makes a replayed micro-batch land
  *    idempotently ([[Pipelines.bronzeSink]] convention).
  *  - '''Read''' ([[summary]] / [[candidates]] / [[totalSeen]]): fold
  *    all per-batch summaries with the MG merge rule (add counts; past
  *    k entries subtract the (k+1)-largest and drop non-positive). The
  *    fold is driver-side over batches·k rows — summary-sized, never
  *    stream-sized; state is derived purely from the store, so a
  *    restarted driver recovers by construction (no handle state to
  *    lose). [[compact]] folds summaries older than the checkpoint
  *    horizon into one prefix slot (mergeability makes that lossless
  *    w.r.t. the guarantee), so a long-lived store stays
  *    O(recent batches + 1) instead of growing with stream age.
  *  - '''Exact report''' ([[exactReport]]): the stream's candidate set
  *    ⊇ every item above N/(k+1) of the TOTAL stream (per-batch
  *    undercounts add across merges), so one exact isin-filtered count
  *    over the pipeline's archive (the bronze store it writes anyway)
  *    turns the sketch into the deterministic exact answer — the x101
  *    two-phase shape with the sketch phase amortized over the stream. */
final class StreamingHeavyHitters private (val storeDir: String, val k: Int) {

  private def batchesDir = s"$storeDir/batches"

  /** foreachBatch hook: sketch the batch, store summary idempotently. */
  def ingest(batch0: DataFrame, batchId: Long, item: Column): Unit = {
    val ct = compactedThrough(batch0.sparkSession)
    require(batchId > ct,
      s"batch $batchId is at/below the compacted horizon $ct — compact() " +
        "must only cover batches the engine can no longer replay")
    val keyed = batch0.select(item.as("item")).filter(col("item").isNotNull)
    val row = keyed.agg(
      graft.plans.functions.misra_gries(col("item"), k).as("s"),
      count(lit(1)).as("n")).head()
    val entries = row.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    val n = row.getLong(1)
    val spark = batch0.sparkSession
    import spark.implicits._
    val slot = entries.toDF("item", "cnt").withColumn("btotal", lit(n))
      // carry the batch total even when the summary is empty (all-null
      // batch): a single null-item marker row keeps the count
      .unionByName(Seq((null.asInstanceOf[String], 0L, n))
        .toDF("item", "cnt", "btotal"))
      .coalesce(1)
    BatchStore.writeSlot(slot, s"$batchesDir/batch=$batchId")
  }

  /** MG merge of two summaries — the Agarwal et al. rule. */
  private def mgMerge(a: Map[String, Long],
                      b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(it => it -> (a.getOrElse(it, 0L) + b.getOrElse(it, 0L))).toMap
    if (sum.size <= k) sum
    else {
      val pivot = sum.values.toArray.sortBy(-_).apply(k)
      sum.iterator.map { case (it, c) => it -> (c - pivot) }
        .filter(_._2 > 0).toMap
    }
  }

  private def compactedDir = s"$storeDir/compacted"
  private def markerPath = s"$storeDir/_COMPACTED_THROUGH"

  /** Highest batch id folded into the compacted prefix (−1 = none).
    *
    * The marker is a cache of the authoritative state, not the commit
    * point itself: a compacted slot is `_SUCCESS`-gated and published
    * atomically by [[BatchStore.writeSlot]] BEFORE the marker is
    * renamed into place, and re-compaction replaces the marker with a
    * delete-then-rename — a crash between those two ops leaves no
    * marker file. Falling back to the max committed `cutoff=<id>` slot
    * keeps the already-deleted covered batches accounted for instead of
    * silently undercounting [[summary]]/[[totalSeen]]. */
  def compactedThrough(spark: SparkSession): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(markerPath)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    } else {
      val cd = new org.apache.hadoop.fs.Path(compactedDir)
      if (!fs.exists(cd)) -1L
      else fs.listStatus(cd).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cutoff=") &&
          fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
        .map(_.getPath.getName.stripPrefix("cutoff=").toLong)
        .foldLeft(-1L)(math.max)
    }
  }

  private def slotEntries(df: org.apache.spark.sql.DataFrame)
      : (Map[String, Long], Long) = {
    val rows = df.collect()
    val total = rows.head.getAs[Long]("btotal")
    (rows.filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap, total)
  }

  private def store(spark: SparkSession): Seq[(Long, Map[String, Long], Long)] = {
    val ct = compactedThrough(spark)
    val head =
      if (ct < 0) Seq.empty
      else {
        val (m, t) = slotEntries(
          spark.read.parquet(s"$compactedDir/cutoff=$ct"))
        Seq((ct, m, t))
      }
    val live = BatchStore.readSlots(spark, batchesDir) match {
      case None => Seq.empty
      case Some(raw0) =>
        // partition-column discovery infers small batch ids as INT — pin long
        val raw = raw0.withColumn("batch", col("batch").cast("long"))
        raw.collect().groupBy(_.getAs[Long]("batch")).toSeq.map {
          case (bid, rows) =>
            val total = rows.head.getAs[Long]("btotal")
            val entries = rows.filter(!_.isNullAt(0))
              .map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
            (bid, entries, total)
        // slots at or below the marker are compacted mass awaiting
        // cleanup (a crash between marker write and slot deletion) —
        // folding them in would double-count
        }.filter(_._1 > ct).sortBy(_._1)
    }
    head ++ live
  }

  /** Retention compaction: fold every stored summary with id <
    * `beforeBatch` into ONE compacted prefix slot — mergeability
    * (Agarwal et al.) makes this LOSSLESS w.r.t. the N/(k+1) guarantee,
    * so a long-lived store stays O(recent batches + 1) instead of
    * growing with stream age. Call with `beforeBatch` at or below the
    * streaming checkpoint horizon: the engine only ever replays batches
    * above it, so a replayed batch can never land inside the prefix.
    *
    * Crash-safe protocol (no multi-directory atomicity exists on a
    * filesystem): (1) the merged prefix is published atomically under
    * `compacted/cutoff=<id>`; (2) the `_COMPACTED_THROUGH` marker is
    * renamed into place — THE commit point; (3) covered batch slots and
    * stale compacted generations are deleted. A crash before (2) leaves
    * an unused compacted dir (cleaned next time); after (2), readers
    * ignore covered slots via the marker, so late deletion is cosmetic.
    * After compaction [[batchesStored]] reports the prefix as one
    * pseudo-batch at the cutoff id. */
  def compact(spark: SparkSession, beforeBatch: Long): Unit = {
    val entries = store(spark).filter(_._1 < beforeBatch)
    if (entries.size < 2) return
    val cutoff = entries.map(_._1).max
    val merged = entries.map(_._2).foldLeft(Map.empty[String, Long])(mgMerge)
    val total = entries.map(_._3).sum
    import spark.implicits._
    val slot = merged.toSeq.toDF("item", "cnt").withColumn("btotal", lit(total))
      .unionByName(Seq((null.asInstanceOf[String], 0L, total))
        .toDF("item", "cnt", "btotal"))
      .coalesce(1)
    BatchStore.writeSlot(slot, s"$compactedDir/cutoff=$cutoff")
    // commit point: marker renamed into place
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(s"$storeDir/._marker_tmp")
    val out = fs.create(tmp, true)
    try out.write(cutoff.toString.getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(markerPath)
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"compact: marker rename failed at $dst")
    // cleanup (safe late): covered batch slots + stale compacted gens
    val bd = new org.apache.hadoop.fs.Path(batchesDir)
    if (fs.exists(bd)) fs.listStatus(bd).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("batch=") &&
        scala.util.Try(n.stripPrefix("batch=").toLong).toOption.exists(_ <= cutoff))
        fs.delete(s.getPath, true)
    }
    val cd = new org.apache.hadoop.fs.Path(compactedDir)
    if (fs.exists(cd)) fs.listStatus(cd).foreach { s =>
      if (s.getPath.getName != s"cutoff=$cutoff") fs.delete(s.getPath, true)
    }
  }

  /** The merged stream summary (item → lower-bound count): ≤ k items
    * guaranteed to include every item above totalSeen/(k+1). */
  def summary(spark: SparkSession): Map[String, Long] =
    store(spark).map(_._2).foldLeft(Map.empty[String, Long])(mgMerge)

  def candidates(spark: SparkSession): Seq[String] =
    summary(spark).keys.toSeq.sorted

  /** Rows ingested across all stored batches. */
  def totalSeen(spark: SparkSession): Long = store(spark).map(_._3).sum

  /** Batch ids present in the store. */
  def batchesStored(spark: SparkSession): Seq[Long] = store(spark).map(_._1)

  /** Exact deterministic report over the stream's archive (must hold
    * the union of ingested batches — the bronze store the pipeline
    * writes anyway): (item, n) for every item with n·(k+1) > N. */
  def exactReport(archive: DataFrame, item: Column): DataFrame = {
    val spark = archive.sparkSession
    val cand = candidates(spark)
    val keyed = archive.select(item.as("item")).filter(col("item").isNotNull)
    if (cand.isEmpty)
      return keyed.select(col("item"), lit(0L).as("n")).limit(0)
    val tot = keyed.count()
    keyed.filter(col("item").isin(cand: _*))
      .groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") * (k + 1) > tot)
  }
}

object StreamingHeavyHitters {
  def create(storeDir: String, k: Int): StreamingHeavyHitters = {
    require(k > 0, s"k must be positive, got $k")
    new StreamingHeavyHitters(storeDir, k)
  }

  /** Recovery is trivial: all state lives in the store. */
  def load(storeDir: String, k: Int): StreamingHeavyHitters = create(storeDir, k)
}
