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
  *    lose). A long-lived store would compact summaries older than the
  *    checkpoint horizon into one (mergeability makes that lossless
  *    w.r.t. the guarantee); left as the declared retention seam.
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

  private def store(spark: SparkSession): Seq[(Long, Map[String, Long], Long)] = {
    val raw0 = BatchStore.readSlots(spark, batchesDir) match {
      case None => return Seq.empty
      case Some(df) => df
    }
    // partition-column discovery infers small batch ids as INT — pin long
    val raw = raw0.withColumn("batch", col("batch").cast("long"))
    raw.collect().groupBy(_.getAs[Long]("batch")).toSeq.map {
      case (bid, rows) =>
        val total = rows.head.getAs[Long]("btotal")
        val entries = rows.filter(!_.isNullAt(0))
          .map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
        (bid, entries, total)
    }.sortBy(_._1)
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
