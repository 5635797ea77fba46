package graft.streaming

import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming semantic-drift monitor: every micro-batch of embeddings is
  * scored against a FIXED reference snapshot with the x96 cell-share
  * machinery ([[Similarity.embeddingDrift]] — same deterministic cell
  * frame, pinned to the reference), and one (batch_id, tvd, n) row is
  * appended to a monitor store. This is the alerting form of the batch
  * drift report: the crawl operator watches the total-variation
  * distance of each arriving slice and pages when the semantic mix
  * moves while token-level monitors (x93) stay quiet.
  *
  * Store discipline = [[StreamingHeavyHitters]]: batch-id-addressed
  * overwrite (replayed micro-batches land idempotently), history
  * derived purely from the store. Per batch: one broadcast-argmax
  * assignment of the batch (narrow), one of the reference (bounded,
  * could be cached by a long-lived caller), cell-keyed counts — the
  * x96 scale shape, batch-sized. */
final class DriftMonitor private (val storeDir: String,
                                  reference: DataFrame, nCells: Int) {

  private def batchesDir = s"$storeDir/batches"

  /** foreachBatch hook. Empty batches are skipped (no mix to score). */
  def ingest(batch0: DataFrame, batchId: Long): Unit = {
    val batch = batch0.select(col("vec_id"), col("embedding"))
    if (batch.isEmpty) return
    val spark = batch0.sparkSession
    import spark.implicits._
    val row = Similarity.embeddingDrift(reference, batch, nCells)
      .agg(round(sum(col("share_delta")) / 2, 6).as("tvd"),
        sum(col("new_n")).as("n")).head()
    val slot = Seq((row.getDouble(0), row.getLong(1)))
      .toDF("tvd", "n").coalesce(1)
    BatchStore.writeSlot(slot, s"$batchesDir/batch=$batchId")
  }

  /** (batch_id, tvd, n) history, batch order. */
  def history(spark: SparkSession): DataFrame =
    BatchStore.readSlots(spark, batchesDir)
      .getOrElse(throw new IllegalStateException(
        s"DriftMonitor: no batches ingested at $storeDir"))
      .withColumn("batch", col("batch").cast("long"))
      .select(col("batch").as("batch_id"), col("tvd"), col("n"))
      .orderBy("batch_id")
}

object DriftMonitor {
  def create(storeDir: String, reference: DataFrame,
             nCells: Int): DriftMonitor = {
    require(nCells > 0, s"nCells must be positive, got $nCells")
    new DriftMonitor(storeDir, reference, nCells)
  }
}
