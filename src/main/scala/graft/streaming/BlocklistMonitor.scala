package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Streaming blocklist monitor: the x114 Aho–Corasick badword audit
  * maintained over an unbounded document stream. A crawl-ingest
  * pipeline wants to see blocked-term pressure continuously (a spam
  * wave shows up as one pattern's hit rate spiking batches before the
  * corpus-level gate statistics move); re-scanning the accumulated
  * corpus per micro-batch grows without bound, while per-pattern counts
  * are exact integer sums — the trivially mergeable summary.
  *
  * Design (the [[StreamingHeavyHitters]] / [[DriftMonitor]] store
  * discipline):
  *  - '''Ingest''' (one `foreachBatch` call per micro-batch): ONE
  *    automaton pass over the batch ([[graft.plans.AcMatchCounts]]),
  *    with the count array extended by a constant 1 so the batch's doc
  *    total rides the SAME P+1-row aggregate (no second job over the
  *    batch); the P+1 rows are written whole to `batches/batch=<id>` —
  *    batch-id-addressed overwrite, so a replayed micro-batch lands
  *    idempotently ([[Pipelines.bronzeSink]] convention).
  *  - '''Read''' ([[totals]] / [[history]]): fold the per-batch rows by
  *    exact addition — batches·(P+1) rows, summary-sized, never
  *    stream-sized; state derives purely from the store, so a restarted
  *    driver recovers by construction.
  *
  * Scale shape: per batch the shuffle is P+1 rows per map partition
  * (partial-aggregated), pattern count invisible to the text scan
  * (O(text + matches) total). */
final class BlocklistMonitor private (val storeDir: String,
                                      patterns: Seq[String]) {

  private def batchesDir = s"$storeDir/batches"
  private val pcount = patterns.length // pidx == pcount is the doc marker

  /** foreachBatch hook. Null text scans as empty (0 hits, doc counted). */
  def ingest(batch0: DataFrame, batchId: Long, text: Column): Unit = {
    val arr = concat(
      graft.plans.functions.ac_match_counts(coalesce(text, lit("")), patterns),
      array(lit(1L)))
    val summary = batch0
      .select(posexplode(arr).as(Seq("pidx", "hits")))
      .groupBy(col("pidx"))
      .agg(count(when(col("hits") > 0, 1)).as("n_docs"),
        sum(col("hits")).as("n_hits"))
      .coalesce(1)
    BatchStore.writeSlot(summary, s"$batchesDir/batch=$batchId")
  }

  private def store(spark: SparkSession): Option[DataFrame] =
    BatchStore.readSlots(spark, batchesDir)
      .map(_.withColumn("batch", col("batch").cast(LongType)))

  private def named(df: DataFrame): DataFrame = {
    val pat = when(col("pidx") < pcount,
      element_at(lit(patterns.toArray), col("pidx").cast(IntegerType) + 1))
      .as("pattern") // null on the doc-marker row
    df.select(pat +: df.columns.filter(_ != "pidx").map(col).toSeq: _*)
  }

  /** Exact per-pattern stream totals: (pattern, n_docs, n_hits) plus one
    * null-pattern row carrying the total document count. */
  def totals(spark: SparkSession): DataFrame = store(spark) match {
    case None => spark.emptyDataFrame
    case Some(df) => named(
      df.groupBy(col("pidx"))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_hits")).as("n_hits")))
  }

  /** Per-batch hit-rate history: (batch_id, pattern, n_docs, n_hits,
    * doc_rate) — doc_rate is the share of the batch's documents the
    * pattern fired in, the series a spike alert thresholds on. */
  def history(spark: SparkSession): DataFrame = store(spark) match {
    case None => spark.emptyDataFrame
    case Some(df) =>
      val tot = df.filter(col("pidx") === pcount)
        .select(col("batch"), col("n_docs").as("batch_docs"))
      named(df.filter(col("pidx") < pcount))
        .join(tot, "batch") // batch-count keyed: batches x (P+1) rows
        .select(col("batch").as("batch_id"), col("pattern"),
          col("n_docs"), col("n_hits"),
          round(col("n_docs").cast("double") / col("batch_docs"), 6)
            .as("doc_rate"))
        .orderBy("batch_id", "pattern")
  }
}

object BlocklistMonitor {
  def create(storeDir: String, patterns: Seq[String]): BlocklistMonitor = {
    require(patterns.nonEmpty, "BlocklistMonitor: empty pattern set")
    new BlocklistMonitor(storeDir, patterns)
  }
}
