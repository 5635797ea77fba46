package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming contamination monitor: the x119 exact longest-substring
  * decontam ([[graft.plans.SamLongestMatch]] — generalized suffix
  * automaton over the benchmark) maintained over an unbounded document
  * stream. A crawl-ingest pipeline wants benchmark-contamination
  * pressure visible the batch it arrives: a scrape that starts pulling
  * an eval-set mirror shows up as a max-run spike batches before any
  * corpus-level audit runs, and the per-batch history localizes WHEN
  * the contaminated source appeared.
  *
  * Design (the [[BlocklistMonitor]]/[[DriftMonitor]] store discipline):
  *  - '''Ingest''': ONE zero-shuffle automaton pass over the batch
  *    (the scoring projection is codegen'd; the benchmark rides the
  *    plan), collapsed to a single summary row — n_docs, docs at/over
  *    `minRun`, the batch's max run, and the run-length HISTOGRAM
  *    tail (docs ≥ 2·minRun — the "verbatim quote" band) — written
  *    atomically to `batches/batch=<id>` via [[BatchStore]] (replay
  *    idempotent, torn slots fail loudly).
  *  - '''Read''' ([[totals]]/[[history]]): fold the batch rows — exact
  *    integer sums and maxes, batches-sized, never stream-sized;
  *    restart recovery is by construction (no driver state).
  *
  * Scale shape: per batch, one scan + a 1-row aggregate; the only
  * cross-batch object is the automaton itself (benchmark-sized, built
  * once per monitor instance). */
final class ContaminationMonitor private (
    val storeDir: String, benchTokenSeqs: Seq[Seq[String]], minRun: Long) {

  private def batchesDir = s"$storeDir/batches"

  /** foreachBatch hook. Null text scores 0 (no tokens, never flagged). */
  def ingest(batch0: DataFrame, batchId: Long, text: Column): Unit = {
    val longest = graft.plans.functions.sam_longest_match(
      graft.text.TextOps.norm(coalesce(text, lit(""))), benchTokenSeqs)
    val slot = batch0.select(longest.as("run"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("run") >= minRun, 1)).as("n_contaminated"),
        count(when(col("run") >= 2 * minRun, 1)).as("n_verbatim"),
        coalesce(max(col("run")), lit(0L)).as("max_run"))
      .coalesce(1)
    BatchStore.writeSlot(slot, s"$batchesDir/batch=$batchId")
  }

  private def store(spark: SparkSession): Option[DataFrame] =
    BatchStore.readSlots(spark, batchesDir)
      .map(_.withColumn("batch", col("batch").cast("long")))

  /** Per-batch pressure history: (batch_id, n_docs, n_contaminated,
    * n_verbatim, max_run, rate) in batch order. */
  def history(spark: SparkSession): DataFrame = store(spark) match {
    case None => spark.emptyDataFrame
    case Some(df) => df.select(col("batch").as("batch_id"), col("n_docs"),
        col("n_contaminated"), col("n_verbatim"), col("max_run"),
        round(col("n_contaminated").cast("double") /
          greatest(col("n_docs"), lit(1L)), 6).as("rate"))
      .orderBy("batch_id")
  }

  /** Stream totals + triage: overall counts, the global max run, and
    * the FIRST batch that carried contamination (null while clean). */
  def totals(spark: SparkSession): DataFrame = store(spark) match {
    case None => spark.emptyDataFrame
    case Some(df) => df.agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_contaminated")).as("n_contaminated"),
      sum(col("n_verbatim")).as("n_verbatim"),
      max(col("max_run")).as("max_run"),
      min(when(col("n_contaminated") > 0, col("batch")))
        .as("first_contaminated_batch"))
  }
}

object ContaminationMonitor {
  /** Build from a static benchmark table (collected ONCE — bounded, an
    * eval set; the x38/x55/x119 convention). */
  def create(storeDir: String, bench: DataFrame, benchText: Column,
             minRun: Long = 8L): ContaminationMonitor = {
    require(minRun > 0, s"minRun must be positive, got $minRun")
    val seqs: Seq[Seq[String]] = bench
      .select(graft.text.TextOps.norm(benchText).as("t")).collect()
      .map(_.getString(0).split(" ").toSeq.filter(_.nonEmpty)).toSeq
    require(seqs.nonEmpty, "ContaminationMonitor: empty benchmark")
    new ContaminationMonitor(storeDir, seqs, minRun)
  }
}
