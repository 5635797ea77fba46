package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Benchmark decontamination with a Bloom-filter pre-gate — the
  * scale-path form of the x24 sweep (reference surface: the pipeline's
  * keyword filtering at `producers/market_discovery.py:35-48` is the
  * closest analog of corpus gating; decontamination itself is
  * LLM-pipeline tier).
  *
  * Shape: the benchmark (eval-set) side is small by definition; the
  * corpus side at 100 TB produces ~10¹² shingle rows. A broadcast join
  * alone would still hash-probe EVERY corpus shingle against the exact
  * set; the Bloom gate (Spark's own `BloomFilterMightContain` sketch
  * expression, codegen'd, the same machinery InjectRuntimeFilter uses
  * for runtime row-level filtering) discards the overwhelmingly-clean
  * majority with a few cache-resident bit probes BEFORE the join, and —
  * unlike the exact set — its size is fixed by (items, fpp), not by
  * benchmark bytes, so it ships to executors as a task-binary constant
  * even when the exact set would be broadcast-heavy. False positives
  * are removed by the exact join after the gate, so the RESULT is
  * exact — the bloom only prunes work.
  */
object Decontam {

  /** `might_contain(bloomBytes, value)`: Spark's sketch-probe predicate
    * over a driver-built `org.apache.spark.util.sketch.BloomFilter` —
    * constant binary on the bloom side (required by the expression's
    * contract), LongType on the value side. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(lit(bloomBytes)),
      GraftBridge.expression(value)))

  /** Emit the CLEAN corpus: every document whose k-char-shingle overlap
    * with the benchmark set stays below `maxOverlap`, with its exact
    * overlap count and token count (the "what survives, with budget"
    * output a curation pipeline feeds downstream).
    *
    * The bloom is a bounded sketch built with one distributed
    * aggregation (`stat.bloomFilter`) — the only driver-side data is the
    * filter's fixed-size bit array, mirroring the count-only discipline
    * of `Dedup.connectedComponents`. The benchmark shingle set is
    * persisted only WITHIN this call (the sizing count and the bloom
    * build are both eager) and unpersisted before returning — no cache
    * handle leaks to the caller; the returned plan's one remaining read
    * (the broadcast exact join) recomputes the small bench-side shingle
    * pipeline once at execution, which is cheaper than holding executor
    * memory hostage across repeated invocations.
    */
  def cleanCorpus(corpus: DataFrame, id: Column, text: Column,
                  bench: DataFrame, benchId: Column, benchText: Column,
                  k: Int = 20, maxOverlap: Long = 10,
                  fpp: Double = 0.01): DataFrame = {
    // explode_outer + null filter (not plain explode): see the corpus-side
    // note below — avoids the inferred size>0 filter re-running the
    // shingle pass
    val bsh = Dedup.stagedShingles(bench, benchId, benchText, k)
      .select(explode_outer(col("_sh")).as("h"))
      .filter(col("h").isNotNull).distinct()
      .persist()
    val nBench = bsh.count()
    val bloom = bsh.stat.bloomFilter("h", math.max(nBench, 1L), fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    // both eager readers (count + bloom) are done; release the cache now
    // rather than leaking it to the caller — the broadcast join below
    // recomputes the small bench-side shingles once when the returned
    // plan executes
    bsh.unpersist()
    // shingle lists are distinct per doc, so the post-gate join count IS
    // the per-document intersection size (same contract as x24).
    // explode_OUTER on purpose: a plain explode lets the optimizer infer
    // `size(child) > 0` and push it below the staging repartition, which
    // re-runs the whole shingle pass inside the filter — doubling the
    // query's dominant narrow cost (observed in the physical plan). The
    // outer form infers nothing; a shingle-less doc yields h = null,
    // which the bloom gate / inner join drop, and the final left join
    // restores it with n_overlap = 0 — identical semantics.
    val overlap = Dedup.stagedShingles(corpus, id, text, k)
      .select(col("_id").as("doc_id"), explode_outer(col("_sh")).as("h"))
      .filter(mightContain(bytes, col("h")))
      .join(broadcast(bsh), "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    corpus.select(id.as("doc_id"), TextOps.wsTokenCount(text).as("n_tokens"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"), col("n_tokens"))
      .filter(col("n_overlap") < maxOverlap)
  }
}
