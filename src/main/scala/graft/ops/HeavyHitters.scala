package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters at sketch cost: the hot-token / hot-domain /
  * hot-key detector a 100-TB pipeline runs before it commits to a
  * partitioning (a key above a few percent of the stream is a skew
  * hazard for every downstream groupBy/join; the same report is the
  * vocabulary-head / boilerplate-token monitor on text).
  *
  * Two-phase sketch-then-verify plan:
  *  1. ONE pass aggregates the native mergeable Misra–Gries summary
  *     (graft.plans.MisraGriesAgg) — each map partition reduces to a
  *     k-entry summary before the exchange, so shuffle volume is
  *     k·partitions, independent of item cardinality (the naive exact
  *     group-by shuffles the whole key space). The same row carries
  *     count(*), so the threshold N arrives with the candidates.
  *  2. The ≤ k candidates come back to the driver (bounded collect, the
  *     model-sized-collect discipline) and ONE exact pass counts only
  *     rows matching the candidate literal `isin` predicate — compiled
  *     into the scan filter, no join — then keeps items with
  *     n·(k+1) > N, exact integer arithmetic.
  *
  * The MG guarantee (no item above N/(k+1) is ever evicted, under any
  * partitioning / merge order) makes the final output DETERMINISTIC and
  * EXACT even though the candidate set itself is merge-order dependent:
  * phase 2 recounts and refilters exactly. Output: (item, n) for every
  * item with true count n satisfying n·(k+1) > N. */
object HeavyHitters {
  def exact(df: DataFrame, item: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val keyed = df.select(item.as("item")).filter(col("item").isNotNull)
    val row = keyed.agg(
      graft.plans.functions.misra_gries(col("item"), k).as("cand"),
      count(lit(1)).as("tot")).head()
    val cand = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val tot = row.getLong(1)
    if (cand.isEmpty)
      keyed.select(col("item"), lit(0L).as("n")).limit(0)
    else
      keyed.filter(col("item").isin(cand: _*))
        .groupBy("item").agg(count(lit(1)).as("n"))
        .filter(col("n") * (k + 1) > tot)
  }
}
