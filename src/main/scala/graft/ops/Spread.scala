package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Conditional parallelism repair for under-split scans (optimization
  * guide §2.5 "input skew: one huge unsplittable file — repartition
  * immediately after the read").
  *
  * The committed sf≤0.1 fixture files are single-row-group parquet, so a
  * scan yields ONE real task no matter what `maxPartitionBytes` says; any
  * heavy narrow compute (or map-side aggregation) downstream of such a
  * scan runs sequentially. At cluster scale the same tables arrive in
  * thousands of splits and a repartition would be a pure extra shuffle —
  * so the decision reads the optimized plan's size ESTIMATE (logical
  * stats only, no physical planning) divided by the configured split
  * size, mirroring how FilePartition would split the input, and only
  * repartitions when that undercuts the configured parallelism.
  *
  * [[byKeys]] hash-partitions by the given keys: when the downstream
  * operation groups/joins on those keys the exchange REPLACES the
  * aggregation's own shuffle (HashPartitioning on the keys satisfies its
  * ClusteredDistribution), so the plan keeps one exchange total — it just
  * moves below the scan, parallelizing everything after it. [[toCores]]
  * is the keyless round-robin form for purely narrow pipelines.
  */
object Spread {

  private def underSplit(df: DataFrame): Boolean = {
    val conf = df.sparkSession.sessionState.conf
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Relations without stats report defaultSizeInBytes (Long.MaxValue)
    // — that is "unknown", not "huge": treat it as small and repartition
    // (a spurious shuffle of a genuinely big input is cheap next to the
    // sequential compute this guards against). Compare as BigInt:
    // join-inflated estimates can exceed Long range.
    val unknown = bytes >= BigInt(conf.defaultSizeInBytes)
    val estSplits = bytes / BigInt(math.max(conf.filesMaxPartitionBytes, 1L)) + 1
    unknown || estSplits < BigInt(conf.numShufflePartitions)
  }

  /** Repartition to the configured parallelism by `keys` when the input
    * would under-split; identity otherwise. */
  def byKeys(df: DataFrame, keys: Seq[Column]): DataFrame =
    if (underSplit(df))
      df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        keys: _*)
    else df

  /** Round-robin repartition to the configured parallelism when the
    * input would under-split; identity otherwise. */
  def toCores(df: DataFrame): DataFrame =
    if (underSplit(df))
      df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    else df
}
