package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** j07: bloom-pruned shuffle join — the explicit form of the classic
  * runtime-filter optimization. When the dim side of a fact⋈dim join is
  * SELECTIVE (a filtered subset), most fact rows will not survive the
  * join, yet a plain shuffle join pays to exchange all of them. Build a
  * Bloom filter over the dim side's join keys (one pass, merged
  * per-partition sketches — `DataFrameStatFunctions.bloomFilter`), push
  * it onto the fact scan as a codegen'd literal predicate
  * ([[graft.plans.BloomMightContain]]), and only ~|match| + |fact|·fpp
  * rows reach the exchange.
  *
  * Exactness: a Bloom filter has NO false negatives, so every matching
  * fact row passes the pre-filter; false positives (rate fpp) pass it
  * and are eliminated by the real join that follows — the result is
  * bit-identical to the plain join, which is what the j07 oracle (a
  * plain SQL join) certifies.
  *
  * Scale shape: at 100 TB this is the difference between shuffling the
  * full fact table and shuffling ~the matching slice. The sketch's size
  * is fixed by `expectedDimKeys` at build time (independent of the fact
  * side); it rides the plan as a literal, so this form is for dim sides
  * KNOWN to be bounded (millions of keys → ~1-2 MB at fpp 0.01). An
  * unbounded dim side belongs with the optimizer's own
  * InjectRuntimeFilter rewrite instead — same idea, planner-owned
  * sizing. */
object BloomJoin {
  /** Inner-join `fact` to `dim` on long-typed `key`, pre-pruning the
    * fact side with a Bloom filter of the dim keys.
    *
    * `expectedDimKeys` ≤ 0 (the default) sizes the filter from an exact
    * `dim.count()` — one extra pass over the SMALL side only (the
    * corpus-scaled-sizing convention, cf. `Similarity.scaledCells`).
    * A hardcoded constant silently undersizes as the dim grows with the
    * scale factor: results stay correct (no false negatives) but the
    * effective fpp inflates and the pruning this operator exists for
    * erodes. Pass an explicit value only when the dim's cardinality is
    * genuinely known a priori (e.g. a fixed enum dim). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                      expectedDimKeys: Long = -1L,
                      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"bloomPrunedJoin: bad fpp ($fpp)")
    val sized =
      if (expectedDimKeys > 0) expectedDimKeys
      else math.max(dim.count(), 1L)
    val bloom = dim.stat.bloomFilter(key, sized, fpp)
    fact.filter(graft.plans.functions.bloom_might_contain(col(key), bloom))
      .join(dim, key)
  }
}
