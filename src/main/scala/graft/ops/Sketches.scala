package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** KMV distinct-count sketches with SET-OPERATION estimates — the
  * cross-source audience/overlap questions a 100-TB pipeline asks
  * without joining full key sets: "how many distinct users per
  * source?" and "how many appear in BOTH?" (HLL answers the first;
  * only value-keeping sketches like KMV answer the second). Built on
  * the native mergeable [[graft.plans.KmvSketchAgg]]: one aggregation
  * whose shuffle is k·partitions regardless of key cardinality.
  *
  * Estimator (Beyer et al. 2007): with hashes uniform on [0, P), a
  * full sketch's k-th smallest value h_(k) gives
  * est = (k−1)·P / h_(k); a sketch holding fewer than k values IS the
  * exact distinct set, so the exact size is returned. The union of
  * two sketches is the bottom-k of the merged value sets (a valid KMV
  * sketch of the union); intersection: of the union sketch's members,
  * the fraction ρ present in BOTH input sketches estimates the
  * Jaccard, and est∩ = ρ · est∪. Every number is deterministic — the
  * sketch is a pure set bottom-k, the hash is the engine-portable
  * poly_hash, and each estimate is one IEEE division — so the whole
  * report is oracle-hashable, unlike sampled estimators. */
object Sketches {
  private val P = graft.plans.HashUtil.P

  /** Per-group sketch + distinct estimate:
    * (g, sk, n_sk, est — rounded 1e-6). */
  def kmvDistinct(df: DataFrame, group: Column, key: Column,
                  k: Int): DataFrame = {
    require(k > 1, s"need k > 1 for the (k-1)/h_k estimator, got $k")
    df.select(group.as("g"),
        graft.plans.functions.poly_hash(key.cast("string")).as("_h"))
      .filter(col("_h").isNotNull)
      .groupBy("g")
      .agg(graft.plans.functions.kmv_sketch(col("_h"), k).as("sk"))
      .select(col("g"), col("sk"), size(col("sk")).cast(LongType).as("n_sk"),
        round(estOf(col("sk"), k), 6).as("est"))
  }

  private def estOf(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast(DoubleType))
      .otherwise(lit((k - 1).toDouble * P) / element_at(sk, k).cast(DoubleType))

  /** All group-pair overlap estimates from the per-group sketches
    * (the [[kmvDistinct]] output): union sketch = bottom-k of the
    * merged values, est∩ = (members of the union sketch present in
    * both inputs) / k · est∪. The pair join is a bounded
    * nGroups×nGroups nested loop over k-length arrays — group counts
    * (sources, event types) are small by construction. */
  /** x111 — CMS point-frequency certificate: build ONE Count-Min
    * sketch ([[graft.plans.CmsSketchAgg]]) over the corpus word
    * stream, then answer point queries for the exact top-`nProbes`
    * words and report estimate vs truth side by side — the overcount
    * (est − exact ≥ 0, always, by the CMS one-sided guarantee) is the
    * sketch's measured error at this depth×width.
    *
    * Scale shape: the sketch pass reduces every map partition to
    * depth·width longs before a single-row exchange — corpus- and
    * vocabulary-independent shuffle; at 100 TB only this pass runs and
    * point queries hit the 8 KB matrix. The exact side (word count +
    * top-n) exists to CERTIFY the estimates and plans as one
    * map-side-combined agg + TakeOrderedAndProject; the probe join is
    * a broadcast of one sketch row. Every number is exact integer
    * arithmetic — sketch counters are order-independent pure sums, so
    * the whole report is oracle-hashable. */
  def cmsWordFreq(docs: DataFrame, id: Column, text: Column,
                  depth: Int, width: Int, nProbes: Int): DataFrame = {
    val words = docs
      .select(explode(split(graft.text.TextOps.norm(text), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("w"), graft.plans.functions.poly_hash(col("w")).as("_h"))
    val sketch = words.agg(
      graft.plans.functions.cms_sketch(col("_h"), depth, width).as("_sk"))
    val probes = words.groupBy("w")
      .agg(count(lit(1)).as("exact"), first(col("_h")).as("_h"))
      .orderBy(col("exact").desc, col("w"))
      .limit(nProbes)
    val mul = graft.plans.CmsSketchAgg.rowMultipliers(depth)
    val cmsP = graft.plans.CmsSketchAgg.P
    val est = (0 until depth).map { r =>
      val cell = (pmod(col("_h"), lit(cmsP)) * mul(r) + r) % cmsP % width
      element_at(col("_sk"), (lit(r * width) + cell + 1).cast("int"))
    }.reduce(least(_, _))
    probes.crossJoin(broadcast(sketch))
      .select(col("w"), col("exact"), est.as("est"),
        (est - col("exact")).as("overcount"))
  }

  def kmvOverlap(sketches: DataFrame, k: Int): DataFrame = {
    val a = sketches.select(col("g").as("g_a"), col("sk").as("sk_a"),
      col("est").as("est_a"))
    val b = sketches.select(col("g").as("g_b"), col("sk").as("sk_b"),
      col("est").as("est_b"))
    a.join(b, col("g_a") < col("g_b"))
      .withColumn("_u", slice(array_sort(array_union(col("sk_a"), col("sk_b"))),
        1, k))
      .withColumn("_eu", estOf(col("_u"), k))
      .withColumn("_ni",
        size(array_intersect(col("_u"),
          array_intersect(col("sk_a"), col("sk_b")))).cast(LongType))
      .select(col("g_a"), col("g_b"), col("est_a"), col("est_b"),
        round(col("_eu"), 6).as("est_union"),
        // rho is the match fraction over the union sketch's ACTUAL
        // size — |usk| < k whenever the union is small enough to be
        // exact, where dividing by k would shrink the estimate
        round(when(size(col("_u")) === 0, 0.0)
          .otherwise(col("_ni") * col("_eu") / size(col("_u"))), 6)
          .as("est_inter"))
  }
}
