package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware join: explicit salting for hot keys (SURVEY §2.5 scale
  * note; the reference's per-market fan-out concentrates traffic on the
  * single active market, so a market-keyed join at 100× scale has one
  * giant key).
  *
  * Technique: replicate the SMALL side once per salt value and scatter
  * the big side's rows across salts, turning one hot (key) group into
  * nSalts groups of 1/nSalts the size. The salt is derived
  * deterministically from a high-cardinality big-side column, so results
  * are reproducible (no rand()) — and the salt never escapes the join.
  * AQE's skewedJoin covers many cases at runtime; explicit salting is
  * for the planned-ahead case (known hot key, or AQE disabled in
  * streaming micro-batches, where AQE does not re-plan).
  */
object Skew {
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSrc: Column, nSalts: Int): DataFrame = {
    val b = big.withColumn("_salt", pmod(hash(saltSrc), lit(nSalts)))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Sketch-directed skew join: [[saltedJoin]] salts EVERY key — the
    * small side is replicated nSalts× wholesale, which at 100 TB pays
    * the replication tax on the (usually overwhelming) cold-key mass
    * for the benefit of a handful of hot keys. This variant spends one
    * Misra–Gries pass over the big side's key (k·partitions shuffle,
    * cardinality-independent — graft.plans.MisraGriesAgg) to learn the
    * ≤ k candidate hot keys, salts ONLY rows matching that literal
    * predicate, and plain-joins the cold remainder; the union is
    * row-identical to the plain inner join (spec-pinned). MG's
    * guarantee is exactly the right one here: every key above
    * N/(k+1) of the big side is in the candidate set, so no genuinely
    * hot key can sneak into the cold branch — a false-positive
    * candidate merely gets salted unnecessarily, which is correct,
    * just mildly wasteful. With no candidates (uniform keys) the plan
    * IS the plain join. Keys are sketched through a string cast (the
    * summary's currency); the hot predicate compares on the same cast,
    * so any key type works. NULL keys never match an inner join and
    * are dropped by both branches alike. */
  def sketchSaltedJoin(big: DataFrame, small: DataFrame, key: String,
                       saltSrc: Column, nSalts: Int, k: Int = 64): DataFrame = {
    val hot = big.select(col(key).cast("string").as("_k"))
      .filter(col("_k").isNotNull)
      .agg(graft.plans.functions.misra_gries(col("_k"), k))
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    if (hot.isEmpty) return big.join(small, key)
    val isHot = col(key).cast("string").isin(hot: _*)
    saltedJoin(big.filter(isHot), small.filter(isHot), key, saltSrc, nSalts)
      .unionByName(big.filter(!isHot).join(small.filter(!isHot), key))
  }
}
