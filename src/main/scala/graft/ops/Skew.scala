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
}
