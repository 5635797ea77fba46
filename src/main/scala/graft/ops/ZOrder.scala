package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) layout support — the multi-column clustering
  * technique behind Delta/Iceberg's OPTIMIZE ZORDER: interleaving the
  * bits of two dimension keys makes range-partitioned output files
  * cover small RECTANGLES of the (a, b) space instead of thin slices
  * of one dimension, so min/max footer stats prune scans for
  * predicates on EITHER column. A single-column sort gives perfect
  * pruning on that column and none on the other; the Morton curve
  * trades a little of the first for most of the second — at 100 TB
  * that is the difference between scanning one dimension's stripe and
  * scanning everything when the query filters on the neglected column.
  *
  * All bit arithmetic is exact integer work (shifts/masks under 2⁶³),
  * expressed as plain Column operations so it fuses into whole-stage
  * codegen; the oracle spells out the identical bit terms. Inputs are
  * clamped to [0, 2^bits) — callers quantize real-valued dims first
  * (any monotone bucketing works; clamping keeps outliers legal). */
object ZOrder {
  /** Bit-interleaved Morton key: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1 — a 2·bits-bit key. */
  def morton(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val max = (1L << bits) - 1
    val ca = least(greatest(a.cast(LongType), lit(0L)), lit(max))
    val cb = least(greatest(b.cast(LongType), lit(0L)), lit(max))
    (0 until bits).map { i =>
      shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Per-Z-bucket locality report: coarse bucket = morton >> shift;
    * each bucket's row count and per-dimension min/max bounds — the
    * bounding rectangle a file written from that bucket would carry in
    * its footer stats (small rectangles on BOTH dims = the pruning
    * claim, measurable). One map-side-combinable aggregation. */
  def bucketRanges(df: DataFrame, a: Column, b: Column,
                   bits: Int = 16, shift: Int = 24): DataFrame = {
    require(shift >= 0 && shift < 2 * bits, s"bad shift $shift for bits $bits")
    val clampMax = (1L << bits) - 1 // don't shadow functions.max below
    val ca = least(greatest(a.cast(LongType), lit(0L)), lit(clampMax))
    val cb = least(greatest(b.cast(LongType), lit(0L)), lit(clampMax))
    df.select(shiftright(morton(a, b, bits), shift).as("zbucket"),
        ca.as("_a"), cb.as("_b"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min(col("_a")).as("min_a"), max(col("_a")).as("max_a"),
        min(col("_b")).as("min_b"), max(col("_b")).as("max_b"))
  }
}
