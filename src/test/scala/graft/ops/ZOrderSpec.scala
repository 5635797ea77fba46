package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton-key correctness and the two-dimensional locality property
  * single-column clustering cannot deliver. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton: hand-computed interleave; clamping keeps outliers legal") {
    // a = 3 (011), b = 5 (101): bits land at 1+2+4+32 = 39
    val out = Seq((3L, 5L), (-7L, 70000L)).toDF("a", "b")
      .select(ZOrder.morton(col("a"), col("b"), bits = 16).as("z"))
      .collect().map(_.getLong(0))
    assert(out(0) === 39L)
    // negative clamps to 0, overflow clamps to 65535 (all odd positions)
    val allB = (0 until 16).map(i => 1L << (2 * i + 1)).sum
    assert(out(1) === allB, s"got ${out(1)}")
  }

  test("bucketRanges: z-buckets are tight rectangles on BOTH dims; a 1-D sort is not") {
    // the full 64x64 grid; bits=6 -> 12-bit keys; shift=6 -> 64 buckets,
    // each exactly an 8x8 tile
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val z = ZOrder.bucketRanges(grid, col("a"), col("b"), bits = 6, shift = 6)
      .collect()
    assert(z.length === 64)
    z.foreach { r =>
      assert(r.getLong(2) + 7 === r.getLong(3), s"a-range not 8 wide: $r")
      assert(r.getLong(4) + 7 === r.getLong(5), s"b-range not 8 wide: $r")
      assert(r.getLong(1) === 64L)
    }
    // the same data bucketed by b alone (a 1-D sort layout): every
    // bucket spans the FULL a range — no pruning on a
    val oneD = grid.groupBy((col("b") / 8).cast("long").as("bucket"))
      .agg(min("a").as("min_a"), max("a").as("max_a")).collect()
    oneD.foreach(r => assert(r.getLong(1) === 0L && r.getLong(2) === 63L))
  }
}
