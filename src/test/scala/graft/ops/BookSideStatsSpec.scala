package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the native book_side_stats kernel to the exact HOF chain it
  * replaced ([[Book.hofSideStats]] — the executable spec), including the
  * null semantics the HOFs imply: absorbing-null volume fold, null-price
  * elements dropped from the best-size filter, null element → struct
  * (null,null) still participating in the largest struct-max, empty side
  * → (null, null, 0, null, null). Both arms run in the same session, so
  * codegen differences are also exercised (the suite-wide
  * CodegenSuiteParitySpec covers the interpreted arm on the declared
  * queries). */
class BookSideStatsSpec extends SparkSpec {

  private val levelType = new StructType()
    .add("price_c", LongType).add("size_c", LongType)
  private val schema = new StructType()
    .add("id", LongType, nullable = false)
    .add("side", ArrayType(levelType, containsNull = true))

  private def lvl(p: java.lang.Long, s: java.lang.Long): Row = Row(p, s)

  private val cases: Seq[(Long, Seq[Row])] = Seq(
    1L -> Seq(lvl(10L, 5L), lvl(12L, 3L), lvl(12L, 7L), lvl(7L, 7L)), // tie at best
    2L -> Seq(lvl(10L, 5L)),                                          // singleton
    3L -> Seq.empty,                                                  // empty
    4L -> Seq(lvl(null, 4L), lvl(9L, null), lvl(9L, 2L)),             // null fields
    5L -> Seq(null, lvl(8L, 8L)),                                     // null element
    6L -> Seq(lvl(null, null), null),                                 // all degenerate
    7L -> Seq(lvl(5L, 9L), lvl(6L, 9L), lvl(4L, 9L)),                 // largest tie on size
    8L -> Seq(lvl(-3L, 1L), lvl(-1L, 2L), lvl(0L, 0L)),               // negatives
    9L -> Seq(lvl(7L, null), lvl(7L, null)))                          // best price, all-null sizes

  test("native book_side_stats equals the HOF chain on every edge case") {
    val rows = cases.map { case (id, side) => Row(id, side) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    for (isBid <- Seq(true, false)) {
      val native = df.select(col("id"),
        graft.plans.functions.book_side_stats(col("side"), isBid).as("s"))
        .selectExpr("id", "s.*").collect().sortBy(_.getLong(0)).toSeq
      val hof = df.select(col("id"),
        Book.hofSideStats(col("side"), isBid).as("s"))
        .selectExpr("id", "s.*").collect().sortBy(_.getLong(0)).toSeq
      assert(native == hof, s"isBid=$isBid:\n native=$native\n hof=$hof")
    }
  }

  test("summarize output columns and both-sides guard are unchanged") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(lvl(10L, 5L), lvl(12L, 3L)), Seq(lvl(20L, 2L), lvl(18L, 6L))),
        Row(2L, Seq.empty[Row], Seq(lvl(20L, 2L))))), // guard drops this row
      new StructType()
        .add("order_key", LongType, nullable = false)
        .add("bids", ArrayType(levelType, containsNull = true))
        .add("asks", ArrayType(levelType, containsNull = true)))
    val out = Book.summarize(df, Seq("order_key"))
    assert(out.columns.toSeq == Seq("order_key",
      "best_bid_price_c", "best_bid_size_c", "best_ask_price_c",
      "best_ask_size_c", "total_bid_volume_c", "total_ask_volume_c",
      "largest_bid_size_c", "largest_bid_price_c", "largest_ask_size_c",
      "largest_ask_price_c", "book_imbalance"))
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 12L && r.getLong(2) == 3L)  // best bid: max price
    assert(r.getLong(3) == 18L && r.getLong(4) == 6L)  // best ask: min price
    assert(r.getLong(5) == 8L && r.getLong(6) == 8L)   // volumes
    assert(r.getLong(7) == 5L && r.getLong(8) == 10L)  // largest bid
    assert(r.getLong(9) == 6L && r.getLong(10) == 18L) // largest ask
    assert(r.getDouble(11) == 0.0)                     // (8-8)/(8+8)
  }
}
