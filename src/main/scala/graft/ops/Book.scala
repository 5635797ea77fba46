package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Orderbook-summary aggregation (SURVEY.md A1–A5; reference
  * `producers/polymarket_ws_manager.py:55-110`).
  *
  * Input: one row per book event with `bids` / `asks` array columns of
  * `struct<price_c: long, size_c: long>` (integer cents — the engine-wide
  * convention for money: exact, order-independent arithmetic that a DuckDB
  * oracle reproduces bit-for-bit; see Norms.cents).
  *
  * Everything is computed with codegen'd higher-order functions over the
  * array columns — per-row, no shuffle, no UDF — so the operator
  * parallelizes embarrassingly across whatever partitioning the event
  * stream already has. At 100 TB this is a pure map stage.
  *
  * Semantics preserved from the reference:
  *  - summary emitted only when BOTH sides are non-empty (`:60`);
  *  - best = top-of-book (max bid price / min ask price — the reference
  *    takes `bids[0]`/`asks[0]` of an exchange-sorted book; we do not
  *    trust input ordering, per SURVEY A1);
  *  - largest = arg-max by size (`max(bids, key=size)`, `:76-84`);
  *  - imbalance = (bid_vol - ask_vol) / (bid_vol + ask_vol), 0 when the
  *    denominator is 0 (`:86-88`).
  *
  * Ties are broken deterministically (max size among best-price levels,
  * max price among largest-size levels) so results are stable under any
  * physical row / array order.
  */
object Book {

  private def pricesOf(side: Column): Column = transform(side, _.getField("price_c"))
  private def sizesOf(side: Column): Column  = transform(side, _.getField("size_c"))

  /** Σ size over one side — HOF aggregate, exact in longs (SURVEY A2). */
  def depth(side: Column): Column =
    aggregate(side, lit(0L), (acc, x) => acc + x.getField("size_c"))

  /** Price of the top-of-book level; `best` picks max (bids) or min (asks). */
  private def bestPrice(side: Column, isBid: Boolean): Column =
    if (isBid) array_max(pricesOf(side)) else array_min(pricesOf(side))

  /** Size at the top-of-book price (max size among tied levels). */
  private def bestSize(side: Column, isBid: Boolean): Column = {
    val bp = bestPrice(side, isBid)
    array_max(transform(filter(side, _.getField("price_c") === bp), _.getField("size_c")))
  }

  /** Arg-max by size (SURVEY A3): returns struct(size_c, price_c) of the
    * largest order; struct ordering = max by size then price. */
  private def largest(side: Column): Column =
    array_max(transform(side, x =>
      struct(x.getField("size_c").as("size_c"), x.getField("price_c").as("price_c"))))

  /** Guarded imbalance ratio in double (SURVEY A4). Division of two exact
    * longs is deterministic IEEE; rounded to 6 places for oracle parity. */
  def imbalance(bidVol: Column, askVol: Column): Column = {
    val total = bidVol + askVol
    when(total === 0L, lit(0.0))
      .otherwise(round((bidVol - askVol).cast("double") / total.cast("double"), 6))
  }

  /** The exact HOF formulation of one side's five summary fields — kept
    * as the executable spec the native kernel is equality-tested against
    * (BookSideStatsSpec); [[summarize]] no longer runs it. */
  private[graft] def hofSideStats(side: Column, isBid: Boolean): Column =
    struct(
      bestPrice(side, isBid).as("best_price_c"),
      bestSize(side, isBid).as("best_size_c"),
      depth(side).as("total_volume_c"),
      largest(side).getField("size_c").as("largest_size_c"),
      largest(side).getField("price_c").as("largest_price_c"))

  /** Full 13-field summary (SURVEY A5) appended to `keep` columns.
    * `bids`/`asks` must be `array<struct<price_c:long, size_c:long>>`.
    *
    * r21: each side's five fields come from ONE native pass
    * ([[graft.plans.BookUtil.sideStats]]) instead of ~8 interpreted HOF
    * walks of the same array per row — null semantics pinned to the HOF
    * chain by BookSideStatsSpec. The sides are STAGED in an inner
    * projection so each kernel runs once per row (CollapseProject will
    * not inline a non-cheap expression into multiple uses). */
  def summarize(df: DataFrame, keep: Seq[String]): DataFrame = {
    val staged = df
      .filter(size(col("bids")) > 0 && size(col("asks")) > 0) // both-sides guard (A5)
      .select(keep.map(col) ++ Seq(
        graft.plans.functions.book_side_stats(col("bids"), isBid = true).as("_b"),
        graft.plans.functions.book_side_stats(col("asks"), isBid = false).as("_a")): _*)
    staged.select(keep.map(col) ++ Seq(
      col("_b.best_price_c").as("best_bid_price_c"),
      col("_b.best_size_c").as("best_bid_size_c"),
      col("_a.best_price_c").as("best_ask_price_c"),
      col("_a.best_size_c").as("best_ask_size_c"),
      col("_b.total_volume_c").as("total_bid_volume_c"),
      col("_a.total_volume_c").as("total_ask_volume_c"),
      col("_b.largest_size_c").as("largest_bid_size_c"),
      col("_b.largest_price_c").as("largest_bid_price_c"),
      col("_a.largest_size_c").as("largest_ask_size_c"),
      col("_a.largest_price_c").as("largest_ask_price_c"),
      imbalance(col("_b.total_volume_c"), col("_a.total_volume_c"))
        .as("book_imbalance")): _*)
  }
}
