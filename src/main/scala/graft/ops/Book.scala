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

  /** Full 13-field summary (SURVEY A5) appended to `keep` columns.
    * `bids`/`asks` must be `array<struct<price_c:long, size_c:long>>`. */
  def summarize(df: DataFrame, keep: Seq[String]): DataFrame = {
    val bids = col("bids")
    val asks = col("asks")
    val bidVol = depth(bids)
    val askVol = depth(asks)
    df.filter(size(bids) > 0 && size(asks) > 0) // both-sides guard (A5)
      .select(keep.map(col) ++ Seq(
        bestPrice(bids, isBid = true).as("best_bid_price_c"),
        bestSize(bids, isBid = true).as("best_bid_size_c"),
        bestPrice(asks, isBid = false).as("best_ask_price_c"),
        bestSize(asks, isBid = false).as("best_ask_size_c"),
        bidVol.as("total_bid_volume_c"),
        askVol.as("total_ask_volume_c"),
        largest(bids).getField("size_c").as("largest_bid_size_c"),
        largest(bids).getField("price_c").as("largest_bid_price_c"),
        largest(asks).getField("size_c").as("largest_ask_size_c"),
        largest(asks).getField("price_c").as("largest_ask_price_c"),
        imbalance(bidVol, askVol).as("book_imbalance")): _*)
  }
}
