package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gold-layer ML feature operators (SURVEY.md D6; the reference documents
  * these as planned: price momentum/volatility, orderbook imbalance
  * signals, whale position changes, participant concentration —
  * reference `README.md:225-229`).
  *
  * Numeric discipline: inputs are integer cents (exact longs); doubles
  * appear only in final, fixed-shape expressions (one deterministic IEEE
  * evaluation), so results are reproducible across partitionings and
  * engines. Variance uses the sum/sum-of-squares decomposition — a single
  * map-side-combinable aggregation instead of a two-pass mean/deviation.
  *
  * Every window partitions by a key (user, market, event_type): at 100 TB
  * that is one shuffle on the key, and within-partition sorting —
  * no global sort anywhere.
  */
object Features {

  /** D6 momentum: per-key delta vs previous row + trailing moving average
    * over `maRows` rows. Ordering must be made total by the caller
    * (e.g. (ts, event_id)) or lag() is nondeterministic. */
  def momentum(df: DataFrame, keys: Seq[Column], ord: Seq[Column],
               valueC: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
    val wm = w.rowsBetween(-4, 0)
    df.withColumn("delta_c", valueC - lag(valueC, 1).over(w))
      .withColumn("ma5",
        round(sum(valueC).over(wm).cast(DoubleType) / count(lit(1)).over(wm), 4))
  }

  /** D6 volatility: per-group sample variance via exact integer
    * sum / sum-of-squares (decimal accumulator: overflow-proof), finished
    * in one deterministic double expression. */
  def volatility(df: DataFrame, keys: Seq[Column], valueC: Column): DataFrame = {
    val d = valueC.cast(DecimalType(38, 0))
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(d).as("s1"),
        sum(d * d).as("s2"))
      .filter(col("n") > 1)
      .withColumn("variance_c2", round(
        (col("s2").cast(DoubleType)
          - col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / col("n"))
          / (col("n") - 1), 4))
      .drop("s1", "s2")
  }

  /** D6 whale deltas: balance change per key between consecutive
    * snapshots, kept when |delta| >= thresholdC (reference whale
    * threshold $1,000 = 100,000 cents, `README.md:143-147`). */
  def whaleDeltas(df: DataFrame, keys: Seq[Column], snapOrd: Seq[Column],
                  balC: Column, thresholdC: Long): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(snapOrd: _*)
    df.withColumn("delta_c", balC - lag(balC, 1).over(w))
      .filter(abs(col("delta_c")) >= thresholdC)
  }

  /** D6 concentration: Herfindahl–Hirschman index per group over member
    * balances: sum((bal/total)^2) = sum(bal^2)/total^2, both sums exact
    * (decimal for the squares), one double division at the end. */
  def hhi(df: DataFrame, keys: Seq[Column], balC: Column): DataFrame = {
    val d = balC.cast(DecimalType(19, 0))
    df.groupBy(keys: _*)
      .agg(sum(balC).as("total_c"), sum(d * d).as("_s2"),
        count(lit(1)).as("participants"))
      .withColumn("hhi", round(
        col("_s2").cast(DoubleType)
          / (col("total_c").cast(DoubleType) * col("total_c").cast(DoubleType)), 8))
      .drop("_s2")
  }

  /** D6 EWMA: exponentially weighted moving average of each key's last
    * `window` observations (α-weighted, recursive — NOT expressible as a
    * combinable aggregate). Deterministic everywhere: observations sort
    * totally on `ord`, the fold runs left-to-right seeded with the first
    * element (≡ DuckDB list_reduce), doubles only in the fixed-shape
    * fold. Scale: per-key state is BOUNDED inside the operator — rows are
    * pre-truncated to the trailing `window` per key with a rank limit
    * (map-side WindowGroupLimit below the exchange), so a hot key with
    * unbounded history ships at most `window` rows into the collect; the
    * collect buffer is then ≤ `window` elements by construction. `ord`
    * must be a total order per key (e.g. (ts, event_id)) and null-free,
    * or the trailing-row selection is nondeterministic. */
  def ewma(df: DataFrame, keys: Seq[Column], ord: Seq[Column], valueC: Column,
           window: Int = 20, alpha: Double = 0.2): DataFrame = {
    val obs = struct(ord :+ valueC.cast(DoubleType).as("_v"): _*)
    // trailing `window` = top-`window` by DESCENDING order; the optimizer
    // rewrites row_number + (<= k) to WindowGroupLimit with a partial pass
    // below the shuffle, so each map task forwards at most `window` rows
    // per key it sees
    val trimmed = graft.ops.TopK.perGroup(df, keys, ord.map(_.desc), window)
    trimmed.groupBy(keys: _*)
      .agg(transform(sort_array(collect_list(obs)), _.getField("_v")).as("_l"))
      .withColumn("_lw", slice(col("_l"),
        greatest(size(col("_l")) - (window - 1), lit(1)), lit(window)))
      .withColumn("n_obs", size(col("_lw")).cast(LongType))
      .withColumn("ewma", round(
        aggregate(slice(col("_lw"), 2, window), element_at(col("_lw"), 1),
          (acc, x) => lit(alpha) * x + lit(1 - alpha) * acc), 6))
      .drop("_l", "_lw")
  }

  /** Accumulator for [[TopShareAgg]]: exact long total + running max. */
  final case class ShareBuf(total: Long, maxBal: Long)

  /** D6 concentration as a typed `Aggregator` (SURVEY §2.10's one
    * named UDAF candidate): the largest single holder's share of the
    * group total. Buffer is two exact longs — associative, commutative,
    * map-side combinable (Spark plans partial_topshareagg below the
    * exchange like any builtin agg); the only double op is one final
    * division, so results are partition-order independent. */
  object TopShareAgg extends org.apache.spark.sql.expressions.Aggregator[Long, ShareBuf, Double] {
    // maxBal identity is MinValue (not 0) so all-negative groups still
    // report their true largest holder
    override def zero: ShareBuf = ShareBuf(0L, Long.MinValue)
    override def reduce(b: ShareBuf, balC: Long): ShareBuf =
      ShareBuf(b.total + balC, math.max(b.maxBal, balC))
    override def merge(a: ShareBuf, b: ShareBuf): ShareBuf =
      ShareBuf(a.total + b.total, math.max(a.maxBal, b.maxBal))
    // no rounding here: callers apply Spark's round() (proven oracle
    // parity with DuckDB's); the division itself is one IEEE op on
    // exact longs, partition-order independent.
    // CONVENTION: a zero total (empty group or mixed signs summing to 0)
    // yields 0.0, NOT the ±Infinity that raw max/sum division would give
    // — "share of nothing" is defined as no concentration. The f06
    // oracle SQL encodes the same CASE so both sides state it.
    override def finish(b: ShareBuf): Double =
      if (b.total == 0L || b.maxBal == Long.MinValue) 0.0
      else b.maxBal.toDouble / b.total.toDouble
    override def bufferEncoder = org.apache.spark.sql.Encoders.product[ShareBuf]
    override def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Column form of [[TopShareAgg]] via `udaf()`. */
  val topShare: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(TopShareAgg)
}
