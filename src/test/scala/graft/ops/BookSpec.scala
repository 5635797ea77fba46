package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalacheck.Gen

/** A1-A5 fixtures from FIXTURES.md: empty books, one-sided books,
  * tied levels, plus a sampled property: imbalance ∈ [-1, 1]. */
class BookSpec extends SparkSpec {
  import spark.implicits._

  private def mk(bids: Seq[(Long, Long)], asks: Seq[(Long, Long)]) =
    Seq((1L, bids, asks)).toDF("order_key", "b", "a")
      .select(col("order_key"),
        expr("transform(b, x -> struct(x._1 AS price_c, x._2 AS size_c))").as("bids"),
        expr("transform(a, x -> struct(x._1 AS price_c, x._2 AS size_c))").as("asks"))

  test("empty book sides are gated out (both-sides guard, ws_manager.py:60)") {
    assert(Book.summarize(mk(Seq((100L, 5L)), Seq.empty), Seq("order_key")).count() === 0)
    assert(Book.summarize(mk(Seq.empty, Seq((100L, 5L))), Seq("order_key")).count() === 0)
    assert(Book.summarize(mk(Seq.empty, Seq.empty), Seq("order_key")).count() === 0)
  }

  test("best bid = max price, best ask = min price, sizes at that level") {
    val r = Book.summarize(
      mk(Seq((100L, 5L), (102L, 7L), (101L, 9L)),
         Seq((110L, 4L), (108L, 6L), (109L, 8L))), Seq("order_key")).head()
    assert(r.getAs[Long]("best_bid_price_c") === 102L)
    assert(r.getAs[Long]("best_bid_size_c") === 7L)
    assert(r.getAs[Long]("best_ask_price_c") === 108L)
    assert(r.getAs[Long]("best_ask_size_c") === 6L)
  }

  test("largest order is arg-max by size carrying its price") {
    val r = Book.summarize(
      mk(Seq((100L, 5L), (95L, 50L)), Seq((110L, 4L), (120L, 40L))), Seq("order_key")).head()
    assert(r.getAs[Long]("largest_bid_size_c") === 50L)
    assert(r.getAs[Long]("largest_bid_price_c") === 95L)
    assert(r.getAs[Long]("largest_ask_size_c") === 40L)
    assert(r.getAs[Long]("largest_ask_price_c") === 120L)
  }

  test("imbalance: +1 all-bid, -1 all-ask, 0 guarded on zero total") {
    val df = Seq((10L, 0L), (0L, 10L), (0L, 0L), (6L, 4L)).toDF("b", "a")
      .select(Book.imbalance(col("b"), col("a")).as("i"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(1.0, -1.0, 0.0, 0.2))
  }

  test("property: imbalance stays within [-1, 1] on sampled volumes") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(0L, 1000000L)))
    val vols = gen.sample.get
    val rows = vols.toDF("b", "a").select(Book.imbalance(col("b"), col("a"))).collect()
    rows.foreach { case Row(d: Double) => assert(d >= -1.0 && d <= 1.0) }
  }
}
