package graft.gold

import graft.SparkSpec
import graft.gold.Features.{ShareBuf, TopShareAgg}
import org.apache.spark.sql.functions._

/** D6 typed-Aggregator surface: algebraic laws the map-side combine
  * relies on, plus the Column form through a real grouped plan. */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("TopShareAgg merge is associative/commutative with zero as identity") {
    val a = ShareBuf(10L, 7L); val b = ShareBuf(5L, 5L); val c = ShareBuf(1L, 1L)
    assert(TopShareAgg.merge(a, TopShareAgg.zero) === a)
    assert(TopShareAgg.merge(TopShareAgg.zero, a) === a)
    assert(TopShareAgg.merge(a, b) === TopShareAgg.merge(b, a))
    assert(TopShareAgg.merge(TopShareAgg.merge(a, b), c) ===
      TopShareAgg.merge(a, TopShareAgg.merge(b, c)))
    // reduce ≡ merge with a singleton buffer
    assert(TopShareAgg.reduce(a, 9L) === TopShareAgg.merge(a, ShareBuf(9L, 9L)))
  }

  test("topShare through a grouped plan matches the direct ratio; zero total guarded") {
    val df = Seq(("a", 60L), ("a", 30L), ("a", 10L), ("b", 5L), ("z", 0L),
      ("neg", -10L), ("neg", -30L))
      .toDF("g", "bal_c")
    val out = df.groupBy("g").agg(Features.topShare(col("bal_c")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") === 0.6)
    assert(out("b") === 1.0)
    assert(out("z") === 0.0)     // guarded division
    assert(out("neg") === 0.25)  // all-negative group: true max is -10, not 0
  }
}
