package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** P7/P8: winner derivation totality + float-equality semantics. */
class ResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("winner cases: exact 1.0 decides, anything else Unknown") {
    val df = Seq((1.0, 0.0), (0.0, 1.0), (0.999999, 0.000001), (1.0, 1.0))
      .toDF("no", "yes")
    val out = df.select(Resolution.winner(col("no"), col("yes")).as("w"))
      .collect().map(_.getString(0))
    // (1,1) is Down because the no-price branch is checked first, matching
    // the reference's if/elif order (market_resolution.py:84-90)
    assert(out.toSeq === Seq("Down", "Up", "Unknown", "Down"))
  }

  test("property: winner is total (never null) over sampled price pairs") {
    val prices = Gen.oneOf(Gen.chooseNum(0.0, 1.0), Gen.oneOf(0.0, 1.0))
    val pairs = Gen.listOfN(60, Gen.zip(prices, prices)).sample.get
    val out = pairs.toDF("no", "yes")
      .select(Resolution.winner(col("no"), col("yes")).as("w")).collect()
    out.foreach(r => assert(Set("Down", "Up", "Unknown").contains(r.getString(0))))
  }

  test("resolvedGate keeps only closed AND uma-resolved rows (P8)") {
    val df = Seq((true, "resolved"), (true, "pending"), (false, "resolved"))
      .toDF("closed", "status")
    assert(Resolution.resolvedGate(df, col("closed"), col("status")).count() === 1)
  }
}
