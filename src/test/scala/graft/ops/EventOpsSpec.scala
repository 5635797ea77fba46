package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** P2/P9/P10/P12/P13, A6, A7 (two-phase top-K), J2 (linear as-of). */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("demux routes known types and keeps raw payload for unknown (P12/P13)") {
    val df = Seq(("book", "raw1"), ("trade", "raw2"), ("mystery", "raw3"))
      .toDF("t", "raw")
    val (kind, detail) = EventOps.demux(df, col("t"),
      Seq("book" -> lit("B"), "trade" -> lit("T")), rawCol = col("raw"))
    val out = df.select(kind.as("k"), detail.as("d")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("book", "B"), ("trade", "T"), ("unknown", "raw3")))
  }

  test("outcome decode and zero/negative balance filter (P9/P10 fixtures)") {
    val df = Seq((0, 10L), (1, 0L), (0, -5L), (1, 7L)).toDF("idx", "bal")
    val kept = EventOps.positiveBalance(df, col("bal"))
      .select(EventOps.outcomeDecode(col("idx")).as("o"), col("bal"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(kept.toSeq === Seq(("YES", 10L), ("NO", 7L)))
  }

  test("throttle keeps the latest row per (key, bucket) (P2 last-value-wins)") {
    val df = Seq(
      (1L, "2026-01-01 00:00:10", 100L), (1L, "2026-01-01 00:00:50", 200L),
      (1L, "2026-01-01 00:01:05", 300L), (2L, "2026-01-01 00:00:30", 400L))
      .toDF("k", "s", "v").withColumn("ts", to_timestamp(col("s")))
    val out = EventOps.throttle(df, Seq(col("k")),
      window(col("ts"), "1 minute").getField("start").as("w"),
      Seq(col("ts")), Seq("v" -> col("v")))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 200L), (1L, 300L), (2L, 400L)))
  }

  test("explodeSide multiplicity: one row per kept element, only kept side (A6)") {
    val df = Seq((1L, Seq(("BUY", 10L), ("SELL", 20L), ("BUY", 30L)))).toDF("k", "cs")
      .select(col("k"),
        expr("transform(cs, x -> struct(x._1 AS side, x._2 AS size_c))").as("changes"))
    val out = PriceChanges.explodeSide(df, col("changes"), "BUY", Seq(col("k")))
      .select(col("c.size_c")).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(10L, 30L))
  }

  test("property: two-phase TopK ⊆ input, |topK| ≤ K, matches single-window reference") {
    val gen = Gen.listOfN(200,
      Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 1000000L)))
    val data = gen.sample.get.zipWithIndex.map { case ((g, v, u), i) => (g, v, u + i) }
    val df = data.toDF("g", "v", "u")
    val k = 7
    val got = TopK.perGroup(df, Seq(col("g")), Seq(col("v").desc, col("u")), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // reference model: plain scala sort per group
    val want = data.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy { case (_, v, u) => (-v, u) }.take(k)
    }.toSet
    assert(got.length <= 2 * k)
    assert(got.toSet === want)
  }

  test("AsOf.join picks the latest build row at or before each probe ts (J2)") {
    val probe = Seq((100L, 1L, "2026-01-10 00:00:00"), (101L, 1L, "2026-01-20 00:00:00"),
        (102L, 2L, "2026-01-05 00:00:00"))
      .toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val build = Seq((1L, 11L, "2026-01-10 00:00:00"), (1L, 10L, "2026-01-01 00:00:00"),
        (1L, 12L, "2026-01-15 00:00:00"), (2L, 20L, "2026-02-01 00:00:00"))
      .toDF("user_id", "o_orderkey", "s")
      .withColumn("o_orderdate", to_timestamp(col("s"))).drop("s")
    val out = AsOf.join(probe, build, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey"), Seq("o_orderkey"))
      .select("event_id", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // event 100: order 11 matches exactly at ts (inclusive); event 101: latest
    // earlier is 12; event 102: user 2's only order is later → dropped
    assert(out === Map(100L -> 11L, 101L -> 12L))
  }

  test("property: RangeJoin.binned ≡ theta-join model on sampled overlapping intervals") {
    val pts = org.scalacheck.Gen.listOfN(80,
      org.scalacheck.Gen.chooseNum(0L, 20000L)).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val ivs = org.scalacheck.Gen.listOfN(25,
      org.scalacheck.Gen.zip(org.scalacheck.Gen.chooseNum(0L, 18000L),
        org.scalacheck.Gen.chooseNum(1L, 4000L))).sample.get.zipWithIndex
      .map { case ((lo, len), i) => (100L + i, lo, lo + len) }
    val p = pts.toDF("pid", "tl").withColumn("ts", timestamp_seconds(col("tl"))).drop("tl")
    val iv = ivs.toDF("iid", "ll", "hl")
      .withColumn("lo", timestamp_seconds(col("ll")))
      .withColumn("hi", timestamp_seconds(col("hl"))).drop("ll", "hl")
    val got = RangeJoin.binned(p, col("ts"), iv, col("lo"), col("hi"), binSeconds = 900L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (pid, t) <- pts
      (iid, lo, hi) <- ivs
      if t >= lo && t < hi
    } yield (pid, iid)).toSet
    assert(got === want)
  }
}
