package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Salted-join equivalence + as-of model check on sampled data. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("property: saltedJoin ≡ plain join on sampled skewed data") {
    // heavy skew: 80% of rows on one key
    val keyGen = Gen.frequency(8 -> Gen.const(1L), 2 -> Gen.chooseNum(2L, 20L))
    val rows = Gen.listOfN(300, Gen.zip(keyGen, Gen.chooseNum(0L, 1000L)))
      .sample.get.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
    val big = rows.toDF("k", "v", "row_id")
    val dim = (1L to 20L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = Skew.saltedJoin(big, dim, "k", col("row_id"), nSalts = 5)
      .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = big.join(dim, "k")
      .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(salted.size === 300) // every row matched some dim key
  }

  test("sketchSaltedJoin ≡ plain join: hot path, uniform (no-candidate) path, row-order immune") {
    // heavy skew: 80% of rows on key 1 — far above N/(k+1) for k = 4
    val keyGen = Gen.frequency(8 -> Gen.const(1L), 2 -> Gen.chooseNum(2L, 20L))
    val rows = Gen.listOfN(300, Gen.zip(keyGen, Gen.chooseNum(0L, 1000L)))
      .sample.get.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
    val big = rows.toDF("k", "v", "row_id")
    val dim = (1L to 20L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(dim, "k")
      .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (parts <- Seq(1, 7)) {
      val got = Skew.sketchSaltedJoin(big.repartition(parts), dim, "k",
          col("row_id"), nSalts = 5, k = 4)
        .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === plain, s"parts=$parts")
    }
    // 300 distinct keys, one row each: no key can clear N/(k+1) in the
    // exact counts, and whatever survivor candidates MG reports only
    // move rows to the (equivalent) salted branch — result unchanged
    val uniform = (1L to 300L).map(k => (k, k, k)).toDF("k", "v", "row_id")
    val uDim = (1L to 300L).map(k => (k, s"d$k")).toDF("k", "name")
    val uGot = Skew.sketchSaltedJoin(uniform, uDim, "k", col("row_id"),
        nSalts = 5, k = 4)
      .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val uPlain = uniform.join(uDim, "k")
      .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(uGot === uPlain)
  }

  test("property: AsOf.join matches the brute-force model on sampled data") {
    val probes = Gen.listOfN(40, Gen.chooseNum(0L, 100L)).sample.get
      .zipWithIndex.map { case (t, i) => (i.toLong, 1L, t) }
    val builds = Gen.listOfN(15, Gen.chooseNum(0L, 100L)).sample.get
      .zipWithIndex.map { case (t, i) => (1L, 100L + i, t) }
    val p = probes.toDF("event_id", "user_id", "tl")
      .withColumn("ts", timestamp_seconds(col("tl"))).drop("tl")
    val b = builds.toDF("user_id", "o_orderkey", "tl")
      .withColumn("o_orderdate", timestamp_seconds(col("tl"))).drop("tl")
    val got = AsOf.join(p, b, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey"), Seq("o_orderkey"))
      .select("event_id", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = probes.flatMap { case (eid, _, t) =>
      val elig = builds.filter(_._3 <= t)
      if (elig.isEmpty) None
      else Some(eid -> elig.maxBy(x => (x._3, x._2))._2)
    }.toMap
    assert(got === want)
  }
}
