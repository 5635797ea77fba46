package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** KMV sketch semantics: exact bottom-k-distinct determinism under any
  * partitioning, the estimator's exact-below-k / formula-at-k split,
  * and the set-operation estimates on planted disjoint/identical
  * groups. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // duplicates included on purpose: the sketch must be a DISTINCT set
  private def rows: Seq[(String, Long)] =
    (1L to 10L).map(("A", _)) ++ (1L to 10L).map(("A", _)) ++
      (6L to 15L).map(("B", _)) ++ (100L to 101L).map(("C", _)) ++
      (100L to 101L).map(("D", _))

  private def truthBottomK(ids: Seq[Long], k: Int): Seq[Long] =
    ids.distinct.map(_.toString).toDF("s")
      .select(graft.plans.functions.poly_hash(col("s")))
      .collect().map(_.getLong(0)).distinct.sorted.take(k)

  test("kmvDistinct: sketch = exact bottom-k distinct hashes, any partitioning; estimator split") {
    val p = graft.plans.HashUtil.P
    val wantA = truthBottomK(1L to 10L, 4)
    for (parts <- Seq(1, 7)) {
      val out = Sketches.kmvDistinct(rows.toDF("g", "k").repartition(parts),
          col("g"), col("k"), k = 4)
        .collect().map(r => r.getString(0) ->
          ((r.getSeq[Long](1), r.getLong(2), r.getDouble(3)))).toMap
      assert(out("A")._1 === wantA, s"parts=$parts: ${out("A")}")
      assert(out("A")._2 === 4L)
      // full sketch -> the (k-1)P/h_k formula on the known 4th value
      val expectEst = BigDecimal(3.0 * p / wantA(3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out("A")._3 === expectEst, s"got ${out("A")._3}")
      // below k -> the sketch IS the distinct set, estimate exact
      assert(out("C") === ((truthBottomK(Seq(100L, 101L), 4), 2L, 2.0)))
    }
  }

  test("kmvOverlap: disjoint pairs estimate zero; identical pairs the union; below-k overlaps exact") {
    // k = 16 exceeds every group's distinct count, so all sketches are
    // the exact sets and every estimate must be the exact answer
    val sk = Sketches.kmvDistinct(rows.toDF("g", "k"), col("g"), col("k"), k = 16)
    val out = Sketches.kmvOverlap(sk, k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(4), r.getDouble(5)))).toMap
    // A(1..10) vs C(100,101): disjoint -> est_inter 0, union exact 12
    assert(out(("A", "C")) === ((12.0, 0.0)), s"got ${out(("A", "C"))}")
    // C and D hold identical keys -> est_inter == est_union == 2
    assert(out(("C", "D")) === ((2.0, 2.0)), s"got ${out(("C", "D"))}")
    // A(1..10) vs B(6..15): |union| 15, |inter| 5 -> exact both
    assert(out(("A", "B")) === ((15.0, 5.0)), s"got ${out(("A", "B"))}")
  }

  test("mergeability: per-batch sketches fold to exactly the whole-corpus sketch") {
    val whole = Sketches.kmvDistinct(rows.toDF("g", "k"), col("g"), col("k"),
        k = 4).collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // three arbitrary batch cuts; merge rule = bottom-k of merged values
    val batches = rows.grouped(rows.size / 3 + 1).toSeq.map(b =>
      Sketches.kmvDistinct(b.toDF("g", "k"), col("g"), col("k"), k = 4)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap)
    val merged = batches.flatMap(_.toSeq).groupBy(_._1).view
      .mapValues(_.flatMap(_._2).distinct.sorted.take(4)).toMap
    assert(merged === whole, "sketch-of-union must equal union-of-sketches")
  }

  test("kmvDistinct plans a PARTIAL ObjectHashAggregate (map-side k-summaries before the exchange)") {
    val plan = Sketches.kmvDistinct(rows.toDF("g", "k"), col("g"), col("k"),
      k = 4).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(plan.contains("partial_kmv_sketch"),
      "the k*partitions-shuffle claim requires a partial mode: " + plan.take(500))
  }

  test("kmv_sketch is callable from SQL and skips nulls") {
    GraftBridge.registerFunctions(spark)
    Seq(Some(5L), Some(3L), None, Some(3L), Some(9L))
      .toDF("h").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT kmv_sketch(h, 2) FROM kmv_in")
      .head().getSeq[Long](0)
    assert(got === Seq(3L, 5L), s"got $got")
  }
}
