package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the cap-before-collect contract of [[CappedCollectList]]
  * (the r21 bucket-cap collector): under-limit groups collect
  * COMPLETELY (bit-identical to collect_list), over-limit groups are
  * truncated at exactly the limit — never more, at any partitioning —
  * so the caller's size filter drops them before truncated content
  * can reach an output. */
class CappedCollectListSpec extends SparkSpec {
  import spark.implicits._

  private def capped(limit: Int) =
    functions.capped_collect(col("v"), limit)

  test("under-limit groups equal collect_list exactly (set semantics)") {
    // many partitions so merge() runs, not just update()
    val df = spark.sparkContext
      .parallelize((1 to 400).map(i => (i % 40, i.toLong)), 16)
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sort_array(collect_list(col("v"))).as("ids"))
    val cap = df.groupBy("k").agg(sort_array(capped(11)).as("ids"))
    val a = plain.orderBy("k").collect().map(_.toString).toSeq
    val b = cap.orderBy("k").collect().map(_.toString).toSeq
    assert(a == b, "groups of 10 under a limit of 11 must collect completely")
  }

  test("over-limit groups truncate at exactly the limit, every partitioning") {
    for (parts <- Seq(1, 3, 16)) {
      val df = spark.sparkContext
        .parallelize((1 to 300).map(i => (i % 3, i.toLong)), parts)
        .toDF("k", "v")
      val sizes = df.groupBy("k").agg(size(capped(7)).as("n"))
        .collect().map(_.getInt(1)).toSeq
      assert(sizes == Seq(7, 7, 7),
        s"groups of 100 at limit 7 must emit exactly 7 elements ($parts parts): $sizes")
    }
  }

  test("collected elements are real group members; nulls skipped") {
    val df = Seq((1, Option(5L)), (1, None), (1, Option(9L)), (2, Option(3L)))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(sort_array(capped(10)).as("ids"))
      .orderBy("k").collect()
    assert(out(0).getSeq[Long](1) == Seq(5L, 9L), "null skipped like collect_list")
    assert(out(1).getSeq[Long](1) == Seq(3L))
  }

  test("struct payloads collect under the cap (the banded-pairs shape)") {
    val df = Seq((1, 10L, Array(1L, 2L)), (1, 11L, Array(3L, 4L)),
      (2, 20L, Array(5L, 6L))).toDF("k", "doc_id", "bands")
    val out = df.groupBy("k")
      .agg(size(functions.capped_collect(
        struct(col("doc_id"), col("bands")), 5)).as("n"))
      .orderBy("k").collect().map(_.getInt(1)).toSeq
    assert(out == Seq(2, 1))
  }
}
