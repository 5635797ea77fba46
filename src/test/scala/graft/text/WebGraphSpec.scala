package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank-lite semantics on a hand-computed 3-host graph:
  * exact truncating updates, dangling-mass drop, damping 17/20. */
class WebGraphSpec extends SparkSpec {
  import spark.implicits._

  // A -> B, A -> C, B -> A; C dangling. scale 2000 over 3 hosts:
  // base = 666. Each round: A splits r evenly (tw 2), B forwards r
  // whole, C's mass is dropped.
  //   r1 = (17·in + 3·666) div 20: A (in 666) = 666, B (in 333) = 382, C 382
  //   r2: A (in 382) = 424, B (in 333) = 382, C 382
  //   r3: A (in 382) = 424, B (in 212) = 280, C 280
  private val hosts = Seq("A", "B", "C").toDF("host")
  private val edges = Seq(("A", "B", 1L), ("A", "C", 1L), ("B", "A", 1L))
    .toDF("src", "dst", "w")

  test("hostRank: hand-computed 3-round integer iteration with a dangling host") {
    val out = WebGraph.hostRank(hosts, edges, iters = 3, scale = 2000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    spark.catalog.clearCache()
    assert(out === Map("A" -> ((424L, 0.212)), "B" -> ((280L, 0.14)),
      "C" -> ((280L, 0.14))), s"got $out")
  }

  test("hostRank: iters 0 is the uniform base; duplicate edge rows sum") {
    val base = WebGraph.hostRank(hosts, edges, iters = 0, scale = 2000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base === Map("A" -> 666L, "B" -> 666L, "C" -> 666L))
    // (A->B, 1) twice must equal (A->B, 2) once
    val dup = Seq(("A", "B", 1L), ("A", "B", 1L), ("A", "C", 2L),
      ("B", "A", 2L)).toDF("src", "dst", "w")
    val merged = Seq(("A", "B", 2L), ("A", "C", 2L), ("B", "A", 2L))
      .toDF("src", "dst", "w")
    val a = WebGraph.hostRank(hosts, dup, iters = 2, scale = 2000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = WebGraph.hostRank(hosts, merged, iters = 2, scale = 2000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(a === b, s"duplicate-pair rows must aggregate: $a vs $b")
  }

  test("driver-local replay equals the distributed loop bit-for-bit") {
    // a denser graph with weights, an out-of-universe src (dropped by
    // the equi-join on both paths) and an in-edge from a dangling host
    val hosts2 = Seq("A", "B", "C", "D", "E").toDF("host")
    val edges2 = Seq(
      ("A", "B", 3L), ("A", "C", 1L), ("B", "A", 2L), ("C", "D", 5L),
      ("D", "A", 1L), ("D", "B", 1L), ("E", "A", 4L), ("Z", "A", 7L))
      .toDF("src", "dst", "w")
    def run(threshold: Long) = {
      val rows = WebGraph.hostRankAt(hosts2, edges2, iters = 4,
          scale = 99991L, localThreshold = threshold)
        .collect().map(_.toString).sorted.toSeq
      spark.catalog.clearCache()
      rows
    }
    val local = run(Long.MaxValue)
    val dist = run(-1L)
    assert(local == dist, s"\n local=$local\n dist =$dist")
  }
}
