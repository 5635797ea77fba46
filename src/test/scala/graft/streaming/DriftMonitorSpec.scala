package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming drift alerts: a same-mix batch scores ~0 TVD against the
  * reference, a shifted batch scores the exact planted distance, and
  * replayed batches land idempotently. */
class DriftMonitorSpec extends SparkSpec {

  private def v(region: Int): Seq[Float] =
    if (region == 0) Seq(1f, 0f, 0f, 0f) else Seq(0f, 1f, 0f, 0f)

  test("per-batch TVD vs the reference snapshot; shifted mix flags exactly; replay idempotent") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // reference: regions 50/50; cells pinned to its first two vectors
    val reference = Seq(0L, 1L, 2L, 3L).zip(Seq(0, 1, 0, 1).map(v))
      .toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_drift").toString
    val mon = DriftMonitor.create(dir, reference, nCells = 2)
    val in = MemoryStream[Vec]
    val q = in.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        mon.ingest(b, id))
      .start()
    try {
      // batch 0: same 50/50 mix -> tvd 0; batch 1: all region 0 -> 0.5
      in.addData(Seq(Vec(10L, v(0)), Vec(11L, v(1)), Vec(12L, v(0)),
        Vec(13L, v(1))))
      q.processAllAvailable()
      in.addData(Seq(Vec(20L, v(0)), Vec(21L, v(0)), Vec(22L, v(0)),
        Vec(23L, v(0))))
      q.processAllAvailable()
    } finally q.stop()
    val hist = mon.history(spark).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(hist === Map(0L -> ((0.0, 4L)), 1L -> ((0.5, 4L))), s"got $hist")
    // replaying batch 1 overwrites its slot, not a new row
    val replay = Seq((20L, v(0)), (21L, v(0)), (22L, v(0)), (23L, v(0)))
      .toDF("vec_id", "embedding")
    mon.ingest(replay, 1L)
    assert(mon.history(spark).count() === 2)
  }
}
