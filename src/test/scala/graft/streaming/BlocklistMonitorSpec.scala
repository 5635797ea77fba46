package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class BDoc(doc_id: Long, text: String)

/** Streaming blocklist pressure: per-batch per-pattern exact counts,
  * null-safe text, mergeable totals, replay idempotency. */
class BlocklistMonitorSpec extends SparkSpec {

  test("per-batch pattern rates; exact stream totals; replay idempotent") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val dir = Files.createTempDirectory("graft_blocklist").toString
    val mon = BlocklistMonitor.create(dir, Seq("he", "she"))
    val in = MemoryStream[BDoc]
    val q = in.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        mon.ingest(b, id, col("text")))
      .start()
    try {
      // batch 0: "ushers"(he 1, she 1), "clean"(0), null(0)
      in.addData(Seq(BDoc(1L, "ushers"), BDoc(2L, "clean"), BDoc(3L, null)))
      q.processAllAvailable()
      // batch 1: "she said he"(he 2, she 1), "hehe"(he 2)
      in.addData(Seq(BDoc(4L, "she said he"), BDoc(5L, "hehe")))
      q.processAllAvailable()
    } finally q.stop()

    val hist = mon.history(spark).collect().map(r =>
      (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(hist === Map(
      (0L, "he") -> ((1L, 1L, 0.333333)),
      (0L, "she") -> ((1L, 1L, 0.333333)),
      (1L, "he") -> ((2L, 4L, 1.0)),
      (1L, "she") -> ((1L, 1L, 0.5))), s"got $hist")

    val tot = mon.totals(spark).collect().map(r =>
      (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(tot === Set(
      (Some("he"), 3L, 5L), (Some("she"), 2L, 2L),
      (None, 5L, 5L))) // doc-marker row: 5 docs total

    // replaying batch 1 overwrites its slot — totals unchanged
    mon.ingest(Seq(BDoc(4L, "she said he"), BDoc(5L, "hehe")).toDF(), 1L,
      col("text"))
    assert(mon.totals(spark).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet === tot)
  }
}
