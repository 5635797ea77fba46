package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class QRow(id: Long, v: String, fk: Option[Long])

/** Streaming dbt-test battery: a clean batch passes all four, a broken
  * batch localizes each violation class to its batch, replay is
  * idempotent, and totals carry the first failing batch. */
class QualityMonitorSpec extends SparkSpec {

  test("per-batch contract verdicts; first-failed-batch triage; replay idempotent") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val parent = Seq(Tuple1(10L), Tuple1(11L)).toDF("pk")
    val dir = Files.createTempDirectory("graft_quality").toString
    val mon = QualityMonitor.create(dir, parent, Seq("a", "b"))
    val in = MemoryStream[QRow]
    val q = in.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        mon.ingest(b, id, col("id"), col("v"), col("fk"), col("v")))
      .start()
    try {
      // batch 0: clean
      in.addData(Seq(QRow(1L, "a", Some(10L)), QRow(2L, "b", Some(11L))))
      q.processAllAvailable()
      // batch 1: dup id, null v, orphan fk 99, bad value "z"
      in.addData(Seq(QRow(3L, "a", Some(10L)), QRow(3L, "a", Some(10L)),
        QRow(4L, null, Some(99L)), QRow(5L, "z", Some(10L))))
      q.processAllAvailable()
    } finally q.stop()

    val hist = mon.history(spark).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(hist === Map(
      (0L, "unique") -> 0L, (0L, "not_null") -> 0L,
      (0L, "relationships") -> 0L, (0L, "accepted_values") -> 0L,
      (1L, "unique") -> 1L, (1L, "not_null") -> 1L,
      (1L, "relationships") -> 1L, (1L, "accepted_values") -> 1L))

    val tot = mon.totals(spark).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(tot("unique") === ((1L, false, Some(1L))))
    assert(tot("relationships") === ((1L, false, Some(1L))))

    // replaying batch 1 overwrites its slot — totals unchanged
    import s.implicits._
    mon.ingest(Seq(QRow(3L, "a", Some(10L)), QRow(3L, "a", Some(10L)),
        QRow(4L, null, Some(99L)), QRow(5L, "z", Some(10L))).toDF(),
      1L, col("id"), col("v"), col("fk"), col("v"))
    assert(mon.history(spark).count() === 8)
  }
}
