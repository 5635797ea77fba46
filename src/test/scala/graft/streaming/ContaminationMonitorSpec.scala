package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class CDoc(doc_id: Long, text: String)

/** Streaming contamination pressure: per-batch longest-run summaries
  * via the x119 suffix automaton, triage totals, replay idempotency. */
class ContaminationMonitorSpec extends SparkSpec {

  test("per-batch contamination pressure; first-contaminated triage; replay idempotent") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val dir = Files.createTempDirectory("graft_contam").toString
    val bench = Seq(Tuple1("the quick brown fox jumps over the lazy dog every single day"))
      .toDF("text")
    val mon = ContaminationMonitor.create(dir, bench, col("text"), minRun = 4L)
    val in = MemoryStream[CDoc]
    val q = in.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        mon.ingest(b, id, col("text")))
      .start()
    try {
      // batch 0: clean (max shared run 1-2 tokens), incl. a null text
      in.addData(Seq(CDoc(1L, "completely unrelated content here"),
        CDoc(2L, "the dog barked at the mailman"), CDoc(3L, null)))
      q.processAllAvailable()
      // batch 1: one 5-token quote (contaminated) + one 9-token verbatim
      // block (>= 2*minRun) + one clean doc
      in.addData(Seq(
        CDoc(4L, "he wrote quick brown fox jumps over and left"),
        CDoc(5L, "quote: the quick brown fox jumps over the lazy dog unquote"),
        CDoc(6L, "nothing shared at all")))
      q.processAllAvailable()
    } finally q.stop()

    val hist = mon.history(spark).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // batch 0: "the dog" is NOT contiguous in the benchmark ("the lazy
    // dog"), so the max shared run is single tokens
    assert(hist(0L) === ((3L, 0L, 0L, 1L)), s"batch 0 must be clean: $hist")
    // batch 1: doc 4 shares the 5-run "quick brown fox jumps over";
    // doc 5 quotes the 9-run "the quick ... lazy dog" (>= 2*minRun)
    assert(hist(1L) === ((3L, 2L, 1L, 9L)), s"batch 1 pressure wrong: $hist")

    val tot = mon.totals(spark).head()
    assert(tot.getAs[Long]("n_docs") === 6L)
    assert(tot.getAs[Long]("n_contaminated") === 2L)
    assert(tot.getAs[Long]("n_verbatim") === 1L)
    assert(tot.getAs[Long]("max_run") === 9L)
    assert(tot.getAs[Long]("first_contaminated_batch") === 1L)

    // replay of batch 1 (redelivery after a crash) lands idempotently
    val replay = Seq(
      CDoc(4L, "he wrote quick brown fox jumps over and left"),
      CDoc(5L, "quote: the quick brown fox jumps over the lazy dog unquote"),
      CDoc(6L, "nothing shared at all")).toDF()
    mon.ingest(replay, 1L, col("text"))
    assert(mon.totals(spark).head().getAs[Long]("n_contaminated") === 2L,
      "replayed batch must replace its slot, not double-count")
  }
}
