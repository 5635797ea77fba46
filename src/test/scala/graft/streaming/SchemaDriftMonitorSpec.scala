package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

final case class Env(id: Long, payload: String)

/** Schema-drift monitor: collapse semantics (trips when a declared key
  * STOPS arriving, not when it never arrived), novel-key first-arrival,
  * malformed-payload accounting, replay idempotence, recovery. */
class SchemaDriftMonitorSpec extends SparkSpec {

  private def batchDf(payloads: String*) = {
    val s = spark
    import s.implicits._
    payloads.zipWithIndex.map { case (p, i) => Env(i.toLong, p) }.toDF()
  }

  test("collapse rule: drift batch pinned; never-arrived key stays null; novel key surfaces") {
    val dir = Files.createTempDirectory("graft_sdm").toString
    val m = SchemaDriftMonitor.create(dir,
      expectedKeys = Seq("event_type", "value", "ghost"))
    // batch 0-1: healthy producer ('ghost' never arrives — config bug,
    // not drift); batch 2: producer renames event_type -> type
    m.ingest(batchDf(
      """{"event_type": "a", "value": 1}""",
      """{"event_type": "b", "value": 2}""",
      "not json"), 0L, col("payload"))
    m.ingest(batchDf(
      """{"event_type": "c", "value": 3}""",
      """{"event_type": "d"}"""), 1L, col("payload"))
    m.ingest(batchDf(
      """{"type": "e", "value": 5}""",
      """{"type": "f", "value": 6}"""), 2L, col("payload"))

    val hist = m.history(spark).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    // malformed payload counts toward n_rows, contributes no keys
    assert(hist.contains((0L, "event_type", "expected", 2L, 3L)))
    assert(hist.contains((1L, "value", "expected", 1L, 2L)))
    assert(hist.contains((2L, "event_type", "expected", 0L, 2L)))
    assert(hist.contains((2L, "type", "novel", 2L, 2L)))

    val tot = m.totals(spark).collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    assert(tot.contains(("event_type", "expected", Some(2L))),
      s"event_type must collapse at batch 2: $tot")
    assert(tot.contains(("value", "expected", None)),
      "value kept arriving — no drift")
    assert(tot.contains(("ghost", "expected", None)),
      "a key that NEVER arrived is not a collapse")
    assert(tot.contains(("type", "novel", Some(2L))),
      "the renamed key must surface as novel at its arrival batch")
    assert(m.drifted(spark) === Seq(("event_type", "expected"),
      ("type", "novel")))

    // replayed micro-batch lands idempotently (overwrite by batch id)
    m.ingest(batchDf(
      """{"type": "e", "value": 5}""",
      """{"type": "f", "value": 6}"""), 2L, col("payload"))
    assert(m.drifted(spark) === Seq(("event_type", "expected"),
      ("type", "novel")))

    // a restarted handle recovers everything from the store
    val rec = SchemaDriftMonitor.load(dir,
      Seq("event_type", "value", "ghost"))
    assert(rec.drifted(spark) === m.drifted(spark))
    assert(rec.totals(spark).count() === m.totals(spark).count())
  }

  test("recovery after collapse: a key resuming does not clear the recorded drift batch") {
    val dir = Files.createTempDirectory("graft_sdm2").toString
    val m = SchemaDriftMonitor.create(dir, expectedKeys = Seq("k"))
    m.ingest(batchDf("""{"k": 1}"""), 0L, col("payload"))
    m.ingest(batchDf("""{"x": 1}"""), 1L, col("payload"))
    m.ingest(batchDf("""{"k": 1}"""), 2L, col("payload"))
    val tot = m.totals(spark).filter(col("key") === "k").head()
    assert(tot.getLong(5) === 1L,
      "first_drifted_batch records the FIRST collapse even after recovery")
  }

  test("novel-key cap bounds the slot with a deterministic most-frequent-first cut") {
    val dir = Files.createTempDirectory("graft_sdm3").toString
    val m = SchemaDriftMonitor.create(dir, expectedKeys = Seq("k"))
    // 150 distinct undeclared keys; u000 appears twice (most frequent)
    val payloads = (0 until 150).map(i => s"""{"u${"%03d".format(i)}": 1}""") :+
      """{"u000": 2}"""
    m.ingest(batchDf(payloads: _*), 0L, col("payload"))
    val novel = m.history(spark).filter(col("kind") === "novel").collect()
    assert(novel.length === SchemaDriftMonitor.NovelCap)
    val byKey = novel.map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(byKey("u000") === 2L, "the most frequent novel key must survive the cap")
  }
}
