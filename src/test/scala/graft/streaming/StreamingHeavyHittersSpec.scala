package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class Tok(pos: Long, item: String)

/** Streaming Misra–Gries: multi-batch foreachBatch ingest, the merged
  * summary's no-false-negative guarantee over the WHOLE stream, the
  * exact report vs the batch x101 operator on the archive, replay
  * idempotency, and store-derived restart recovery. */
class StreamingHeavyHittersSpec extends SparkSpec {

  // a 60, b 36, c 20, 40 distinct singletons -> N = 156; k = 4:
  // threshold 31.2 -> heavy hitters are exactly a (60) and b (36)
  private def toks: Seq[Tok] = {
    val items = Seq.fill(60)("a") ++ Seq.fill(36)("b") ++
      Seq.fill(20)("c") ++ (1 to 40).map(i => s"z$i")
    // interleave deterministically so hitters span all batches
    items.zipWithIndex.sortBy { case (it, i) => (i * 48271) % 156 }
      .zipWithIndex.map { case ((it, _), pos) => Tok(pos.toLong, it) }
  }

  test("multi-batch ingest: merged-summary guarantee, exact report = batch operator, recovery") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val dir = Files.createTempDirectory("graft_shh").toString
    val hh = StreamingHeavyHitters.create(dir, k = 4)
    val archiveDir = s"$dir/bronze"
    val in = MemoryStream[Tok]
    val q = in.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        // the pipeline's usual pair: archive the batch, sketch the batch
        b.write.mode("overwrite").parquet(s"$archiveDir/batch=$id")
        hh.ingest(b, id, col("item"))
      }
      .start()
    try {
      toks.grouped(39).foreach { g => in.addData(g); q.processAllAvailable() }
    } finally q.stop()

    assert(hh.batchesStored(spark).size === 4)
    assert(hh.totalSeen(spark) === 156L)
    val cand = hh.candidates(spark)
    assert(cand.size <= 4, s"summary exceeded k: $cand")
    assert(cand.contains("a") && cand.contains("b"),
      s"merged summary lost a whole-stream heavy hitter: $cand")

    // exact report over the archive == the batch x101 operator
    val archive = spark.read.parquet(archiveDir)
    val got = hh.exactReport(archive, col("item"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 60L, "b" -> 36L), s"got $got")
    val batch = graft.ops.HeavyHitters.exact(archive, col("item"), k = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === batch, "streaming-candidate route must agree with batch x101")

    // replayed micro-batch lands idempotently (overwrite by batch id)
    val replay = toks.take(39).toDF()
    hh.ingest(replay, 0L, col("item"))
    assert(hh.totalSeen(spark) === 156L, "replay must not double-count")

    // a restarted handle recovers everything from the store
    val recovered = StreamingHeavyHitters.load(dir, k = 4)
    assert(recovered.candidates(spark) === cand)
    assert(recovered.totalSeen(spark) === 156L)
  }

  test("compaction: lossless prefix fold, crash-safe marker, horizon guard") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_shh3").toString
    val hh = StreamingHeavyHitters.create(dir, k = 4)
    def batch(items: String*): org.apache.spark.sql.DataFrame =
      items.zipWithIndex.map { case (it, i) => Tok(i.toLong, it) }.toDF()
    hh.ingest(batch("a", "a", "b"), 0L, col("item"))
    hh.ingest(batch("a", "c", "c"), 1L, col("item"))
    hh.ingest(batch("b", "b", "d"), 2L, col("item"))
    hh.ingest(batch("a", "d"), 3L, col("item"))
    val beforeSum = hh.summary(spark)
    val beforeSeen = hh.totalSeen(spark)
    // compact everything strictly below batch 3
    hh.compact(spark, beforeBatch = 3L)
    assert(hh.compactedThrough(spark) === 2L)
    assert(hh.summary(spark) === beforeSum, "compaction must be lossless")
    assert(hh.totalSeen(spark) === beforeSeen)
    assert(hh.batchesStored(spark) === Seq(2L, 3L),
      "prefix appears as one pseudo-batch at the cutoff id")
    // the stream continues; a second compaction folds prefix + middle
    hh.ingest(batch("e", "e", "e", "a"), 4L, col("item"))
    hh.compact(spark, beforeBatch = 4L)
    assert(hh.compactedThrough(spark) === 3L)
    assert(hh.totalSeen(spark) === beforeSeen + 4L)
    assert(hh.summary(spark).contains("e"))
    // crash between marker write and slot deletion: a leftover covered
    // slot must be IGNORED by the marker, never double-counted
    BatchStore.writeSlot(
      Seq(("a", 2L, 3L), (null.asInstanceOf[String], 0L, 3L))
        .toDF("item", "cnt", "btotal").coalesce(1),
      s"$dir/batches/batch=1")
    assert(hh.totalSeen(spark) === beforeSeen + 4L,
      "covered slot below the marker folded in — double count")
    // a replayed batch at/below the horizon is refused loudly
    val e = intercept[IllegalArgumentException](
      hh.ingest(batch("x"), 3L, col("item")))
    assert(e.getMessage.contains("compacted horizon"))
    // recovery from the compacted store works unchanged
    val rec = StreamingHeavyHitters.load(dir, k = 4)
    assert(rec.totalSeen(spark) === beforeSeen + 4L)
    assert(rec.summary(spark) === hh.summary(spark))
    // crash between a re-compaction's marker delete and rename leaves NO
    // marker file; the committed compacted slot (published before the
    // marker) is the authority — no silent undercount of the prefix
    val expectSum = hh.summary(spark)
    val expectSeen = hh.totalSeen(spark)
    val mp = new org.apache.hadoop.fs.Path(s"$dir/_COMPACTED_THROUGH")
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(mp, false))
    assert(hh.compactedThrough(spark) === 3L,
      "marker-absent fallback must scan for the max committed cutoff slot")
    assert(hh.totalSeen(spark) === expectSeen,
      "missing marker silently dropped the compacted prefix")
    assert(hh.summary(spark) === expectSum)
    assert(StreamingHeavyHitters.load(dir, k = 4).totalSeen(spark) === expectSeen)
  }

  test("all-null batch keeps its row count without summary entries") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_shh2").toString
    val hh = StreamingHeavyHitters.create(dir, k = 4)
    hh.ingest(Seq(Tok(0L, null), Tok(1L, null)).toDF(), 0L, col("item"))
    assert(hh.totalSeen(spark) === 0L, "null items are skipped entirely")
    assert(hh.candidates(spark).isEmpty)
    hh.ingest(Seq(Tok(2L, "a"), Tok(3L, "a"), Tok(4L, null)).toDF(), 1L,
      col("item"))
    assert(hh.totalSeen(spark) === 2L)
    assert(hh.candidates(spark) === Seq("a"))
  }
}
