package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary-column plumbing: typed Dataset round-trip, feature math on
  * known payloads, frame-sampling multiplicity, empty payload edge. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("media synthesis: binary content + typed metadata survive the encoder") {
    val m = Multimodal.media(mk((0L, "abc"), (1L, "defg"), (2L, "h"))).collect()
      .map(r => r.media_id -> r).toMap
    assert(m(0L).kind === "image" && m(0L).meta.format === "png")
    assert(m(1L).kind === "audio" && m(1L).meta.format === "wav")
    assert(m(2L).kind === "video" && m(2L).meta.format === "mp4")
    assert(new String(m(0L).content, "UTF-8") === "abc")
  }

  test("features: checksum and quadrant counts on a known payload") {
    // "Ab1": bytes 65,98,49 → q2(uppercase)=1, q3(lower)=1, q1(digit)=1
    val f = Multimodal.features(Multimodal.media(mk((0L, "Ab1")))).head()
    assert(f.byte_len === 3L)
    assert((f.q1, f.q2, f.q3) === ((1L, 1L, 1L)))
    val expected = ((65L * 31 + 98) % 1000000007L * 31 + 49) % 1000000007L
    assert(f.checksum === expected)
  }

  test("frame sampling keeps every Nth block and counts correctly") {
    val text40 = "x" * 40 // 3 blocks of 16 → keep blocks 0 and 2
    val f = Multimodal.frameSample(Multimodal.media(mk((0L, text40))),
      frameBytes = 16, everyN = 2).head()
    assert(f.n_frames === 2L)
    // first frame = 16 'x' bytes
    var cs = 0L
    (1 to 16).foreach(_ => cs = (cs * 31 + 'x'.toLong) % 1000000007L)
    assert(f.frame_checksum === cs)
  }

  test("empty payload yields zero frames and zero checksum, no crash") {
    val f = Multimodal.frameSample(Multimodal.media(mk((0L, ""))),
      frameBytes = 16, everyN = 2).head()
    assert(f.n_frames === 0L)
    assert(f.frame_checksum === 0L)
  }
}
