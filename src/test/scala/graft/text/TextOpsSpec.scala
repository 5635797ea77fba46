package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunking semantics: window/stride arithmetic, overlap content, tail
  * handling — plus the repetition signal on a known boilerplate doc. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: overlapping windows cover every token; overlap is chunkTokens - stride") {
    // 12 tokens a..l; 5-token windows every 3 → starts 0,3,6,9
    val doc = Seq((1L, ('a' to 'l').map(_.toString).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.chunk(doc, col("doc_id"), col("text"),
        chunkTokens = 5, stride = 3)
      .orderBy("chunk_id")
      .select("chunk_id", "n_tokens", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._2).toSeq === Seq(5L, 5L, 5L, 3L)) // short tail kept
    assert(out(0)._3 === "a b c d e")
    assert(out(1)._3 === "d e f g h") // 2-token overlap with previous
    assert(out(3)._3 === "j k l")
    // every token appears in at least one chunk
    val covered = out.flatMap(_._3.split(" ")).toSet
    assert(covered === ('a' to 'l').map(_.toString).toSet)
  }

  test("chunk: a doc shorter than one window yields exactly one chunk") {
    val doc = Seq((1L, "only three tokens")).toDF("doc_id", "text")
    val out = TextOps.chunk(doc, col("doc_id"), col("text")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_tokens") === 3L)
  }

  test("repetition: a constant-bigram doc scores 1.0, diverse text scores lower") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),          // one bigram repeated
      (2L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val out = TextOps.repetition(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) < 0.5)
  }
}
