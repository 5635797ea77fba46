package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Embedding-similarity invariants: self-cosine 1, bounds, zero-vector
  * guard, top-k shape, sign-bucket determinism. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (2L, Seq(1.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("cosine: self=1, orthogonal=0, opposite=-1, zero vector guarded to 0") {
    val q = corpus.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val out = corpus.crossJoin(q)
      .select(col("vec_id"), Similarity.cosine(col("q_emb"), col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) === 1.0)
    assert(out(1L) === 0.0)
    assert(out(3L) === -1.0)
    assert(out(4L) === 0.0)
    assert(math.abs(out(2L) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("bruteForceTopK returns k rows per query, self first") {
    val q = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val out = Similarity.bruteForceTopK(corpus, q, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.count(_._1 == 0L) === 2)
    assert(out.count(_._1 == 1L) === 2)
    val best = out.groupBy(_._1).map { case (q, rs) => q -> rs.maxBy(_._3)._2 }
    assert(best === Map(0L -> 0L, 1L -> 1L))
  }

  test("sign bucket packs sign bits of leading dims deterministically") {
    val out = corpus.select(col("vec_id"),
        Similarity.signBucket(col("embedding"), 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0.0f counts as >= 0 → bit set
    assert(out(0L) === 15L)  // all non-negative
    assert(out(3L) === 14L)  // dim0 negative → bit0 clear
  }
}
