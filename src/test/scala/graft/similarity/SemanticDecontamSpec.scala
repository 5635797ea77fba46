package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Embedding-space decontamination: planted leaks must be flagged with
  * their source benchmark vector; unrelated vectors must not. */
class SemanticDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))

  test("semanticDecontam: exact leak flagged at cos 1.0, orthogonal vector clean") {
    val e1 = Seq(1f, 0f, 0f, 0f)
    val e2 = Seq(0f, 1f, 0f, 0f)
    val eval = vecs(100L -> e1, 101L -> e2)
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))
    val corpus = vecs(
      1L -> e1,                       // exact copy of eval 100 → leak
      2L -> Seq(0f, 0f, 1f, 0f),      // orthogonal → clean
      3L -> Seq(0f, 0.9999f, 0f, 0.0001f)) // within 0.999 of eval 101
    val out = Similarity.semanticDecontam(corpus, eval, n = 3, minCos = 0.999)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L) === ((100L, 1.0)))
    assert(out(3L)._1 === 101L && out(3L)._2 >= 0.999)
  }

  test("semanticDecontam: argmax ties break to the lowest eval_id; nulls drop out") {
    val e = Seq(1f, 0f)
    // two identical benchmark vectors: both match at cos 1.0
    val eval = vecs(200L -> e, 150L -> e)
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))
    val corpus = vecs(1L -> e)
      .unionAll(Seq((2L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>")))
    val out = Similarity.semanticDecontam(corpus, eval, n = 2, minCos = 0.999)
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1L)
    assert(out.head.getLong(1) === 150L) // lowest matching eval_id wins
  }

  test("semanticDecontam: empty eval set and empty corpus both yield empty results") {
    val e = Seq(1f, 0f)
    val eval = vecs(100L -> e)
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))
    val corpus = vecs(1L -> e)
    assert(Similarity.semanticDecontam(corpus, eval.limit(0), n = 1,
      minCos = 0.999).count() === 0L)
    assert(Similarity.semanticDecontam(corpus.limit(0), eval, n = 1,
      minCos = 0.999).count() === 0L)
  }
}
