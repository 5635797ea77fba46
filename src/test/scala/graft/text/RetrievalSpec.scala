package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval and the temperature-balanced deterministic
  * sample — the round-10 retrieval/selection pair. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana banana"),
    (4L, "date fig grape")).toDF("doc_id", "text")

  test("bm25TopK: hand-computed scores, ranking, and exclusion of non-matching docs") {
    val out = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"),
        Seq("apple", "banana"), k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    // doc 4 contains no query term: it must never leave the scan
    assert(!out.map(_._1).contains(4L))
    // N = 4, Σdl = 12, avgdl = 3.0; df(apple) = df(banana) = 2 → idf = ln 2
    def s(tf: Long, dl: Long): Double =
      math.log(2.0) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    val expected = Map(
      1L -> (2L, s(2, 3) + s(1, 3)), // apple tf=2 + banana tf=1, dl=3
      2L -> (1L, s(1, 2)),           // apple tf=1, dl=2
      3L -> (1L, s(4, 4)))           // banana tf=4, dl=4
    assert(out.length === 3)
    out.foreach { case (id, (nTerms, bm25)) =>
      assert(nTerms === expected(id)._1)
      assert(math.abs(bm25 - expected(id)._2) < 1e-6, s"doc $id")
    }
    // descending score order (doc 1 matches both terms → highest)
    assert(out.map(_._1).head === 1L)
    assert(out.map(_._2._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("bm25TopK: query terms are case-normalized and k truncates with id tie-break") {
    val top1 = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"),
      Seq("APPLE", "Banana"), k = 1).collect()
    assert(top1.length === 1 && top1.head.getLong(0) === 1L)
    // identical docs score identically → boundary resolved by doc_id
    val ties = Seq((10L, "apple pie"), (11L, "apple pie"), (12L, "apple pie"))
      .toDF("doc_id", "text")
    val picked = Retrieval.bm25TopK(ties, col("doc_id"), col("text"),
      Seq("apple"), k = 2).collect().map(_.getLong(0)).toSeq
    assert(picked === Seq(10L, 11L))
  }

  test("buildVocab: frequency-ordered dense ids, truncation, tf/df both exact") {
    val docs = Seq(
      (1L, "aa bb aa cc"),
      (2L, "aa bb dd"),
      (3L, "aa ee")).toDF("doc_id", "text")
    val out = TextOps.buildVocab(docs, col("doc_id"), col("text"), vocabSize = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // aa: tf 4 df 3; bb: tf 2 df 2; cc/dd/ee tie at tf 1 → term order cuts
    assert(out.toSeq === Seq((1L, "aa", 4L, 3L), (2L, "bb", 2L, 2L), (3L, "cc", 1L, 1L)))
    // V larger than the vocabulary returns everything, ids stay dense
    val full = TextOps.buildVocab(docs, col("doc_id"), col("text"), vocabSize = 100)
    assert(full.count() === 5L)
    assert(full.agg(max(col("token_id"))).head().getLong(0) === 5L)
  }

  test("oovStats: counts against a fixed vocab, all-OOV and all-covered docs") {
    val docs = Seq(
      (1L, "aa bb xx"),   // 1 of 3 OOV
      (2L, "aa bb"),      // fully covered
      (3L, "zz yy")).toDF("doc_id", "text") // fully OOV
    val vocab = Seq("aa", "bb").toDF("term")
    val out = TextOps.oovStats(docs, col("doc_id"), col("text"), vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((3L, 1L, 0.333333)))
    assert(out(2L) === ((2L, 0L, 0.0)))
    assert(out(3L) === ((2L, 2L, 1.0)))
  }

  test("domainManifest: first-URL host extraction, www-strip, blocklist verdict") {
    val docs = Seq(
      (1L, "x https://www.good.org/a and later https://spam.example/b"),
      (2L, "y http://spam.example/offer z"),
      (3L, "plain text, no url"),
      (4L, "w https://good.org/other")).toDF("doc_id", "text")
    val out = TextOps.domainManifest(docs, col("doc_id"), col("text"),
        Seq("spam.example"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // doc 1's FIRST url wins (good.org), and www. is stripped → merges with doc 4
    assert(out === Map("good.org" -> (2L, false), "spam.example" -> (1L, true)))
    // empty blocklist: nothing blocked, hosts still counted
    val none = TextOps.domainManifest(docs, col("doc_id"), col("text"), Nil)
      .collect().map(r => r.getBoolean(2))
    assert(none.forall(_ == false))
  }

  test("temperatureSample: deterministic, row-order immune, and rare-source up-weighted") {
    // big source: 90 docs × 40 tokens; rare source: 10 docs × 4 tokens
    // → token share(rare) ≈ 1.1%, weight ratio √(share_b/share_r) ≈ 9.5×
    val docs = ((1L to 90L).map(i => (i, ("w" + i + " ") * 40, "big")) ++
      (101L to 110L).map(i => (i, ("r" + i + " ") * 4, "rare")))
      .toDF("doc_id", "text", "source")
    val out = TextOps.temperatureSample(docs, col("doc_id"), col("text"),
      col("source"), n = 40).collect()
    assert(out.length === 40)
    assert(out.map(_.getLong(0)).distinct.length === 40)
    // keys are emitted in descending order, ties by id
    val keys = out.map(_.getDouble(3)).toSeq
    assert(keys.sliding(2).forall(p => p.head >= p.last))
    // α = 0.5 up-weights the rare source: at uniform its 10/100 docs
    // would land ~4 of 40 picks; the √share weighting must beat that
    val rare = out.count(_.getString(1) == "rare")
    assert(rare > 4, s"rare-source picks = $rare, expected up-weighting")
    // determinism and row-order immunity: shuffled input, same result
    val again = TextOps.temperatureSample(docs.orderBy(rand(7)), col("doc_id"),
      col("text"), col("source"), n = 40).collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(3))).toSeq ===
      again.map(r => (r.getLong(0), r.getDouble(3))).toSeq)
  }

  test("bm25TopK: query terms absent corpus-wide rank nothing and never divide by zero") {
    // adversarial: zero postings — the df aggregation is empty, the idf
    // expression never evaluates on a 0-df row, and the result is empty
    // rather than k rows of NaN
    val out = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"),
      Seq("zzzzunseen", "qqqqmissing"), k = 5)
    assert(out.count() === 0L)
    // mixed present/absent terms: absent ones contribute nothing, the
    // present term still ranks its postings
    val mixed = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"),
      Seq("cherry", "zzzzunseen"), k = 5).collect()
    assert(mixed.map(_.getLong(0)).toSeq === Seq(2L))
    assert(!mixed.head.getDouble(2).isNaN)
  }

  test("rrfFuse: both-list docs outrank single-list docs; absent side contributes exactly 0") {
    val sparse = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rnk")
    val dense = Seq((2L, 1L), (4L, 2L)).toDF("doc_id", "rnk")
    val out = Retrieval.rrfFuse(sparse, dense, kRrf = 60, k = 10)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3)))
    // doc 2 appears in both lists (ranks 2 and 1) and must lead despite
    // doc 1 holding the sparse top rank
    assert(out.head._1 === 2L, s"both-list doc not first: ${out.toSeq}")
    assert(out.head._4 === BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // absent sides are null ranks with zero contribution, not NaN/err
    val d1 = out.find(_._1 == 1L).get
    assert(d1._3.isEmpty && d1._4 === BigDecimal(1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // every listed doc survives the union; output capped at k
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L, 4L))
  }
}
