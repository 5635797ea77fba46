package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** x74/x75: int8 embedding quantization and quantized-space ANN.
  *
  * The quality claim behind the 4× scan saving is QUANTIFIED here, not
  * assumed: recall of the int8 top-k against the fp32 brute-force top-k
  * on the real sf0.1 corpus, plus the per-element bound |x − q·amax/127|
  * ≤ amax/254 + ulp that symmetric round-to-nearest guarantees. All
  * values are deterministic (no RNG anywhere in the path), so the gates
  * are exact reproductions, not statistical bounds. */
class Int8AnnSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.1"

  private def rs(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def vecDf(rows: Seq[(Long, Seq[Float])]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }),
      schema)
  }

  test("quantized values are bounded to [-127, 127] and error <= amax/254 + ulp") {
    assume(new java.io.File(sfDir).isDirectory)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = Similarity.quantizeInt8(emb)
      .select(col("vec_id"), col("amax"),
        expr("array_min(qvec)").as("qmin"), expr("array_max(qvec)").as("qmax"),
        expr("array_max(zip_with(embedding, qvec," +
          " (x, v) -> abs(CAST(x AS DOUBLE)" +
          " - CAST(v AS DOUBLE) * amax / CAST(127 AS DOUBLE))))").as("maxerr"))
      .agg(min("qmin").as("qmin"), max("qmax").as("qmax"),
        max(col("maxerr") / col("amax")).as("relerr"))
      .head()
    assert(q.getAs[Int]("qmin") >= -127 && q.getAs[Int]("qmax") <= 127,
      s"quantized value escaped [-127,127]: $q")
    // half-step bound: |x - q·amax/127| <= (amax/127)/2, relative 1/254
    assert(q.getAs[Double]("relerr") <= 1.0 / 254 + 1e-12,
      s"reconstruction error above the half-step bound: $q")
  }

  test("sf0.1 int8 top-3 recall >= 0.95 vs fp32 brute force") {
    assume(new java.io.File(sfDir).isDirectory)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").persist()
    try {
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val exact = rs(Similarity.bruteForceTopK(emb, queries, 3))
      val int8 = rs(Similarity.int8TopK(emb, queries, 3))
      val recall = (exact intersect int8).size.toDouble / exact.size
      info(f"int8TopK recall@3 = $recall%.3f (corpus ${emb.count()})")
      // measured 1.000 at sf0.1 (PLANS.md round-12 session-5): with
      // 64-dim vectors the int8 cosine perturbation is ~1e-3, far
      // below this corpus's top-3 similarity gaps
      assert(recall >= 0.95, s"int8 recall regressed: $recall")
    } finally emb.unpersist()
  }

  test("all-zero vectors quantize to zeros and score cos 0 without dividing by zero") {
    val corpus = vecDf(Seq(
      1L -> Seq(0f, 0f, 0f),
      2L -> Seq(1f, 2f, -2f),
      3L -> Seq(-1f, -2f, 2f)))
    val qz = Similarity.quantizeInt8(corpus).select("vec_id", "amax", "qvec")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    assert(qz(1L) == ((0.0, Seq(0, 0, 0))), s"zero vector mis-quantized: ${qz(1L)}")
    assert(qz(2L)._2 == Seq(64, 127, -127), s"2:1 ratio mis-quantized: ${qz(2L)}")
    val queries = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = Similarity.int8TopK(corpus, queries, 3)
      .select("vec_id", "cosq").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.values.forall(_ == 0.0), s"zero-vector query must score 0: $scored")
  }

  test("matryoshka: full dims with m = k reproduces the exact top-k; recall grows with the pool m") {
    assume(new java.io.File(sfDir).isDirectory)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").persist()
    try {
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val exact = rs(Similarity.bruteForceTopK(emb, queries, 3))
      // degenerate configuration = the exact scan, bit for bit
      val full = rs(Similarity.matryoshkaTopK(emb, queries, 3, dims = 64, m = 3))
      assert(full === exact, "dims=64/m=k must equal the exact top-k")
      // synthetic embeddings spread energy uniformly over dims — the
      // WORST case for prefix truncation (a trained MRL model
      // concentrates signal in the prefix); recall must still be
      // monotone in the rerank pool and recover with headroom
      val recalls = Seq(12, 48, 192).map { m =>
        val r = (exact intersect
          rs(Similarity.matryoshkaTopK(emb, queries, 3, dims = 16, m = m)))
          .size.toDouble / exact.size
        info(f"matryoshkaTopK(dims=16, m=$m%3d) recall@3 = $r%.3f")
        r
      }
      // measured 0.400/0.467/0.750 (PLANS.md round-12 session-5): a
      // random 16-of-64 prefix keeps only 1/4 of the variance, so this
      // documents the floor, not the operating point — MRL-trained
      // embeddings concentrate variance in the prefix by construction
      assert(recalls == recalls.sorted, s"recall not monotone in m: $recalls")
      assert(recalls.last >= 0.6, s"m=192 recall collapsed: ${recalls.last}")
      // widening the prefix at fixed m must also be monotone, and the
      // full-width prefix is exact for any m >= k
      val byDims = Seq(16, 32, 64).map { d =>
        val r = (exact intersect
          rs(Similarity.matryoshkaTopK(emb, queries, 3, dims = d, m = 12)))
          .size.toDouble / exact.size
        info(f"matryoshkaTopK(dims=$d%2d, m=12) recall@3 = $r%.3f")
        r
      }
      assert(byDims == byDims.sorted, s"recall not monotone in dims: $byDims")
      assert(byDims.last == 1.0, s"full-width prefix must be exact: $byDims")
    } finally emb.unpersist()
  }

  test("sf0.1 IVF,SQ8: int8-scored cells reach >= 0.95 of the fp32 IVF route's recall, same cells/probes") {
    assume(new java.io.File(sfDir).isDirectory)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").persist()
    try {
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val nCells = Similarity.scaledCells(emb.count())
      val fp32 = rs(Similarity.ivfTopK(emb, queries, 3, nCells, nprobe = 2))
      spark.catalog.clearCache()
      val int8 = rs(Similarity.ivfTopKInt8(emb, queries, 3, nCells, nprobe = 2))
      spark.catalog.clearCache()
      // identical coarse assignment (both fp32), so any difference is
      // quantization reordering inside the probed candidate set — with
      // recall@3 perturbations ~1e-3 the sets should coincide
      val agree = (fp32 intersect int8).size.toDouble / fp32.size
      info(f"IVF,SQ8 vs IVF fp32 top-3 agreement = $agree%.3f (cells=$nCells)")
      assert(agree >= 0.95, s"int8 cell scoring diverged from fp32: $agree")
    } finally emb.unpersist()
  }

  test("property: sampled random vectors — quantization bounds, half-step error, Cauchy-Schwarz in int space") {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(60,
      Gen.listOfN(24, Gen.chooseNum(-8.0f, 8.0f).suchThat(f => !f.isNaN)))
    val vecs = gen.sample.get.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    import graft.plans.functions.{int_dot_fold, int_sqnorm_fold, quantize_int8}
    val df = vecDf(vecs.map { case (i, v) => (i, v) })
    val rows = Similarity.quantizeInt8(df)
      .select(col("vec_id"), col("amax"), col("qvec"),
        int_sqnorm_fold(col("qvec")).as("qn"),
        expr("array_max(zip_with(embedding, qvec," +
          " (x, q) -> abs(CAST(x AS DOUBLE)" +
          " - CAST(q AS DOUBLE) * amax / CAST(127 AS DOUBLE))))").as("maxerr"))
      .collect()
    rows.foreach { r =>
      val (amax, q, qn) = (r.getDouble(1), r.getSeq[Int](2), r.getLong(3))
      assert(q.forall(x => x >= -127 && x <= 127), s"range escape: $r")
      // exact norm identity: the fold equals the scala-side sum
      assert(qn === q.map(x => x.toLong * x).sum, s"norm fold mismatch: $r")
      if (amax > 0)
        assert(r.getDouble(4) <= amax / 254 + 1e-12, s"half-step bound: $r")
    }
    // pairwise: |dot_q(a,b)| <= sqrt(nq(a))*sqrt(nq(b)) — the cosine in
    // quantized space can never leave [-1, 1] (no clamping anywhere)
    val pairs = df.select(col("vec_id"), quantize_int8(col("embedding")).as("q"),
        int_sqnorm_fold(quantize_int8(col("embedding"))).as("n"))
      .withColumn("_j", lit(1))
    val a = pairs.select(col("vec_id").as("ia"), col("q").as("qa"), col("n").as("na"), col("_j"))
    val b = pairs.select(col("vec_id").as("ib"), col("q").as("qb"), col("n").as("nb"), col("_j"))
    val viol = a.join(b, "_j")
      .select(int_dot_fold(col("qa"), col("qb")).as("d"), col("na"), col("nb"))
      .filter(expr("CAST(d AS DOUBLE) * d > CAST(na AS DOUBLE) * nb + 1e-6"))
      .count()
    assert(viol === 0L, s"Cauchy-Schwarz violated in int space: $viol pairs")
  }

  test("antipodal pair ranks exactly -1/+1 in quantized space") {
    val corpus = vecDf(Seq(
      1L -> Seq(3f, -1f, 2f),
      2L -> Seq(-3f, 1f, -2f),
      3L -> Seq(3f, -1f, 2f)))
    val queries = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val r = Similarity.int8TopK(corpus, queries, 3)
      .orderBy(col("cosq").desc, col("vec_id"))
      .collect().map(x => (x.getAs[Long]("vec_id"), x.getAs[Double]("cosq")))
    // identical vectors quantize identically → cos exactly ±1
    assert(r.take(2).toSeq == Seq((1L, 1.0), (3L, 1.0)), s"self/dup not at +1: ${r.toSeq}")
    assert(r.last == ((2L, -1.0)), s"antipode not at -1: ${r.toSeq}")
  }

  test("jlTopK: recall monotone in outDims and pool m; dense mixing beats prefix truncation at equal dims") {
    assume(new java.io.File(sfDir).isDirectory)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").persist()
    try {
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val exact = rs(Similarity.bruteForceTopK(emb, queries, 3))
      def recall(outDims: Int, m: Int): Double =
        (exact intersect rs(Similarity.jlTopK(emb, queries, 3, outDims, m)))
          .size.toDouble / exact.size
      // recall must be monotone in the rerank pool at fixed outDims
      val byM = Seq(12, 48, 192).map { m =>
        val r = recall(16, m)
        info(f"jlTopK(outDims=16, m=$m%3d) recall@3 = $r%.3f")
        r
      }
      assert(byM == byM.sorted, s"recall not monotone in m: $byM")
      assert(byM.last >= 0.6, s"m=192 recall collapsed: $byM")
      // ...and monotone in the projected dimensionality at fixed m
      val byDims = Seq(8, 16, 32).map { d =>
        val r = recall(d, 12)
        info(f"jlTopK(outDims=$d%2d, m=12) recall@3 = $r%.3f")
        r
      }
      assert(byDims == byDims.sorted, s"recall not monotone in outDims: $byDims")
      // the distribution-free claim: on these synthetic embeddings
      // (energy spread uniformly — matryoshka's worst case, measured
      // 0.400 recall at dims=16/m=12) dense mixing at the SAME
      // compressed width must do at least as well
      val mrl = (exact intersect
        rs(Similarity.matryoshkaTopK(emb, queries, 3, dims = 16, m = 12)))
        .size.toDouble / exact.size
      info(f"jl=${byDims(1)}%.3f vs matryoshka=$mrl%.3f at 16 dims, m=12")
      assert(byDims(1) >= mrl,
        s"JL (${byDims(1)}) below prefix truncation ($mrl) on a no-prefix-structure corpus")
    } finally emb.unpersist()
  }
}
