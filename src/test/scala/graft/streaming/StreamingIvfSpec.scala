package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class Vec(vec_id: Long, embedding: Seq[Float])

/** Streaming IVF index maintenance: multi-batch ingest via a real
  * foreachBatch streaming query, periodic refine + generation cutover,
  * a recall gate against brute-force ground truth over the accumulated
  * corpus, ingest-time near-dup detection, and restart recovery. */
class StreamingIvfSpec extends SparkSpec {

  private def vecs(n: Int): Seq[Vec] = {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .orderBy("vec_id").limit(n)
    df.collect().map(r =>
      Vec(r.getLong(0), r.getSeq[Float](1))).toSeq
  }

  test("multi-batch ingest + periodic refine: recall@3 over the streamed corpus") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val all = vecs(240)
    val dir = Files.createTempDirectory("graft_sivf").toString
    val ivf = StreamingIvf.create(dir, nCells = 16, refineEvery = 3,
      kmeansIters = 2)
    val in = MemoryStream[Vec]
    val q = in.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        ivf.ingest(b, id))
      .start()
    try {
      all.grouped(40).foreach { g => in.addData(g); q.processAllAvailable() }
    } finally q.stop()

    // every streamed vector is in the latest generation, exactly once
    val idx = ivf.index(spark).persist()
    assert(idx.count() === 240L)
    assert(idx.select("vec_id").distinct().count() === 240L)
    // 6 batches / refineEvery=3 -> two refines, two generation cutovers
    assert(ivf.batchesIngested === 6L,
      s"expected 6 micro-batches, got ${ivf.batchesIngested}")
    assert(ivf.generation === 2L,
      s"expected generation cutover after two refines, got ${ivf.generation}")

    // recall gate: IVF top-3 vs brute force over the SAME streamed corpus
    val queries = spark.createDataFrame(all.take(12).map(v =>
        (v.vec_id, v.embedding)))
      .toDF("q_id", "q_emb")
    val truth = Similarity.bruteForceTopK(
        idx.select("vec_id", "embedding"), queries, 3)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = ivf.topK(queries, 3, nprobe = 4)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = truth.map { case (qid, t) =>
      got.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size
    assert(recall >= 0.7, s"IVF recall@3 $recall < 0.7 at nprobe=4")
    idx.unpersist()

    // restart recovery: a fresh handle reloads the latest generation and
    // answers the same queries identically
    val re = StreamingIvf.load(spark, dir, nCells = 16)
    val got2 = re.topK(queries, 3, nprobe = 4)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got2 === got, "recovered index must answer identically")

    // superseded generations are pruned at cutover: without pruning,
    // every refine would permanently double the index's disk footprint
    val left = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("gen=")).map(_.getName).toSet
    assert(left === Set("gen=2"),
      s"old generations must be pruned after cutover, found $left")
    val cLeft = new java.io.File(s"$dir/centroids").listFiles()
      .map(_.getName).toSet
    assert(cLeft === Set("gen=2"),
      s"old centroid generations must be pruned, found $cLeft")

    // a crash between the cutover marker's delete and rename leaves no
    // _LATEST_GEN; load() must fall back to the max committed generation
    assert(new java.io.File(s"$dir/_LATEST_GEN").delete())
    val re2 = StreamingIvf.load(spark, dir, nCells = 16)
    assert(re2.generation === 2L,
      "marker-absent fallback must recover the max committed generation")
    val got3 = re2.topK(queries, 3, nprobe = 4)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got3 === got, "fallback-recovered index must answer identically")
  }

  test("composed ingest gate: curate -> embed -> ANN near-dup check -> index, across batches") {
    // the full streaming admission pipeline: each micro-batch's documents
    // run the batch-verified curation chain, survivors are embedded
    // (deterministic fake: unit vector from the text fingerprint), the
    // CURRENT index is probed for semantic copies, and only novel
    // documents enter the index — the streaming composition of
    // curateBatch (x70/x66/x49/x36/x30/x45) with StreamingIvf.nearDups.
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val dir = Files.createTempDirectory("graft_sivf3").toString
    val ivf = StreamingIvf.create(dir, nCells = 4, refineEvery = 100)
    def embed(curated: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // planted 4-dim unit embedding driven by the text fingerprint:
      // identical text -> identical vector (cos 1), else far apart
      val h = graft.text.TextOps.fingerprint(graft.text.TextOps.norm(col("text")))
      curated.select(col("doc_id").as("vec_id"),
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.sequence(lit(0), lit(3)),
          i => (pmod(h * (i * 2 + 1), lit(97L)).cast("double") / 97.0).cast("float"))
          .as("embedding"))
    }
    val corpusIdx = Pipelines.corpusNearDupIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text").persist()
    // one line per doc, ending in terminal punctuation (the C4 line rule)
    val body = ("the quick brown fox jumps over the lazy dog and then runs far away " * 3).trim
    val rejected = scala.collection.mutable.ArrayBuffer.empty[Long]
    def ingestBatch(b: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val curated = Pipelines.curateBatch(b, "doc_id", "text", corpusIdx,
        gopherMinWords = 10, c4MinKeptLines = 1L, htmlMinRatio = 0.0)
      val emb = embed(curated).persist()
      val dupIds = if (ivf.batchesIngested == 0L) Set.empty[Long]
        else ivf.nearDups(emb, minCos = 0.9999)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      rejected ++= dupIds
      val novel = emb.filter(!col("vec_id").isin(dupIds.toSeq: _*))
      ivf.ingest(novel, id)
      emb.unpersist(); ()
    }
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(ingestBatch _).start()
    try {
      // batch 0: two good docs + one that dies at the Gopher gate
      in.addData((1L, body + " alpha."), (2L, body + " beta."), (3L, "too short."))
      q.processAllAvailable()
      // batch 1: a semantic copy of doc 1 (same text, new id) + a novel doc
      in.addData((10L, body + " alpha."), (11L, body + " gamma gamma."))
      q.processAllAvailable()
    } finally q.stop()
    val indexed = ivf.index(spark).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(indexed === Set(1L, 2L, 11L),
      s"expected curation to drop 3, the ANN gate to drop 10; got $indexed")
    assert(rejected.toSet === Set(10L), s"expected doc 10 rejected, got $rejected")
    corpusIdx.unpersist()
  }

  test("ingest-time near-dup: a re-streamed vector flags its indexed twin") {
    val s = spark
    import s.implicits._
    val all = vecs(60)
    val dir = Files.createTempDirectory("graft_sivf2").toString
    val ivf = StreamingIvf.create(dir, nCells = 8, refineEvery = 100)
    ivf.ingest(spark.createDataFrame(all.map(v => (v.vec_id, v.embedding)))
      .toDF("vec_id", "embedding"), 0L)
    // a new batch that duplicates three indexed embeddings under new ids
    val dup = spark.createDataFrame(all.take(3).map(v =>
        (v.vec_id + 10000L, v.embedding)))
      .toDF("vec_id", "embedding")
    val hits = ivf.nearDups(dup, minCos = 0.9999, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits === all.take(3).map(v => (v.vec_id + 10000L, v.vec_id)).toSet,
      s"expected each duplicate to flag its twin, got $hits")
  }
}
