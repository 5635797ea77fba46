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
