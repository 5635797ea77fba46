package graft.streaming

import graft.ops.TopK
import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ANN index maintenance: an IVF index kept current over an
  * unbounded embedding stream — the missing streaming member of the
  * batch ANN family (x15 IVF, x40 two-level, x83 IVF,SQ8). The batch
  * operators assume the corpus is already on disk; a crawl pipeline
  * instead receives embeddings continuously and must answer "nearest
  * neighbors so far" at any time, without re-clustering from scratch
  * per batch.
  *
  * Design — the production incremental-IVF pattern (assign-on-ingest,
  * periodic re-train + atomic generation cutover):
  *  - '''Ingest''' (one `foreachBatch` call per micro-batch): assign the
  *    batch's vectors to their nearest CURRENT centroid — a narrow
  *    broadcast-argmax pass ([[Similarity.assignCells]]), no shuffle of
  *    embeddings — and append (vec_id, embedding, cell) to the index
  *    store under `gen=<g>/batch=<id>`. The batch-id-addressed directory
  *    is overwritten whole, so a replayed micro-batch lands idempotently
  *    (the same exactly-once convention as [[Pipelines.bronzeSink]]).
  *    Centroids bootstrap from the FIRST batch (first `nCells` vectors
  *    by id — deterministic, like the batch IVF init).
  *  - '''Periodic refine''': every `refineEvery` batches, Lloyd-refine
  *    the centroids over the accumulated corpus
  *    ([[Similarity.kmeansRefine]] — exact-decimal means, reproducible
  *    under any partitioning), REBUILD the assignments under the new
  *    centroids, and write both as generation g+1; the generation marker
  *    file is written last, so readers cut over atomically and a crash
  *    mid-rebuild leaves the previous generation intact. Assign-on-ingest
  *    drifts as centroids age — the periodic rebuild bounds that drift,
  *    which is exactly the compaction/re-index rhythm production ANN
  *    systems run in the background.
  *  - '''Query''': probe the latest complete generation — assign queries
  *    to their `nprobe` nearest centroids, equi-join the index on cell,
  *    exact-cosine the candidates, two-phase top-k. Identical search
  *    shape to the batch [[Similarity.ivfTopK]].
  *
  * Scale shape: per micro-batch work is narrow and batch-sized (one
  * broadcast argmax + one append); the refine touches the accumulated
  * corpus once per `refineEvery` batches with map-side-combinable
  * aggregations; queries read one generation's parquet with cell
  * pruning. Nothing corpus-sized ever reaches the driver — the only
  * driver state is the current centroid table (`nCells` rows) and the
  * batch counter. A restart reloads both from the store
  * ([[StreamingIvf.load]]).
  *
  * Reference seam: the reference pipeline has no ANN surface at all
  * (its streams are market JSON); this is LLM-data-pipeline tier, the
  * streaming form of the x15/x83 batch operators. */
final class StreamingIvf private (
    val indexDir: String, nCells: Int, refineEvery: Int, kmeansIters: Int,
    private var gen: Long, private var nBatches: Long,
    private var centroids: Option[DataFrame]) extends Serializable {

  private def genDir(g: Long) = s"$indexDir/gen=$g"
  private def centsPath(g: Long) = s"$indexDir/centroids/gen=$g"
  private def markerPath = s"$indexDir/_LATEST_GEN"

  /** Tmp+rename marker publish (the [[BatchStore]]/compact protocol) —
    * `fs.create(overwrite=true)` would truncate-then-write, and with
    * [[pruneGenerations]] deleting superseded generations the marker is
    * the ONLY pointer to live data; a crash mid-write must leave the
    * previous marker intact, not an empty file. */
  private def writeMarker(spark: SparkSession, g: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/._gen_marker_tmp")
    val out = fs.create(tmp, true)
    try out.write(g.toString.getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(markerPath)
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"StreamingIvf: marker rename failed at $dst")
  }

  /** The current centroid table (cid, c_emb) — `nCells` rows. */
  def centroidTable: Option[DataFrame] = centroids

  /** Latest complete generation (bumps on every refine cutover). */
  def generation: Long = synchronized(gen)

  /** Non-empty micro-batches ingested by THIS handle (not persisted —
    * a recovered handle restarts its refine cadence). */
  def batchesIngested: Long = synchronized(nBatches)

  /** The latest complete generation's assignments
    * (vec_id, embedding, cell). */
  def index(spark: SparkSession): DataFrame =
    spark.read.parquet(genDir(gen))

  /** foreachBatch hook: assign-on-ingest + idempotent append + periodic
    * refine/rebuild. Streaming guarantees micro-batches are sequential,
    * so no cross-batch races; `synchronized` guards ad-hoc driver-side
    * callers only. */
  def ingest(batch0: DataFrame, batchId: Long): Unit = synchronized {
    val spark = batch0.sparkSession
    val batch = batch0.select(col("vec_id"), col("embedding"))
    if (batch.isEmpty) return
    val cents = centroids.getOrElse {
      val init = batch.orderBy(col("vec_id")).limit(nCells)
        .select(col("vec_id").as("cid"), col("embedding").as("c_emb"))
        .persist()
      init.count()
      init.write.mode("overwrite").parquet(centsPath(gen))
      writeMarker(spark, gen)
      centroids = Some(init)
      init
    }
    // write-then-rename (BatchStore): readers of index() never see a
    // torn slot between a crash and the engine's replay of the batch
    BatchStore.writeSlot(
      Similarity.assignCells(batch, "vec_id", "embedding", cents, 1)
        .select(col("vec_id"), col("embedding"), col("cell")),
      s"${genDir(gen)}/batch=$batchId")
    nBatches += 1
    if (nBatches % refineEvery == 0) refine(spark)
  }

  /** Re-train centroids over the accumulated corpus and rebuild the
    * assignments as generation g+1; cut over only after both land, then
    * prune superseded generations (see [[pruneGenerations]] — without
    * it every refine would permanently DOUBLE the index's disk
    * footprint, since the rebuild copies the whole corpus into the new
    * generation and the old one never shrinks). */
  def refine(spark: SparkSession): Unit = synchronized {
    val corpus = index(spark).select(col("vec_id"), col("embedding")).persist()
    try {
      val newCents = Similarity
        .kmeansRefine(corpus, centroids.get, kmeansIters).persist()
      newCents.count()
      val next = gen + 1
      newCents.write.mode("overwrite").parquet(centsPath(next))
      BatchStore.writeSlot(
        Similarity.assignCells(corpus, "vec_id", "embedding", newCents, 1)
          .select(col("vec_id"), col("embedding"), col("cell")),
        s"${genDir(next)}/batch=rebuild")
      writeMarker(spark, next) // atomic cutover: marker is written LAST
      centroids.foreach(_.unpersist())
      centroids = Some(newCents)
      gen = next
    } finally corpus.unpersist()
    pruneGenerations(spark)
  }

  /** Delete generations superseded by the marker — data AND centroid
    * directories below the current generation. Safe at any moment: the
    * marker (written LAST at cutover) names the only generation readers
    * touch, so pruning after the marker landed can never be observed;
    * a crash mid-prune just leaves some stale directories for the next
    * prune. In-flight queries against an OLD handle are the caller's
    * lifecycle to drain (same contract as any compact-then-read race
    * on generational storage). */
  def pruneGenerations(spark: SparkSession): Unit = synchronized {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = gen
    val root = new org.apache.hadoop.fs.Path(indexDir)
    if (fs.exists(root)) fs.listStatus(root).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("gen=") &&
        scala.util.Try(n.stripPrefix("gen=").toLong).toOption.exists(_ < cur))
        fs.delete(s.getPath, true)
    }
    val cents = new org.apache.hadoop.fs.Path(s"$indexDir/centroids")
    if (fs.exists(cents)) fs.listStatus(cents).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("gen=") &&
        scala.util.Try(n.stripPrefix("gen=").toLong).toOption.exists(_ < cur))
        fs.delete(s.getPath, true)
    }
  }

  /** IVF top-k over the index as of the latest complete generation —
    * the [[Similarity.ivfTopK]] search shape against the streamed
    * corpus. Queries: (q_id, q_emb). */
  def topK(queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    val spark = queries.sparkSession
    val cents = centroids.getOrElse(
      throw new IllegalStateException("StreamingIvf: no batch ingested yet"))
    val q = Similarity.assignCells(queries, "q_id", "q_emb", cents, nprobe)
      .select("q_id", "q_emb", "cell")
    val scored = index(spark).join(broadcast(q), "cell")
      .select(col("q_id"), col("vec_id"),
        Similarity.cosine(col("q_emb"), col("embedding")).as("cos"))
    TopK.perGroup(scored, Seq(col("q_id")),
      Seq(col("cos").desc, col("vec_id")), k)
  }

  /** Ingest-time near-dup check (the embedding analog of
    * [[Pipelines.streamingIncrementalNearDup]]): before a batch lands,
    * probe it against the CURRENT index and emit
    * (vec_id, neighbor_id, cos) for near-parallel pairs — "is this new
    * embedding a semantic copy of anything already indexed?" at
    * ingestion time. Cell-pruned like every probe here. */
  def nearDups(batch: DataFrame, minCos: Double, nprobe: Int = 1): DataFrame = {
    val q = batch.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    topK(q, k = 1, nprobe = nprobe)
      .filter(col("cos") >= minCos)
      .select(col("q_id").as("vec_id"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }
}

object StreamingIvf {
  /** Fresh index at `indexDir` (must not hold a previous index). */
  def create(indexDir: String, nCells: Int, refineEvery: Int = 4,
             kmeansIters: Int = 2): StreamingIvf = {
    require(nCells > 0 && refineEvery > 0 && kmeansIters >= 0)
    new StreamingIvf(indexDir, nCells, refineEvery, kmeansIters,
      gen = 0L, nBatches = 0L, centroids = None)
  }

  /** Recover an index from its store: reload the latest complete
    * generation's centroids (the marker is only ever written after its
    * generation landed, so this never sees a torn rebuild). The marker
    * is a cache: if a crash landed between its delete and rename, fall
    * back to the max `_SUCCESS`-committed centroid generation —
    * generations only increase and are published before the marker. */
  def load(spark: SparkSession, indexDir: String, nCells: Int,
           refineEvery: Int = 4, kmeansIters: Int = 2): StreamingIvf = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$indexDir/_LATEST_GEN")
    val g =
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      } else {
        val cd = new org.apache.hadoop.fs.Path(s"$indexDir/centroids")
        require(fs.exists(cd), s"no index marker or centroids at $indexDir")
        val gens = fs.listStatus(cd)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen=") &&
            fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
          .map(_.getPath.getName.stripPrefix("gen=").toLong)
        require(gens.nonEmpty, s"no committed centroid generation at $indexDir")
        gens.max
      }
    val cents = spark.read.parquet(s"$indexDir/centroids/gen=$g").persist()
    cents.count()
    new StreamingIvf(indexDir, nCells, refineEvery, kmeansIters,
      gen = g, nBatches = 0L, centroids = Some(cents))
  }
}
