package graft.multimodal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Staged planted-media corpora for the x87/x89 perceptual-dedup
  * queries (r14 verdict task: generation through REAL codec round-trips
  * is the right proof but the wrong place — in-query, it re-encoded
  * 15 k PNGs/WAVs on every bench rep, ~5 s of pure fixture synthesis
  * per x87 rep that a real pipeline never pays per query).
  *
  * Discipline (the classifier_weights.parquet shape, adapted for a
  * corpus too big to commit): the corpora are deterministic functions of
  * doc_id alone, generated ONCE for the doc-id UNIVERSE (0 until 5000 —
  * the sf0.1 superset; every smaller SF's doc_ids nest inside it),
  * published atomically ([[graft.streaming.BatchStore.writeSlot]]) under
  * `fixtures/media_corpus/`, and READ by the queries with a broadcast
  * semi-join against the current SF's doc_ids (`id % 20000000` recovers the
  * base doc: planted ids are d / d+20000000 / d+40000000 with d < 20000000).
  * This is also the honest 100-TB shape: media is a table ingestion
  * wrote once, not something a dedup query synthesizes.
  *
  * Regeneration CLI: `runMain graft.BuildMediaFixtures [dir]` (or just
  * delete the directory — the first query rebuilds it). Determinism: the
  * pixel/sample generators are exact integer arithmetic and the hash
  * consumes DECODED pixels, so a re-generated fixture always reproduces
  * the same query results even if codec bytes differ across JDKs. */
object MediaFixtures {

  /** doc-id universe the fixture covers: sf0.1's 0 until 5000 by
    * default (the smaller SFs' doc_ids are strict subsets —
    * TESTDATA.md); env-overridable for larger validation tiers (sf1's
    * 50000). Must stay below the 20000000 planted-id stride, and a
    * fixture dir is only valid for ONE universe (point
    * GRAFT_MEDIA_FIXTURE_DIR somewhere fresh when overriding). */
  def UniverseDocs: Long = {
    val v = sys.env.get("GRAFT_MEDIA_UNIVERSE_DOCS")
      .map(_.toLong).getOrElse(5000L)
    require(v > 0 && v < 20000000L,
      s"GRAFT_MEDIA_UNIVERSE_DOCS out of (0, 20000000): $v")
    v
  }

  /** Env override, else working-directory-relative (no machine-specific
    * absolute path baked into library code). */
  def defaultDir: String = sys.env.getOrElse(
    "GRAFT_MEDIA_FIXTURE_DIR",
    new java.io.File("fixtures/media_corpus").getAbsolutePath)

  private[graft] def imagesPath(dir: String) = s"$dir/images.parquet"
  private[graft] def audioPath(dir: String) = s"$dir/audio.parquet"

  /** Planted-id stride the fixture's id scheme uses (d / d+stride /
    * d+2·stride). Part of the reuse stamp: a fixture built under an
    * older scheme must NOT be silently accepted. */
  val IdStride = 20000000L

  /** Expected stamp contents for the current generator + universe. */
  private def stampText: String =
    s"universe=$UniverseDocs;stride=$IdStride;gen=2"

  private def stampPath(path: String) = new Path(path, "_graft_fixture_meta")

  /** A fixture slot is reusable only if it is _SUCCESS-committed AND its
    * stamp matches the current universe size + id stride + generator
    * version — a dir built before the +20000 → +20000000 stride
    * migration (or for a different GRAFT_MEDIA_UNIVERSE_DOCS) would
    * otherwise be accepted while the semi-join now does
    * pmod(id, 20000000), silently dropping every planted variant row. */
  private[graft] def reusable(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(p, "_SUCCESS"))) return false
    val sp = stampPath(path)
    if (!fs.exists(sp)) return false
    val in = fs.open(sp)
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    got == stampText
  }

  /** Write the reuse stamp AFTER the slot commit: a crash between the
    * two leaves an unstamped dir that the next caller regenerates
    * (idempotent), never a stamped dir with torn data. */
  private def writeStamp(spark: SparkSession, path: String): Unit = {
    val sp = stampPath(path)
    val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(sp, true)
    try out.write(stampText.getBytes("UTF-8")) finally out.close()
  }

  private def universe(spark: SparkSession): DataFrame =
    spark.range(UniverseDocs).toDF("doc_id")

  /** Materialize the image corpus if absent or stamped for a different
    * universe/stride; returns its path. Synchronized: two concurrent
    * first-touch callers would otherwise race on BatchStore's shared
    * `.inflight-` temp for the same slot. */
  def ensureImages(spark: SparkSession, dir: String = defaultDir): String =
    synchronized {
      val path = imagesPath(dir)
      if (!reusable(spark, path)) {
        graft.streaming.BatchStore.writeSlot(
          Multimodal.imageCorpus(universe(spark)).toDF(), path)
        writeStamp(spark, path)
      }
      path
    }

  /** Materialize the audio corpus if absent or stamped for a different
    * universe/stride; returns its path. Synchronized — see
    * [[ensureImages]]. */
  def ensureAudio(spark: SparkSession, dir: String = defaultDir): String =
    synchronized {
      val path = audioPath(dir)
      if (!reusable(spark, path)) {
        graft.streaming.BatchStore.writeSlot(
          Multimodal.audioCorpus(universe(spark)).toDF(), path)
        writeStamp(spark, path)
      }
      path
    }

  private def semiJoin(fix: DataFrame, idCol: String,
                       docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id").cast(LongType).as("_d")).distinct()
    fix.join(broadcast(ids),
      pmod(col(idCol), lit(IdStride)) === col("_d"), "left_semi")
  }

  /** The staged image corpus restricted to `docs`' doc_ids — same rows
    * as `Multimodal.imageCorpus(docs)`, read instead of re-encoded. */
  def stagedImages(docs: DataFrame, dir: String = defaultDir): Dataset[ImageAsset] = {
    val spark = docs.sparkSession
    val path = ensureImages(spark, dir)
    // conditional spread (guide §2.5): the decode downstream of this
    // scan is heavy per-row compute, and the small staged fixture file
    // yields far fewer splits than cores
    graft.ops.Spread.toCores(semiJoin(spark.read.parquet(path), "img_id", docs))
      .as[ImageAsset](org.apache.spark.sql.Encoders.product[ImageAsset])
  }

  /** The staged audio corpus restricted to `docs`' doc_ids — same rows
    * as `Multimodal.audioCorpus(docs)`, read instead of re-encoded. */
  def stagedAudio(docs: DataFrame, dir: String = defaultDir): Dataset[AudioAsset] = {
    val spark = docs.sparkSession
    val path = ensureAudio(spark, dir)
    // conditional spread — same rationale as stagedImages
    graft.ops.Spread.toCores(semiJoin(spark.read.parquet(path), "aud_id", docs))
      .as[AudioAsset](org.apache.spark.sql.Encoders.product[AudioAsset])
  }
}
