package graft.silver

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sharded corpus export with an integrity manifest —
  * the hand-off artifact between a curation pipeline and a training
  * run (reference analog: the bronze writer's idempotent-batch
  * contract, `consumers/db_writer.py:44-73`, applied to the corpus
  * tier). The shard of a document is a pure function of its content
  * hash and id, so the same corpus always lands in the same shards
  * regardless of input partitioning or row order, and the manifest
  * (per-shard doc/token counts, an order-independent XOR content
  * checksum, id bounds) lets the consumer verify an export without
  * re-reading the data.
  */
object Export {

  /** Per-shard manifest of a deterministic `(content_hash + doc_id) %
    * nShards` assignment: (shard, n_docs, n_tokens, content_xor,
    * min_doc, max_doc). `content_xor` is the XOR of the member
    * documents' poly-hash fingerprints — order-independent and
    * overflow-free where a SUM of 10^10 hashes would wrap, so two
    * independently-produced exports of the same corpus compare equal
    * checksum-by-checksum.
    *
    * Scale shape: one narrow projection (hash + token count, both
    * codegen'd) and one `nShards`-row hash aggregation with map-side
    * combine — the only shuffle moves nShards rows per map task. */
  def shardManifest(docs: DataFrame, id: Column, text: Column,
                    nShards: Int = 64): DataFrame =
    sharded(docs, id, text, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        expr("bit_xor(hk)").as("content_xor"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  /** The shard assignment both [[shardManifest]] and [[writeSharded]]
    * share: null text hashes to 0 so every document gets a shard. */
  private def sharded(docs: DataFrame, id: Column, text: Column,
                      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs.select(id.as("doc_id"), text.as("text"),
        TextOps.wsTokenCount(text).as("n_tokens"),
        coalesce(TextOps.fingerprint(TextOps.norm(text)), lit(0L)).as("hk"))
      .withColumn("shard", pmod(col("hk") + col("doc_id"), lit(nShards.toLong)))
  }

  /** Write the corpus as `outDir/shard=K/part-*.parquet` and return the
    * manifest computed from the FILES JUST WRITTEN (not the input), so
    * the returned frame certifies what is actually on disk; the caller
    * compares it against [[shardManifest]] of the source to validate
    * the export end-to-end.
    *
    * Scale shape: deliberately NO repartition before the write — each
    * input task appends independently into the shard directories it
    * sees (dynamic `partitionBy`), so write parallelism equals input
    * parallelism and no task ever owns a whole shard; a
    * `repartition(shard)` would make one task write corpus/nShards
    * rows (~100 GB at 100 TB / 1024 shards). The cost is more, smaller
    * files (≤ tasks × nShards, further split by `maxRecordsPerFile`),
    * which is what compaction policies are for — a skewed-task write
    * is not recoverable after the fact. */
  def writeSharded(docs: DataFrame, id: Column, text: Column, outDir: String,
                   nShards: Int = 64, maxRecordsPerFile: Long = 1000000L): DataFrame = {
    sharded(docs, id, text, nShards)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(outDir)
    val back = docs.sparkSession.read.parquet(outDir)
    shardManifest(back, col("doc_id"), col("text"), nShards)
  }

  /** Manifest of a packed-sequence table (`TextOps.pack` output or its
    * parquet read-back): per shard, distinct doc/sequence counts, span
    * rows, total tokens, an order-independent XOR checksum over the
    * span triples, and the sequence-id bounds. The checksum folds each
    * (doc_id, seq_id, n_tok_in_seq) span through the same mod-P
    * polynomial the corpus fingerprints use — every operand is reduced
    * mod 1e9+7 before multiplying, so the arithmetic stays far inside
    * 64 bits for any doc id (DuckDB raises on BIGINT overflow where
    * Spark would wrap silently; bounded math keeps both engines equal).
    *
    * Scale shape: one nShards-row hash aggregation with map-side
    * combine — the same profile as [[shardManifest]]. */
  def packedManifest(packed: DataFrame): DataFrame =
    packed.groupBy(col("shard").cast(LongType).as("shard"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("seq_id")).as("n_seqs"),
        count(lit(1)).as("n_spans"),
        sum(col("n_tok_in_seq")).as("n_tokens"),
        expr("bit_xor((((doc_id % 1000000007) * 31 + seq_id) % 1000000007 * 31" +
          " + n_tok_in_seq) % 1000000007)").as("span_xor"),
        min(col("seq_id")).as("min_seq"),
        max(col("seq_id")).as("max_seq"))

  /** x60 — the packed-sequence training artifact: curated documents →
    * fixed-`seqLen`-token sequence spans (`TextOps.pack`) → sharded
    * parquet at `outDir/shard=K/` → manifest computed from the FILES
    * JUST WRITTEN, certifying what is actually on disk. This is the
    * hand-off between the curation tier and a training run: a trainer
    * points one data-loader at each shard directory, replays spans in
    * (seq_id, doc_id) order, and verifies the export against the
    * manifest without re-reading the corpus.
    *
    * Scale shape: pack's cumsum is windowed WITHIN a shard (never
    * global — see `TextOps.pack`); the write keeps input parallelism
    * via dynamic `partitionBy` exactly like [[writeSharded]], with
    * `sortWithinPartitions(shard, seq_id)` so each written file is
    * training-replay-ordered at zero extra shuffle (sort is per-task);
    * the manifest is an nShards-row aggregation. */
  def packedExport(docs: DataFrame, id: Column, text: Column, outDir: String,
                   seqLen: Int = 128, nShards: Int = 8,
                   maxRecordsPerFile: Long = 1000000L): DataFrame = {
    // tok_off is computed at WRITE time so the on-disk spans carry
    // their attention-mask geometry — the trainer reads [tok_off,
    // tok_off + n_tok_in_seq) per segment instead of re-deriving
    // offsets with another shuffle on every epoch; packWithOffsets
    // derives it arithmetically, zero shuffles beyond pack's own
    TextOps.packWithOffsets(docs, id, text, seqLen, nShards)
      .sortWithinPartitions("shard", "seq_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(outDir)
    packedManifest(docs.sparkSession.read.parquet(outDir))
  }

  /** x76 — quota-binned compaction plan over a FILE inventory: the
    * small-files answer [[writeSharded]]'s scaladoc defers to (its
    * skew-safe write trades file count for parallelism; this plans the
    * rewrite that restores file size). Within each shard, files are
    * walked in `file_id` order and assigned bin = ⌊bytes-before /
    * target⌋ — the Delta-OPTIMIZE-style next-fit quota policy as one
    * per-shard window prefix sum: every non-final bin's cumulative
    * stream crosses its quota boundary, so bin sizes land within
    * (target − max-file, target + max-file) bytes. Exact
    * integer arithmetic end to end (`DIV`, no doubles), so the plan is
    * oracle-hash-comparable and byte-stable across engines.
    *
    * Scale shape: operates on file METADATA — ~10⁶ rows for 100 TB at
    * 128 MB files, thousands of rows per shard — with one shuffle on
    * shard and per-shard windows (never a global window; shards are
    * the parallelism unit exactly as in the write path). The data
    * itself is untouched: planning cost is independent of corpus size.
    * Output: one row per file, (shard, file_id, bytes, bin). */
  def compactionPlan(files: DataFrame, shard: Column, fileId: Column,
                     bytes: Column, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.select(shard.as("shard"), fileId.as("file_id"),
        bytes.cast(LongType).as("bytes"))
      .withColumn("_cum", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"_cum DIV ${targetBytes}L"))
      .drop("_cum")
  }

  /** Per-bin summary of a [[compactionPlan]]: how many files merge into
    * each planned output file and the resulting sizes — the report an
    * operator reads before green-lighting the rewrite. */
  def compactionSummary(plan: DataFrame): DataFrame =
    plan.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
        min(col("file_id")).as("min_file"), max(col("file_id")).as("max_file"))

  /** x79 — manifest diff between two exports of a corpus: which shards
    * were added, removed, changed, or left untouched between version A
    * and version B — the incremental-re-export decision table (ship
    * only `changed`/`added` shards; a consumer holding A's manifest
    * verifies B shard by shard). `unchanged` requires the
    * order-independent XOR checksum AND both counts to agree, so a
    * same-count content edit still surfaces (the checksum exists for
    * exactly this). Inputs are [[shardManifest]] outputs; the join is
    * nShards rows a side — pure metadata, corpus-size-independent.
    * Output: (shard, n_docs_a, n_docs_b, docs_delta, status). */
  def manifestDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("shard"), col("n_docs").as("n_docs_a"),
      col("n_tokens").as("n_tokens_a"), col("content_xor").as("xor_a"))
    val r = b.select(col("shard"), col("n_docs").as("n_docs_b"),
      col("n_tokens").as("n_tokens_b"), col("content_xor").as("xor_b"))
    l.join(r, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_docs_a"), lit(0L)).as("n_docs_a"),
        coalesce(col("n_docs_b"), lit(0L)).as("n_docs_b"),
        (coalesce(col("n_docs_b"), lit(0L))
          - coalesce(col("n_docs_a"), lit(0L))).as("docs_delta"),
        when(col("xor_a").isNull, "added")
          .when(col("xor_b").isNull, "removed")
          .when(col("xor_a") === col("xor_b")
            && col("n_docs_a") === col("n_docs_b")
            && col("n_tokens_a") === col("n_tokens_b"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Execute a compaction plan over a [[writeSharded]]-layout directory:
    * list `shard=K/part-*` file metadata (driver-side, the same
    * metadata walk every table format's OPTIMIZE does), plan bins at
    * `targetBytes`, then rewrite `srcDir` → `dstDir` with ONE shuffle
    * keyed on (shard, bin): all of a bin's rows land in one task (hash
    * partitioning never splits a key), and the `shard=K/bin=J/` output
    * layout keeps two bins that happen to share a task in separate
    * files — exactly one data file per planned bin, and no task ever
    * owns a whole shard (the hazard the write path avoided). Rows join
    * to their file's bin via `input_file_name()` against a broadcast
    * of the metadata-sized plan. Returns the plan's per-bin summary;
    * callers verify the rewrite with [[shardManifest]] equality on the
    * read-back (ExportSpec does). `dstDir` must differ from `srcDir` —
    * swap-in is the caller's (atomic-rename/metastore) concern. */
  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
              dstDir: String, targetBytes: Long): DataFrame = {
    require(srcDir != dstDir, "compact rewrites src into a fresh dstDir")
    import org.apache.hadoop.fs.Path
    val fs = new Path(srcDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus returns null (not empty) when nothing matches / the dir
    // is missing — an unexpected layout must fail loudly, not NPE or
    // silently rewrite zero rows.
    val inv = Option(fs.globStatus(new Path(srcDir, "shard=*/part-*")))
      .map(_.toSeq).getOrElse(Seq.empty).map { st =>
        val p = st.getPath
        (p.getParent.getName.stripPrefix("shard=").toLong,
          s"${p.getParent.getName}/${p.getName}", st.getLen)
      }
    require(inv.nonEmpty,
      s"compact: no shard=*/part-* files under $srcDir — not a writeSharded layout")
    val files = spark.createDataFrame(inv).toDF("shard", "file_id", "bytes")
    val plan = compactionPlan(files, col("shard"), col("file_id"),
      col("bytes"), targetBytes)
    // suffix key (shard=K/part-...) — input_file_name() returns a full
    // URI whose scheme/prefix need not match the listing's
    val rows = spark.read.parquet(srcDir)
      .withColumn("file_id", regexp_extract(input_file_name(),
        "(shard=[0-9]+/[^/]+)$", 1))
    val joined = rows.join(broadcast(plan.select("shard", "file_id", "bin")),
        Seq("shard", "file_id"))
      .drop("file_id")
    // A row whose input_file_name misses the regexp or the plan would
    // silently vanish through the inner join; count both sides once
    // (metadata-cheap: count aggregates, no collect of data) and refuse
    // to write a lossy rewrite.
    val (nSrc, nJoined) = (rows.count(), joined.count())
    require(nSrc == nJoined,
      s"compact: $nSrc source rows but only $nJoined matched the plan — " +
        "unexpected file layout; aborting before writing a lossy rewrite")
    joined.repartition(col("shard"), col("bin"))
      .write.mode("overwrite").partitionBy("shard", "bin").parquet(dstDir)
    compactionSummary(plan)
  }
}
