package graft.silver

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sharded-export contract: the on-disk layout writeSharded produces,
  * the file-size cap, and the manifest's role as an integrity check —
  * the read-back manifest must equal the source manifest bit-for-bit,
  * and must CHANGE if the corpus changes. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"document number $i with some words"))
      .toDF("doc_id", "text")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("shard").collect().map(_.toSeq).toSeq

  test("writeSharded lays out shard=K dirs, respects maxRecordsPerFile, and round-trips the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    val docs = corpus(200)
    val expected = Export.shardManifest(docs, col("doc_id"), col("text"), nShards = 8)
    val got = Export.writeSharded(docs, col("doc_id"), col("text"), dir,
      nShards = 8, maxRecordsPerFile = 10L)
    assert(canon(got) === canon(expected))
    val shardDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(shardDirs.nonEmpty && shardDirs.forall(_.getName.startsWith("shard=")))
    // every data file honors the record cap
    val files = shardDirs.flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val c = spark.read.parquet(f.getAbsolutePath).count()
      assert(c <= 10L, s"${f.getName} has $c rows > maxRecordsPerFile")
    }
    // the stored shard partition column equals the recomputed assignment
    val back = spark.read.parquet(dir)
    val mismatch = back
      .withColumn("_re", pmod(col("hk") + col("doc_id"), lit(8L)))
      .filter(col("shard").cast("long") =!= col("_re")).count()
    assert(mismatch === 0L)
  }

  test("shard assignment disperses at runtime: every shard populated, no shard dominates") {
    // the bucket-degeneration lesson (PLANS.md session-5 part 3): a
    // planned partitioning proves nothing about the runtime key
    // distribution — pin the dispersion itself
    val m = Export.shardManifest(corpus(400), col("doc_id"), col("text"), nShards = 8)
      .select("shard", "n_docs").as[(Long, Long)].collect().toMap
    assert(m.keySet === (0L until 8L).toSet, s"unpopulated shard: $m")
    assert(m.values.max < 3L * m.values.min + 8,
      s"shard skew beyond the hash-balance band: $m")
  }

  test("shard assignment is a pure function of content: partitioning and row order do not matter") {
    val docs = corpus(100)
    val a = Export.shardManifest(docs, col("doc_id"), col("text"), nShards = 8)
    val b = Export.shardManifest(docs.repartition(13).orderBy(desc("doc_id")),
      col("doc_id"), col("text"), nShards = 8)
    assert(canon(a) === canon(b))
  }

  test("the XOR checksum detects a single-document content change") {
    val docs = corpus(100)
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 42L, lit("tampered content")).otherwise(col("text")))
    val a = Export.shardManifest(docs, col("doc_id"), col("text"), nShards = 8)
      .select("shard", "content_xor").as[(Long, Long)].collect().toMap
    val b = Export.shardManifest(tampered, col("doc_id"), col("text"), nShards = 8)
      .select("shard", "content_xor").as[(Long, Long)].collect().toMap
    // doc 42 may also move shards; either way at least one checksum differs
    assert(a !== b)
  }

  test("null text gets hash 0 and still lands in a shard") {
    val docs = Seq((1L, "some real text here"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = Export.shardManifest(docs, col("doc_id"), col("text"), nShards = 4)
    assert(m.agg(sum("n_docs")).head().getLong(0) === 2L)
  }

  test("packedExport lays out shard=K dirs, files replay-ordered by seq_id, manifest certifies disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_packed").toString
    val docs = corpus(200)
    val got = Export.packedExport(docs, col("doc_id"), col("text"), dir,
      seqLen = 16, nShards = 4)
    // manifest of the files on disk == manifest of the pack computed in memory
    val expected = Export.packedManifest(
      graft.text.TextOps.pack(docs, col("doc_id"), col("text"), 16, 4))
    assert(canon(got) === canon(expected))
    // layout: shard=K directories only
    val shardDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(shardDirs.length === 4 && shardDirs.forall(_.getName.startsWith("shard=")))
    // every written file is replay-ordered: seq_id non-decreasing within the file
    val files = shardDirs.flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val seqs = spark.read.parquet(f.getAbsolutePath)
        .select("seq_id").collect().map(_.getLong(0))
      assert(seqs.sameElements(seqs.sorted), s"${f.getName} not seq-ordered")
    }
    // token conservation: manifest total == corpus token count (no spans lost)
    val corpusTok = docs
      .select(graft.text.TextOps.wsTokenCount(
        graft.text.TextOps.norm(col("text"))).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(got.agg(sum("n_tokens")).head().getLong(0) === corpusTok)
  }

  test("packed span checksum detects a single lost span") {
    val docs = corpus(60)
    val packed = graft.text.TextOps.pack(docs, col("doc_id"), col("text"), 16, 4)
    val a = Export.packedManifest(packed)
      .select("shard", "span_xor").as[(Long, Long)].collect().toMap
    val victim = packed.orderBy("shard", "seq_id", "doc_id").limit(1)
    val b = Export.packedManifest(packed.exceptAll(victim))
      .select("shard", "span_xor").as[(Long, Long)].collect().toMap
    assert(a !== b)
  }

  test("compactionPlan: per-shard next-fit quota bins — each non-final bin crosses its quota boundary") {
    val target = 300L
    val files = (0 until 40).map(i => (i.toLong % 4, i.toLong, 100L + i))
      .toDF("shard", "file_id", "bytes")
    val plan = Export.compactionPlan(files, col("shard"), col("file_id"),
      col("bytes"), targetBytes = target)
    val bins = Export.compactionSummary(plan)
      .select("shard", "bin", "bin_bytes")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val maxFile = 139L
    bins.foreach { case (shard, bs) =>
      val sorted = bs.sortBy(_._2)
      // bins are contiguous from 0 within the shard
      assert(sorted.map(_._2).toSeq === (0L until sorted.length).toSeq,
        s"shard $shard bins not contiguous: ${sorted.toSeq}")
      // quota property: the cumulative stream through each non-final
      // bin crosses that bin's boundary — sizes stay within
      // (target - maxFile, target + maxFile)
      val cum = sorted.map(_._3).scanLeft(0L)(_ + _).drop(1)
      sorted.dropRight(1).zip(cum).foreach { case ((_, b, bytes), c) =>
        assert(c >= (b + 1) * target, s"shard $shard bin $b quota not met: cum $c")
        assert(bytes > target - maxFile && bytes < target + maxFile,
          s"shard $shard bin $b size $bytes outside the quota band")
      }
    }
    // the whole inventory is planned, nothing dropped or duplicated
    assert(plan.count() === 40L)
  }

  test("manifestDiff classifies added/removed/changed/unchanged shards; a same-count edit still surfaces") {
    val docs = corpus(100)
    val a = Export.shardManifest(docs, col("doc_id"), col("text"), nShards = 16)
    // same doc count, one document's content edited (same shard: the
    // edit keeps the id and the assignment depends on hash + id, so the
    // doc may move shard — either way some shard must read 'changed')
    val edited = docs.withColumn("text",
      when(col("doc_id") === 7L, lit("edited content")).otherwise(col("text")))
    val d1 = Export.manifestDiff(a,
      Export.shardManifest(edited, col("doc_id"), col("text"), nShards = 16))
      .select("status").as[String].collect()
    assert(d1.contains("changed"), s"content edit invisible: ${d1.toSeq}")
    // identical corpus: everything unchanged
    val d0 = Export.manifestDiff(a, a).select("status").as[String].collect()
    assert(d0.forall(_ == "unchanged"), s"self-diff not clean: ${d0.toSeq}")
    // a removed shard: drop every doc of one shard from B
    val assigned = docs
      .withColumn("hk", coalesce(
        graft.text.TextOps.fingerprint(graft.text.TextOps.norm(col("text"))), lit(0L)))
      .withColumn("shard", pmod(col("hk") + col("doc_id"), lit(16L)))
    val victim = assigned.groupBy("shard").count()
      .orderBy("shard").limit(1).select("shard").as[Long].head()
    val b = assigned.filter(col("shard") =!= victim).select("doc_id", "text")
    val d2 = Export.manifestDiff(a,
      Export.shardManifest(b, col("doc_id"), col("text"), nShards = 16))
      .select("shard", "status").as[(Long, String)].collect().toMap
    assert(d2(victim) == "removed", s"dropped shard not flagged: $d2")
  }

  test("compact rewrites a many-small-files export into one file per planned bin, content intact") {
    val src = java.nio.file.Files.createTempDirectory("graft_compact_src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_compact_dst").toString
    val docs = corpus(200)
    val before = Export.writeSharded(docs, col("doc_id"), col("text"), src,
      nShards = 4, maxRecordsPerFile = 5L) // force many tiny files
    def dataFiles(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).flatMap { d =>
        val direct = d.listFiles().filter(f => f.getName.endsWith(".parquet"))
        val nested = d.listFiles().filter(_.isDirectory)
          .flatMap(_.listFiles().filter(f => f.getName.endsWith(".parquet")))
        direct ++ nested
      }
    val nBefore = dataFiles(src).length
    val summary = Export.compact(spark, src, dst, targetBytes = 64 * 1024L)
    val nBins = summary.count()
    val nAfter = dataFiles(dst).length
    assert(nAfter === nBins, s"expected one file per bin: $nAfter files, $nBins bins")
    assert(nAfter < nBefore, s"compaction did not shrink file count: $nBefore -> $nAfter")
    // content round-trips: the read-back manifest equals the source's
    val after = Export.shardManifest(spark.read.parquet(dst),
      col("doc_id"), col("text"), nShards = 4)
    assert(canon(after) === canon(before))
  }
}
