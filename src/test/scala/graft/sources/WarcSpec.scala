package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC framing: round-trip fidelity, strict malformed-framing
  * rejection (never resynchronize), binary payloads with embedded
  * CRLFs, and the Spark source path end-to-end into the curation
  * entry projection. */
class WarcSpec extends SparkSpec {

  private def rec(t: String, uri: String, body: Array[Byte]) = WarcRecord(
    t, uri, "2026-08-14T12:00:00Z", s"<urn:uuid:$uri>", "text/html", body)

  private val fixture = Seq(
    rec("warcinfo", "", "software: graft-test\r\n".getBytes(StandardCharsets.UTF_8)),
    rec("response", "https://example.org/a",
      "<html><body><p>hello crawl</p></body></html>".getBytes(StandardCharsets.UTF_8)),
    // payload containing CRLF CRLF — framing must use Content-Length,
    // never scan for the separator
    rec("response", "https://example.org/b",
      "first\r\n\r\nsecond".getBytes(StandardCharsets.UTF_8)),
    rec("request", "https://example.org/a",
      "GET /a HTTP/1.1\r\n".getBytes(StandardCharsets.UTF_8)))

  test("round-trip: write then parse preserves every record and payload byte") {
    val parsed = Warc.parseRecords(Warc.writeRecords(fixture))
    assert(parsed.size === 4)
    parsed.zip(fixture).foreach { case (p, f) =>
      assert(p.warc_type === f.warc_type)
      assert(p.target_uri === f.target_uri)
      assert(p.content.toSeq === f.content.toSeq)
    }
    assert(new String(parsed(2).content, StandardCharsets.UTF_8)
      === "first\r\n\r\nsecond", "CRLF CRLF inside a payload must survive")
  }

  test("malformed framing is refused with a position, never resynchronized") {
    val good = Warc.writeRecords(fixture)
    // truncate mid-payload
    val truncated = good.take(good.length - 30)
    val e1 = intercept[IllegalArgumentException](Warc.parseRecords(truncated))
    assert(e1.getMessage.contains("WARC framing error"))
    // corrupt the version line of the second record
    val text = new String(good, StandardCharsets.ISO_8859_1)
    val second = text.indexOf("WARC/1.0", 1)
    val corrupted = (text.substring(0, second) + "HTTP/1.0" +
      text.substring(second + 8)).getBytes(StandardCharsets.ISO_8859_1)
    val e2 = intercept[IllegalArgumentException](Warc.parseRecords(corrupted))
    assert(e2.getMessage.contains("expected WARC version line"))
    // bad Content-Length
    val bad = (text.replaceFirst("Content-Length: ", "Content-Length: x"))
      .getBytes(StandardCharsets.ISO_8859_1)
    val e3 = intercept[IllegalArgumentException](Warc.parseRecords(bad))
    assert(e3.getMessage.contains("Content-Length"))
  }

  test("Spark source: binaryFile -> records -> curation entry projection") {
    val dir = Files.createTempDirectory("graft_warc")
    Files.write(Paths.get(dir.toString, "seg-00001.warc"),
      Warc.writeRecords(fixture))
    Files.write(Paths.get(dir.toString, "seg-00002.warc"),
      Warc.writeRecords(Seq(rec("response", "https://example.org/c",
        "plain body".getBytes(StandardCharsets.UTF_8)))))
    val all = Warc.records(spark, dir.toString + "/*.warc").collect()
    assert(all.length === 5)
    val resp = Warc.responses(spark, dir.toString + "/*.warc")
      .orderBy("url").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(resp.map(_._1).toSeq === Seq("https://example.org/a",
      "https://example.org/b", "https://example.org/c"))
    assert(resp.head._2.contains("hello crawl"))
    // composes with the x70 extraction gate
    val extracted = graft.text.TextOps.htmlExtract(
        Warc.responses(spark, dir.toString + "/*.warc"),
        col("url"), col("raw_text"))
      .filter(col("doc_id") === "https://example.org/a")
      .head()
    assert(extracted.toString.contains("hello crawl"))
  }

  test("streaming: newly landed segment files arrive as micro-batches, each parsed once") {
    val dir = Files.createTempDirectory("graft_warc_stream")
    Files.write(Paths.get(dir.toString, "seg-1.warc"), Warc.writeRecords(fixture))
    val q = Warc.streamRecords(spark, dir.toString)
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_warc_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() === 4)
      // a second segment lands: only ITS records arrive (no reprocess)
      Files.write(Paths.get(dir.toString, "seg-2.warc"),
        Warc.writeRecords(Seq(rec("response", "https://example.org/z",
          "late segment".getBytes(StandardCharsets.UTF_8)))))
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() === 5)
      assert(spark.table("warc_stream")
        .filter(col("target_uri") === "https://example.org/z").count() === 1)
    } finally q.stop()
  }

  test("gzip: per-record members round-trip, one member per record") {
    val gz = Warc.writeGzipRecords(fixture)
    // really concatenated members: a second magic appears past the first
    assert((gz(0) & 0xff) === 0x1f && (gz(1) & 0xff) === 0x8b)
    assert(gz.drop(2).zip(gz.drop(3)).count {
      case (a, b) => (a & 0xff) == 0x1f && (b & 0xff) == 0x8b } >= 3,
      "expected one gzip member per record")
    val parsed = Warc.parseGzipRecords(gz)
    assert(parsed.size === 4)
    parsed.zip(fixture).foreach { case (p, f) =>
      assert(p.warc_type === f.warc_type)
      assert(p.target_uri === f.target_uri)
      assert(p.content.toSeq === f.content.toSeq)
    }
    // the sniffing dispatcher picks the right parser for both layouts
    assert(Warc.parseAnyRecords(gz).size === 4)
    assert(Warc.parseAnyRecords(Warc.writeRecords(fixture)).size === 4)
  }

  test("gzip: truncated and corrupted members are refused with a compressed offset") {
    val gz = Warc.writeGzipRecords(fixture)
    // truncate inside the last member's deflate data / trailer
    val e1 = intercept[IllegalArgumentException](
      Warc.parseGzipRecords(gz.take(gz.length - 6)))
    assert(e1.getMessage.contains("gzip member error"))
    // flip a bit inside the first member's DEFLATE data (header is 10
    // bytes, FLG=0 from GZIPOutputStream): either the inflater chokes or
    // the CRC32 verification catches the changed output — never silence
    val flipped = gz.clone()
    flipped(14) = (flipped(14) ^ 0x40).toByte
    val e2 = intercept[IllegalArgumentException](Warc.parseGzipRecords(flipped))
    assert(e2.getMessage.contains("gzip member error"))
    // header itself truncated
    val e3 = intercept[IllegalArgumentException](Warc.parseGzipRecords(gz.take(5)))
    assert(e3.getMessage.contains("truncated gzip header"))
    // a mis-framed WARC inside a VALID member carries both coordinates
    val inner = Warc.writeRecords(fixture).take(40) // truncated WARC bytes
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(inner); g.finish()
    val e4 = intercept[IllegalArgumentException](
      Warc.parseGzipRecords(bos.toByteArray))
    assert(e4.getMessage.contains("in gzip member #0"))
    assert(e4.getMessage.contains("WARC framing error"))
  }

  test("gzip truncation property: EVERY cut inside a member is refused; cuts at member boundaries yield exactly the prefix") {
    // per-record members: boundaries = cumulative per-record gz lengths
    val parts = fixture.map(r => Warc.writeGzipRecords(Seq(r)))
    val gz = parts.reduce(_ ++ _)
    val boundaries = parts.map(_.length).scanLeft(0)(_ + _).toSet
    var refused = 0
    (1 until gz.length).foreach { t =>
      if (boundaries.contains(t)) {
        // a cut exactly between members is indistinguishable from a
        // shorter file at this framing layer (gzip concatenation has no
        // global footer) — the export manifest's record counts are the
        // cross-file truncation guard; here the prefix must parse whole
        val prefix = Warc.parseGzipRecords(gz.take(t))
        assert(prefix.size === boundaries.count(b => b > 0 && b <= t))
      } else {
        intercept[IllegalArgumentException](Warc.parseGzipRecords(gz.take(t)))
        refused += 1
      }
    }
    assert(refused > gz.length - 10, s"only $refused/${gz.length} cuts refused")
  }

  test("mixed .warc/.warc.gz directory: batch and streaming ingest both layouts") {
    val dir = Files.createTempDirectory("graft_warc_mixed")
    Files.write(Paths.get(dir.toString, "seg-1.warc"), Warc.writeRecords(fixture))
    Files.write(Paths.get(dir.toString, "seg-2.warc.gz"),
      Warc.writeGzipRecords(Seq(rec("response", "https://example.org/gz",
        "gzipped segment".getBytes(StandardCharsets.UTF_8)))))
    val batch = Warc.records(spark, dir.toString).collect()
    assert(batch.length === 5)
    assert(batch.count(_.target_uri === "https://example.org/gz") === 1)
    val q = Warc.streamRecords(spark, dir.toString)
      .writeStream.format("memory").queryName("warc_mixed_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_warc_mixed_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_mixed_stream").count() === 5)
      // a late gzip segment lands: only ITS records arrive
      Files.write(Paths.get(dir.toString, "seg-3.warc.gz"),
        Warc.writeGzipRecords(Seq(rec("response", "https://example.org/gz2",
          "late gzip".getBytes(StandardCharsets.UTF_8)))))
      q.processAllAvailable()
      assert(spark.table("warc_mixed_stream").count() === 6)
      assert(spark.table("warc_mixed_stream")
        .filter(col("target_uri") === "https://example.org/gz2").count() === 1)
    } finally q.stop()
  }

  test("writeGzipShards: distributed re-export closes the crawl loop (read .warc.gz back from the export)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_warc_export").toString
    val recs = (0 until 40).map(i =>
      rec("conversion", s"https://example.org/d$i",
        s"curated body $i".getBytes(StandardCharsets.UTF_8)))
    val ds = spark.createDataset(recs).repartition(4)
    val manifest = Warc.writeGzipShards(ds, dir).collect()
    assert(manifest.map(_.getLong(1)).sum === 40L, "manifest counts all records")
    assert(manifest.forall(_.getString(0).endsWith(".warc.gz")))
    assert(manifest.forall(_.getLong(2) > 0L))
    // the export reads back through the ordinary source path — the
    // full loop: records -> .warc.gz segments -> records
    val back = Warc.records(spark, dir).collect()
    assert(back.length === 40)
    assert(back.map(_.target_uri).sorted.toSeq ===
      recs.map(_.target_uri).sorted)
    assert(back.forall(_.warc_type === "conversion"))
    // each segment is genuinely per-record-gzip: member count == records
    val m0 = manifest.head
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(
        m0.getString(0)).getPath match {
        case p if p.nonEmpty => p
        case _ => m0.getString(0)
      }))
    val magics = bytes.sliding(2).count(a =>
      (a(0) & 0xff) == 0x1f && (a(1) & 0xff) == 0x8b)
    assert(magics >= m0.getLong(1), "one gzip member per record expected")
  }

  test("CDX sidecar: seek-by-offset reads back exactly the indexed record") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_warc_cdx").toString
    val recs = (0 until 30).map(i =>
      rec("conversion", s"https://example.org/c$i",
        ("payload " * (i + 1) + i).getBytes(StandardCharsets.UTF_8)))
    Warc.writeGzipShards(spark.createDataset(recs).repartition(3), dir)
    val cdx = Warc.cdxIndex(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(cdx.length === 30, "one CDX row per record")
    assert(cdx.map(_._1).sorted.toSeq === recs.map(_.target_uri).sorted,
      "every record's URI is indexed")
    // members tile each segment exactly: offsets+lengths are contiguous
    cdx.groupBy(_._2).foreach { case (seg, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"$seg: first member not at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 + a._4 === b._3, s"$seg: gap/overlap after offset ${a._3}")
        case _ =>
      }
      val segBytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, seg))
      assert(sorted.last._3 + sorted.last._4 === segBytes.length.toLong,
        s"$seg: members do not tile the file")
    }
    // the point of the index: random-access one record WITHOUT scanning
    // its segment — both whole-buffer + offset and the range-read form
    val byUri = recs.map(r => r.target_uri -> r).toMap
    cdx.sortBy(_._1).take(7).foreach { case (uri, seg, off, len) =>
      val segBytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, seg))
      val got = Warc.recordAt(segBytes, off)
      assert(got.target_uri === uri)
      assert(got.content.toSeq === byUri(uri).content.toSeq,
        s"payload mismatch at $seg:$off")
      // simulated HTTP range request: just the [off, off+len) slice
      val range = java.util.Arrays.copyOfRange(
        segBytes, off.toInt, (off + len).toInt)
      assert(Warc.recordAt(range, 0L).target_uri === uri,
        "range-read member must parse standalone")
    }
    // the batch reader still ingests the directory despite the sidecars
    assert(Warc.records(spark, dir).count() === 30L)
  }

  test("WET conversion: extracted-text records round-trip through the parser") {
    val dir = Files.createTempDirectory("graft_wet")
    Files.write(Paths.get(dir.toString, "seg.warc"), Warc.writeRecords(fixture))
    val wet = Warc.wetRecords(spark, dir.toString + "/*.warc").collect()
    // responses a, b kept (plain text passes the gate at ratio 1.0)
    assert(wet.map(_.warc_type).toSet === Set("conversion"))
    assert(wet.map(_.target_uri).sorted.toSeq ===
      Seq("https://example.org/a", "https://example.org/b"))
    val back = Warc.parseRecords(Warc.writeRecords(wet.toSeq))
    val a = back.find(_.target_uri.endsWith("/a")).get
    assert(new String(a.content, StandardCharsets.UTF_8) === "hello crawl",
      "markup stripped, text framed as a conversion record")
  }
}
