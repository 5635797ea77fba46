package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC record (one captured resource): the header fields a curation
  * pipeline routes on, plus the raw payload bytes. */
final case class WarcRecord(
    warc_type: String,
    target_uri: String,
    warc_date: String,
    record_id: String,
    content_type: String,
    content: Array[Byte])

/** WARC (ISO 28500) ingestion — the container CommonCrawl publishes, and
  * therefore the FIRST operator of any web-scale curation pipeline: a
  * crawl dump is a stream of `WARC/1.0` records (response, request,
  * warcinfo, metadata …), each a CRLF-terminated header block, a
  * `Content-Length`-framed payload, and a CRLF CRLF trailer. Everything
  * downstream (HTML extraction x70 → hygiene → C4 → Gopher → dedup, the
  * `Pipelines.curateBatch` chain) starts from these records.
  *
  * Parsing discipline (the mp4-demux convention): the framing is parsed
  * STRICTLY from the spec — version line, header fold rules, exact
  * Content-Length byte framing, mandatory CRLF CRLF record separator —
  * and malformed framing is REFUSED with a position-carrying error,
  * never guessed at: silently resynchronizing a mis-framed 100-TB crawl
  * corrupts every record after the first bad byte.
  *
  * `.warc.gz` (what CommonCrawl actually publishes) is per-RECORD gzip:
  * each record is its own RFC 1952 member and members concatenate, so a
  * range request can decompress one record without its neighbors.
  * [[parseGzipRecords]] walks the members one at a time — gzip header
  * fields parsed from the spec, raw-deflate inflate with an exact
  * consumed-byte count to find the member boundary, and the CRC32 +
  * ISIZE trailer VERIFIED — then runs the same strict WARC framing on
  * each member's bytes. A truncated or bit-rotted member is refused
  * with its compressed byte offset, never skipped. The batch/streaming
  * sources sniff the gzip magic per file, so a mixed `.warc`/`.warc.gz`
  * drop directory ingests uniformly.
  *
  * Scale shape: one WARC file is one row (path, bytes) and parsing is
  * partition-local `flatMap` — embarrassingly parallel, no shuffle; a
  * crawl's thousands of ~1 GB segment files give the natural input
  * partitioning. Record extraction emits only header strings + payload
  * bytes; projections prune the payload column before any exchange. */
object Warc {

  /** Parse one WARC file's bytes into records. Strict: throws
    * IllegalArgumentException with the byte offset on any framing
    * violation. Trailing garbage after the last record is refused too
    * (a truncated copy should fail loudly, not quietly shrink). */
  def parseRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WARC framing error at byte $pos: $msg")
    def readLine(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      if (pos + 1 >= bytes.length) fail("unterminated header line")
      val s = new String(bytes, start, pos - start, StandardCharsets.UTF_8)
      pos += 2
      s
    }
    while (pos < bytes.length) {
      val version = readLine()
      if (version != "WARC/1.0" && version != "WARC/1.1")
        fail(s"expected WARC version line, got '${version.take(40)}'")
      var warcType, uri, date, id, ctype = ""
      var len = -1L
      var line = readLine()
      while (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i < 0) fail(s"header without ':': '${line.take(40)}'")
        val (k, v) = (line.substring(0, i).trim.toLowerCase, line.substring(i + 1).trim)
        k match {
          case "warc-type" => warcType = v
          case "warc-target-uri" => uri = v
          case "warc-date" => date = v
          case "warc-record-id" => id = v
          case "content-type" => ctype = v
          case "content-length" =>
            len = try v.toLong catch {
              case _: NumberFormatException => fail(s"bad Content-Length '$v'")
            }
          case _ => // other headers are legal; pass over
        }
        line = readLine()
      }
      if (len < 0) fail("missing Content-Length")
      if (pos + len > bytes.length) fail(s"payload of $len bytes overruns file")
      val content = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
      pos += len.toInt
      if (pos + 4 > bytes.length || bytes(pos) != '\r' || bytes(pos + 1) != '\n' ||
        bytes(pos + 2) != '\r' || bytes(pos + 3) != '\n')
        fail("record not terminated by CRLF CRLF")
      pos += 4
      out += WarcRecord(warcType, uri, date, id, ctype, content)
    }
    out.toSeq
  }

  /** Inflate ONE gzip member (RFC 1952) starting at `start`: returns
    * (inflated bytes, offset just past the member's trailer). Strict:
    * header fields are parsed from the spec (FEXTRA/FNAME/FCOMMENT/FHCRC
    * honored), the deflate stream must terminate inside the buffer, and
    * the CRC32 + ISIZE trailer is verified against the inflated output —
    * a truncated or corrupted member fails with its byte offset. */
  private def inflateMember(bytes: Array[Byte], start: Int): (Array[Byte], Int) = {
    var p = start
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"gzip member error at byte $p (member starts at $start): $msg")
    def u8(i: Int): Int = bytes(i) & 0xff
    if (p + 10 > bytes.length) fail("truncated gzip header")
    if (u8(p) != 0x1f || u8(p + 1) != 0x8b)
      fail(f"bad gzip magic ${u8(p)}%02x${u8(p + 1)}%02x")
    if (u8(p + 2) != 8) fail(s"unsupported compression method ${u8(p + 2)}")
    val flg = u8(p + 3)
    p += 10 // magic(2) CM(1) FLG(1) MTIME(4) XFL(1) OS(1)
    if ((flg & 0x04) != 0) { // FEXTRA: 2-byte LE length + payload
      if (p + 2 > bytes.length) fail("truncated FEXTRA length")
      val xlen = u8(p) | (u8(p + 1) << 8)
      p += 2 + xlen
      if (p > bytes.length) fail("truncated FEXTRA payload")
    }
    if ((flg & 0x08) != 0) { // FNAME: zero-terminated
      while (p < bytes.length && bytes(p) != 0) p += 1
      if (p >= bytes.length) fail("unterminated FNAME")
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT: zero-terminated
      while (p < bytes.length && bytes(p) != 0) p += 1
      if (p >= bytes.length) fail("unterminated FCOMMENT")
      p += 1
    }
    if ((flg & 0x02) != 0) { // FHCRC: 2 bytes
      p += 2
      if (p > bytes.length) fail("truncated FHCRC")
    }
    val inf = new java.util.zip.Inflater(/* nowrap = */ true)
    try {
      inf.setInput(bytes, p, bytes.length - p)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        val n = try inf.inflate(buf) catch {
          case e: java.util.zip.DataFormatException =>
            fail(s"corrupt deflate stream: ${e.getMessage}")
        }
        if (n > 0) bos.write(buf, 0, n)
        else if (inf.needsDictionary()) fail("deflate stream needs a preset dictionary")
        else if (inf.needsInput()) fail("truncated deflate stream")
      }
      p += (bytes.length - p) - inf.getRemaining
      val out = bos.toByteArray
      if (p + 8 > bytes.length) fail("truncated gzip trailer")
      val crcStored = u8(p).toLong | (u8(p + 1).toLong << 8) |
        (u8(p + 2).toLong << 16) | (u8(p + 3).toLong << 24)
      val isize = u8(p + 4).toLong | (u8(p + 5).toLong << 8) |
        (u8(p + 6).toLong << 16) | (u8(p + 7).toLong << 24)
      p += 8
      val crc = new java.util.zip.CRC32()
      crc.update(out)
      if (crc.getValue != crcStored)
        fail(f"CRC32 mismatch: stored $crcStored%08x, computed ${crc.getValue}%08x")
      if (isize != (out.length.toLong & 0xffffffffL))
        fail(s"ISIZE mismatch: stored $isize, inflated ${out.length}")
      (out, p)
    } finally inf.end()
  }

  /** Parse a per-record-gzip `.warc.gz` file: members walked one at a
    * time, each member's bytes run through the same strict
    * [[parseRecords]] framing. Framing errors inside a member carry
    * BOTH coordinates (member ordinal + compressed offset, and the
    * in-member byte position from parseRecords). */
  def parseGzipRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var p = 0
    var member = 0
    while (p < bytes.length) {
      val at = p
      val (raw, next) = inflateMember(bytes, p)
      out ++= (try parseRecords(raw) catch {
        case e: IllegalArgumentException => throw new IllegalArgumentException(
          s"in gzip member #$member at compressed byte $at: ${e.getMessage}")
      })
      p = next
      member += 1
    }
    out.toSeq
  }

  /** Dispatch on the gzip magic: `.warc.gz` members or plain `.warc`
    * bytes. Content-sniffed (not extension-matched) so a mixed or
    * misnamed drop directory still parses every file correctly — a
    * plain WARC can't start with 0x1f8b (records start "WARC/"). */
  def parseAnyRecords(bytes: Array[Byte]): Seq[WarcRecord] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
      parseGzipRecords(bytes)
    else parseRecords(bytes)

  /** Records of every WARC file under `path` (binaryFile source → one
    * partition-local flatMap; `filter("warc_type = 'response'")` and a
    * payload decode are the usual next steps). Plain and per-record-gzip
    * files both parse (magic-sniffed per file). */
  def records(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    // pathGlobFilter scopes a directory load to WARC payloads so the
    // CDX sidecars [[writeGzipShards]] co-locates are not mis-parsed
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("content"))
      .as[Array[Byte]](Encoders.BINARY)
      .flatMap(parseAnyRecords(_))
  }

  /** Streaming form: watch a crawl drop directory — each newly landed
    * segment file becomes one micro-batch input row, parsed
    * partition-locally exactly like the batch path (same strict
    * framing), feeding `Pipelines.curationSink`-style foreachBatch
    * chains. File-source semantics give exactly-once per segment (a
    * file is processed once, tracked in the checkpoint log). */
  def streamRecords(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile").schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("content"))
      .as[Array[Byte]](Encoders.BINARY)
      .flatMap(parseAnyRecords(_))
  }

  /** The curation entry projection: response records as
    * (url, fetch date, payload text) — feed straight into
    * TextOps.htmlExtract / the curateBatch chain. */
  def responses(spark: SparkSession, path: String): DataFrame =
    records(spark, path)
      .filter(col("warc_type") === "response")
      .select(col("target_uri").as("url"), col("warc_date").as("fetched_at"),
        col("content").cast("string").as("raw_text"))

  /** WET conversion (the WARC → extracted-text sibling CommonCrawl
    * publishes): run the x70 extraction gate over the response records
    * and emit `conversion` records holding the extracted text, framed
    * as WARC again — so a curated crawl re-exports in the ecosystem's
    * own interchange format and round-trips through [[parseRecords]].
    * Pages failing the extraction-ratio gate are dropped, matching
    * WET's kept-documents-only convention. Narrow end to end: the
    * extraction is a codegen'd projection, the conversion a
    * partition-local map. */
  def wetRecords(spark: SparkSession, path: String,
                 minRatio: Double = 0.05): Dataset[WarcRecord] = {
    import spark.implicits._
    val resp = responses(spark, path)
    graft.text.TextOps.htmlExtract(resp, col("url"), col("raw_text"), minRatio)
      .filter(col("keep"))
      .select(col("doc_id").as("url"), col("extracted"))
      .join(resp.select(col("url"), col("fetched_at")), "url")
      .select(col("url"), col("fetched_at"), col("extracted"))
      .as[(String, String, String)]
      .map { case (u, d, t) => WarcRecord("conversion", u, d, "", "text/plain",
        t.getBytes(StandardCharsets.UTF_8)) }
  }

  /** Serialize records back to WARC bytes (round-trip fixture support
    * and re-export of filtered crawls). */
  def writeRecords(records: Seq[WarcRecord]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val hdr = new StringBuilder("WARC/1.0\r\n")
      hdr.append(s"WARC-Type: ${r.warc_type}\r\n")
      if (r.target_uri.nonEmpty) hdr.append(s"WARC-Target-URI: ${r.target_uri}\r\n")
      if (r.warc_date.nonEmpty) hdr.append(s"WARC-Date: ${r.warc_date}\r\n")
      if (r.record_id.nonEmpty) hdr.append(s"WARC-Record-ID: ${r.record_id}\r\n")
      if (r.content_type.nonEmpty) hdr.append(s"Content-Type: ${r.content_type}\r\n")
      hdr.append(s"Content-Length: ${r.content.length}\r\n\r\n")
      bos.write(hdr.toString.getBytes(StandardCharsets.UTF_8))
      bos.write(r.content)
      bos.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
    }
    bos.toByteArray
  }

  /** Serialize records as per-record gzip members — the actual
    * CommonCrawl `.warc.gz` layout (one member per record, members
    * concatenated, so a byte-range fetch decompresses one record).
    * Round-trips through [[parseGzipRecords]]. */
  def writeGzipRecords(records: Seq[WarcRecord]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach(r => writeGzipMember(bos, writeRecords(Seq(r))))
    bos.toByteArray
  }

  /** One RFC 1952 member onto a shared sink. `close()` (not just
    * `finish()`) must run per member or the stream's native `Deflater`
    * is never `end()`'d and a large partition accumulates unreleased
    * zlib memory until finalization — so the member stream wraps the
    * sink in a close-suppressor and is closed for real. */
  private def writeGzipMember(sink: java.io.OutputStream,
                              payload: Array[Byte]): Unit = {
    val noClose = new java.io.FilterOutputStream(sink) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = flush() // member trailer only; sink stays open
    }
    val gz = new java.util.zip.GZIPOutputStream(noClose)
    try { gz.write(payload); gz.finish() } finally gz.close()
  }

  /** Distributed `.warc.gz` export — the write half of the crawl loop
    * (read `.warc.gz` → curate → RE-EXPORT in the ecosystem's own
    * compressed interchange layout, one segment file per partition,
    * per-record gzip members inside each). Records stream through a
    * partition-local writer (never collected; each task owns exactly
    * its segment file, so the export is embarrassingly parallel and a
    * segment is re-creatable from its partition alone). Returns the
    * manifest (segment path, records, compressed bytes) — the
    * shardManifest convention, and what a downstream reader lists.
    * Segment naming is partition-indexed and deterministic; re-running
    * the export overwrites the same names (idempotent re-export).
    *
    * Commit protocol: each task writes to an attempt-unique dot-prefixed
    * temp file and renames into the segment name on success, so a
    * speculative or retried attempt can never interleave bytes with the
    * original into a corrupt segment — the rename is atomic, the visible
    * file is always one complete attempt's output. The export runs
    * EAGERLY (the manifest is collected before returning): the side
    * effect happens exactly once, not once per downstream action. */
  def writeGzipShards(records: Dataset[WarcRecord], dir: String): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    val rows = records.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      if (!it.hasNext) Iterator.empty
      else {
        val segName = f"segment-$pid%05d.warc.gz"
        val dst = new org.apache.hadoop.fs.Path(s"$dir/$segName")
        val cdxDst = new org.apache.hadoop.fs.Path(
          f"$dir/segment-$pid%05d.cdx")
        val attempt = tc.taskAttemptId()
        val tmp = new org.apache.hadoop.fs.Path(
          f"$dir/.inflight-segment-$pid%05d-attempt-$attempt.warc.gz")
        val cdxTmp = new org.apache.hadoop.fs.Path(
          f"$dir/.inflight-segment-$pid%05d-attempt-$attempt.cdx")
        // executor-side FS handle from the default Hadoop conf (the
        // session conf is not serializable; defaults resolve the same
        // local/HDFS filesystems from the cluster's core-site)
        val fs = tmp.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(tmp, true)
        val cdxOut = fs.create(cdxTmp, true)
        var n = 0L
        var pos = 0L
        // the CDX sidecar: one line per member — (uri, segment, member
        // byte offset, compressed length) — written INCREMENTALLY (never
        // buffered whole), the seek index real crawl consumers range-read
        // by. pos tracks exactly what writeGzipMember emits.
        val counting = new java.io.FilterOutputStream(out) {
          override def write(b: Int): Unit = { out.write(b); pos += 1 }
          override def write(b: Array[Byte], off: Int, len: Int): Unit = {
            out.write(b, off, len); pos += len
          }
          override def close(): Unit = out.close()
        }
        try {
          it.foreach { r =>
            // WARC-Target-URI cannot contain whitespace (it would break
            // the WARC header line itself) — enforced here so the
            // tab-separated CDX needs no escape scheme
            require(!r.target_uri.exists(c => c == '\t' || c == '\n' || c == '\r'),
              s"writeGzipShards: whitespace control char in target_uri '${r.target_uri}'")
            val offset = pos
            writeGzipMember(counting, writeRecords(Seq(r)))
            cdxOut.write((r.target_uri + "\t" + segName + "\t" +
              offset + "\t" + (pos - offset) + "\n")
              .getBytes(StandardCharsets.UTF_8))
            n += 1
          }
        } finally {
          // close both streams independently: if the segment stream's
          // close throws, the .cdx stream must not leak its FS handle
          try counting.close() finally cdxOut.close()
        }
        // segment renamed FIRST, sidecar second: a visible .cdx implies
        // its segment is already committed, so index consumers can trust
        // any sidecar they can list. Commit is last-writer-wins but
        // attempt-tolerant: with speculative/retried attempts two tasks
        // can race the exists/delete/rename — every attempt writes the
        // SAME deterministic records for this partition, so a loser
        // whose rename fails because a peer already committed discards
        // its temp and reports the committed file instead of failing a
        // correct export.
        def commit(src: org.apache.hadoop.fs.Path,
                   target: org.apache.hadoop.fs.Path): Unit = {
          if (fs.exists(target)) fs.delete(target, false)
          if (!fs.rename(src, target)) {
            // a benign loser is one whose PEER committed the same
            // deterministic bytes — verified by FULL byte equality
            // (length first as the cheap reject), so a stale file from
            // an earlier different-data export that happens to share
            // the gzip length (e.g. when the delete above returned
            // false) still fails loudly instead of silently pairing
            // old bytes with new metadata. Shards are task-sized, so
            // one streaming compare per losing attempt is bounded.
            def sameBytes(a: org.apache.hadoop.fs.Path,
                          b: org.apache.hadoop.fs.Path): Boolean = {
              if (fs.getFileStatus(a).getLen != fs.getFileStatus(b).getLen)
                return false
              val (ia, ib) = (fs.open(a), fs.open(b))
              try {
                val (ba, bb) = (new Array[Byte](65536), new Array[Byte](65536))
                var eq = true
                var done = false
                while (eq && !done) {
                  val na = ia.read(ba, 0, ba.length)
                  if (na < 0) done = true
                  else {
                    // fill the peer buffer to the same length (reads
                    // may fragment differently across filesystems)
                    var got = 0
                    while (got < na && eq) {
                      val nb = ib.read(bb, got, na - got)
                      if (nb < 0) eq = false else got += nb
                    }
                    // range overload: compares prefixes in place, no
                    // per-chunk 64 KB copies under the commit race
                    eq &&= got == na &&
                      java.util.Arrays.equals(ba, 0, na, bb, 0, na)
                  }
                }
                eq
              } finally { try ia.close() finally ib.close() }
            }
            if (fs.exists(target) && sameBytes(src, target))
              fs.delete(src, false)
            else throw new IllegalStateException(
              s"writeGzipShards: commit rename $src -> $target failed " +
                "and the existing target does not match this attempt's " +
                "bytes (no committed peer)")
          }
        }
        commit(tmp, dst)
        commit(cdxTmp, cdxDst)
        Iterator((dst.toString, n, fs.getFileStatus(dst).getLen))
      }
    }.collect()
    spark.createDataset(rows.toSeq.sortBy(_._1))
      .toDF("segment", "n_records", "bytes")
  }

  /** The CDX seek index over a [[writeGzipShards]] export:
    * (uri, segment, offset, length), one row per gzip member — what a
    * range-reading consumer lists to fetch ONE record without scanning
    * its segment. Distributed text scan of the sidecars; all codegen'd
    * string functions, no UDF (URIs are whitespace-free by the writer's
    * contract, so the tab-split is exact). */
  def cdxIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val parts = split(col("value"), "\t")
    spark.read.textFile(s"$dir/*.cdx").select(
      element_at(parts, 1).as("uri"),
      element_at(parts, 2).as("segment"),
      element_at(parts, 3).cast("long").as("offset"),
      element_at(parts, 4).cast("long").as("length"))
  }

  /** Random-access read: inflate and parse the ONE record whose gzip
    * member starts at `offset` in `bytes` (a whole segment, or — the
    * point of the CDX index — just the `length`-byte range fetched from
    * it, passed with offset 0). Verifies the member's CRC32/ISIZE like
    * every other read path. */
  def recordAt(bytes: Array[Byte], offset: Long): WarcRecord = {
    val (inflated, _) = inflateMember(bytes, offset.toInt)
    val rs = parseRecords(inflated)
    require(rs.size == 1,
      s"expected exactly one record in the member at $offset, got ${rs.size}")
    rs.head
  }
}
