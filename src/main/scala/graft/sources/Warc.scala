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
  * corrupts every record after the first bad byte. Per-file gzip
  * (`.warc.gz` members) is the declared stub seam, as inter-frame
  * codecs are for mp4.
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

  /** Records of every WARC file under `path` (binaryFile source → one
    * partition-local flatMap; `filter("warc_type = 'response'")` and a
    * payload decode are the usual next steps). */
  def records(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]](Encoders.BINARY)
      .flatMap(parseRecords(_))
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
    spark.readStream.format("binaryFile").schema(binaryFileSchema).load(path)
      .select(col("content"))
      .as[Array[Byte]](Encoders.BINARY)
      .flatMap(parseRecords(_))
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
}
