package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary-column plumbing: typed Dataset round-trip, feature math on
  * known payloads, frame-sampling multiplicity, empty payload edge. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("media synthesis: binary content + typed metadata survive the encoder") {
    val m = Multimodal.media(mk((0L, "abc"), (1L, "defg"), (2L, "h"))).collect()
      .map(r => r.media_id -> r).toMap
    assert(m(0L).kind === "image" && m(0L).meta.format === "png")
    assert(m(1L).kind === "audio" && m(1L).meta.format === "wav")
    assert(m(2L).kind === "video" && m(2L).meta.format === "mp4")
    assert(new String(m(0L).content, "UTF-8") === "abc")
  }

  test("features: checksum and quadrant counts on a known payload") {
    // "Ab1": bytes 65,98,49 → q2(uppercase)=1, q3(lower)=1, q1(digit)=1
    val f = Multimodal.features(Multimodal.media(mk((0L, "Ab1")))).head()
    assert(f.byte_len === 3L)
    assert((f.q1, f.q2, f.q3) === ((1L, 1L, 1L)))
    val expected = ((65L * 31 + 98) % 1000000007L * 31 + 49) % 1000000007L
    assert(f.checksum === expected)
  }

  test("frame sampling keeps every Nth block and counts correctly") {
    val text40 = "x" * 40 // 3 blocks of 16 → keep blocks 0 and 2
    val f = Multimodal.frameSample(Multimodal.media(mk((0L, text40))),
      frameBytes = 16, everyN = 2).head()
    assert(f.n_frames === 2L)
    // first frame = 16 'x' bytes
    var cs = 0L
    (1 to 16).foreach(_ => cs = (cs * 31 + 'x'.toLong) % 1000000007L)
    assert(f.frame_checksum === cs)
  }

  test("PNG payloads decode to real RGB bytes through the codec seam") {
    // synthesize a 2×1 PNG: red pixel, then blue pixel
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0x0000ff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    // direct seam: decoded RGB is exactly the pixel bytes, not the file
    val rgb = FakeCodec.decode(png, "png")
    assert(rgb.toSeq === Seq(0xff, 0x00, 0x00, 0x00, 0x00, 0xff).map(_.toByte))
    // through the Dataset pipeline: features run on DECODED bytes
    val ds = Seq(MediaRow(0L, "image", png, MediaMeta("png", 2, 1))).toDS()
    val f = Multimodal.features(ds).head()
    assert(f.byte_len === 6L) // 2 px × 3 channels, not the PNG file size
    var cs = 0L
    rgb.foreach(b => cs = (cs * 31 + (b & 0xff)) % 1000000007L)
    assert(f.checksum === cs)
    // non-PNG bytes under the same format tag stay identity (x13/x14 path)
    assert(FakeCodec.decode("abc".getBytes, "png").toSeq === "abc".getBytes.toSeq)
  }

  test("WAV payloads decode to raw PCM bytes through the codec seam") {
    // synthesize a 4-sample 8-bit mono PCM WAV with known sample bytes
    val pcm = Array[Byte](0, 64, -128, 127)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    assert(wav.length > pcm.length) // RIFF header present
    // direct seam: decode strips the container, returns the samples
    assert(FakeCodec.decode(wav, "wav").toSeq === pcm.toSeq)
    // through the Dataset pipeline: features run on DECODED samples
    val ds = Seq(MediaRow(1L, "audio", wav, MediaMeta("wav", 0, 0))).toDS()
    val f = Multimodal.features(ds).head()
    assert(f.byte_len === 4L) // sample count, not the WAV file size
    // non-WAV bytes under the same format tag stay identity (x13/x14 path)
    assert(FakeCodec.decode("abc".getBytes, "wav").toSeq === "abc".getBytes.toSeq)
  }

  // -- ISO-BMFF synthesis helpers: [size|type|payload] boxes in the three
  //    header encodings the spec defines (compact, largesize, to-EOF)
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(tpe.getBytes("ISO-8859-1")).put(payload)
    bb.array()
  }
  private def largeBox(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
    bb.putInt(1).put(tpe.getBytes("ISO-8859-1"))
      .putLong(16L + payload.length).put(payload)
    bb.array()
  }
  private def eofBox(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(0).put(tpe.getBytes("ISO-8859-1")).put(payload)
    bb.array()
  }

  test("mp4 payloads demux to concatenated mdat media data through the codec seam") {
    // a minimal valid ISO-BMFF file: ftyp brand, an empty moov, one
    // compact mdat, one largesize mdat, one to-EOF mdat (all three
    // header encodings from ISO/IEC 14496-12 §4.2)
    val mp4 = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0)) ++
      box("moov", Array.emptyByteArray) ++
      box("mdat", "frame0".getBytes) ++
      largeBox("mdat", "frame1".getBytes) ++
      eofBox("mdat", "frame2".getBytes)
    // direct seam: decode walks the boxes and returns only the media data
    assert(new String(FakeCodec.decode(mp4, "mp4"), "UTF-8")
      === "frame0frame1frame2")
    // through the Dataset pipeline: features run on DEMUXED bytes
    val ds = Seq(MediaRow(2L, "video", mp4, MediaMeta("mp4", 0, 0))).toDS()
    val f = Multimodal.features(ds).head()
    assert(f.byte_len === 18L) // 3 × "frameN", not the container size
    // frame sampling over the demuxed stream, not the raw container
    val fs = Multimodal.frameSample(ds, frameBytes = 6, everyN = 2).head()
    assert(fs.n_frames === 2L) // frame0, frame2
    // non-mp4 bytes under the same format tag stay identity (x13/x14 path)
    assert(FakeCodec.decode("abc".getBytes, "mp4").toSeq === "abc".getBytes.toSeq)
  }

  test("mp4 demux fails loudly on malformed box structure") {
    val ftyp = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0))
    // size points past the end of the buffer
    val overrun = ftyp ++ { val b = box("mdat", "xy".getBytes); b(3) = 99; b }
    val e1 = intercept[IllegalArgumentException](FakeCodec.decode(overrun, "mp4"))
    assert(e1.getMessage.contains("out of bounds"))
    // size smaller than its own header
    val tiny = ftyp ++ { val b = box("mdat", "xy".getBytes); b(3) = 4; b }
    val e2 = intercept[IllegalArgumentException](FakeCodec.decode(tiny, "mp4"))
    assert(e2.getMessage.contains("out of bounds"))
    // truncated header after a valid box
    val trunc = ftyp ++ Array[Byte](0, 0, 0, 9, 'm')
    val e3 = intercept[IllegalArgumentException](FakeCodec.decode(trunc, "mp4"))
    assert(e3.getMessage.contains("truncated"))
  }

  /** u32 big-endian bytes. */
  private def be32(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }
  private def be64(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  /** A tiny VALID mp4 with a real sample table: three samples of sizes
    * 4/5/6 split 2+1 across two chunks inside one mdat, and a full
    * moov/trak/mdia/minf/stbl hierarchy whose stsz/stsc/stco describe
    * them. `wide` swaps stco for co64 (64-bit chunk offsets). Layout:
    * ftyp (16 B) then mdat header (8 B) → media data at offset 24. */
  private def mp4WithSamples(wide: Boolean = false): (Array[Byte], Seq[(Long, Long)]) = {
    val media = "f0f0" + "f1f1f" + "g2g2g2" // sizes 4, 5, 6
    val chunk1 = 24L // after ftyp(16) + mdat header(8)
    val chunk2 = chunk1 + 4 + 5 // sample 2 starts its own chunk
    val stsz = box("stsz", be32(0, 0, 3, 4, 5, 6)) // per-sample sizes
    val stsc = box("stsc", be32(0, 2, /*run1*/ 1, 2, 1, /*run2*/ 2, 1, 1))
    val stco =
      if (wide) box("co64", be32(0, 2) ++ be64(chunk1, chunk2))
      else box("stco", be32(0, 2, chunk1, chunk2))
    val stbl = box("stbl", stsz ++ stsc ++ stco)
    val moov = box("moov", box("trak", box("mdia", box("minf", stbl))))
    val mp4 = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0)) ++
      box("mdat", media.getBytes) ++ moov
    (mp4, Seq((chunk1, 4L), (chunk1 + 4, 5L), (chunk2, 6L)))
  }

  test("mp4 sample-table walk enumerates real sample boundaries (stsz/stsc/stco + co64)") {
    for (wide <- Seq(false, true)) {
      val (mp4, expected) = mp4WithSamples(wide)
      assert(FakeCodec.mp4Samples(mp4) === Some(expected.toIndexedSeq), s"wide=$wide")
      // the samples really are the planted frame payloads
      val texts = expected.map { case (o, s) =>
        new String(mp4, o.toInt, s.toInt, "UTF-8") }
      assert(texts === Seq("f0f0", "f1f1f", "g2g2g2"))
    }
    // uniform-size stsz (sample_size != 0): 3 samples of 3 bytes in one chunk
    val uStbl = box("stbl", box("stsz", be32(0, 3, 3)) ++
      box("stsc", be32(0, 1, 1, 3, 1)) ++ box("stco", be32(0, 1, 24)))
    val uni = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0)) ++
      box("mdat", "aaabbbccc".getBytes) ++
      box("moov", box("trak", box("mdia", box("minf", uStbl))))
    assert(FakeCodec.mp4Samples(uni) ===
      Some(IndexedSeq((24L, 3L), (27L, 3L), (30L, 3L))))
    // sample-less container (empty moov) → None, callers fall back
    val noTable = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0)) ++
      box("moov", Array.emptyByteArray) ++ box("mdat", "xyz".getBytes)
    assert(FakeCodec.mp4Samples(noTable) === None)
  }

  test("mp4Timeline: stts decode timestamps + mdhd timescale (v0 and v1)") {
    // same three samples as mp4WithSamples, plus timing: stts runs
    // (2 × delta 100, 1 × delta 200) → DT = 0, 100, 200 @ 1000 ticks/s
    val media = "f0f0" + "f1f1f" + "g2g2g2"
    val stsz = box("stsz", be32(0, 0, 3, 4, 5, 6))
    val stsc = box("stsc", be32(0, 2, 1, 2, 1, 2, 1, 1))
    val stco = box("stco", be32(0, 2, 24, 33))
    val stts = box("stts", be32(0, 2, /*run1*/ 2, 100, /*run2*/ 1, 200))
    def mp4(mdhd: Array[Byte]) =
      box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0)) ++
        box("mdat", media.getBytes) ++
        box("moov", box("trak", box("mdia", mdhd ++
          box("minf", box("stbl", stsz ++ stsc ++ stco ++ stts)))))
    val expected = IndexedSeq((24L, 4L, 0L), (28L, 5L, 100L), (33L, 6L, 200L))
    // version-0 mdhd: timescale at payload +12
    val v0 = box("mdhd", be32(0, 0, 0, 1000, 400))
    assert(FakeCodec.mp4Timeline(mp4(v0)) === Some((1000L, expected)))
    // version-1 mdhd: 64-bit creation/modification push timescale to +20
    val v1 = box("mdhd", be32(0x01000000L) ++ be64(0L, 0L) ++ be32(1000, 0, 400))
    assert(FakeCodec.mp4Timeline(mp4(v1)) === Some((1000L, expected)))
    // no stts/mdhd (the mp4WithSamples container): synthetic 1-tick
    // spacing at timescale 1 — offsets stay exact, timing degrades
    val (plain, offs) = mp4WithSamples()
    assert(FakeCodec.mp4Timeline(plain) === Some((1L,
      offs.zipWithIndex.map { case ((o, s), i) => (o, s, i.toLong) }.toIndexedSeq)))
    // stts that disagrees with stsz fails loudly
    val badStts = box("stts", be32(0, 1, 2, 100)) // covers 2 of 3 samples
    val bad = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0)) ++
      box("mdat", media.getBytes) ++
      box("moov", box("trak", box("mdia",
        box("minf", box("stbl", stsz ++ stsc ++ stco ++ badStts)))))
    val e = intercept[IllegalArgumentException](FakeCodec.mp4Timeline(bad))
    assert(e.getMessage.contains("stts covers 2 samples but stsz claims 3"))
  }

  test("frameSample walks the sample table when present: real frames, not byte blocks") {
    val (mp4, _) = mp4WithSamples()
    val ds = Seq(MediaRow(5L, "video", mp4, MediaMeta("mp4", 0, 0))).toDS()
    // everyN=2 keeps samples 0 and 2 — sizes 4 and 6, NOT frameBytes blocks
    val fs = Multimodal.frameSample(ds, frameBytes = 1000, everyN = 2).head()
    assert(fs.n_frames === 2L)
    var cs = 0L
    "f0f0".getBytes.foreach(b => cs = (cs * 31 + (b & 0xff)) % 1000000007L)
    assert(fs.frame_checksum === cs)
  }

  test("framePixelDecode: MJPEG-style image-coded samples decode to REAL pixels; opaque samples are counted, not faked") {
    // build an mp4 whose mdat carries three samples: two genuine PNGs
    // (2x1 red|blue and 1x1 green) and one non-image byte blob — the
    // image-coded-track layout Motion JPEG uses
    def png(pixels: Seq[(Int, Int, Int)], w: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, pixels.length / w,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      pixels.zipWithIndex.foreach { case ((r, g, b), i) =>
        img.setRGB(i % w, i / w, (r << 16) | (g << 8) | b) }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val f0 = png(Seq((255, 0, 0), (0, 0, 255)), w = 2) // red | blue
    val f1 = "not an image frame".getBytes
    val f2 = png(Seq((0, 255, 0)), w = 1)              // green
    val media = f0 ++ f1 ++ f2
    val off0 = 24L // ftyp(16) + mdat header(8)
    val stbl = box("stbl",
      box("stsz", be32(0, 0, 3, f0.length, f1.length, f2.length)) ++
        box("stsc", be32(0, 1, 1, 3, 1)) ++ // one chunk, 3 samples
        box("stco", be32(0, 1, off0)))
    val mp4 = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0)) ++
      box("mdat", media) ++
      box("moov", box("trak", box("mdia", box("minf", stbl))))
    val out = Multimodal.framePixelDecode(
      Seq(MediaRow(7L, "video", mp4, MediaMeta("mp4", 0, 0))).toDS(),
      everyN = 1).head()
    assert(out.n_frames === 3L)
    assert(out.n_decoded === 2L, "the byte blob must not fake-decode")
    assert((out.width, out.height) === ((2L, 1L)), "first decoded frame dims")
    // pixel checksum over the REAL decoded RGB: [255,0,0, 0,0,255]
    var cs = 0L
    Seq(255, 0, 0, 0, 0, 255).foreach(b => cs = (cs * 31 + b) % 1000000007L)
    assert(out.pixel_checksum === cs)
    // everyN=2 keeps samples 0 and 2 — both images, first still the 2x1
    val sampled = Multimodal.framePixelDecode(
      Seq(MediaRow(8L, "video", mp4, MediaMeta("mp4", 0, 0))).toDS(),
      everyN = 2).head()
    assert(sampled.n_frames === 2L && sampled.n_decoded === 2L)
    // non-mp4 payloads have no sample table: zero frames, zero decoded
    val none = Multimodal.framePixelDecode(
      Seq(MediaRow(9L, "image", f0, MediaMeta("png", 2, 1))).toDS(),
      everyN = 1).head()
    assert(none.n_frames === 0L && none.n_decoded === 0L)
  }

  test("mp4 sample table pointing outside the file fails loudly") {
    val (mp4, _) = mp4WithSamples()
    // corrupt the second stco entry to point past EOF: find the stco
    // payload and overwrite its last 4 bytes with a huge offset
    val idx = {
      val pat = "stco".getBytes("ISO-8859-1")
      (0 until mp4.length - 4).find(i => pat.indices.forall(j => mp4(i + j) == pat(j))).get
    }
    val bad = mp4.clone()
    val lastEntry = idx + 4 + 8 // fullbox header + count, first entry
    java.nio.ByteBuffer.wrap(bad, lastEntry + 4, 4).putInt(1 << 20)
    val e = intercept[IllegalArgumentException](FakeCodec.mp4Samples(bad))
    assert(e.getMessage.contains("outside file"))
  }

  test("mp4 with a zero-sample stsz yields an empty sample table and zero frames") {
    // adversarial: a structurally valid container holding no samples —
    // the walk must emit Some(empty), not None (no fallback to byte
    // slicing) and not a crash in the bounds checks
    val stbl = box("stbl", box("stsz", be32(0, 0, 0)) ++
      box("stsc", be32(0, 0)) ++ box("stco", be32(0, 0)))
    val empty = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0)) ++
      box("mdat", "leftover".getBytes) ++
      box("moov", box("trak", box("mdia", box("minf", stbl))))
    assert(FakeCodec.mp4Samples(empty) === Some(IndexedSeq.empty[(Long, Long)]))
    val fs = Multimodal.frameSample(
      Seq(MediaRow(9L, "video", empty, MediaMeta("mp4", 0, 0))).toDS(),
      frameBytes = 4, everyN = 1).head()
    assert(fs.n_frames === 0L && fs.frame_checksum === 0L)
  }

  test("resize: nearest-neighbor mapping on a known grid") {
    // 32 bytes = 2 source rows of 16; resize to 2x2 → picks
    // (row 0, col 0), (row 0, col 8), (row 1, col 0), (row 1, col 8)
    val text = ('a' to 'z').mkString + "012345" // 32 chars
    val out = Multimodal.resize(Multimodal.media(mk((0L, text))),
      outW = 2, outH = 2).head()
    assert((out.out_w, out.out_h) === ((2, 2)))
    val picks = Seq(text(0), text(8), text(16), text(24)).map(_.toLong)
    var cs = 0L
    picks.foreach(b => cs = (cs * 31 + b) % 1000000007L)
    assert(out.resize_checksum === cs)
  }

  test("resize runs on REAL decoded PNG bytes through the codec seam") {
    // 2×1 PNG (red, blue) decodes to 6 RGB bytes; as a 16-wide grid that
    // is one source row; 1×2 output picks bytes 0 and 3 (255, 0)
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0x0000ff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val ds = Seq(MediaRow(0L, "image", baos.toByteArray, MediaMeta("png", 2, 1))).toDS()
    val out = Multimodal.resize(ds, outW = 2, outH = 1, srcW = 6).head()
    // decoded RGB = [255,0,0, 0,0,255]; srcW=6 → 1 row; picks idx 0 and 3
    assert(out.resize_checksum === (255L * 31 + 0L) % 1000000007L)
  }

  test("empty payload yields zero frames and zero checksum, no crash") {
    val f = Multimodal.frameSample(Multimodal.media(mk((0L, ""))),
      frameBytes = 16, everyN = 2).head()
    assert(f.n_frames === 0L)
    assert(f.frame_checksum === 0L)
  }

  test("MediaFixtures: staged corpora are byte-identical to in-query generation " +
       "and restrict to the queried docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_fix").toString
    val docs = mk((0L to 7L).map(d => d -> s"doc $d"): _*)
    val gen = Multimodal.imageCorpus(docs).collect()
      .map(a => a.img_id -> a.content.toSeq).toMap
    val staged = MediaFixtures.stagedImages(docs, dir).collect()
    assert(staged.length === gen.size, "staged row set must match generation")
    staged.foreach(a => assert(a.content.toSeq === gen(a.img_id),
      s"fixture bytes drifted for img ${a.img_id}"))
    val genA = Multimodal.audioCorpus(docs).collect()
      .map(a => a.aud_id -> a.content.toSeq).toMap
    val stagedA = MediaFixtures.stagedAudio(docs, dir).collect()
    assert(stagedA.length === genA.size)
    stagedA.foreach(a => assert(a.content.toSeq === genA(a.aud_id)))
    // second read hits the committed cache (no regeneration): the
    // _SUCCESS-gated slot is already there, and a narrower doc set
    // semi-joins down to its own rows only
    val narrow = MediaFixtures.stagedImages(mk(3L -> "doc 3"), dir).collect()
    assert(narrow.map(_.img_id).sorted.toSeq === Seq(3L, 20000003L, 40000003L))
  }

  test("idrFrameSample: cadence runs in keyframe-ordinal space and selects only IDR sync points") {
    import spark.implicits._
    // gop=2 over 10 frames -> IDR at sample indices 0,2,4,6,8; everyK=2
    // selects IDR ordinals 0,2,4 -> sample indices 0,4,8
    val media = Seq(MediaRow(7L, "video", FakeCodec.avcAsset(7L, 10, 2),
      MediaMeta("mp4", 0, 0))).toDS()
    val r = Multimodal.idrFrameSample(media, everyK = 2).head()
    assert(r.n_samples === 10L)
    assert(r.n_idr === 5L)
    assert(r.n_selected === 3L)
    assert(r.first_sel_idx === 0L)
    val expCs = Seq(0L, 4L, 8L).foldLeft(0L)((a, x) => (a * 31 + x) % 1000000007L)
    assert(r.sel_idx_checksum === expCs, "selected more than the 0,4,8 sync points")
    // selected bytes = full sample sizes: 10+(7+i)%7 (+16 for sample 0)
    val expBytes = Seq(0, 4, 8).map(i => 10L + (7 + i) % 7 +
      (if (i == 0) 16L else 0L)).sum
    assert(r.sel_bytes === expBytes)
    // everyK=1 degenerates to "every keyframe" — n_selected == n_idr
    val all = Multimodal.idrFrameSample(media, everyK = 1).head()
    assert(all.n_selected === all.n_idr)
  }

  test("imagePHashPairs: re-encoded copies pair at Hamming 0; resized+brightened " +
       "pair within 3; distinct docs never pair") {
    val docs = mk((0L to 19L).map(d => d -> s"doc $d"): _*)
    val pairs = Multimodal.imagePHashPairs(Multimodal.imageCorpus(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDelta = pairs.groupBy { case (a, b, _) => (b - a, a % 20000000 == b % 20000000) }
    // every re-encode round-trip is pixel-identical -> Hamming 0, all 20 pair
    val reenc = pairs.filter { case (a, b, _) => b - a == 20000000 && a < 20000000 }
    assert(reenc.length === 20 && reenc.forall(_._3 === 0L),
      s"re-encoded pairs wrong: ${reenc.toSeq}")
    // the 2x upscale is pool-aligned, so only the +4 brightness clamp can
    // flip bits: the resized variant pairs for (nearly) every doc
    val resized = pairs.filter { case (a, b, _) => b - a == 40000000 }
    assert(resized.length >= 18, s"only ${resized.length}/20 resized variants paired")
    // precision: no pair ever crosses documents
    assert(pairs.forall { case (a, b, _) => a % 20000000 === b % 20000000 },
      s"cross-document pair found: ${pairs.filterNot(p => p._1 % 20000000 == p._2 % 20000000).toSeq}")
    assert(byDelta.keys.forall(_._2), "pair deltas must stay within one document")
  }

  test("nalTypes: AVCC length-prefixed walk, Annex-B start codes, malformed framing refused") {
    // AVCC: SPS + PPS + IDR, exact tiling
    def nal(tpe: Int, len: Int): Array[Byte] =
      Array[Byte](0, 0, 0, (1 + len).toByte, ((3 << 5) | tpe).toByte) ++
        Array.fill(len)(0x42.toByte)
    assert(FakeCodec.nalTypes(nal(7, 3) ++ nal(8, 2) ++ nal(5, 6)) ===
      Some(Seq(7, 8, 5)))
    // Annex-B: 3- and 4-byte start codes in one stream
    val annexB = Array[Byte](0, 0, 0, 1, ((3 << 5) | 7).toByte, 9, 9,
      0, 0, 1, ((3 << 5) | 5).toByte, 9,
      0, 0, 1, ((2 << 5) | 1).toByte, 9)
    assert(FakeCodec.nalTypes(annexB) === Some(Seq(7, 5, 1)))
    // malformed AVCC: length runs past the buffer -> refused, not guessed
    assert(FakeCodec.nalTypes(Array[Byte](0, 0, 0, 99, 0x65.toByte)) === None)
    // zero-length NAL -> refused
    assert(FakeCodec.nalTypes(Array[Byte](0, 0, 0, 0, 0x65.toByte)) === None)
  }

  test("keyframeStats: IDR cadence, SPS/PPS in sample 0, full-bitmask checksum; " +
       "image-coded samples classify as zero IDR") {
    import spark.implicits._
    val media = Seq(1L, 2L).toDS().mapPartitions(_.map(id => MediaRow(id, "video",
      FakeCodec.avcAsset(id, nFrames = 7, gop = 3), MediaMeta("mp4", 0, 0))))
    val out = Multimodal.keyframeStats(media).collect()
      .map(k => k.media_id -> k).toMap
    // 7 samples, IDR at 0, 3, 6
    assert(out(1L).n_samples === 7L && out(1L).n_idr === 3L)
    assert(out(1L).n_sps === 1L && out(1L).n_pps === 1L)
    assert(out(1L).first_idr_idx === 0L)
    val expectCs = Seq(1L, 0L, 0L, 1L, 0L, 0L, 1L)
      .foldLeft(0L)((a, x) => (a * 31 + x) % 1000000007L)
    assert(out(1L).idr_mask_checksum === expectCs)
    // an MJPEG (PNG-sample) track has no NAL framing: parses to no IDR
    val mjpeg = Seq(3L).toDS().mapPartitions(_.map(id => MediaRow(id, "video",
      FakeCodec.mjpegAsset(id, 3), MediaMeta("mp4", 1, 1))))
    val kf = Multimodal.keyframeStats(mjpeg).head()
    assert(kf.n_samples === 3L && kf.n_idr === 0L && kf.first_idr_idx === -1L)
  }

  test("dhash64_bands: brightness-shift invariant, distinct patterns differ") {
    import graft.plans.functions.dhash64_bands
    // two 18x16 gray buffers: a ramp and the same ramp +9 brightness
    // (pattern stays <= 239 so the shift never wraps or clamps)
    def buf(off: Int): Array[Byte] =
      Array.tabulate(18 * 16 * 3)(i => ((i / 3) % 240 + off).toByte)
    val df = Seq((1L, buf(0), 18), (2L, buf(9), 18),
        (3L, Array.tabulate(18 * 16 * 3)(i => ((i * 37) % 256).toByte), 18))
      .toDF("id", "pixels", "width")
      .select(col("id"), dhash64_bands(col("pixels"), col("width"), 3).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L) === df(2L), "global brightness shift must not change the dHash")
    assert(df(1L) !== df(3L), "distinct patterns must hash differently")
  }

  test("16-bit WAV encode -> real decode round-trips every sample exactly") {
    val samples = Array(0, 1, -1, 16383, -16384, 12345, -12345, 255, -256)
    val wav = FakeCodec.encodePcm16Wav(samples)
    // RIFF/WAVE container present, then the exact signed samples back
    assert(wav.take(4).map(_.toChar).mkString === "RIFF")
    assert(FakeCodec.pcm16Samples(wav).toSeq === samples.toSeq)
  }

  test("gradient64_bands: exact-gain invariant, reversed contour flips; short contour refused") {
    import graft.plans.functions.gradient64_bands
    val es = Array.tabulate(65)(i => ((i * 7919L) % 1000 + 1) * 100)
    val df = Seq((1L, es), (2L, es.map(_ * 2)), (3L, es.reverse))
      .toDF("id", "es")
      .select(col("id"), gradient64_bands(col("es")).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L) === df(2L), "an exact 2x gain must not change any gradient bit")
    assert(df(1L) !== df(3L), "a reversed contour must hash differently")
    val thrown = intercept[Exception] {
      Seq((1L, Array.fill(64)(1L))).toDF("id", "es")
        .select(gradient64_bands(col("es"))).collect()
    }
    assert(thrown.getMessage != null)
  }

  test("audioFpPairs: re-encoded tracks pair at Hamming 0; 2x-gain+dither pairs within 3; " +
       "distinct docs never pair") {
    val docs = mk((0L to 19L).map(d => d -> s"doc $d"): _*)
    val pairs = Multimodal.audioFpPairs(Multimodal.audioCorpus(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the re-encode round-trip is sample-identical -> Hamming 0, all 20 pair
    val reenc = pairs.filter { case (a, b, _) => b - a == 20000000 && a < 20000000 }
    assert(reenc.length === 20 && reenc.forall(_._3 === 0L),
      s"re-encoded pairs wrong: ${reenc.toSeq}")
    // 2x gain is gradient-exact; only the ±1 dither (≤16 of a ~260k frame
    // energy) can flip near-tie bits — (nearly) every doc must still pair
    val gained = pairs.filter { case (a, b, _) => b - a == 40000000 }
    assert(gained.length >= 18, s"only ${gained.length}/20 gain variants paired")
    // precision: no pair ever crosses documents
    assert(pairs.forall { case (a, b, _) => a % 20000000 === b % 20000000 },
      s"cross-document pair found: ${pairs.filterNot(p => p._1 % 20000000 == p._2 % 20000000).toSeq}")
  }

  test("sceneCuts: planted scene boundaries detected exactly; within-scene drift never cuts") {
    import spark.implicits._
    // d=4 -> sceneLen 2 (cuts at j=2,4); d=5 -> sceneLen 3 (cut at j=3)
    val media = Seq(4L, 5L).toDS().mapPartitions(_.map(d => MediaRow(d, "video",
      Multimodal.sceneAsset(d, nFrames = 6, sceneLen = 2 + (d % 2).toInt),
      MediaMeta("mp4", 8, 6))))
    val out = Multimodal.sceneCuts(media, threshold = 1000L)
      .collect().map(s => s.media_id -> s).toMap
    assert(out(4L).n_frames === 6L && out(4L).n_cuts === 2L
      && out(4L).first_cut_idx === 2L)
    assert(out(5L).n_frames === 6L && out(5L).n_cuts === 1L
      && out(5L).first_cut_idx === 3L)
    // checksum parity with the planted arithmetic, for d=5 (s=3):
    // boundaries j=1..5, diff = 144 within a scene, SAD at the j=3 jump
    val d = 5L; val s = 3
    val diffs = (1 to 5).map { j =>
      if (j % s != 0) 144L
      else 3L * (for (y <- 0 until 6; x <- 0 until 8) yield
        math.abs(Multimodal.scenePix(d, j / s, y, x)
          - (Multimodal.scenePix(d, j / s - 1, y, x) + s - 1)).toLong).sum
    }
    val p = 1000000007L
    assert(out(5L).diff_checksum ===
      diffs.foldLeft(0L)((a, x) => (a * 31 + x % p) % p))
    assert(out(5L).cut_checksum === Seq(0L, 0L, 1L, 0L, 0L)
      .foldLeft(0L)((a, x) => (a * 31 + x) % p))
  }

  test("sceneCuts: a dimension change cuts at maximal dissimilarity; undecodable frames drop out") {
    import spark.implicits._
    // two same-pixel frames at different sizes -> one cut, diff = 765*max(px)
    val small = FakeCodec.encodeRgbPng(2, 2, Array.fill(12)(100.toByte))
    val big = FakeCodec.encodeRgbPng(4, 2, Array.fill(24)(100.toByte))
    val dims = Seq(1L).toDS().mapPartitions(_.map(id => MediaRow(id, "video",
      FakeCodec.mp4Asset(Seq(small, big)), MediaMeta("mp4", 0, 0))))
    val st = Multimodal.sceneCuts(dims, threshold = 1000L).head()
    assert(st.n_frames === 2L && st.n_cuts === 1L && st.first_cut_idx === 1L)
    assert(st.diff_checksum === 765L * 8) // one boundary: the raw SAD itself
    // an undecodable (NAL-framed) sample between two identical PNGs:
    // the chain skips it, the diff spans the gap -> identical frames, no cut
    val nal = Array[Byte](0, 0, 0, 2, 0x65.toByte, 0x42.toByte)
    val gap = Seq(2L).toDS().mapPartitions(_.map(id => MediaRow(id, "video",
      FakeCodec.mp4Asset(Seq(small, nal, small)), MediaMeta("mp4", 0, 0))))
    val gs = Multimodal.sceneCuts(gap, threshold = 1000L).head()
    assert(gs.n_frames === 2L && gs.n_cuts === 0L && gs.first_cut_idx === -1L)
  }

  test("audioCorpus bytes go through the real codec: decoded PCM equals the planted arithmetic") {
    val docs = mk(7L -> "doc seven")
    val byId = Multimodal.audioCorpus(docs).collect().map(a => a.aud_id -> a.content).toMap
    val base = FakeCodec.pcm16Samples(byId(7L))
    assert(base.length === 1040)
    assert(base.toSeq === (0 until 1040).map(s => Multimodal.audioSampleVal(7L, s)))
    assert(FakeCodec.pcm16Samples(byId(20000007L)).toSeq === base.toSeq,
      "re-encoded track must round-trip sample-identical")
    assert(FakeCodec.pcm16Samples(byId(40000007L)).toSeq ===
      (0 until 1040).map(s => 2 * Multimodal.audioSampleVal(7L, s) + s % 2),
      "gain track must be exactly 2x + dither")
  }
}
