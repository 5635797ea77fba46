package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The real H.264 bitstream layer behind x120: Exp-Golomb IO, RBSP
  * emulation prevention, SPS/PPS/slice parsing, and the I_PCM
  * macroblock path — plus the HONESTY edges: anything the module does
  * not implement must return None, never garbage pixels. */
class H264Spec extends AnyFunSuite {

  test("exp-golomb ue/se round-trip across the value range") {
    val w = new H264.BitWriter
    val ues = Seq(0, 1, 2, 3, 7, 8, 25, 255, 65535)
    val ses = Seq(0, 1, -1, 2, -2, 12, -26)
    ues.foreach(w.ue)
    ses.foreach(w.se)
    w.trailing()
    val r = new H264.BitReader(w.result())
    ues.foreach(v => assert(r.ue() === v))
    ses.foreach(v => assert(r.se() === v))
  }

  test("emulation prevention: 00 00 0x sequences escape and unescape exactly") {
    // every start-code-like run, including back-to-back zeros at the end
    val rbsp = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 5, 0, 0)
    val nal = H264.escapeRbsp(rbsp)
    // escaped stream must contain no 00 00 0x with x <= 2 (00 00 03 is
    // the legal escape sequence itself — §7.4.1.1)
    (0 until nal.length - 2).foreach { i =>
      assert(!(nal(i) == 0 && nal(i + 1) == 0 && (nal(i + 2) & 0xff) <= 2),
        s"unescaped start-code emulation at $i in ${nal.mkString(",")}")
    }
    assert(H264.unescapeRbsp(nal, 0).toSeq === rbsp.toSeq)
  }

  test("SPS/PPS encode-parse round-trip carries the MB geometry") {
    val sps = H264.parseSps(H264.encodeSps(widthMbs = 3, heightMbs = 2))
    assert(sps.isDefined)
    assert(sps.get.widthMbs === 3 && sps.get.heightMbs === 2)
    assert(sps.get.chromaFormatIdc === 1 && sps.get.frameMbsOnly)
    val pps = H264.parsePps(H264.encodePps())
    assert(pps.isDefined && pps.get.cavlc)
  }

  test("I_PCM IDR round-trip: multi-macroblock planes decode byte-exact") {
    val (wMbs, hMbs) = (2, 2) // 32x32 luma, MB interleave must reassemble
    val w16 = wMbs * 16
    val y = Array.tabulate[Byte](w16 * hMbs * 16)(i => ((i * 7 + 3) % 256).toByte)
    val cb = Array.tabulate[Byte](y.length / 4)(i => ((i * 11 + 5) % 256).toByte)
    val cr = Array.tabulate[Byte](y.length / 4)(i => ((i * 13 + 9) % 256).toByte)
    val sps = H264.parseSps(H264.encodeSps(wMbs, hMbs)).get
    val pps = H264.parsePps(H264.encodePps()).get
    val nal = H264.encodeIdrIPcm(wMbs, hMbs, idrPicId = 3, y, cb, cr)
    val fr = H264.decodeIdrIPcm(sps, pps, nal)
    assert(fr.isDefined)
    assert(fr.get.width === 32 && fr.get.height === 32)
    assert(fr.get.y.toSeq === y.toSeq)
    assert(fr.get.cb.toSeq === cb.toSeq)
    assert(fr.get.cr.toSeq === cr.toSeq)
  }

  test("PCM bytes that look like start codes survive the escape layer") {
    // all-zero planes maximize 00-runs — the exact case emulation
    // prevention exists for
    val y = new Array[Byte](256)
    val cb = new Array[Byte](64)
    val cr = new Array[Byte](64)
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePps()).get
    val fr = H264.decodeIdrIPcm(sps, pps, H264.encodeIdrIPcm(1, 1, 0, y, cb, cr))
    assert(fr.isDefined && fr.get.y.forall(_ == 0) &&
      fr.get.cb.forall(_ == 0) && fr.get.cr.forall(_ == 0))
  }

  test("honesty edges: predicted MBs, truncation, CABAC all decode to None") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePps()).get
    // a slice whose first mb_type is NOT 25 (I_4x4 = 0): prediction seam
    val w = new H264.BitWriter
    w.u(0x65L, 8)
    val p = new H264.BitWriter
    p.ue(0); p.ue(7); p.ue(0); p.u(0L, 4); p.ue(0)
    p.u(0L, 1); p.u(0L, 1); p.se(0)
    p.ue(0) // mb_type I_4x4 — not implemented here
    p.trailing()
    val nonPcm = w.putBytes(H264.escapeRbsp(p.result())).result()
    assert(H264.decodeIdrIPcm(sps, pps, nonPcm).isEmpty)
    // truncated PCM payload
    val y = new Array[Byte](256); val c = new Array[Byte](64)
    val full = H264.encodeIdrIPcm(1, 1, 0, y, c, c)
    assert(H264.decodeIdrIPcm(sps, pps, full.take(full.length / 2)).isEmpty)
    // a CABAC PPS refuses to parse (entropy path not implemented)
    val wc = new H264.BitWriter
    wc.u(0x68L, 8)
    val pc = new H264.BitWriter
    pc.ue(0); pc.ue(0); pc.u(1L, 1) // entropy_coding_mode_flag = CABAC
    pc.u(0L, 1); pc.ue(0); pc.ue(0); pc.ue(0)
    pc.u(0L, 1); pc.u(0L, 2); pc.se(0); pc.se(0); pc.se(0)
    pc.u(0L, 1); pc.u(0L, 1); pc.u(0L, 1)
    pc.trailing()
    assert(H264.parsePps(wc.putBytes(H264.escapeRbsp(pc.result())).result()).isEmpty)
  }

  test("pocType-1 slices: delta_pic_order_cnt is consumed, decode stays aligned") {
    // SPS with pic_order_cnt_type=1 and delta_pic_order_always_zero=0:
    // §7.3.3 puts delta_pic_order_cnt[0] in the slice header; skipping
    // it would bit-shift every later field
    val sps = H264.Sps(widthMbs = 1, heightMbs = 1, log2MaxFrameNum = 4,
      pocType = 1, log2MaxPocLsb = 0, frameMbsOnly = true,
      chromaFormatIdc = 1, deltaPocAlwaysZero = false)
    val pps = H264.parsePps(H264.encodePps()).get
    val y = Array.tabulate[Byte](256)(i => (i % 251).toByte)
    val cbcr = Array.tabulate[Byte](64)(i => ((i * 3) % 251).toByte)
    val w = new H264.BitWriter
    w.u(0x65L, 8)
    val p = new H264.BitWriter
    p.ue(0); p.ue(7); p.ue(0); p.u(0L, 4); p.ue(0)
    p.se(3) // delta_pic_order_cnt[0]
    p.u(0L, 1); p.u(0L, 1); p.se(0)
    p.ue(25); p.alignZero()
    y.foreach(b => p.u((b & 0xff).toLong, 8))
    cbcr.foreach(b => p.u((b & 0xff).toLong, 8))
    cbcr.foreach(b => p.u((b & 0xff).toLong, 8))
    p.trailing()
    val nal = w.putBytes(H264.escapeRbsp(p.result())).result()
    val fr = H264.decodeIdrIPcm(sps, pps, nal)
    assert(fr.isDefined, "pocType-1 slice with delta_pic_order_cnt must decode")
    assert(fr.get.y.toSeq === y.toSeq)
    assert(fr.get.cb.toSeq === cbcr.toSeq && fr.get.cr.toSeq === cbcr.toSeq)
  }

  test("avcIntraAsset: sync points decode, opaque inter samples do not") {
    val asset = FakeCodec.avcIntraAsset(42L, nFrames = 5, gop = 2)
    val samples = FakeCodec.mp4Samples(asset).get
    assert(samples.size === 5)
    val frames = samples.zipWithIndex.map { case ((off, sz), i) =>
      i -> H264.decodeAvccSample(
        java.util.Arrays.copyOfRange(asset, off.toInt, (off + sz).toInt))
    }.toMap
    assert(frames(0).isDefined && frames(2).isDefined && frames(4).isDefined)
    assert(frames(1).isEmpty && frames(3).isEmpty)
    // decoded bytes are exactly the planted arithmetic, bitstream order
    val fr = frames(2).get
    val got = fr.y ++ fr.cb ++ fr.cr
    (0 until 384).foreach { k =>
      assert((got(k) & 0xff) === FakeCodec.avcPcmSample(42L, 2, k),
        s"plane byte $k")
    }
  }
}
