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

  // ------------------------------------------------ CAVLC / Intra_16x16

  test("every CAVLC VLC table is prefix-free, and complete where the spec's is") {
    // the structural gate that caught two transcription slips in review:
    // a wrong length or codeword value almost always breaks one of
    // prefix-freeness / Kraft completeness. Three tables are genuinely
    // incomplete in the spec (an all-zeros codeword is unused); their
    // exact Kraft deficit is pinned so a regression can't hide there.
    val knownIncomplete = Map(
      "coeff_token_nc0" -> BigDecimal(1) / 32768, // one 15-bit slot unused
      "total_zeros_tc1" -> BigDecimal(1) / 512,
      "run_before_zl7" -> BigDecimal(1) / 2048)
    H264.vlcTables.foreach { case (name, entries) =>
      val valid = entries.filter(_._1 > 0)
      val words = valid.map { case (l, b) =>
        String.format("%" + l + "s", Integer.toBinaryString(b)).replace(' ', '0')
      }
      assert(words.distinct.size == words.size, s"$name: duplicate codeword")
      for (a <- words; c <- words if a != c)
        assert(!c.startsWith(a), s"$name: $a prefixes $c")
      val kraft = valid.map { case (l, _) => BigDecimal(1) / BigDecimal(2).pow(l) }.sum
      assert(kraft == BigDecimal(1) - knownIncomplete.getOrElse(name, BigDecimal(0)),
        s"$name: Kraft sum $kraft — table transcription broken")
    }
  }

  test("coeff_token spot checks against the published short codewords") {
    // independently-known Table 9-5 entries (nC<2): (T1s,TC) → codeword
    def decode(bits: String, nC: Int): (Int, Int) = {
      val w = new H264.BitWriter
      bits.foreach(c => w.bit(c - '0'))
      w.trailing() // padding so the reader never runs dry
      val r = new H264.BitReader(w.result())
      val (coeff, total) = H264.readCavlcBlock(r, nC, 16)
      // reuse readCavlcBlock for token-only probes is awkward; read
      // the token via a 1-coeff trick instead: not possible — so probe
      // via full blocks below. This helper is for (0,0) only.
      (total, coeff.count(_ != 0))
    }
    // TC=0 token is "1": a block that starts with bit 1 must decode to
    // all zeros immediately
    assert(decode("1", 0) === (0, 0))
    // chroma DC TC=0 token is "01"
    val w = new H264.BitWriter
    w.bit(0); w.bit(1); w.trailing()
    assert(H264.readCavlcBlock(new H264.BitReader(w.result()), -1, 4)._2 === 0)
  }

  test("CAVLC block round-trip across coefficient shapes and contexts") {
    val shapes: Seq[(String, Array[Int], Int, Int)] = Seq(
      // (label, scan-order coefficients, nC, maxNumCoeff)
      ("empty16", Array.fill(16)(0), 0, 16),
      ("single+1", Array(1) ++ Array.fill(15)(0), 0, 16),
      ("single-1@15", Array.fill(15)(0) :+ -1, 0, 16),
      ("dc-heavy", Array(5, -3, 2, -1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), 0, 16),
      ("scattered", Array(2, 0, 0, -1, 0, 0, 1, 0, 0, 0, -2, 0, 0, 0, 1, 0), 0, 16),
      ("four-trailing-ones", Array(3, 1, -1, 1, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), 0, 16),
      ("max-levels", Array(7, -7, 6, -6, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), 0, 16),
      ("full16", Array(1, -1, 1, -1, 2, -2, 2, -2, 1, -1, 1, -1, 3, -3, 1, -1), 0, 16),
      ("nc1", Array(0, 2, 0, -1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), 1, 16),
      ("flc-nc8", Array(2, -1, 0, 1, 0, 0, -3, 0, 0, 0, 0, 0, 0, 0, 1, 0), 8, 16),
      ("flc-nc16-empty", Array.fill(16)(0), 16, 16),
      ("ac15", Array(0, 1, 0, -2, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0), 0, 15),
      ("chromaDC-empty", Array(0, 0, 0, 0), -1, 4),
      ("chromaDC-2", Array(1, 0, -2, 0), -1, 4),
      ("chromaDC-full", Array(1, -1, 2, 1), -1, 4))
    shapes.foreach { case (label, coeffs, nC, maxN) =>
      val p = new H264.BitWriter
      val wroteTotal = H264.writeCavlcBlock(p, coeffs, nC)
      p.trailing()
      val r = new H264.BitReader(p.result())
      val (got, total) = H264.readCavlcBlock(r, nC, maxN)
      assert(got.toSeq === coeffs.toSeq, s"$label: coefficient mismatch")
      assert(total === wroteTotal && total === coeffs.count(_ != 0), s"$label: TotalCoeff")
    }
  }

  /** Independent arithmetic model of the DC-only Intra_16x16 decode —
    * matrix-multiplication Hadamard and the raw §8.5.10 formulas, a
    * different code path from the decoder's butterflies. */
  private def expectedI16DcLuma(zigzagLevels: Array[Int], qp: Int,
                                predDc: Int): Array[Int] = {
    val zz = H264.Zigzag4x4
    val c = new Array[Int](16)
    zigzagLevels.indices.foreach(s => c(zz(s)) = zigzagLevels(s))
    val A = Array(Array(1, 1, 1, 1), Array(1, 1, -1, -1),
      Array(1, -1, -1, 1), Array(1, -1, 1, -1))
    val f = Array.ofDim[Int](4, 4)
    for (i <- 0 until 4; j <- 0 until 4)
      f(i)(j) = (for (u <- 0 until 4; v <- 0 until 4)
        yield A(i)(u) * c(u * 4 + v) * A(v)(j)).sum
    val v00 = Array(10, 11, 13, 14, 16, 18)(qp % 6) * 16
    val dc = Array.ofDim[Int](4, 4)
    for (i <- 0 until 4; j <- 0 until 4)
      dc(i)(j) =
        if (qp >= 36) (f(i)(j) * v00) << (qp / 6 - 6)
        else (f(i)(j) * v00 + (1 << (5 - qp / 6))) >> (6 - qp / 6)
    // DC-only 4x4 block inverse transform is uniform: r = (dc + 32) >> 6
    val out = new Array[Int](256)
    for (by <- 0 until 4; bx <- 0 until 4; py <- 0 until 4; px <- 0 until 4)
      out((by * 4 + py) * 16 + bx * 4 + px) =
        math.max(0, math.min(255, predDc + ((dc(by)(bx) + 32) >> 6)))
    out
  }

  test("Intra_16x16 DC-only IDR: single MB decodes to the independent arithmetic") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePps()).get
    // scattered levels exercising T1 signs, a ±2 level, runs and zeros
    val levels = Array(2, 0, -1, 0, 0, 1, 0, 0, -2, 0, 0, 0, 1, 0, 0, 0)
    val nal = H264.encodeIdrI16Dc(1, 1, 0, (_, _) => levels)
    val fr = H264.decodeIdrIntra(sps, pps, nal)
    assert(fr.isDefined, "DC-only Intra_16x16 slice must decode")
    val want = expectedI16DcLuma(levels, qp = 26, predDc = 128)
    assert(fr.get.y.map(_ & 0xff).toSeq === want.toSeq)
    // cbp_chroma 0 → chroma is pure DC prediction: 128 everywhere
    assert(fr.get.cb.forall(b => (b & 0xff) == 128))
    assert(fr.get.cr.forall(b => (b & 0xff) == 128))
  }

  test("Intra_16x16 DC-only IDR: 2x2 MBs propagate DC prediction through neighbors") {
    val sps = H264.parseSps(H264.encodeSps(2, 2)).get
    val pps = H264.parsePps(H264.encodePps()).get
    def lv(mbX: Int, mbY: Int): Array[Int] = {
      val a = new Array[Int](16)
      a(0) = 3 * (mbY * 2 + mbX + 1) // DC-position level only, per-MB
      a
    }
    val nal = H264.encodeIdrI16Dc(2, 2, 1, lv)
    val fr = H264.decodeIdrIntra(sps, pps, nal)
    assert(fr.isDefined)
    // independent model: each MB is uniform (DC-position-only levels
    // make a uniform residual); DC prediction averages neighbor edges
    def resid(mbX: Int, mbY: Int): Int = {
      val f = lv(mbX, mbY)(0) // Hadamard of a DC-only 4x4 = c00 everywhere
      val dc = (f * 13 * 16 + 2) >> 2 // qp 26: %6=2 → v00 13, branch <36
      (dc + 32) >> 6
    }
    val p00 = 128 + resid(0, 0)
    val p10 = p00 + resid(1, 0) // left edge avg = p00 (uniform)
    val p01 = p00 + resid(0, 1) // top edge avg = p00
    val p11 = ((16 * p10 + 16 * p01 + 16) >> 5) + resid(1, 1)
    val y = fr.get.y.map(_ & 0xff)
    def at(px: Int, py: Int) = y(py * 32 + px)
    assert(at(5, 5) === p00 && at(20, 5) === p10)
    assert(at(5, 20) === p01 && at(20, 20) === p11)
    // uniformity within each MB
    for (mb <- Seq((0, 0, p00), (1, 0, p10), (0, 1, p01), (1, 1, p11));
         k <- 0 until 256) {
      val (mx, my, v) = mb
      assert(y((my * 16 + k / 16) * 32 + mx * 16 + k % 16) === v,
        s"MB($mx,$my) pixel $k")
    }
  }

  test("mixed slice: I_PCM and Intra_16x16 MBs coexist; PCM neighbors drive nC>=8 FLC") {
    // hand-build a 2x1-MB slice: MB0 I_PCM (planted bytes), MB1
    // Intra_16x16 DC-only whose DC block's left neighbor is PCM
    // (stored TotalCoeff 16 → nC = 16 → the exact FLC path)
    val sps = H264.parseSps(H264.encodeSps(2, 1)).get
    val pps = H264.parsePps(H264.encodePps()).get
    val y0 = Array.tabulate(256)(i => (40 + i % 17))
    val cb0 = Array.tabulate(64)(i => (90 + i % 5))
    val cr0 = Array.tabulate(64)(i => (160 + i % 3))
    val levels = Array(1, -1, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val w = new H264.BitWriter
    w.u(0x65L, 8)
    val p = new H264.BitWriter
    p.ue(0); p.ue(7); p.ue(0); p.u(0L, 4); p.ue(0)
    p.u(0L, 1); p.u(0L, 1); p.se(0)
    // MB0: I_PCM
    p.ue(25); p.alignZero()
    y0.foreach(v => p.u(v.toLong, 8))
    cb0.foreach(v => p.u(v.toLong, 8))
    cr0.foreach(v => p.u(v.toLong, 8))
    // MB1: Intra_16x16, DC pred, cbp 0; its DC block nC = 16 (left PCM)
    p.ue(3); p.ue(0); p.se(0)
    H264.writeCavlcBlock(p, levels, 16)
    p.trailing()
    val nal = w.putBytes(H264.escapeRbsp(p.result())).result()
    val fr = H264.decodeIdrIntra(sps, pps, nal)
    assert(fr.isDefined, "mixed PCM + Intra_16x16 slice must decode")
    val y = fr.get.y.map(_ & 0xff)
    // MB0 pixels are the PCM bytes
    for (r <- 0 until 16; c <- 0 until 16)
      assert(y(r * 32 + c) === y0(r * 16 + c), s"PCM pixel ($r,$c)")
    // MB1: DC pred = mean of MB0's right column (left edge), then the
    // independent arithmetic residual on the planted levels
    val leftMean = ((0 until 16).map(r => y0(r * 16 + 15)).sum + 8) >> 4
    val want = expectedI16DcLuma(levels, qp = 26, predDc = leftMean)
    for (r <- 0 until 16; c <- 0 until 16)
      assert(y(r * 32 + 16 + c) === want(r * 16 + c), s"I16 pixel ($r,$c)")
    // chroma of MB1: per-4x4-block DC prediction from MB0's chroma
    // right column — with the top row unavailable every block falls
    // back to the MB-left samples of ITS OWN row range (§8.3.4.1), so
    // rows 0-3 and rows 4-7 each take their half-column mean
    def halfMean(plane: Array[Int], r0: Int): Int =
      ((r0 until r0 + 4).map(r => plane(r * 8 + 7)).sum + 2) >> 2
    val cbP = fr.get.cb.map(_ & 0xff); val crP = fr.get.cr.map(_ & 0xff)
    for (r <- 0 until 8; c <- 0 until 8) {
      val r0 = (r / 4) * 4
      assert(cbP(r * 16 + 8 + c) === halfMean(cb0, r0), s"cb ($r,$c)")
      assert(crP(r * 16 + 8 + c) === halfMean(cr0, r0), s"cr ($r,$c)")
    }
  }

  test("honesty: nC in [2,8) context and I_4x4 mb_type decode to None, never garbage") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePps()).get
    assert(H264.decodeIdrIntra(sps, pps, H264.encodeIdrI4x4Stub(0)).isEmpty)
    // CABAC PPS still refuses at parse time
    assert(H264.parsePps(H264.encodePpsCabac()).isEmpty)
    // writeCavlcBlock refuses the un-transcribed context class loudly
    val p = new H264.BitWriter
    intercept[IllegalArgumentException] {
      H264.writeCavlcBlock(p, Array.fill(16)(0), 4)
    }
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
