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
    // a CABAC PPS parses since r20 (entropy handled by Cabac), carrying
    // the entropy mode for decodeIdrIntra's dispatch
    val wc = new H264.BitWriter
    wc.u(0x68L, 8)
    val pc = new H264.BitWriter
    pc.ue(0); pc.ue(0); pc.u(1L, 1) // entropy_coding_mode_flag = CABAC
    pc.u(0L, 1); pc.ue(0); pc.ue(0); pc.ue(0)
    pc.u(0L, 1); pc.u(0L, 2); pc.se(0); pc.se(0); pc.se(0)
    pc.u(0L, 1); pc.u(0L, 1); pc.u(0L, 1)
    pc.trailing()
    val cabacPps =
      H264.parsePps(wc.putBytes(H264.escapeRbsp(pc.result())).result())
    assert(cabacPps.isDefined && !cabacPps.get.cavlc)
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
      "coeff_token_nc2" -> BigDecimal(1) / 8192, // one 13-bit slot unused
      "coeff_token_nc4" -> BigDecimal(1) / 1024, // the all-zeros 10-bit slot
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
    // published short codewords of the r19 columns: TC=0 is "11" for
    // nC ∈ [2,4) and "1111" for nC ∈ [4,8) — a column swap or offset
    // slip cannot survive these
    assert(decode("11", 2) === (0, 0))
    assert(decode("11", 3) === (0, 0))
    assert(decode("1111", 4) === (0, 0))
    assert(decode("1111", 7) === (0, 0))
    // nC ∈ [2,4): (TC=1, T1=1) is "10" + sign bit; one +1 coefficient
    val w2 = new H264.BitWriter
    "10".foreach(c => w2.bit(c - '0'))
    w2.bit(0) // trailing_ones_sign_flag: positive
    // total_zeros(TC=1): 15 zeros below → the tc1 table's last entry
    (0 until 8).foreach(_ => w2.bit(0)); w2.bit(1) // "000000001" = tz 15
    w2.trailing()
    // decode succeeds structurally; exact zero placement asserted via
    // the round-trip shapes above — here the TOKEN is the subject
    val (c2, t2) = H264.readCavlcBlock(new H264.BitReader(w2.result()), 2, 16)
    assert(t2 === 1 && c2.count(_ != 0) === 1 && c2.sum === 1)
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
      // the r19 nC ∈ [2,8) columns: every context value 2..7, varied shapes
      ("nc2-empty", Array.fill(16)(0), 2, 16),
      ("nc2", Array(3, 0, -1, 1, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0), 2, 16),
      ("nc3", Array(1, -1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -2, 0), 3, 16),
      ("nc4-empty", Array.fill(16)(0), 4, 16),
      ("nc4", Array(-2, 1, 0, 0, 1, 0, 0, -1, 0, 0, 0, 1, 0, 0, 0, 0), 4, 16),
      ("nc5-full16", Array(1, -1, 1, -1, 2, -2, 2, -2, 1, -1, 1, -1, 3, -3, 1, -1), 5, 16),
      ("nc6-ac15", Array(0, 1, 0, -2, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0), 6, 15),
      ("nc7-max-levels", Array(7, -7, 6, -6, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), 7, 16),
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

  test("honesty: truncated I_4x4 bodies and truncated CABAC decode to None, never garbage") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePps()).get
    // the legacy stub CLAIMS I_4x4 but carries a 16-bit opaque body —
    // the real parser runs out of bits inside mb_pred/residual → None
    assert(H264.decodeIdrIntra(sps, pps, H264.encodeIdrI4x4Stub(0)).isEmpty)
    // CABAC PPS parses since r20; a TRUNCATED CABAC slice must refuse
    val ppsC = H264.parsePps(H264.encodePpsCabac()).get
    assert(!ppsC.cavlc)
    val cnal = Cabac.encodeIdrI4x4(1, 1, 0,
      (_, _, b) => FakeCodec.i4x4Mode(7L, b),
      (_, _, b) => Array.tabulate(16)(k => FakeCodec.i4x4Level(7L, b, k)),
      qpDelta = 0)
    assert(H264.decodeIdrIntra(sps, ppsC, cnal.take(cnal.length / 2)).isEmpty)
    // invalid coeff_token context refuses loudly on the encode side
    val p = new H264.BitWriter
    intercept[IllegalArgumentException] {
      H264.writeCavlcBlock(p, Array.fill(16)(0), -2)
    }
  }

  test("intra4x4Predict: all nine modes against hand-computed spec arithmetic") {
    // ramp neighbors: top p[0..7,-1], left p[-1,0..3], corner p[-1,-1]
    val top = Array(0, 8, 16, 24, 32, 40, 48, 56)
    val left = Array(4, 12, 20, 28)
    val corner = 2
    def pr(mode: Int): Array[Int] =
      H264.intra4x4Predict(mode, top, left, corner, true, true)
    def at(p: Array[Int], y: Int, x: Int): Int = p(y * 4 + x)
    val v = pr(0); assert(at(v, 0, 0) === 0 && at(v, 3, 3) === 24)
    val h = pr(1); assert(at(h, 0, 0) === 4 && at(h, 3, 1) === 28)
    val dc = pr(2); assert(dc.forall(_ === 14)) // (48+64+4)>>3
    val ddl = pr(3)
    assert(at(ddl, 0, 0) === 8) // (t0+2t1+t2+2)>>2 = 34>>2
    assert(at(ddl, 0, 3) === 32) // (t3+2t4+t5+2)>>2 = 130>>2
    assert(at(ddl, 3, 3) === 54) // (t6+3t7+2)>>2 = 218>>2
    val ddr = pr(4)
    assert(at(ddr, 0, 0) === 2) // (t0+2c+l0+2)>>2 = 10>>2
    assert(at(ddr, 0, 2) === 8) // x>y: (t0+2t1+t2+2)>>2
    assert(at(ddr, 2, 0) === 12) // x<y: (l0+2l1+l2+2)>>2 = 50>>2
    val vr = pr(5)
    assert(at(vr, 0, 0) === 1) // zVR 0: (c+t0+1)>>1 = 3>>1
    assert(at(vr, 1, 1) === 3) // zVR 1: (c+2t0+t1+2)>>2 = 12>>2
    assert(at(vr, 1, 0) === 2) // zVR -1: (l0+2c+t0+2)>>2 = 10>>2
    assert(at(vr, 2, 0) === 6) // zVR -2: (l1+2l0+c+2)>>2 = 24>>2
    val hd = pr(6)
    assert(at(hd, 0, 0) === 3) // zHD 0: (c+l0+1)>>1 = 7>>1
    assert(at(hd, 0, 1) === 2) // zHD -1: (l0+2c+t0+2)>>2
    assert(at(hd, 0, 2) === 3) // zHD -2: (t1+2t0+c+2)>>2 = 12>>2
    val vl = pr(7)
    assert(at(vl, 0, 0) === 4) // (t0+t1+1)>>1 = 9>>1
    assert(at(vl, 1, 0) === 8) // (t0+2t1+t2+2)>>2
    assert(at(vl, 3, 3) === 40) // (t4+2t5+t6+2)>>2 = 162>>2
    val hu = pr(8)
    assert(at(hu, 0, 0) === 8) // zHU 0: (l0+l1+1)>>1 = 17>>1
    assert(at(hu, 1, 1) === 20) // zHU 3: (l1+2l2+l3+2)>>2 = 82>>2
    assert(at(hu, 2, 0) === 24) // zHU 4: (l2+l3+1)>>1 = 49>>1
    assert(at(hu, 2, 1) === 26) // zHU 5: (l2+3l3+2)>>2 = 106>>2
    assert(at(hu, 3, 2) === 28) // zHU 9 > 5: l3
    // availability refusals: null, never a guess
    assert(H264.intra4x4Predict(0, top, left, corner, false, true) == null)
    assert(H264.intra4x4Predict(1, top, left, corner, true, false) == null)
    assert(H264.intra4x4Predict(4, top, left, corner, true, false) == null)
    // flat neighborhood is a fixed point of every mode (weights sum
    // to the divisor): catches indexing slips across the whole grid
    val ft = Array.fill(8)(77); val fl = Array.fill(4)(77)
    (0 to 8).foreach { m =>
      assert(H264.intra4x4Predict(m, ft, fl, 77, true, true).forall(_ === 77),
        s"mode $m not flat-preserving")
    }
  }

  test("Table 9-4 intra CBP mapping is a 0..47 bijection with the published head") {
    val t = H264.cbpIntraTable
    assert(t.length === 48)
    assert(t.toSet === (0 until 48).toSet)
    assert(t(0) === 47 && t(1) === 31 && t(2) === 15 && t(3) === 0)
  }

  /** Independent I_4x4 luma model: sequential §6.4.3 reconstruction
    * with matrix-form inverse transform (doubled-integer halves — the
    * decoder uses butterflies) and straight-line V/H/DC prediction.
    * Valid for even dequantized coefficients (fixture QP 26 ensures
    * it) and modes 0-2. */
  private def expectedI4x4Luma(modes: Int => Int,
                               zig: Int => Array[Int]): Array[Int] = {
    val zz = H264.Zigzag4x4
    // deliberate literal copies of the 6.4.3 ordering: the model stays
    // independent of the codec's constant (the x121 SQL oracle is the
    // other independent pin)
    val blk4x = Array(0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3)
    val blk4y = Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)
    val ls = Array.tabulate(16) { k =>
      val i = k / 4; val j = k % 4
      if (i % 2 == 0 && j % 2 == 0) 208 else if (i % 2 == 1 && j % 2 == 1) 320
      else 256 // qp 26: 16 * {13, 20, 16}
    }
    // inverse core as M * D * M^T with doubled integers (exact for
    // even D): rows of 2*M are (2,2,2,1), (2,1,-2,-2), (2,-1,-2,2),
    // (2,-2,2,-1)
    val m2 = Array(
      Array(2, 2, 2, 1), Array(2, 1, -2, -2),
      Array(2, -1, -2, 2), Array(2, -2, 2, -1))
    val pix = new Array[Int](256)
    for (b <- 0 until 16) {
      val bx = blk4x(b); val by = blk4y(b)
      val sc = zig(b)
      val d = new Array[Int](16)
      for (s <- 0 until 16) d(zz(s)) = sc(s) * ls(zz(s))
      val g = Array.ofDim[Int](4, 4)
      for (i <- 0 until 4; j <- 0 until 4) {
        var acc = 0
        for (u <- 0 until 4; v2 <- 0 until 4)
          acc += m2(i)(u) * d(u * 4 + v2) * m2(j)(v2)
        assert(acc % 4 == 0, "doubled transform inexact — odd input")
        g(i)(j) = acc / 4
      }
      val x0 = bx * 4; val y0 = by * 4
      val topOk = by > 0; val leftOk = bx > 0
      val pred = Array.ofDim[Int](4, 4)
      modes(b) match {
        case 0 =>
          for (y <- 0 until 4; x <- 0 until 4)
            pred(y)(x) = pix((y0 - 1) * 16 + x0 + x)
        case 1 =>
          for (y <- 0 until 4; x <- 0 until 4)
            pred(y)(x) = pix((y0 + y) * 16 + x0 - 1)
        case 2 =>
          val sT = if (topOk) (0 until 4).map(i => pix((y0 - 1) * 16 + x0 + i)).sum else 0
          val sL = if (leftOk) (0 until 4).map(i => pix((y0 + i) * 16 + x0 - 1)).sum else 0
          val v =
            if (topOk && leftOk) (sT + sL + 4) >> 3
            else if (topOk) (sT + 2) >> 2
            else if (leftOk) (sL + 2) >> 2
            else 128
          for (y <- 0 until 4; x <- 0 until 4) pred(y)(x) = v
        case m => fail(s"model only covers modes 0-2, got $m")
      }
      for (y <- 0 until 4; x <- 0 until 4) {
        val r = {
          val t = g(y)(x) + 32
          // arithmetic >> 6 is floor division
          if (t >= 0) t >> 6 else -((-t + 63) / 64)
        }
        pix((y0 + y) * 16 + x0 + x) =
          math.max(0, math.min(255, pred(y)(x) + r))
      }
    }
    pix
  }

  test("I_4x4 IDR: V/H/DC-mode MB decodes to the independent sequential model") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePps()).get
    def mode(b: Int): Int = {
      val bx = H264.Blk4x(b); val by = H264.Blk4y(b)
      if (bx == 0 && by == 0) 2
      else if (by == 0) Seq(1, 2)((b + 1) % 2)
      else if (bx == 0) Seq(0, 2)(b % 2)
      else Seq(0, 1, 2)(b % 3)
    }
    def zig(b: Int): Array[Int] = Array.tabulate(16) { k =>
      if ((b * 7 + k) % 5 != 0) 0
      else { val v = (b * 13 + k * 7) % 4; if (v < 2) v - 2 else v - 1 }
    }
    val nal = H264.encodeIdrI4x4(1, 1, 0, (_, _, b) => mode(b),
      (_, _, b) => zig(b))
    val fr = H264.decodeIdrIntra(sps, pps, nal)
    assert(fr.isDefined, "I_4x4 slice must decode")
    val want = expectedI4x4Luma(mode, zig)
    (0 until 256).foreach { k =>
      assert((fr.get.y(k) & 0xff) === want(k), s"luma byte $k")
    }
    // chroma: cbp_chroma 0 + DC prediction with no neighbors = flat 128
    assert(fr.get.cb.forall(b => (b & 0xff) === 128))
    assert(fr.get.cr.forall(b => (b & 0xff) === 128))
  }

  test("I_4x4 2x2-MB slice: modes 3-8 on interior blocks decode (flat fixed point)") {
    val sps = H264.parseSps(H264.encodeSps(2, 2)).get
    val pps = H264.parsePps(H264.encodePps()).get
    // zero residual everywhere: with an all-flat reconstruction (DC
    // from no neighbors = 128 seeds it), EVERY mode must reproduce the
    // flat value — exercises the directional modes' neighbor indexing
    // (incl. top-right substitution) across real MB boundaries
    def mode(mbX: Int, mbY: Int, b: Int): Int = {
      val bx = H264.Blk4x(b); val by = H264.Blk4y(b)
      val gx = mbX * 4 + bx; val gy = mbY * 4 + by
      if (gx == 0 && gy == 0) 2
      else if (gy == 0) 1 // top picture row: H
      else if (gx == 0) 0 // left picture col: V
      else 3 + ((gx * 5 + gy * 3 + b) % 6) // interior: modes 3..8
    }
    val nal = H264.encodeIdrI4x4(2, 2, 0, (mx, my, b) => mode(mx, my, b),
      (_, _, _) => Array.fill(16)(0))
    val fr = H264.decodeIdrIntra(sps, pps, nal)
    assert(fr.isDefined)
    assert(fr.get.y.forall(b => (b & 0xff) === 128), "flat fixed point broken")
  }

  test("Intra_16x16 AC residual (cbp_luma 15): nC contexts walk all Table 9-5 columns") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePps()).get
    def dc(k: Int): Int = if (k % 3 == 0) 1 - (k % 2) * 2 else 0
    // density by blk%3 drives neighbor TotalCoeff through 0-8+
    def ac(b: Int, k0: Int): Int = {
      val k = k0 + 1 // zigzag position 1..15
      val dense = b % 3
      val hit =
        if (dense == 0) (b + k) % 5 == 0
        else if (dense == 1) (b + k) % 3 == 0
        else k % 2 == 1
      if (!hit) 0
      else { val v = (b * 11 + k * 3) % 4; if (v < 2) v - 2 else v - 1 }
    }
    val nal = H264.encodeIdrI16Ac(1, 1, 0,
      (_, _) => Array.tabulate(16)(dc),
      (_, _, b) => Array.tabulate(15)(k0 => ac(b, k0)))
    val fr = H264.decodeIdrIntra(sps, pps, nal)
    assert(fr.isDefined, "AC Intra_16x16 slice must decode")
    // expected pixels rebuilt longhand: matrix-form Hadamard for the
    // DC path (as in expectedI16DcLuma), §8.5.12 butterflies written
    // out from the spec text for the AC-bearing blocks (the doubled-
    // matrix trick is inexact here because the Hadamard-path d(0) can
    // be odd), explicit floor shifts throughout
    val zz = H264.Zigzag4x4
    val ls = Array.tabulate(16) { k =>
      val i = k / 4; val j = k % 4
      if (i % 2 == 0 && j % 2 == 0) 208 else if (i % 2 == 1 && j % 2 == 1) 320
      else 256
    }
    val blk4x = H264.Blk4x; val blk4y = H264.Blk4y
    for (b <- 0 until 16) {
      // rebuild the block's full transform (DC from the Hadamard path
      // + AC) exactly as the decoder composes them
      val dcRaster = new Array[Int](16)
      for (s <- 0 until 16) dcRaster(zz(s)) = dc(s)
      val A = Array(Array(1, 1, 1, 1), Array(1, 1, -1, -1),
        Array(1, -1, -1, 1), Array(1, -1, 1, -1))
      val f = Array.ofDim[Int](4, 4)
      for (i <- 0 until 4; j <- 0 until 4)
        f(i)(j) = (for (u <- 0 until 4; v <- 0 until 4)
          yield A(i)(u) * dcRaster(u * 4 + v) * A(v)(j)).sum
      val bx = blk4x(b); val by = blk4y(b)
      val d = new Array[Int](16)
      d(0) = (f(by)(bx) * 208 + 2) >> 2 // §8.5.10 DC dequant, qp 26
      for (s <- 1 until 16) d(zz(s)) = ac(b, s - 1) * ls(zz(s))
      def inv(src: Array[Int]): Array[Int] = {
        val e = new Array[Int](16)
        for (i <- 0 until 4) {
          val d0 = src(i * 4); val d1 = src(i * 4 + 1)
          val d2 = src(i * 4 + 2); val d3 = src(i * 4 + 3)
          e(i * 4) = (d0 + d2) + (d1 + (d3 >> 1))
          e(i * 4 + 1) = (d0 - d2) + ((d1 >> 1) - d3)
          e(i * 4 + 2) = (d0 - d2) - ((d1 >> 1) - d3)
          e(i * 4 + 3) = (d0 + d2) - (d1 + (d3 >> 1))
        }
        val g = new Array[Int](16)
        for (j <- 0 until 4) {
          val d0 = e(j); val d1 = e(4 + j); val d2 = e(8 + j); val d3 = e(12 + j)
          g(j) = (d0 + d2) + (d1 + (d3 >> 1))
          g(4 + j) = (d0 - d2) + ((d1 >> 1) - d3)
          g(8 + j) = (d0 - d2) - ((d1 >> 1) - d3)
          g(12 + j) = (d0 + d2) - (d1 + (d3 >> 1))
        }
        g
      }
      val g = inv(d)
      for (py <- 0 until 4; px <- 0 until 4) {
        val t = g(py * 4 + px) + 32
        val resid = if (t >= 0) t >> 6 else -((-t + 63) / 64)
        val want = math.max(0, math.min(255, 128 + resid))
        val got = fr.get.y((by * 4 + py) * 16 + bx * 4 + px) & 0xff
        assert(got === want, s"block $b pixel ($py,$px)")
      }
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
