package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The §9.3 CABAC entropy layer behind the r20 seam closure. The gate
  * structure mirrors what caught the CAVLC transcription slips:
  * STRUCTURAL checks on the tables (the published rangeTabLPS
  * construction formula, terminal-row anchors, monotonicity), engine
  * round-trips (encode→decode identity over adversarial bin mixes),
  * and CROSS-ENTROPY consistency — the same planted syntax encoded
  * through CAVLC and CABAC must decode to byte-identical frames, which
  * holds the new entropy layer to the CAVLC layer's oracle-pinned
  * truth. See the Cabac scaladoc for what these gates can and cannot
  * certify offline. */
class H264CabacSpec extends AnyFunSuite {

  test("rangeTabLPS matches the published construction within rounding") {
    val tab = Cabac.rangeTable
    assert(tab.length === 64 && tab.forall(_.length === 4))
    // terminal row: the DecodeTerminate reserve
    assert(tab(63).toSeq === Seq(2, 2, 2, 2))
    // construction: round(Q_rho * p0 * alpha^sigma), Q = 288+64*rho,
    // p0 = 1/2, alpha = (0.01875/0.5)^(1/63); column 0 clamps at 128
    // for sigma <= 2 (LPS subrange must not exceed the MPS subrange)
    val alpha = math.pow(0.01875 / 0.5, 1.0 / 63)
    for (s <- 0 until 63; q <- 0 until 4) {
      val expect = math.min(if (q == 0) 128 else Int.MaxValue,
        math.round((288 + 64 * q) * 0.5 * math.pow(alpha, s)).toInt)
      assert(math.abs(tab(s)(q) - expect) <= 2,
        s"rangeTabLPS($s)($q) = ${tab(s)(q)}, construction says ~$expect")
    }
    // rows increase across the quantizer index; columns never increase
    for (s <- 0 until 63; q <- 0 until 3)
      assert(tab(s)(q) < tab(s)(q + 1), s"row $s not increasing at $q")
    for (s <- 0 until 62; q <- 0 until 4)
      assert(tab(s + 1)(q) <= tab(s)(q), s"column $q not decreasing at $s")
  }

  test("transIdxLPS is a valid decay map") {
    val lps = Cabac.transLpsTable
    assert(lps.length === 64)
    assert(lps(0) === 0 && lps(63) === 63)
    for (s <- 1 until 63) {
      assert(lps(s) <= s, s"LPS transition at $s rises above the state")
      assert(lps(s) >= s - 26, s"LPS transition at $s drops implausibly")
      // near-monotone: the published table has single-step local dips
      assert(math.abs(lps(s) - lps(s - 1)) <= 2, s"jump at $s")
    }
  }

  test("context init: every (m, n) yields a legal state at every QP") {
    val init = Cabac.initTable
    // exactly the I-slice subset's context ranges, each fully covered
    val idxs = init.map(_._1).toSet
    for (r <- Seq(3 to 10, 60 to 69, 73 to 104, 105 to 165, 166 to 226,
      227 to 275); i <- r)
      assert(idxs.contains(i), s"ctx $i uncovered by the init table")
    assert(init.size === idxs.size, "duplicate ctx in the init table")
    for ((idx, m, n) <- init; qp <- Seq(0, 10, 26, 37, 51)) {
      val pre = math.max(1, math.min(126, ((m * qp) >> 4) + n))
      val ps = if (pre <= 63) 63 - pre else pre - 64
      assert(ps >= 0 && ps <= 63, s"ctx $idx qp $qp: pState $ps")
    }
  }

  test("engine round-trip: adversarial bin mixes survive encode->decode") {
    // deterministic LCG so the mix covers MPS runs, LPS flips, bypass
    // bursts and interleaved terminates without flaking
    var seed = 0x2545F4914F6CDD1DL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (trial <- 0 until 20) {
      val n = 200 + nextInt(300)
      val kinds = Array.tabulate(n)(_ => nextInt(10)) // 0-6 ctx, 7-9 bypass
      val bins = Array.tabulate(n)(_ => nextInt(2))
      val ctxs = Array.tabulate(n)(_ => Seq(3, 68, 69, 105, 166, 227)(nextInt(6)))
      val w = new H264.BitWriter
      val ce = new Cabac.Contexts(26)
      val enc = new Cabac.Encoder(w)
      for (i <- 0 until n) {
        if (kinds(i) < 7) enc.decision(ce, ctxs(i), bins(i))
        else enc.bypass(bins(i))
      }
      enc.terminate(0)
      enc.terminate(1) // flush
      w.alignZero()
      val cd = new Cabac.Contexts(26)
      val dec = new Cabac.Decoder(new H264.BitReader(w.result()))
      for (i <- 0 until n) {
        val b =
          if (kinds(i) < 7) dec.decision(cd, ctxs(i), 0)
          else dec.bypass(0)
        assert(b === bins(i), s"trial $trial bin $i (kind ${kinds(i)})")
      }
      assert(dec.terminate(0) === 0)
      assert(dec.terminate(0) === 1)
    }
  }

  test("CAVLC and CABAC code the SAME I_16x16 plants to identical frames") {
    val sps = H264.parseSps(H264.encodeSps(2, 2)).get
    val cavlcPps = H264.parsePps(H264.encodePps()).get
    val cabacPps = H264.parsePps(H264.encodePpsCabac()).get
    assert(cavlcPps.cavlc && !cabacPps.cavlc)
    for (docId <- Seq(0L, 7L, 123L)) {
      def dc(mbX: Int, mbY: Int) =
        Array.tabulate(16)(k => FakeCodec.i16DcLevel(docId + mbX + 3 * mbY, k))
      def ac(mbX: Int, mbY: Int, blk: Int) =
        Array.tabulate(15)(k0 =>
          FakeCodec.i16AcLevel(docId + mbX + 3 * mbY, blk, k0 + 1))
      val fr1 = H264.decodeIdrIntra(sps, cavlcPps,
        H264.encodeIdrI16Ac(2, 2, 0, dc, ac))
      val fr2 = H264.decodeIdrIntra(sps, cabacPps,
        Cabac.encodeIdrI16Ac(2, 2, 0, dc, ac))
      assert(fr1.isDefined, s"CAVLC decode failed for doc $docId")
      assert(fr2.isDefined, s"CABAC decode failed for doc $docId")
      assert(fr1.get.y.toSeq === fr2.get.y.toSeq, s"luma differs, doc $docId")
      assert(fr1.get.cb.toSeq === fr2.get.cb.toSeq)
      assert(fr1.get.cr.toSeq === fr2.get.cr.toSeq)
    }
  }

  test("CAVLC and CABAC code the SAME I_4x4 plants to identical frames") {
    val sps = H264.parseSps(H264.encodeSps(2, 2)).get
    val cavlcPps = H264.parsePps(H264.encodePps()).get
    val cabacPps = H264.parsePps(H264.encodePpsCabac()).get
    for (docId <- Seq(1L, 42L, 999L)) {
      // multi-MB: interior MBs see decoded neighbors, so modes beyond
      // V/H/DC stay legal on non-border blocks via the fixture plant
      def modes(mbX: Int, mbY: Int, b: Int) =
        FakeCodec.i4x4Mode(docId + mbX + 2 * mbY, b)
      def coeffs(mbX: Int, mbY: Int, b: Int) =
        Array.tabulate(16)(k => FakeCodec.i4x4Level(docId + mbX + 2 * mbY, b, k))
      val fr1 = H264.decodeIdrIntra(sps, cavlcPps,
        H264.encodeIdrI4x4(2, 2, 0, modes, coeffs))
      val fr2 = H264.decodeIdrIntra(sps, cabacPps,
        Cabac.encodeIdrI4x4(2, 2, 0, modes, coeffs, qpDelta = 0))
      assert(fr1.isDefined && fr2.isDefined, s"decode failed for doc $docId")
      assert(fr1.get.y.toSeq === fr2.get.y.toSeq, s"luma differs, doc $docId")
      assert(fr1.get.cb.toSeq === fr2.get.cb.toSeq)
      assert(fr1.get.cr.toSeq === fr2.get.cr.toSeq)
    }
  }

  test("mb_qp_delta: CABAC QP shifts match the shared dequant arithmetic") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePpsCabac()).get
    def modes(b: Int) = FakeCodec.i4x4Mode(5L, b)
    def coeffs(b: Int) = Array.tabulate(16)(k => FakeCodec.i4x4Level(5L, b, k))
    for (delta <- Seq(-1, 0, 1, -3, 4)) {
      val fr = H264.decodeIdrIntra(sps, pps,
        Cabac.encodeIdrI4x4(1, 1, 0, (_, _, b) => modes(b),
          (_, _, b) => coeffs(b), qpDelta = delta))
      assert(fr.isDefined, s"delta $delta failed")
      // expected frame straight through the entropy-independent helpers
      // at QP 26+delta — the same code the oracle-pinned CAVLC path uses
      val y = new Array[Byte](256)
      val cb = new Array[Byte](64); val cr = new Array[Byte](64)
      val qp = 26 + delta
      for (b4 <- 0 until 16)
        assert(H264.reconI4x4Block(modes(b4), coeffs(b4), qp, 0, 0, b4, 1, 16, y))
      assert(H264.reconstructChroma(Array.ofDim[Int](2, 4),
        Array.ofDim[Int](2, 4, 15), 0, H264.chromaQp(qp), 0, 0, 16, cb, cr,
        topOk = false, leftOk = false))
      assert(fr.get.y.toSeq === y.toSeq, s"delta $delta luma mismatch")
      assert(fr.get.cb.toSeq === cb.toSeq)
      assert(fr.get.cr.toSeq === cr.toSeq)
    }
  }

  test("UEG0 escape levels (|coeff|-1 > 14) round-trip through the suffix") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePpsCabac()).get
    // |levels| 15..40 force prefix exhaustion + 0-5 bypass suffix bits;
    // a level at scan position 15 also pins the inferred-significance
    // path (the loop completes without a last flag)
    def coeffs(b: Int): Array[Int] = {
      val sc = new Array[Int](16)
      sc(0) = 16 + b
      sc(7) = -(15 + 2 * b)
      sc(15) = if (b % 2 == 0) 40 else -17
      sc
    }
    val fr = H264.decodeIdrIntra(sps, pps,
      Cabac.encodeIdrI4x4(1, 1, 0, (_, _, b) => FakeCodec.i4x4Mode(9L, b),
        (_, _, b) => coeffs(b), qpDelta = 0))
    assert(fr.isDefined)
    val y = new Array[Byte](256)
    for (b4 <- 0 until 16)
      assert(H264.reconI4x4Block(FakeCodec.i4x4Mode(9L, b4), coeffs(b4), 26,
        0, 0, b4, 1, 16, y))
    assert(fr.get.y.toSeq === y.toSeq)
  }

  test("chroma residual (cat 3/4): CABAC I_16x16 with cbp_chroma 2 decodes") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePpsCabac()).get
    val dc = Array.tabulate(16)(k => FakeCodec.i16DcLevel(3L, k))
    val ac = Array.tabulate(16, 15)((b, k0) => FakeCodec.i16AcLevel(3L, b, k0 + 1))
    val chromaDc = Array(Array(1, -1, 2, 0), Array(-2, 1, 0, 1))
    val chromaAc = Array.tabulate(2, 4, 15)((pl, b, k) =>
      if ((pl + b + k) % 6 == 0) (if (k % 2 == 0) 1 else -2) else 0)
    val plants: Array[Cabac.MbPlant] = Array(Cabac.PlantI16(
      predMode = 2, cbpLuma = 15, cbpChroma = 2, dc = dc, luma = ac,
      chromaPredMode = 0, qpDelta = 0, chromaDc = chromaDc,
      chromaAc = chromaAc))
    val nal = Cabac.encodeIdrSlice(1, 1, 0, plants)
    val fr = H264.decodeIdrIntra(sps, pps, nal)
    assert(fr.isDefined)
    // expected planes through the shared reconstruction helpers
    val y = new Array[Byte](256)
    val cb = new Array[Byte](64); val cr = new Array[Byte](64)
    assert(H264.reconstructI16Luma(2, dc, ac, 26, 0, 0, 16, y))
    assert(H264.reconstructChroma(chromaDc, chromaAc, 0, H264.chromaQp(26),
      0, 0, 16, cb, cr, topOk = false, leftOk = false))
    assert(fr.get.y.toSeq === y.toSeq)
    assert(fr.get.cb.toSeq === cb.toSeq)
    assert(fr.get.cr.toSeq === cr.toSeq)
  }

  test("mixed CABAC slice: I_4x4 and I_16x16 MBs share neighbor contexts") {
    val sps = H264.parseSps(H264.encodeSps(2, 1)).get
    val pps = H264.parsePps(H264.encodePpsCabac()).get
    val p4 = Cabac.PlantI4x4(
      Array.tabulate(16)(b => FakeCodec.i4x4Mode(11L, b)),
      Array.tabulate(16)(b =>
        Array.tabulate(16)(k => FakeCodec.i4x4Level(11L, b, k))),
      cbp = 15, chromaPredMode = 0, qpDelta = 0,
      chromaDc = Array.ofDim[Int](2, 4), chromaAc = Array.ofDim[Int](2, 4, 15))
    val p16 = Cabac.PlantI16(
      predMode = 1, cbpLuma = 15, cbpChroma = 0,
      dc = Array.tabulate(16)(k => FakeCodec.i16DcLevel(11L, k)),
      luma = Array.tabulate(16, 15)((b, k0) => FakeCodec.i16AcLevel(11L, b, k0 + 1)),
      chromaPredMode = 0, qpDelta = 0,
      chromaDc = Array.ofDim[Int](2, 4), chromaAc = Array.ofDim[Int](2, 4, 15))
    val fr = H264.decodeIdrIntra(sps, pps,
      Cabac.encodeIdrSlice(2, 1, 0, Array(p4, p16)))
    assert(fr.isDefined)
    // MB 1 (I_16x16, Horizontal pred) reads MB 0's reconstructed right
    // edge — build the expectation with the same sequential helpers
    val y = new Array[Byte](32 * 16)
    val cb = new Array[Byte](16 * 8); val cr = new Array[Byte](16 * 8)
    for (b4 <- 0 until 16)
      assert(H264.reconI4x4Block(p4.modes(b4), p4.luma(b4), 26, 0, 0, b4, 2, 32, y))
    assert(H264.reconstructChroma(p4.chromaDc, p4.chromaAc, 0,
      H264.chromaQp(26), 0, 0, 32, cb, cr, topOk = false, leftOk = false))
    assert(H264.reconstructI16Luma(1, p16.dc, p16.luma, 26, 1, 0, 32, y))
    assert(H264.reconstructChroma(p16.chromaDc, p16.chromaAc, 0,
      H264.chromaQp(26), 1, 0, 32, cb, cr, topOk = false, leftOk = true))
    assert(fr.get.y.toSeq === y.toSeq)
    assert(fr.get.cb.toSeq === cb.toSeq)
    assert(fr.get.cr.toSeq === cr.toSeq)
  }

  test("honesty: bit flips in a CABAC slice never decode to the planted frame") {
    val sps = H264.parseSps(H264.encodeSps(1, 1)).get
    val pps = H264.parsePps(H264.encodePpsCabac()).get
    val nal = Cabac.encodeIdrI4x4(1, 1, 0,
      (_, _, b) => FakeCodec.i4x4Mode(13L, b),
      (_, _, b) => Array.tabulate(16)(k => FakeCodec.i4x4Level(13L, b, k)),
      qpDelta = 0)
    val base = H264.decodeIdrIntra(sps, pps, nal)
    assert(base.isDefined)
    // flip one bit in the arithmetic payload: either refuses (None) or
    // decodes to DIFFERENT pixels — never silently the planted frame
    for (byteIdx <- Seq(8, 12, nal.length - 3)) {
      val bad = nal.clone()
      bad(byteIdx) = (bad(byteIdx) ^ 0x10).toByte
      H264.decodeIdrIntra(sps, pps, bad) match {
        case None => ()
        case Some(fr) =>
          assert(fr.y.toSeq !== base.get.y.toSeq,
            s"bit flip at byte $byteIdx decoded to the untouched frame")
      }
    }
  }
}
