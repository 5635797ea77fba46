package graft.multimodal

/** Minimal — but REAL — H.264 (ISO/IEC 14496-10) bitstream layer for
  * intra-only tracks whose macroblocks are PCM-coded.
  *
  * What is real here: Exp-Golomb bit IO, RBSP emulation-prevention
  * escaping/unescaping (§7.3.1 / §7.4.1), SPS and PPS syntax parsing
  * (§7.3.2.1-2, including the high-profile chroma branch), IDR slice
  * headers (§7.3.3), and the macroblock layer for `I_PCM` macroblocks
  * (§7.3.5: `mb_type` = 25 in I slices → `pcm_alignment_zero_bit`s to a
  * byte boundary, then 256 raw luma + 2×64 raw 4:2:0 chroma samples).
  * A stream this module emits is spec-conformant baseline H.264 — any
  * compliant decoder reproduces the same pixels — and the decode side
  * parses those bits back rather than assuming them.
  *
  * Also real (rounds 18-19): the CAVLC entropy layer (§9.2 — the FULL
  * coeff_token context family: all three Table 9-5 VLC columns
  * (nC < 2, nC ∈ [2,4), nC ∈ [4,8)), the chroma-DC table, the exact
  * nC ≥ 8 FLC, trailing-one signs, level_prefix/suffix decoding
  * with suffix-length adaptation and both escape forms, total_zeros,
  * run_before) and the Intra_16x16
  * macroblock class: mb_type 1–24 partitioned into prediction mode /
  * CodedBlockPatternLuma / CodedBlockPatternChroma per §7.4.5, all four
  * §8.3.3 luma 16x16 prediction modes (V/H/DC/Plane), §8.3.4 chroma
  * DC/H/V/Plane prediction, the §8.5.10 luma-DC Hadamard + dequant, the
  * §8.5.11 chroma-DC 2x2 transform, §8.5.12 AC dequant + inverse core
  * transform, per-MB QP tracking (mb_qp_delta) and the §Table 8-15
  * chroma-QP mapping, with CAVLC nC neighbor-context tracking across
  * the slice (I_PCM neighbors count 16 per spec).
  *
  * Also real (round 19): I_4x4 macroblocks — §8.3.1.1 prediction-mode
  * derivation (prev/rem syntax, DC substitution for non-I_4x4
  * neighbors), all nine §8.3.1.2 prediction modes with the top-right
  * sample substitution rule, the Table 9-4 intra coded_block_pattern
  * me(v) mapping, per-block CAVLC residuals across the full nC
  * context family, and sequential §6.4.3 reconstruction.
  *
  * Also real (round 20): CABAC entropy for the I-slice subset — the
  * §9.3.3/§9.3.4 arithmetic engines, context init and selection,
  * binarizations and residual coding live in [[Cabac]];
  * [[decodeIdrIntra]] dispatches slices under a CABAC PPS there and
  * the reconstruction halves of this file (reconstructI16Luma,
  * reconI4x4Block, reconstructChroma) are shared by both entropy
  * paths.
  *
  * What is NOT here, deliberately: I_8x8 (transform_size_8x8_flag),
  * I_PCM inside a CABAC slice (the §9.3.1.2 engine re-init), and all
  * inter-frame machinery. A slice containing any such macroblock
  * returns None — classified honestly as undecodable-here, never
  * guessed. The seam narrowed from "predicted macroblocks" (r17) via
  * "sub-16x16 partitions" (r18) and "CABAC" (r19) to "I_8x8/inter"
  * (reference seam note: `requirements.txt:1-12` ships no codec
  * either; the reference never decodes video at all).
  */
object H264 {

  /** MSB-first bit writer with Exp-Golomb codes (§9.1). */
  final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
    }
    def u(v: Long, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
      this
    }
    def ue(v: Int): this.type = {
      require(v >= 0)
      val cp = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(cp)
      u(0L, len - 1); u(cp.toLong, len)
    }
    def se(v: Int): this.type = ue(if (v <= 0) -2 * v else 2 * v - 1)
    /** pcm_alignment_zero_bit / rbsp_alignment_zero_bit run. */
    def alignZero(): this.type = { while (nbits != 0) bit(0); this }
    /** cabac_alignment_one_bit run (§7.3.4: slice data under CABAC
      * starts byte-aligned, padded with ONE bits). */
    def alignOne(): this.type = { while (nbits != 0) bit(1); this }
    /** rbsp_trailing_bits: stop bit then zero-align (§7.3.2.11). */
    def trailing(): this.type = { bit(1); alignZero() }
    def putBytes(bs: Array[Byte]): this.type = {
      require(nbits == 0, "byte write while unaligned")
      bs.foreach(buf += _); this
    }
    def result(): Array[Byte] = {
      require(nbits == 0, "result while unaligned"); buf.toArray
    }
  }

  /** MSB-first bit reader over an (already unescaped) RBSP. */
  final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    private var bitPos = 0
    def bit(): Int = {
      val b = (bytes(pos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      b
    }
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (bit() == 0) { zeros += 1; require(zeros < 32, "ue overrun") }
      ((1 << zeros) | u(zeros)) - 1
    }
    def se(): Int = { val k = ue(); if (k % 2 == 0) -(k / 2) else (k + 1) / 2 }
    def byteAlign(): Unit = if (bitPos != 0) { bitPos = 0; pos += 1 }
    def readByte(): Int = {
      require(bitPos == 0, "byte read while unaligned")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def remainingBytes: Int = bytes.length - pos - (if (bitPos > 0) 1 else 0)
  }

  /** RBSP → NAL byte-string: insert emulation_prevention_three_byte
    * before any 00/01/02/03 that follows two zero bytes (§7.4.1.1). */
  def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xff) <= 3) { out += 3.toByte; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  /** NAL payload → RBSP: drop each 03 that follows two zero bytes. */
  def unescapeRbsp(nal: Array[Byte], from: Int): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    var i = from
    while (i < nal.length) {
      val b = nal(i)
      if (zeros >= 2 && b == 3) zeros = 0 // emulation prevention byte
      else {
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toArray
  }

  final case class Sps(widthMbs: Int, heightMbs: Int,
                       log2MaxFrameNum: Int, pocType: Int,
                       log2MaxPocLsb: Int, frameMbsOnly: Boolean,
                       chromaFormatIdc: Int,
                       deltaPocAlwaysZero: Boolean)

  final case class Pps(cavlc: Boolean, bottomFieldPocPresent: Boolean,
                       deblockingControlPresent: Boolean,
                       redundantPicCntPresent: Boolean,
                       picInitQp: Int = 26, chromaQpOffset: Int = 0)

  /** One decoded frame: 4:2:0 planes in PCM sample order. */
  final case class Frame(width: Int, height: Int,
                         y: Array[Byte], cb: Array[Byte], cr: Array[Byte])

  // ---------------------------------------------------------------- encode

  /** Baseline SPS for a frame_mbs_only 4:2:0 stream (§7.3.2.1.1). */
  def encodeSps(widthMbs: Int, heightMbs: Int): Array[Byte] = {
    val w = new BitWriter
    w.u(0x67L, 8) // nal header: forbidden 0 | ref_idc 3 | type 7
    // payload is RBSP — escape separately below
    val p = new BitWriter
    p.u(66L, 8) // profile_idc: baseline (no chroma_format syntax)
    p.u(0L, 8) // constraint_set flags + reserved_zero_2bits
    p.u(10L, 8) // level_idc 1.0
    p.ue(0) // seq_parameter_set_id
    p.ue(0) // log2_max_frame_num_minus4 → MaxFrameNum 16 (4 bits)
    p.ue(2) // pic_order_cnt_type 2: POC from frame_num, no extra syntax
    p.ue(1) // max_num_ref_frames
    p.u(0L, 1) // gaps_in_frame_num_value_allowed_flag
    p.ue(widthMbs - 1) // pic_width_in_mbs_minus1
    p.ue(heightMbs - 1) // pic_height_in_map_units_minus1
    p.u(1L, 1) // frame_mbs_only_flag
    p.u(0L, 1) // direct_8x8_inference_flag
    p.u(0L, 1) // frame_cropping_flag
    p.u(0L, 1) // vui_parameters_present_flag
    p.trailing()
    w.putBytes(escapeRbsp(p.result())).result()
  }

  /** CAVLC PPS, one slice group, no optional controls (§7.3.2.2). */
  def encodePps(): Array[Byte] = {
    val w = new BitWriter
    w.u(0x68L, 8) // nal header: ref_idc 3 | type 8
    val p = new BitWriter
    p.ue(0) // pic_parameter_set_id
    p.ue(0) // seq_parameter_set_id
    p.u(0L, 1) // entropy_coding_mode_flag: CAVLC
    p.u(0L, 1) // bottom_field_pic_order_in_frame_present_flag
    p.ue(0) // num_slice_groups_minus1
    p.ue(0) // num_ref_idx_l0_default_active_minus1
    p.ue(0) // num_ref_idx_l1_default_active_minus1
    p.u(0L, 1) // weighted_pred_flag
    p.u(0L, 2) // weighted_bipred_idc
    p.se(0) // pic_init_qp_minus26
    p.se(0) // pic_init_qs_minus26
    p.se(0) // chroma_qp_index_offset
    p.u(0L, 1) // deblocking_filter_control_present_flag
    p.u(0L, 1) // constrained_intra_pred_flag
    p.u(0L, 1) // redundant_pic_cnt_present_flag
    p.trailing()
    w.putBytes(escapeRbsp(p.result())).result()
  }

  /** The §7.3.3 IDR I-slice header every encoder here shares: first_mb
    * 0, slice_type 7 (I), pps 0, frame_num 0 (4 bits), idr_pic_id,
    * pic_order_cnt_type 2 → no POC syntax, IDR dec_ref_pic_marking
    * (no_output_of_prior_pics / long_term_reference both 0), and
    * slice_qp_delta 0 → QPy = pic_init_qp = 26. deblocking control is
    * absent (flag 0 in the PPS). */
  private[multimodal] def writeISliceHeader(p: BitWriter, idrPicId: Int): Unit = {
    p.ue(0) // first_mb_in_slice
    p.ue(7) // slice_type: I (all slices of the picture)
    p.ue(0) // pic_parameter_set_id
    p.u(0L, 4) // frame_num (log2_max_frame_num = 4)
    p.ue(idrPicId) // idr_pic_id
    p.u(0L, 1) // no_output_of_prior_pics_flag (dec_ref_pic_marking, IDR)
    p.u(0L, 1) // long_term_reference_flag
    p.se(0) // slice_qp_delta
    ()
  }

  /** IDR slice whose macroblocks are ALL I_PCM: slice header (§7.3.3)
    * + per-MB `mb_type`=25, alignment bits, raw 256+64+64 samples.
    * Planes are full-frame raster 4:2:0; the encoder interleaves them
    * into per-MB order exactly as §7.3.5 reads them back. */
  def encodeIdrIPcm(widthMbs: Int, heightMbs: Int, idrPicId: Int,
                    y: Array[Byte], cb: Array[Byte], cr: Array[Byte]): Array[Byte] = {
    val w16 = widthMbs * 16
    require(y.length == w16 * heightMbs * 16, "luma plane size")
    require(cb.length == y.length / 4 && cr.length == y.length / 4,
      "4:2:0 chroma plane size")
    val w = new BitWriter
    w.u(0x65L, 8) // nal header: ref_idc 3 | type 5 (IDR slice)
    val p = new BitWriter
    writeISliceHeader(p, idrPicId)
    var mb = 0
    val nMbs = widthMbs * heightMbs
    while (mb < nMbs) {
      val mbX = mb % widthMbs
      val mbY = mb / widthMbs
      p.ue(25) // mb_type: I_PCM in an I slice (§Table 7-11)
      p.alignZero() // pcm_alignment_zero_bit*
      var r = 0
      while (r < 16) { // pcm_sample_luma: MB raster rows from the plane
        var c = 0
        while (c < 16) {
          p.u((y((mbY * 16 + r) * w16 + mbX * 16 + c) & 0xff).toLong, 8)
          c += 1
        }
        r += 1
      }
      var pl = 0
      while (pl < 2) { // pcm_sample_chroma: Cb then Cr, 8×8 each
        val plane = if (pl == 0) cb else cr
        var r2 = 0
        while (r2 < 8) {
          var c2 = 0
          while (c2 < 8) {
            p.u((plane((mbY * 8 + r2) * (w16 / 2) + mbX * 8 + c2) & 0xff).toLong, 8)
            c2 += 1
          }
          r2 += 1
        }
        pl += 1
      }
      mb += 1
    }
    p.trailing()
    w.putBytes(escapeRbsp(p.result())).result()
  }

  /** PPS variant flagging CABAC entropy — pairs with
    * [[Cabac.encodeIdrI4x4]]/[[Cabac.encodeIdrI16Ac]] slices;
    * [[decodeIdrIntra]] dispatches slices under it to the §9.3 layer. */
  def encodePpsCabac(): Array[Byte] = {
    val w = new BitWriter
    w.u(0x68L, 8)
    val p = new BitWriter
    p.ue(0); p.ue(0)
    p.u(1L, 1) // entropy_coding_mode_flag: CABAC
    p.u(0L, 1)
    p.ue(0); p.ue(0); p.ue(0)
    p.u(0L, 1); p.u(0L, 2)
    p.se(0); p.se(0); p.se(0)
    p.u(0L, 1); p.u(0L, 1); p.u(0L, 1)
    p.trailing()
    w.putBytes(escapeRbsp(p.result())).result()
  }

  /** IDR slice of Intra_16x16 macroblocks, DC luma + DC chroma
    * prediction, DC-only luma residual (cbp 0): per MB, `dcLevels`
    * supplies the 16 Intra16x16DCLevel coefficients in ZIGZAG scan
    * order (CAVLC-encoded for real — coeff_token, T1 signs, levels,
    * total_zeros, run_before). mb_type 3 = Intra_16x16 pred 2 (DC),
    * CodedBlockPatternLuma 0, CodedBlockPatternChroma 0 (§7.4.5). */
  def encodeIdrI16Dc(widthMbs: Int, heightMbs: Int, idrPicId: Int,
                     dcLevels: (Int, Int) => Array[Int]): Array[Byte] = {
    val w = new BitWriter
    w.u(0x65L, 8) // nal header: ref_idc 3 | type 5 (IDR slice)
    val p = new BitWriter
    writeISliceHeader(p, idrPicId)
    // CAVLC nC context for the DC blocks: only AC counts are stored
    // (§9.2.1) and cbp_luma is 0 here, so every stored count is 0 and
    // every DC block's nC is 0 — no tracking needed.
    var mb = 0
    while (mb < widthMbs * heightMbs) {
      val levels = dcLevels(mb % widthMbs, mb / widthMbs)
      require(levels.length == 16, "16 zigzag DC levels per MB")
      p.ue(3) // mb_type: Intra_16x16, pred DC, cbp_luma 0, cbp_chroma 0
      p.ue(0) // intra_chroma_pred_mode: DC
      p.se(0) // mb_qp_delta
      writeCavlcBlock(p, levels, 0) // Intra16x16DCLevel, nC = 0
      mb += 1
    }
    p.trailing()
    w.putBytes(escapeRbsp(p.result())).result()
  }

  /** IDR slice of Intra_16x16 macroblocks with FULL luma residual
    * (CodedBlockPatternLuma 15): DC luma prediction, DC chroma, per MB
    * `dcLevels` gives the 16 zigzag Intra16x16DCLevel coefficients and
    * `acLevels(mbX, mbY, blkIdx)` the 15 zigzag AC coefficients of
    * each 4x4 block. mb_type = 15 (pred DC, cbp_luma 15, cbp_chroma 0
    * per §7.4.5). The encoder tracks the CAVLC nC neighbor context
    * exactly as the decoder does — with dense AC blocks the contexts
    * walk through every Table 9-5 column (nC 0, [2,4), [4,8), ≥ 8). */
  def encodeIdrI16Ac(widthMbs: Int, heightMbs: Int, idrPicId: Int,
                     dcLevels: (Int, Int) => Array[Int],
                     acLevels: (Int, Int, Int) => Array[Int]): Array[Byte] = {
    val w = new BitWriter
    w.u(0x65L, 8)
    val p = new BitWriter
    writeISliceHeader(p, idrPicId)
    val lumaNnz = Array.ofDim[Int](heightMbs * 4, widthMbs * 4)
    var mb = 0
    while (mb < widthMbs * heightMbs) {
      val mbX = mb % widthMbs; val mbY = mb / widthMbs
      val dc = dcLevels(mbX, mbY)
      require(dc.length == 16, "16 zigzag DC levels per MB")
      p.ue(15) // mb_type: Intra_16x16, pred DC, cbp_luma 15, cbp_chroma 0
      p.ue(0) // intra_chroma_pred_mode: DC
      p.se(0) // mb_qp_delta
      writeCavlcBlock(p, dc, nCtx(lumaNnz, mbX * 4, mbY * 4))
      var blk = 0
      while (blk < 16) {
        val gx = mbX * 4 + Blk4x(blk); val gy = mbY * 4 + Blk4y(blk)
        val ac = acLevels(mbX, mbY, blk)
        require(ac.length == 15, "15 zigzag AC levels per block")
        lumaNnz(gy)(gx) = writeCavlcBlock(p, ac, nCtx(lumaNnz, gx, gy))
        blk += 1
      }
      mb += 1
    }
    p.trailing()
    w.putBytes(escapeRbsp(p.result())).result()
  }

  /** IDR slice of I_4x4 macroblocks (mb_type 0): per-block prediction
    * `modes(mbX, mbY, blkIdx)` (§8.3.1.2 mode numbers 0-8; the caller
    * must respect neighbor availability — asserted here through the
    * same [[intra4x4Predict]] gate the decoder uses), 16-coefficient
    * zigzag residual per block via `coeffs(mbX, mbY, blkIdx)`,
    * CodedBlockPatternLuma 15 / chroma 0 (codeNum 2 in Table 9-4), DC
    * chroma prediction, QPy 26. Mode bits use the real §8.3.1.1
    * prediction (prev_intra4x4_pred_mode_flag / rem). */
  def encodeIdrI4x4(widthMbs: Int, heightMbs: Int, idrPicId: Int,
                    modes: (Int, Int, Int) => Int,
                    coeffs: (Int, Int, Int) => Array[Int]): Array[Byte] = {
    val w = new BitWriter
    w.u(0x65L, 8)
    val p = new BitWriter
    writeISliceHeader(p, idrPicId)
    val lumaNnz = Array.ofDim[Int](heightMbs * 4, widthMbs * 4)
    val lumaMode = Array.fill(heightMbs * 4, widthMbs * 4)(-1)
    var mb = 0
    while (mb < widthMbs * heightMbs) {
      val mbX = mb % widthMbs; val mbY = mb / widthMbs
      p.ue(0) // mb_type: I_4x4
      var b4 = 0
      while (b4 < 16) {
        val gx = mbX * 4 + Blk4x(b4); val gy = mbY * 4 + Blk4y(b4)
        val mode = modes(mbX, mbY, b4)
        require(mode >= 0 && mode <= 8, s"invalid intra4x4 mode $mode")
        // availability gate mirrors the decoder: a mode the neighbors
        // cannot support would decode to None
        require(intra4x4Predict(mode, new Array[Int](8), new Array[Int](4),
          0, gy > 0, gx > 0) != null,
          s"mode $mode unavailable at block ($gx,$gy)")
        val predicted = predIntra4x4Mode(lumaMode, gx, gy)
        if (mode == predicted) p.bit(1)
        else {
          p.bit(0)
          p.u((if (mode < predicted) mode else mode - 1).toLong, 3)
        }
        lumaMode(gy)(gx) = mode
        b4 += 1
      }
      p.ue(0) // intra_chroma_pred_mode: DC
      p.ue(CbpIntraInv(15)) // coded_block_pattern 15 (luma 15, chroma 0)
      p.se(0) // mb_qp_delta (cbp > 0 → present)
      b4 = 0
      while (b4 < 16) {
        val gx = mbX * 4 + Blk4x(b4); val gy = mbY * 4 + Blk4y(b4)
        val sc = coeffs(mbX, mbY, b4)
        require(sc.length == 16, "16 zigzag coefficients per 4x4 block")
        lumaNnz(gy)(gx) = writeCavlcBlock(p, sc, nCtx(lumaNnz, gx, gy))
        b4 += 1
      }
      mb += 1
    }
    p.trailing()
    w.putBytes(escapeRbsp(p.result())).result()
  }

  /** IDR slice whose first macroblock CLAIMS I_4x4 but carries an
    * opaque non-spec body — historically the I_4x4 seam probe (r18);
    * since r19 the real I_4x4 parser runs out of bits inside it →
    * None, which is exactly what H264Spec's truncation-honesty test
    * pins. No fixture class uses it anymore (the CABAC sample has
    * been a real §9.3 slice since r20). */
  def encodeIdrI4x4Stub(idrPicId: Int): Array[Byte] = {
    val w = new BitWriter
    w.u(0x65L, 8)
    val p = new BitWriter
    writeISliceHeader(p, idrPicId)
    p.ue(0) // mb_type: I_4x4 — decoder classifies and returns None here
    p.u(0x5555L, 16) // opaque filler standing in for the unparsed body
    p.trailing()
    w.putBytes(escapeRbsp(p.result())).result()
  }

  // ------------------------------------------------------------ CAVLC §9.2

  /** Table 9-5 coeff_token VLC for nC ∈ [0,2), (len, bits) indexed
    * [TotalCoeff*4 + T1s], plus the nC ∈ [2,4) and nC ∈ [4,8) columns
    * below, the 4:2:0 chroma-DC table (nC == -1), and the exact nC ≥ 8
    * 6-bit FLC handled in code — the full §9.2.1 context family.
    * H264Spec asserts prefix-freeness and the spec's exact Kraft
    * deficit on every column (each coeff_token column is complete
    * except ONE unused near-max-length slot: 1/32768, 1/8192, 1/1024
    * respectively) — the structural gates that caught two
    * transcription slips in review. len 0 marks invalid
    * (T1s > TotalCoeff). */
  private val coeffTokenLen: Array[Int] = Array(
    1, 0, 0, 0,
    6, 2, 0, 0, 8, 6, 3, 0, 9, 8, 7, 5, 10, 9, 8, 6,
    11, 10, 9, 7, 13, 11, 10, 8, 13, 13, 11, 9, 13, 13, 13, 10,
    14, 14, 13, 11, 14, 14, 14, 13, 15, 15, 14, 14, 15, 15, 15, 14,
    16, 15, 15, 15, 16, 16, 16, 15, 16, 16, 16, 16, 16, 16, 16, 16)
  private val coeffTokenBits: Array[Int] = Array(
    1, 0, 0, 0,
    5, 1, 0, 0, 7, 4, 1, 0, 7, 6, 5, 3, 7, 6, 5, 3,
    7, 6, 5, 4, 15, 6, 5, 4, 11, 14, 5, 4, 8, 10, 13, 4,
    15, 14, 9, 4, 11, 10, 13, 12, 15, 14, 9, 12, 11, 10, 13, 8,
    15, 1, 9, 12, 11, 14, 13, 8, 7, 10, 9, 12, 4, 6, 5, 8)
  // Table 9-5 column 2 ≤ nC < 4 (same [TotalCoeff*4 + T1s] indexing)
  private val coeffTokenLenNc2: Array[Int] = Array(
    2, 0, 0, 0,
    6, 2, 0, 0, 6, 5, 3, 0, 7, 6, 6, 4, 8, 6, 6, 4,
    8, 7, 7, 5, 9, 8, 8, 6, 11, 9, 9, 6, 11, 11, 11, 7,
    12, 11, 11, 9, 12, 12, 12, 11, 12, 12, 12, 11, 13, 13, 13, 12,
    13, 13, 13, 13, 13, 14, 13, 13, 14, 14, 14, 13, 14, 14, 14, 14)
  private val coeffTokenBitsNc2: Array[Int] = Array(
    3, 0, 0, 0,
    11, 2, 0, 0, 7, 7, 3, 0, 7, 10, 9, 5, 7, 6, 5, 4,
    4, 6, 5, 6, 7, 6, 5, 8, 15, 6, 5, 4, 11, 14, 13, 4,
    15, 10, 9, 4, 11, 14, 13, 12, 8, 10, 9, 8, 15, 14, 13, 12,
    11, 10, 9, 12, 7, 11, 6, 8, 9, 8, 10, 1, 7, 6, 5, 4)
  // Table 9-5 column 4 ≤ nC < 8
  private val coeffTokenLenNc4: Array[Int] = Array(
    4, 0, 0, 0,
    6, 4, 0, 0, 6, 5, 4, 0, 6, 5, 5, 4, 7, 5, 5, 4,
    7, 5, 5, 4, 7, 6, 6, 4, 7, 6, 6, 4, 8, 7, 7, 5,
    8, 8, 7, 6, 9, 8, 8, 7, 9, 9, 8, 8, 9, 9, 9, 8,
    10, 9, 9, 9, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10)
  private val coeffTokenBitsNc4: Array[Int] = Array(
    15, 0, 0, 0,
    15, 14, 0, 0, 11, 15, 13, 0, 8, 12, 14, 12, 15, 10, 11, 11,
    11, 8, 9, 10, 9, 14, 13, 9, 8, 10, 9, 8, 15, 14, 13, 13,
    11, 14, 10, 12, 15, 10, 13, 12, 11, 14, 9, 12, 8, 10, 13, 8,
    13, 7, 9, 12, 9, 12, 11, 10, 5, 8, 7, 6, 1, 4, 3, 2)
  // chroma DC (nC == -1, 4:2:0): TotalCoeff 0..4
  private val chromaDcTokenLen = Array(
    2, 0, 0, 0, 6, 1, 0, 0, 6, 6, 3, 0, 6, 7, 7, 6, 6, 8, 8, 7)
  private val chromaDcTokenBits = Array(
    1, 0, 0, 0, 7, 1, 0, 0, 4, 6, 1, 0, 3, 3, 2, 5, 2, 3, 2, 0)

  /** Table 9-7/9-8 total_zeros VLCs, indexed [TotalCoeff-1][totalZeros]. */
  private val totalZerosLen: Array[Array[Int]] = Array(
    Array(1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9),
    Array(3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6),
    Array(4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6), // tc3
    Array(5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5),
    Array(4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5),
    Array(6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6),
    Array(6, 5, 3, 3, 3, 2, 3, 4, 3, 6),
    Array(6, 4, 5, 3, 2, 2, 3, 3, 6),
    Array(6, 6, 4, 2, 2, 3, 2, 5),
    Array(5, 5, 3, 2, 2, 2, 4),
    Array(4, 4, 3, 3, 1, 3),
    Array(4, 4, 2, 1, 3),
    Array(3, 3, 1, 2),
    Array(2, 2, 1),
    Array(1, 1))
  private val totalZerosBits: Array[Array[Int]] = Array(
    Array(1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1),
    Array(7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0),
    Array(5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0), // tc3
    Array(3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0),
    Array(5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0),
    Array(1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0),
    Array(1, 1, 5, 4, 3, 3, 2, 1, 1, 0),
    Array(1, 1, 1, 3, 3, 2, 2, 1, 0),
    Array(1, 0, 1, 3, 2, 1, 1, 1),
    Array(1, 0, 1, 3, 2, 1, 1),
    Array(0, 1, 1, 2, 1, 3),
    Array(0, 1, 1, 1, 1),
    Array(0, 1, 1, 1),
    Array(0, 1, 1),
    Array(0, 1))
  // Table 9-9(a) chroma-DC total_zeros (4:2:0), [TotalCoeff-1][totalZeros]
  private val chromaDcTzLen: Array[Array[Int]] =
    Array(Array(1, 2, 3, 3), Array(1, 2, 2), Array(1, 1))
  private val chromaDcTzBits: Array[Array[Int]] =
    Array(Array(1, 1, 1, 0), Array(1, 1, 0), Array(1, 0))

  /** Table 9-10 run_before, [min(zerosLeft,7)-1][run]. */
  private val runBeforeLen: Array[Array[Int]] = Array(
    Array(1, 1),
    Array(1, 2, 2),
    Array(2, 2, 2, 2),
    Array(2, 2, 2, 3, 3),
    Array(2, 2, 3, 3, 3, 3),
    Array(2, 3, 3, 3, 3, 3, 3),
    Array(3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11))
  private val runBeforeBits: Array[Array[Int]] = Array(
    Array(1, 0),
    Array(1, 1, 0),
    Array(3, 2, 1, 0),
    Array(3, 2, 1, 1, 0),
    Array(3, 2, 3, 2, 1, 0),
    Array(3, 0, 1, 3, 2, 5, 4),
    Array(7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1))

  /** Structural table access for H264Spec's Kraft/prefix gates. */
  private[multimodal] def vlcTables: Seq[(String, Seq[(Int, Int)])] = {
    def tok(len: Array[Int], bits: Array[Int], maxTc: Int) =
      (0 to maxTc).flatMap(tc => (0 to math.min(3, tc)).map(t1 =>
        (len(tc * 4 + t1), bits(tc * 4 + t1))))
    Seq(
      "coeff_token_nc0" -> tok(coeffTokenLen, coeffTokenBits, 16),
      "coeff_token_nc2" -> tok(coeffTokenLenNc2, coeffTokenBitsNc2, 16),
      "coeff_token_nc4" -> tok(coeffTokenLenNc4, coeffTokenBitsNc4, 16),
      "coeff_token_chroma_dc" -> tok(chromaDcTokenLen, chromaDcTokenBits, 4)) ++
      totalZerosLen.indices.map(i =>
        s"total_zeros_tc${i + 1}" ->
          totalZerosLen(i).indices.map(j => (totalZerosLen(i)(j), totalZerosBits(i)(j)))) ++
      chromaDcTzLen.indices.map(i =>
        s"chroma_dc_tz_tc${i + 1}" ->
          chromaDcTzLen(i).indices.map(j => (chromaDcTzLen(i)(j), chromaDcTzBits(i)(j)))) ++
      runBeforeLen.indices.map(i =>
        s"run_before_zl${i + 1}" ->
          runBeforeLen(i).indices.map(j => (runBeforeLen(i)(j), runBeforeBits(i)(j))))
  }

  /** Longest-prefix VLC read: accumulate bits until (len, acc) matches a
    * table entry. Tables are prefix-free (spec + H264Spec gate), so the
    * first match is THE match; 16 bits bounds every table here. */
  private def readVlc(r: BitReader, entries: Seq[(Int, Int, Int)]): Int = {
    var acc = 0
    var len = 0
    while (len < 17) {
      acc = (acc << 1) | r.bit(); len += 1
      var k = 0
      while (k < entries.length) {
        val (l, b, v) = entries(k)
        if (l == len && b == acc) return v
        k += 1
      }
    }
    throw new IllegalStateException("VLC overrun")
  }

  /** coeff_token → (TotalCoeff, TrailingOnes). nC == -1 selects the
    * chroma-DC table; nC ≥ 8 the 6-bit FLC (§9.2.1); nC ∈ [0,2), [2,4)
    * and [4,8) dispatch to the three transcribed Table 9-5 columns
    * (full family since r19 — Kraft deficits pinned by H264Spec). */
  // VLC entry tables are static — build each (len, bits, value) entry
  // sequence ONCE instead of per readCoeffToken/total_zeros/run_before
  // call (the per-sample decode loop previously allocated and rescanned
  // a fresh ~54-element Seq per block)
  private def tokenEntries(len: Array[Int], bits: Array[Int],
                           maxTc: Int): IndexedSeq[(Int, Int, Int)] =
    (for {
      tc <- 0 to maxTc; t1 <- 0 to math.min(3, tc)
      if len(tc * 4 + t1) > 0
    } yield (len(tc * 4 + t1), bits(tc * 4 + t1), tc * 16 + t1)).toIndexedSeq
  private lazy val chromaDcTokenEntries =
    tokenEntries(chromaDcTokenLen, chromaDcTokenBits, 4)
  private lazy val coeffTokenEntries =
    tokenEntries(coeffTokenLen, coeffTokenBits, 16)
  private lazy val coeffTokenEntriesNc2 =
    tokenEntries(coeffTokenLenNc2, coeffTokenBitsNc2, 16)
  private lazy val coeffTokenEntriesNc4 =
    tokenEntries(coeffTokenLenNc4, coeffTokenBitsNc4, 16)
  private lazy val chromaDcTzEntries =
    Array.tabulate(chromaDcTzLen.length) { t =>
      val row = chromaDcTzLen(t)
      row.indices.map(j => (row(j), chromaDcTzBits(t)(j), j))
    }
  private lazy val totalZerosEntries =
    Array.tabulate(totalZerosLen.length) { t =>
      val row = totalZerosLen(t)
      row.indices.collect {
        case j if row(j) > 0 => (row(j), totalZerosBits(t)(j), j)
      }: IndexedSeq[(Int, Int, Int)]
    }
  private lazy val runBeforeEntries =
    Array.tabulate(runBeforeLen.length) { t =>
      val row = runBeforeLen(t)
      row.indices.map(j => (row(j), runBeforeBits(t)(j), j))
    }

  private def readCoeffToken(r: BitReader, nC: Int): (Int, Int) = {
    if (nC >= 8) {
      val code = r.u(6)
      return if (code == 3) (0, 0) else ((code >> 2) + 1, code & 3)
    }
    require(nC >= -1, s"invalid coeff_token context nC=$nC")
    val entries =
      if (nC == -1) chromaDcTokenEntries
      else if (nC < 2) coeffTokenEntries
      else if (nC < 4) coeffTokenEntriesNc2
      else coeffTokenEntriesNc4
    val v = readVlc(r, entries)
    (v / 16, v % 16)
  }

  /** One residual block via §9.2: returns scan-order coefficients
    * (length maxNumCoeff) and TotalCoeff. nC selects the coeff_token
    * context (-1 for chroma DC). */
  def readCavlcBlock(r: BitReader, nC: Int, maxNumCoeff: Int): (Array[Int], Int) = {
    val coeff = new Array[Int](maxNumCoeff)
    val (total, t1s) = readCoeffToken(r, nC)
    if (total == 0) return (coeff, 0)
    require(total <= maxNumCoeff, "TotalCoeff exceeds block size")
    // level[0] is the HIGHEST-frequency coefficient
    val level = new Array[Int](total)
    var i = 0
    while (i < t1s) { level(i) = 1 - 2 * r.bit(); i += 1 }
    var suffixLength = if (total > 10 && t1s < 3) 1 else 0
    while (i < total) {
      var levelPrefix = 0
      while (r.bit() == 0) {
        levelPrefix += 1; require(levelPrefix < 32, "level_prefix overrun")
      }
      val suffixSize =
        if (levelPrefix >= 15) levelPrefix - 3
        else if (levelPrefix == 14 && suffixLength == 0) 4
        else suffixLength
      val suffix = if (suffixSize > 0) r.u(suffixSize) else 0
      var levelCode = (math.min(15, levelPrefix) << suffixLength) + suffix
      if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
      if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
      if (i == t1s && t1s < 3) levelCode += 2
      level(i) =
        if (levelCode % 2 == 0) (levelCode + 2) >> 1 else (-levelCode - 1) >> 1
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    val totalZeros =
      if (total == maxNumCoeff) 0
      else if (nC == -1) readVlc(r, chromaDcTzEntries(total - 1))
      else readVlc(r, totalZerosEntries(total - 1))
    var zerosLeft = totalZeros
    var pos = totalZeros + total - 1
    i = 0
    while (i < total) {
      require(pos >= 0 && pos < maxNumCoeff, "coefficient position out of range")
      coeff(pos) = level(i)
      val run =
        if (i == total - 1) zerosLeft
        else if (zerosLeft > 0)
          readVlc(r, runBeforeEntries(math.min(zerosLeft, 7) - 1))
        else 0
      zerosLeft -= run
      pos -= 1 + run
      i += 1
    }
    require(zerosLeft == 0, "run_before zeros mismatch")
    (coeff, total)
  }

  private def writeVlc(p: BitWriter, len: Int, bits: Int): Unit = {
    require(len > 0, "invalid VLC entry")
    p.u(bits.toLong, len)
  }

  /** CAVLC-encode one residual block (§9.2 inverse). `coeffScan` is the
    * full scan-order coefficient array; levels are bounded to the
    * non-escape prefix region (|level| small) — the fixture encoder's
    * envelope, asserted loudly. Returns TotalCoeff (the decoder-context
    * value the caller must track). */
  def writeCavlcBlock(p: BitWriter, coeffScan: Array[Int], nC: Int): Int = {
    val maxNumCoeff = coeffScan.length
    val nzPos = coeffScan.indices.filter(coeffScan(_) != 0).reverse // high→low freq
    val total = nzPos.length
    var t1s = 0
    while (t1s < math.min(3, total) &&
      math.abs(coeffScan(nzPos(t1s))) == 1) t1s += 1
    // coeff_token
    if (nC >= 8) {
      val code = if (total == 0) 3 else ((total - 1) << 2) | t1s
      p.u(code.toLong, 6)
    } else if (nC == -1) {
      require(total <= 4, "chroma DC block: TotalCoeff > 4")
      writeVlc(p, chromaDcTokenLen(total * 4 + t1s), chromaDcTokenBits(total * 4 + t1s))
    } else {
      require(nC >= 0, s"invalid coeff_token context nC=$nC")
      val (lenT, bitsT) =
        if (nC < 2) (coeffTokenLen, coeffTokenBits)
        else if (nC < 4) (coeffTokenLenNc2, coeffTokenBitsNc2)
        else (coeffTokenLenNc4, coeffTokenBitsNc4)
      writeVlc(p, lenT(total * 4 + t1s), bitsT(total * 4 + t1s))
    }
    if (total == 0) return 0
    var i = 0
    while (i < t1s) {
      p.bit(if (coeffScan(nzPos(i)) < 0) 1 else 0); i += 1
    }
    var suffixLength = if (total > 10 && t1s < 3) 1 else 0
    while (i < total) {
      val level = coeffScan(nzPos(i))
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (i == t1s && t1s < 3) levelCode -= 2
      if (suffixLength == 0) {
        if (levelCode < 14) { p.u(0L, levelCode); p.bit(1) }
        else if (levelCode < 30) {
          p.u(0L, 14); p.bit(1); p.u((levelCode - 14).toLong, 4)
        } else {
          require(levelCode < 30 + 4096, "level escape out of fixture envelope")
          p.u(0L, 15); p.bit(1); p.u((levelCode - 30).toLong, 12)
        }
      } else {
        if ((levelCode >> suffixLength) < 15) {
          p.u(0L, levelCode >> suffixLength); p.bit(1)
          p.u((levelCode & ((1 << suffixLength) - 1)).toLong, suffixLength)
        } else {
          val esc = levelCode - (15 << suffixLength)
          require(esc < 4096, "level escape out of fixture envelope")
          p.u(0L, 15); p.bit(1); p.u(esc.toLong, 12)
        }
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    val totalZeros = nzPos.head + 1 - total // zeros below the top coefficient
    if (total < maxNumCoeff) {
      if (nC == -1)
        writeVlc(p, chromaDcTzLen(total - 1)(totalZeros), chromaDcTzBits(total - 1)(totalZeros))
      else
        writeVlc(p, totalZerosLen(total - 1)(totalZeros), totalZerosBits(total - 1)(totalZeros))
    }
    var zerosLeft = totalZeros
    i = 0
    while (i < total - 1 && zerosLeft > 0) {
      val run = nzPos(i) - nzPos(i + 1) - 1
      val zl = math.min(zerosLeft, 7) - 1
      writeVlc(p, runBeforeLen(zl)(run), runBeforeBits(zl)(run))
      zerosLeft -= run
      i += 1
    }
    total
  }

  // ------------------------------------------------- transforms & scaling

  /** 4x4 zigzag: scan position → raster index (§8.5.6 frame scan). */
  val Zigzag4x4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** normAdjust4x4 class-0 values {(0,0),(0,2),(2,0),(2,2)} per QP%6. */
  private val V0 = Array(10, 11, 13, 14, 16, 18)
  private val V1 = Array(16, 18, 20, 23, 25, 29) // class 1: odd/odd
  private val V2 = Array(13, 14, 16, 18, 20, 23) // class 2: the rest

  private def levelScale(qpMod6: Int, i: Int, j: Int): Int = {
    // flat weightScale 16 × normAdjust (Table 8-13 via §8.5.9)
    val v =
      if (i % 2 == 0 && j % 2 == 0) V0(qpMod6)
      else if (i % 2 == 1 && j % 2 == 1) V1(qpMod6)
      else V2(qpMod6)
    16 * v
  }

  /** §8.5.12.1 AC/plain 4x4 dequant (flat scaling list). */
  private def dequant4x4(c: Array[Int], qp: Int): Array[Int] = {
    val d = new Array[Int](16)
    var k = 0
    while (k < 16) {
      val i = k / 4; val j = k % 4
      val ls = levelScale(qp % 6, i, j)
      d(k) =
        if (qp >= 24) (c(k) * ls) << (qp / 6 - 4)
        else (c(k) * ls + (1 << (3 - qp / 6))) >> (4 - qp / 6)
      k += 1
    }
    d
  }

  /** §8.5.12.2 inverse core transform; input raster d(16), output the
    * residual BEFORE the final rounding shift (caller adds 32 >> 6). */
  private def inverseTransform4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) { // horizontal
      val d0 = d(i * 4); val d1 = d(i * 4 + 1); val d2 = d(i * 4 + 2); val d3 = d(i * 4 + 3)
      val a0 = d0 + d2; val a1 = d0 - d2
      val a2 = (d1 >> 1) - d3; val a3 = d1 + (d3 >> 1)
      e(i * 4) = a0 + a3; e(i * 4 + 1) = a1 + a2
      e(i * 4 + 2) = a1 - a2; e(i * 4 + 3) = a0 - a3
      i += 1
    }
    val g = new Array[Int](16)
    var j = 0
    while (j < 4) { // vertical
      val d0 = e(j); val d1 = e(4 + j); val d2 = e(8 + j); val d3 = e(12 + j)
      val a0 = d0 + d2; val a1 = d0 - d2
      val a2 = (d1 >> 1) - d3; val a3 = d1 + (d3 >> 1)
      g(j) = a0 + a3; g(4 + j) = a1 + a2
      g(8 + j) = a1 - a2; g(12 + j) = a0 - a3
      j += 1
    }
    g
  }

  /** §8.5.10 luma DC: 4x4 Hadamard of the DC coefficients, then the
    * DC-specific dequant branch. Input/output raster 4x4. */
  private def lumaDcDequant(c: Array[Int], qp: Int): Array[Int] = {
    val f = hadamard4x4(c)
    val ls = levelScale(qp % 6, 0, 0)
    val out = new Array[Int](16)
    var k = 0
    while (k < 16) {
      out(k) =
        if (qp >= 36) (f(k) * ls) << (qp / 6 - 6)
        else (f(k) * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      k += 1
    }
    out
  }

  private def hadamard4x4(c: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val c0 = c(i * 4); val c1 = c(i * 4 + 1); val c2 = c(i * 4 + 2); val c3 = c(i * 4 + 3)
      val s0 = c0 + c2; val s1 = c0 - c2; val s2 = c1 - c3; val s3 = c1 + c3
      t(i * 4) = s0 + s3; t(i * 4 + 1) = s1 + s2
      t(i * 4 + 2) = s1 - s2; t(i * 4 + 3) = s0 - s3
      i += 1
    }
    val f = new Array[Int](16)
    var j = 0
    while (j < 4) { // columns
      val c0 = t(j); val c1 = t(4 + j); val c2 = t(8 + j); val c3 = t(12 + j)
      val s0 = c0 + c2; val s1 = c0 - c2; val s2 = c1 - c3; val s3 = c1 + c3
      f(j) = s0 + s3; f(4 + j) = s1 + s2
      f(8 + j) = s1 - s2; f(12 + j) = s0 - s3
      j += 1
    }
    f
  }

  /** §8.5.11 chroma DC (4:2:0): 2x2 Hadamard + dequant. */
  private def chromaDcDequant(c: Array[Int], qp: Int): Array[Int] = {
    val f = Array(
      c(0) + c(1) + c(2) + c(3), c(0) - c(1) + c(2) - c(3),
      c(0) + c(1) - c(2) - c(3), c(0) - c(1) - c(2) + c(3))
    val ls = levelScale(qp % 6, 0, 0)
    f.map(v => ((v * ls) << (qp / 6)) >> 5)
  }

  /** Table 8-15 chroma QP from luma QP (+ offset already applied). */
  private val QpcTable = Array(
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38, 38,
    39, 39, 39, 39)
  private[multimodal] def chromaQp(qpi: Int): Int = {
    val q = math.max(0, math.min(51, qpi))
    if (q < 30) q else QpcTable(q - 30)
  }

  private def clip255(v: Int): Byte = math.max(0, math.min(255, v)).toByte

  // luma4x4BlkIdx → 4x4-block (x, y) within the MB (§6.4.3 ordering).
  // private[multimodal]: the fixture plants (FakeCodec) and the spec's
  // fixture helpers must use the SAME ordering constant as the codec —
  // only the x121 DuckDB oracle keeps an independent copy, as the pin.
  private[multimodal] val Blk4x =
    Array(0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3)
  private[multimodal] val Blk4y =
    Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)
  // inverse: (by * 4 + bx) → luma4x4BlkIdx (decode order of that block)
  private val BlkIdxOf: Array[Int] = {
    val m = new Array[Int](16)
    var i = 0
    while (i < 16) { m(Blk4y(i) * 4 + Blk4x(i)) = i; i += 1 }
    m
  }

  /** Table 9-4 coded_block_pattern me(v) mapping for ChromaArrayType
    * 1/2, Intra_4x4 column: codeNum → cbp (luma low 4 bits, chroma
    * high 2). Inverse built for the encoder. */
  private val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private val CbpIntraInv: Array[Int] = {
    val m = Array.fill(48)(-1)
    CbpIntra.indices.foreach(i => m(CbpIntra(i)) = i)
    m
  }
  /** Structural access for H264Spec: the mapping must be a bijection
    * 0..47 → 0..47 with the published head (0→47, 1→31, 2→15, 3→0). */
  private[multimodal] def cbpIntraTable: Array[Int] = CbpIntra.clone()

  /** §8.3.1.2 Intra_4x4 sample prediction, all nine modes. `top` holds
    * p[0..7,-1] (the caller substitutes p[3,-1] for x ≥ 4 when the
    * top-right is unavailable, per the §8.3.1.2 substitution rule),
    * `left` p[-1,0..3], `corner` p[-1,-1]. Returns null when the
    * mode's required neighbors are unavailable (an invalid stream —
    * the decoder maps it to None). Output raster pred(y*4+x). */
  // availability requirement bitmasks by mode (hot path: one predict
  // call per 4x4 block — no per-call allocation)
  private final val NeedTopMask = (1 << 0) | (1 << 3) | (1 << 7)
  private final val NeedLeftMask = (1 << 1) | (1 << 8)
  private final val NeedBothMask = (1 << 4) | (1 << 5) | (1 << 6)

  private[multimodal] def intra4x4Predict(
      mode: Int, top: Array[Int], left: Array[Int], corner: Int,
      topOk: Boolean, leftOk: Boolean): Array[Int] = {
    if (mode < 0 || mode > 8) return null
    if ((NeedTopMask >> mode & 1) == 1 && !topOk) return null
    if ((NeedLeftMask >> mode & 1) == 1 && !leftOk) return null
    if ((NeedBothMask >> mode & 1) == 1 && !(topOk && leftOk)) return null
    // t/l with index -1 = the corner sample (used by modes 4/5/6)
    def t(i: Int): Int = if (i < 0) corner else top(i)
    def l(i: Int): Int = if (i < 0) corner else left(i)
    val p = new Array[Int](16)
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        p(y * 4 + x) = mode match {
          case 0 => top(x) // Vertical
          case 1 => left(y) // Horizontal
          case 2 => // DC (§8.3.1.2.3)
            if (topOk && leftOk)
              (top(0) + top(1) + top(2) + top(3) +
                left(0) + left(1) + left(2) + left(3) + 4) >> 3
            else if (topOk) (top(0) + top(1) + top(2) + top(3) + 2) >> 2
            else if (leftOk) (left(0) + left(1) + left(2) + left(3) + 2) >> 2
            else 128
          case 3 => // Diagonal-Down-Left (§8.3.1.2.4)
            if (x == 3 && y == 3) (top(6) + 3 * top(7) + 2) >> 2
            else (top(x + y) + 2 * top(x + y + 1) + top(x + y + 2) + 2) >> 2
          case 4 => // Diagonal-Down-Right (§8.3.1.2.5)
            if (x > y) (t(x - y - 2) + 2 * t(x - y - 1) + t(x - y) + 2) >> 2
            else if (x < y) (l(y - x - 2) + 2 * l(y - x - 1) + l(y - x) + 2) >> 2
            else (top(0) + 2 * corner + left(0) + 2) >> 2
          case 5 => // Vertical-Right (§8.3.1.2.6)
            val zVR = 2 * x - y
            if (zVR >= 0 && zVR % 2 == 0)
              (t(x - (y >> 1) - 1) + t(x - (y >> 1)) + 1) >> 1
            else if (zVR >= 0)
              (t(x - (y >> 1) - 2) + 2 * t(x - (y >> 1) - 1) + t(x - (y >> 1)) + 2) >> 2
            else if (zVR == -1) (left(0) + 2 * corner + top(0) + 2) >> 2
            else (l(y - 1) + 2 * l(y - 2) + l(y - 3) + 2) >> 2
          case 6 => // Horizontal-Down (§8.3.1.2.7)
            val zHD = 2 * y - x
            if (zHD >= 0 && zHD % 2 == 0)
              (l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 1) >> 1
            else if (zHD >= 0)
              (l(y - (x >> 1) - 2) + 2 * l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 2) >> 2
            else if (zHD == -1) (left(0) + 2 * corner + top(0) + 2) >> 2
            else (t(x - 1) + 2 * t(x - 2) + t(x - 3) + 2) >> 2
          case 7 => // Vertical-Left (§8.3.1.2.8)
            if (y % 2 == 0) (top(x + (y >> 1)) + top(x + (y >> 1) + 1) + 1) >> 1
            else (top(x + (y >> 1)) + 2 * top(x + (y >> 1) + 1) +
              top(x + (y >> 1) + 2) + 2) >> 2
          case 8 => // Horizontal-Up (§8.3.1.2.9)
            val zHU = x + 2 * y
            if (zHU <= 4 && zHU % 2 == 0)
              (left(y + (x >> 1)) + left(y + (x >> 1) + 1) + 1) >> 1
            else if (zHU <= 3)
              (left(y + (x >> 1)) + 2 * left(y + (x >> 1) + 1) +
                left(y + (x >> 1) + 2) + 2) >> 2
            else if (zHU == 5) (left(2) + 3 * left(3) + 2) >> 2
            else left(3)
          case _ => return null
        }
        x += 1
      }
      y += 1
    }
    p
  }

  /** §8.3.1.1 Intra4x4PredMode prediction: min of the neighbor modes,
    * with 2 (DC) substituted when a neighbor is unavailable or its MB
    * is not I_4x4 (grid value -1). */
  private[multimodal] def predIntra4x4Mode(grid: Array[Array[Int]], gx: Int, gy: Int): Int = {
    val a = if (gx > 0 && grid(gy)(gx - 1) >= 0) grid(gy)(gx - 1) else 2
    val b = if (gy > 0 && grid(gy - 1)(gx) >= 0) grid(gy - 1)(gx) else 2
    math.min(a, b)
  }

  /** §7.3.2.1.1, both the baseline path and the high-profile
    * chroma_format branch; None for field-coded streams. */
  def parseSps(nal: Array[Byte]): Option[Sps] = try {
    val r = new BitReader(unescapeRbsp(nal, 1))
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    r.u(8) // level_idc
    r.ue() // sps id
    var chroma = 1 // 4:2:0 default when the syntax is absent
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
        .contains(profile)) {
      chroma = r.ue()
      if (chroma == 3) r.u(1) // separate_colour_plane_flag
      r.ue(); r.ue() // bit_depth_luma/chroma_minus8
      r.u(1) // qpprime_y_zero_transform_bypass_flag
      if (r.u(1) == 1) return None // seq_scaling_matrix unsupported
    }
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    var log2MaxPocLsb = 0
    var deltaPocAlwaysZero = true
    if (pocType == 0) log2MaxPocLsb = r.ue() + 4
    else if (pocType == 1) {
      deltaPocAlwaysZero = r.u(1) == 1 // gates slice delta_pic_order_cnt
      r.se(); r.se()
      val n = r.ue()
      var i = 0
      while (i < n) { r.se(); i += 1 }
    }
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed_flag
    val wMbs = r.ue() + 1
    val hMapUnits = r.ue() + 1
    val frameMbsOnly = r.u(1) == 1
    if (!frameMbsOnly) return None // field/MBAFF coding unsupported
    Some(Sps(wMbs, hMapUnits, log2MaxFrameNum, pocType, log2MaxPocLsb,
      frameMbsOnly, chroma, deltaPocAlwaysZero))
  } catch { case _: Throwable => None }

  /** §7.3.2.2; None unless single-slice-group. */
  def parsePps(nal: Array[Byte]): Option[Pps] = try {
    val r = new BitReader(unescapeRbsp(nal, 1))
    r.ue(); r.ue() // pps id, sps id
    val cavlc = r.u(1) == 0
    val bottomPoc = r.u(1) == 1
    if (r.ue() != 0) return None // slice groups unsupported
    r.ue(); r.ue() // num_ref_idx defaults
    r.u(1); r.u(2) // weighted_pred, weighted_bipred_idc
    val picInitQp = 26 + r.se() // pic_init_qp_minus26
    r.se() // pic_init_qs_minus26
    val chromaQpOffset = r.se()
    val deblock = r.u(1) == 1
    r.u(1) // constrained_intra_pred_flag
    val redundant = r.u(1) == 1
    // CABAC PPSes are accepted since r20: decodeIdrIntra dispatches the
    // slice to the §9.3 entropy layer in [[Cabac]]
    Some(Pps(cavlc, bottomPoc, deblock, redundant, picInitQp, chromaQpOffset))
  } catch { case _: Throwable => None }

  /** §7.3.3 IDR I-slice header; Some(initial QPy) on success (QPy =
    * pic_init_qp + slice_qp_delta — the SliceQPY of §7.4.3). */
  private[multimodal] def parseISliceHeader(r: BitReader, sps: Sps, pps: Pps): Option[Int] = {
    if (r.ue() != 0) return None // first_mb_in_slice: single-slice only
    val sliceType = r.ue()
    if (sliceType != 2 && sliceType != 7) return None // I slices only
    r.ue() // pic_parameter_set_id
    r.u(sps.log2MaxFrameNum) // frame_num
    r.ue() // idr_pic_id
    if (sps.pocType == 0) {
      r.u(sps.log2MaxPocLsb)
      if (pps.bottomFieldPocPresent) r.se()
    } else if (sps.pocType == 1 && !sps.deltaPocAlwaysZero) {
      r.se() // delta_pic_order_cnt[0] (§7.3.3)
      if (pps.bottomFieldPocPresent) r.se() // delta_pic_order_cnt[1]
    }
    if (pps.redundantPicCntPresent) r.ue()
    r.u(1); r.u(1) // dec_ref_pic_marking for IDR
    val qp = pps.picInitQp + r.se() // slice_qp_delta
    if (pps.deblockingControlPresent) {
      val idc = r.ue()
      if (idc != 1) { r.se(); r.se() }
    }
    if (qp < 0 || qp > 51) None else Some(qp)
  }

  /** Decode one IDR slice NAL whose macroblocks are all I_PCM. Real
    * header parse per §7.3.3, then the §7.3.5 PCM path; any non-I_PCM
    * `mb_type` → None ([[decodeIdrIntra]] handles Intra_16x16 too). */
  def decodeIdrIPcm(sps: Sps, pps: Pps, nal: Array[Byte]): Option[Frame] = try {
    if (sps.chromaFormatIdc != 1) return None // PCM path below is 4:2:0
    val r = new BitReader(unescapeRbsp(nal, 1))
    if (parseISliceHeader(r, sps, pps).isEmpty) return None
    val w16 = sps.widthMbs * 16
    val h16 = sps.heightMbs * 16
    val y = new Array[Byte](w16 * h16)
    val cb = new Array[Byte](w16 * h16 / 4)
    val cr = new Array[Byte](w16 * h16 / 4)
    var mb = 0
    val nMbs = sps.widthMbs * sps.heightMbs
    while (mb < nMbs) {
      if (r.ue() != 25) return None // not I_PCM: prediction seam
      r.byteAlign() // pcm_alignment_zero_bit*
      val mbX = mb % sps.widthMbs
      val mbY = mb / sps.widthMbs
      var row = 0
      while (row < 16) {
        var c = 0
        while (c < 16) {
          y((mbY * 16 + row) * w16 + mbX * 16 + c) = r.readByte().toByte
          c += 1
        }
        row += 1
      }
      var pl = 0
      while (pl < 2) {
        val plane = if (pl == 0) cb else cr
        var r2 = 0
        while (r2 < 8) {
          var c2 = 0
          while (c2 < 8) {
            plane((mbY * 8 + r2) * (w16 / 2) + mbX * 8 + c2) = r.readByte().toByte
            c2 += 1
          }
          r2 += 1
        }
        pl += 1
      }
      mb += 1
    }
    Some(Frame(w16, h16, y, cb, cr))
  } catch { case _: Throwable => None }

  /** §9.2.1 nC from stored neighbor TotalCoeff counts: mean of the
    * available left/top (rounded up), else the available one, else 0. */
  private def nCtx(grid: Array[Array[Int]], gx: Int, gy: Int): Int = {
    val a = if (gx > 0) grid(gy)(gx - 1) else -1
    val b = if (gy > 0) grid(gy - 1)(gx) else -1
    if (a >= 0 && b >= 0) (a + b + 1) >> 1
    else if (a >= 0) a else if (b >= 0) b else 0
  }

  /** §7.3.5.3 chroma residual parse (DC both planes, then AC when
    * CodedBlockPatternChroma == 2) + §8.3.4 prediction + §8.5.11-12
    * reconstruction for one macroblock — shared by the Intra_16x16 and
    * I_4x4 branches of [[decodeIdrIntra]]. Must be called at the
    * bitstream position right after the luma residual. Returns false
    * when the prediction mode needs unavailable neighbors. */
  private def decodeChroma(r: BitReader, cbpChroma: Int, chromaPredMode: Int,
                           qpC: Int, mbX: Int, mbY: Int, w16: Int,
                           cb: Array[Byte], cr: Array[Byte],
                           cbNnz: Array[Array[Int]], crNnz: Array[Array[Int]],
                           topOk: Boolean, leftOk: Boolean): Boolean = {
    val chromaDc = Array.ofDim[Int](2, 4)
    val chromaAc = Array.ofDim[Int](2, 4, 15)
    if (cbpChroma > 0) {
      var pl = 0
      while (pl < 2) { // ChromaDCLevel, Cb then Cr; nC = -1
        chromaDc(pl) = readCavlcBlock(r, -1, 4)._1; pl += 1
      }
    }
    var pl = 0
    while (pl < 2) {
      val grid = if (pl == 0) cbNnz else crNnz
      var b = 0
      while (b < 4) {
        val gx = mbX * 2 + b % 2; val gy = mbY * 2 + b / 2
        if (cbpChroma == 2) {
          val (ac, tc) = readCavlcBlock(r, nCtx(grid, gx, gy), 15)
          chromaAc(pl)(b) = ac; grid(gy)(gx) = tc
        } else grid(gy)(gx) = 0
        b += 1
      }
      pl += 1
    }
    reconstructChroma(chromaDc, chromaAc, chromaPredMode, qpC, mbX, mbY,
      w16, cb, cr, topOk, leftOk)
  }

  /** §8.3.4 chroma prediction + §8.5.11-12 reconstruction for one MB
    * from already-parsed residuals (`chromaDc`: per-plane 4 raster DC
    * coefficients; `chromaAc`: per-plane, per-4x4-block 15 zigzag AC
    * coefficients) — the entropy-independent half of [[decodeChroma]],
    * shared with the CABAC path in [[Cabac]]. Returns false when the
    * prediction mode needs unavailable neighbors. */
  private[multimodal] def reconstructChroma(
      chromaDc: Array[Array[Int]], chromaAc: Array[Array[Array[Int]]],
      chromaPredMode: Int, qpC: Int, mbX: Int, mbY: Int, w16: Int,
      cb: Array[Byte], cr: Array[Byte],
      topOk: Boolean, leftOk: Boolean): Boolean = {
    // ---- prediction + reconstruction (8x8 per component)
    val wC = w16 / 2
    var pl = 0
    while (pl < 2) {
      val plane = if (pl == 0) cb else cr
      def cAt(py: Int, px: Int): Int = plane(py * wC + px) & 0xff
      val cPred = new Array[Int](64)
      chromaPredMode match {
        case 0 => // DC, per-4x4-block neighbor rules (§8.3.4.1)
          var byy = 0
          while (byy < 2) {
            var bxx = 0
            while (bxx < 2) {
              var sT = 0; var sL = 0
              if (topOk) {
                var k = 0
                while (k < 4) {
                  sT += cAt(mbY * 8 - 1, mbX * 8 + bxx * 4 + k); k += 1
                }
              }
              if (leftOk) {
                var k = 0
                while (k < 4) {
                  sL += cAt(mbY * 8 + byy * 4 + k, mbX * 8 - 1); k += 1
                }
              }
              val corner = (bxx == byy) // (0,0) and (1,1) blocks
              val dc =
                if (corner) {
                  if (topOk && leftOk) (sT + sL + 4) >> 3
                  else if (leftOk) (sL + 2) >> 2
                  else if (topOk) (sT + 2) >> 2
                  else 128
                } else if (bxx == 1 && byy == 0) {
                  if (topOk) (sT + 2) >> 2
                  else if (leftOk) (sL + 2) >> 2
                  else 128
                } else { // (0,1)
                  if (leftOk) (sL + 2) >> 2
                  else if (topOk) (sT + 2) >> 2
                  else 128
                }
              var py = 0
              while (py < 4) {
                var px = 0
                while (px < 4) {
                  cPred((byy * 4 + py) * 8 + bxx * 4 + px) = dc; px += 1
                }
                py += 1
              }
              bxx += 1
            }
            byy += 1
          }
        case 1 => // Horizontal
          if (!leftOk) return false
          var yy = 0
          while (yy < 8) {
            val l = cAt(mbY * 8 + yy, mbX * 8 - 1)
            var x = 0
            while (x < 8) { cPred(yy * 8 + x) = l; x += 1 }
            yy += 1
          }
        case 2 => // Vertical
          if (!topOk) return false
          var x = 0
          while (x < 8) {
            val t = cAt(mbY * 8 - 1, mbX * 8 + x)
            var yy = 0
            while (yy < 8) { cPred(yy * 8 + x) = t; yy += 1 }
            x += 1
          }
        case _ => // Plane (§8.3.4.4, 4:2:0)
          if (!topOk || !leftOk) return false
          def t(x: Int): Int =
            if (x < 0) cAt(mbY * 8 - 1, mbX * 8 - 1)
            else cAt(mbY * 8 - 1, mbX * 8 + x)
          def l(yy: Int): Int =
            if (yy < 0) cAt(mbY * 8 - 1, mbX * 8 - 1)
            else cAt(mbY * 8 + yy, mbX * 8 - 1)
          var hAcc = 0; var vAcc = 0
          var k = 0
          while (k < 4) {
            hAcc += (k + 1) * (t(4 + k) - t(2 - k))
            vAcc += (k + 1) * (l(4 + k) - l(2 - k))
            k += 1
          }
          val a = 16 * (t(7) + l(7))
          val bB = (34 * hAcc + 32) >> 6
          val cC = (34 * vAcc + 32) >> 6
          var yy = 0
          while (yy < 8) {
            var x = 0
            while (x < 8) {
              cPred(yy * 8 + x) = math.max(0, math.min(255,
                (a + bB * (x - 3) + cC * (yy - 3) + 16) >> 5))
              x += 1
            }
            yy += 1
          }
      }
      val dcC = chromaDcDequant(chromaDc(pl), qpC)
      var b = 0
      while (b < 4) {
        val bxx = b % 2; val byy = b / 2
        val cBlock = new Array[Int](16)
        var s2 = 1
        while (s2 < 16) {
          cBlock(Zigzag4x4(s2)) = chromaAc(pl)(b)(s2 - 1); s2 += 1
        }
        val d = dequant4x4(cBlock, qpC)
        d(0) = dcC(byy * 2 + bxx)
        val g = inverseTransform4x4(d)
        var py = 0
        while (py < 4) {
          var px = 0
          while (px < 4) {
            val yy = byy * 4 + py; val xx = bxx * 4 + px
            plane((mbY * 8 + yy) * wC + mbX * 8 + xx) =
              clip255(cPred(yy * 8 + xx) + ((g(py * 4 + px) + 32) >> 6))
            px += 1
          }
          py += 1
        }
        b += 1
      }
      pl += 1
    }
    true
  }

  /** Decode one IDR I slice containing any mix of I_PCM (§7.3.5 PCM
    * path), Intra_16x16 (mb_type 1–24: CAVLC residual per §9.2,
    * §8.3.3 luma + §8.3.4 chroma prediction, §8.5.10-12 transforms)
    * and I_4x4 (mb_type 0: §8.3.1.1 mode derivation, all nine
    * §8.3.1.2 per-block prediction modes, Table 9-4 coded_block_
    * pattern, per-block CAVLC residual with the full nC context
    * family) macroblocks. Anything else (I_8x8, inter) → None — the
    * remaining declared seam. Single slice per picture (first_mb 0). */
  def decodeIdrIntra(sps: Sps, pps: Pps, nal: Array[Byte]): Option[Frame] = try {
    if (sps.chromaFormatIdc != 1) return None // 4:2:0 only
    if (!pps.cavlc) return Cabac.decodeISlice(sps, pps, nal) // §9.3 entropy
    val r = new BitReader(unescapeRbsp(nal, 1))
    var qpY = parseISliceHeader(r, sps, pps) match {
      case Some(q) => q
      case None => return None
    }
    val wMb = sps.widthMbs; val hMb = sps.heightMbs
    val w16 = wMb * 16; val h16 = hMb * 16
    val y = new Array[Byte](w16 * h16)
    val cb = new Array[Byte](w16 * h16 / 4)
    val cr = new Array[Byte](w16 * h16 / 4)
    // CAVLC nC context: stored TotalCoeff per 4x4 block (luma global
    // 4x4 grid; chroma per-component 2x2-per-MB grid). I_PCM blocks
    // count 16 (§9.2.1).
    val lumaNnz = Array.ofDim[Int](hMb * 4, wMb * 4)
    val cbNnz = Array.ofDim[Int](hMb * 2, wMb * 2)
    val crNnz = Array.ofDim[Int](hMb * 2, wMb * 2)
    // per-4x4 Intra4x4PredMode grid for §8.3.1.1 derivation; -1 marks
    // blocks of non-I_4x4 macroblocks (predicted as DC there)
    val lumaMode = Array.fill(hMb * 4, wMb * 4)(-1)
    var mb = 0
    val nMbs = wMb * hMb
    while (mb < nMbs) {
      val mbX = mb % wMb; val mbY = mb / wMb
      val mbType = r.ue()
      if (mbType == 25) {
        // I_PCM — raw samples; context counts 16
        r.byteAlign()
        var row = 0
        while (row < 16) {
          var c = 0
          while (c < 16) {
            y((mbY * 16 + row) * w16 + mbX * 16 + c) = r.readByte().toByte
            c += 1
          }
          row += 1
        }
        var pl = 0
        while (pl < 2) {
          val plane = if (pl == 0) cb else cr
          var r2 = 0
          while (r2 < 8) {
            var c2 = 0
            while (c2 < 8) {
              plane((mbY * 8 + r2) * (w16 / 2) + mbX * 8 + c2) = r.readByte().toByte
              c2 += 1
            }
            r2 += 1
          }
          pl += 1
        }
        var b = 0
        while (b < 16) {
          lumaNnz(mbY * 4 + Blk4y(b))(mbX * 4 + Blk4x(b)) = 16; b += 1
        }
        b = 0
        while (b < 4) {
          cbNnz(mbY * 2 + b / 2)(mbX * 2 + b % 2) = 16
          crNnz(mbY * 2 + b / 2)(mbX * 2 + b % 2) = 16
          b += 1
        }
      } else if (mbType >= 1 && mbType <= 24) {
        // Intra_16x16: §7.4.5 partition of mb_type
        val m = mbType - 1
        val predMode = m % 4
        val cbpChroma = (m / 4) % 3
        val cbpLuma = if (m / 12 == 1) 15 else 0
        val chromaPredMode = r.ue() // mb_pred: intra_chroma_pred_mode
        if (chromaPredMode > 3) return None
        qpY = (qpY + r.se() + 52) % 52 // mb_qp_delta (§7.4.5)
        // ---- residual parse (§7.3.5.3.1 order)
        // luma DC: nC as for luma4x4BlkIdx 0; its TotalCoeff is NOT
        // stored in the context (only AC counts are, per §9.2.1)
        val dcScan = readCavlcBlock(r,
          nCtx(lumaNnz, mbX * 4, mbY * 4), 16)._1
        val lumaAc = Array.ofDim[Int](16, 15)
        var blk = 0
        while (blk < 16) {
          val gx = mbX * 4 + Blk4x(blk); val gy = mbY * 4 + Blk4y(blk)
          if ((cbpLuma & (1 << (blk / 4))) != 0) {
            val (ac, tc) = readCavlcBlock(r, nCtx(lumaNnz, gx, gy), 15)
            lumaAc(blk) = ac; lumaNnz(gy)(gx) = tc
          } else lumaNnz(gy)(gx) = 0
          blk += 1
        }
        val qpC = chromaQp(qpY + pps.chromaQpOffset)
        if (!decodeChroma(r, cbpChroma, chromaPredMode, qpC, mbX, mbY, w16,
          cb, cr, cbNnz, crNnz, topOk = mbY > 0, leftOk = mbX > 0))
          return None
        if (!reconstructI16Luma(predMode, dcScan, lumaAc, qpY, mbX, mbY, w16, y))
          return None
      } else if (mbType == 0) {
        // ---- I_4x4 (§7.3.5.1 mb_pred + §7.4.5 cbp + §7.3.5.3 residual)
        // 16 prediction modes, §8.3.1.1 derivation against the mode grid
        val modes = new Array[Int](16)
        var b4 = 0
        while (b4 < 16) {
          val gx = mbX * 4 + Blk4x(b4); val gy = mbY * 4 + Blk4y(b4)
          val predicted = predIntra4x4Mode(lumaMode, gx, gy)
          val mode =
            if (r.bit() == 1) predicted // prev_intra4x4_pred_mode_flag
            else {
              val rem = r.u(3) // rem_intra4x4_pred_mode
              if (rem < predicted) rem else rem + 1
            }
          modes(b4) = mode
          lumaMode(gy)(gx) = mode // §8.3.1.1 reads modes of DECODED blocks
          b4 += 1
        }
        val chromaPredMode = r.ue()
        if (chromaPredMode > 3) return None
        val cbpCode = r.ue() // coded_block_pattern, me(v) Table 9-4
        if (cbpCode > 47) return None
        val cbp = CbpIntra(cbpCode)
        val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
        if (cbp != 0) qpY = (qpY + r.se() + 52) % 52 // mb_qp_delta
        // ---- per-block residual parse + §8.3.1.2 prediction +
        // §8.5.12 reconstruction, strictly in §6.4.3 decode order
        // (prediction reads already-reconstructed neighbor samples)
        b4 = 0
        while (b4 < 16) {
          val gx = mbX * 4 + Blk4x(b4); val gy = mbY * 4 + Blk4y(b4)
          val coeffScan =
            if ((cbpLuma & (1 << (b4 / 4))) != 0) {
              val (sc, tc) = readCavlcBlock(r, nCtx(lumaNnz, gx, gy), 16)
              lumaNnz(gy)(gx) = tc
              sc
            } else { lumaNnz(gy)(gx) = 0; new Array[Int](16) }
          if (!reconI4x4Block(modes(b4), coeffScan, qpY, mbX, mbY, b4, wMb, w16, y))
            return None
          b4 += 1
        }
        val qpC = chromaQp(qpY + pps.chromaQpOffset)
        if (!decodeChroma(r, cbpChroma, chromaPredMode, qpC, mbX, mbY, w16,
          cb, cr, cbNnz, crNnz, topOk = mbY > 0, leftOk = mbX > 0))
          return None
      } else return None // I_8x8 via transform_size flag / out-of-range:
      // inter frames and 8x8 partitions are the remaining seam
      mb += 1
    }
    Some(Frame(w16, h16, y, cb, cr))
  } catch { case _: Throwable => None }

  /** §8.3.3 Intra_16x16 luma prediction + §8.5.10/12 reconstruction for
    * one MB from parsed syntax (`dcScan`: the 16 zigzag
    * Intra16x16DCLevel coefficients; `lumaAc`: per-4x4-block 15 zigzag
    * AC coefficients) — the entropy-independent half of the Intra_16x16
    * branch of [[decodeIdrIntra]], shared with [[Cabac]]. Returns false
    * when the prediction mode needs unavailable neighbors. */
  private[multimodal] def reconstructI16Luma(
      predMode: Int, dcScan: Array[Int], lumaAc: Array[Array[Int]],
      qpY: Int, mbX: Int, mbY: Int, w16: Int, y: Array[Byte]): Boolean = {
    val dcRaster = new Array[Int](16)
    var s = 0
    while (s < 16) { dcRaster(Zigzag4x4(s)) = dcScan(s); s += 1 }
    val dcY = lumaDcDequant(dcRaster, qpY)
    val topOk = mbY > 0; val leftOk = mbX > 0
    def yAt(py: Int, px: Int): Int = y(py * w16 + px) & 0xff
    val pred = new Array[Int](256)
    predMode match {
      case 0 => // Vertical
        if (!topOk) return false
        var x = 0
        while (x < 16) {
          val t = yAt(mbY * 16 - 1, mbX * 16 + x)
          var yy = 0
          while (yy < 16) { pred(yy * 16 + x) = t; yy += 1 }
          x += 1
        }
      case 1 => // Horizontal
        if (!leftOk) return false
        var yy = 0
        while (yy < 16) {
          val l = yAt(mbY * 16 + yy, mbX * 16 - 1)
          var x = 0
          while (x < 16) { pred(yy * 16 + x) = l; x += 1 }
          yy += 1
        }
      case 2 => // DC
        var sum = 0; var n = 0
        if (topOk) {
          var x = 0
          while (x < 16) { sum += yAt(mbY * 16 - 1, mbX * 16 + x); x += 1 }
          n += 16
        }
        if (leftOk) {
          var yy = 0
          while (yy < 16) { sum += yAt(mbY * 16 + yy, mbX * 16 - 1); yy += 1 }
          n += 16
        }
        val dc =
          if (n == 32) (sum + 16) >> 5
          else if (n == 16) (sum + 8) >> 4
          else 128
        java.util.Arrays.fill(pred, dc)
      case _ => // Plane (§8.3.3.4)
        if (!topOk || !leftOk) return false
        def t(x: Int): Int =
          if (x < 0) yAt(mbY * 16 - 1, mbX * 16 - 1)
          else yAt(mbY * 16 - 1, mbX * 16 + x)
        def l(yy: Int): Int =
          if (yy < 0) yAt(mbY * 16 - 1, mbX * 16 - 1)
          else yAt(mbY * 16 + yy, mbX * 16 - 1)
        var hAcc = 0; var vAcc = 0
        var k = 0
        while (k < 8) {
          hAcc += (k + 1) * (t(8 + k) - t(6 - k))
          vAcc += (k + 1) * (l(8 + k) - l(6 - k))
          k += 1
        }
        val a = 16 * (t(15) + l(15))
        val bB = (5 * hAcc + 32) >> 6
        val cC = (5 * vAcc + 32) >> 6
        var yy = 0
        while (yy < 16) {
          var x = 0
          while (x < 16) {
            pred(yy * 16 + x) = math.max(0, math.min(255,
              (a + bB * (x - 7) + cC * (yy - 7) + 16) >> 5))
            x += 1
          }
          yy += 1
        }
    }
    // ---- luma reconstruction: per 4x4 block DC + AC
    var blk = 0
    while (blk < 16) {
      val bx = Blk4x(blk); val by = Blk4y(blk)
      val cBlock = new Array[Int](16)
      var s2 = 1
      while (s2 < 16) {
        cBlock(Zigzag4x4(s2)) = lumaAc(blk)(s2 - 1); s2 += 1
      }
      val d = dequant4x4(cBlock, qpY)
      d(0) = dcY(by * 4 + bx)
      val g = inverseTransform4x4(d)
      var py = 0
      while (py < 4) {
        var px = 0
        while (px < 4) {
          val yy = by * 4 + py; val xx = bx * 4 + px
          y((mbY * 16 + yy) * w16 + mbX * 16 + xx) =
            clip255(pred(yy * 16 + xx) + ((g(py * 4 + px) + 32) >> 6))
          px += 1
        }
        py += 1
      }
      blk += 1
    }
    true
  }

  /** §8.3.1.2 prediction + §8.5.12 reconstruction of ONE I_4x4 luma
    * block (decode-order index `b4`) from its parsed 16-coefficient
    * zigzag residual — the entropy-independent half of the I_4x4
    * branch, shared with [[Cabac]]. Must be called in §6.4.3 decode
    * order (prediction reads already-reconstructed neighbor samples,
    * including the top-right availability rule). Returns false when
    * the mode needs unavailable neighbors. */
  private[multimodal] def reconI4x4Block(
      mode: Int, coeffScan: Array[Int], qpY: Int, mbX: Int, mbY: Int,
      b4: Int, wMb: Int, w16: Int, y: Array[Byte]): Boolean = {
    def yAt(py: Int, px: Int): Int = y(py * w16 + px) & 0xff
    val bx = Blk4x(b4); val by = Blk4y(b4)
    val gx = mbX * 4 + bx; val gy = mbY * 4 + by
    val x0 = mbX * 16 + bx * 4; val y0 = mbY * 16 + by * 4
    val topOk4 = gy > 0
    val leftOk4 = gx > 0
    val corner =
      if (topOk4 && leftOk4) yAt(y0 - 1, x0 - 1) else 0
    val left4 = new Array[Int](4)
    if (leftOk4) {
      var i = 0
      while (i < 4) { left4(i) = yAt(y0 + i, x0 - 1); i += 1 }
    }
    val top8 = new Array[Int](8)
    if (topOk4) {
      var i = 0
      while (i < 4) { top8(i) = yAt(y0 - 1, x0 + i); i += 1 }
      // top-right p[4..7,-1]: available when those samples lie in
      // the picture AND their block is already decoded — exactly
      // two reachable cases (§6.4.3 order): the block's top row is
      // the MB's top row (samples in the previous, fully-decoded MB
      // row — including the top-RIGHT MB when bx == 3), or the
      // top-right block is within THIS MB with a smaller decode
      // index; otherwise substitute p[3,-1] (§8.3.1.2)
      val trMbX = (gx + 1) / 4
      val trAvail = gx + 1 < wMb * 4 && (
        gy % 4 == 0 || // top row of this MB → previous MB row
          (trMbX == mbX && // within this MB: earlier decode index
            BlkIdxOf((by - 1) * 4 + (bx + 1)) < b4))
      if (trAvail) {
        var i = 4
        while (i < 8) { top8(i) = yAt(y0 - 1, x0 + i); i += 1 }
      } else {
        var i = 4
        while (i < 8) { top8(i) = top8(3); i += 1 }
      }
    }
    val pred = intra4x4Predict(mode, top8, left4, corner, topOk4, leftOk4)
    if (pred == null) return false
    val cBlock = new Array[Int](16)
    var s2 = 0
    while (s2 < 16) {
      cBlock(Zigzag4x4(s2)) = coeffScan(s2); s2 += 1
    }
    val g = inverseTransform4x4(dequant4x4(cBlock, qpY))
    var py = 0
    while (py < 4) {
      var px = 0
      while (px < 4) {
        y((y0 + py) * w16 + x0 + px) =
          clip255(pred(py * 4 + px) + ((g(py * 4 + px) + 32) >> 6))
        px += 1
      }
      py += 1
    }
    true
  }

  /** Decode the first IDR picture of one AVCC-framed mp4 sample: walk
    * the 4-byte-length NAL sequence, pick up in-band SPS/PPS, and PCM-
    * decode the IDR slice. None when the sample carries no IDR, lacks
    * parameter sets (in-sample or caller-supplied), or needs the
    * prediction path. */
  def decodeAvccSample(sample: Array[Byte],
                       sps0: Option[Sps] = None,
                       pps0: Option[Pps] = None): Option[Frame] = {
    var sps = sps0
    var pps = pps0
    var off = 0
    val n = sample.length
    while (off + 4 <= n) {
      val len = (((sample(off) & 0xffL) << 24) | ((sample(off + 1) & 0xffL) << 16) |
        ((sample(off + 2) & 0xffL) << 8) | (sample(off + 3) & 0xffL)).toInt
      if (len < 1 || len > n - off - 4) return None
      val nal = java.util.Arrays.copyOfRange(sample, off + 4, off + 4 + len)
      (nal(0) & 0x1f) match {
        case 7 => sps = parseSps(nal)
        case 8 => pps = parsePps(nal)
        case 5 =>
          return (sps, pps) match {
            case (Some(s), Some(p)) => decodeIdrIntra(s, p, nal)
            case _ => None
          }
        case _ => ()
      }
      off += 4 + len
    }
    None
  }
}
