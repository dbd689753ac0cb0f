package graft.functions

/** Lossy-WebP (`VP8 `) keyframe decoder — RFC 6386, implemented from the
  * public spec and pinned pixel-exact against the system libwebp (the
  * same reference the VP8L pins use; see tools/gen_vp8_fixtures.py and
  * WebpPixelsSpec's lossy battery):
  *
  *  - boolean arithmetic decoder (§7) with tree / literal / signed
  *    forms;
  *  - the uncompressed frame header, keyframe start code, 14-bit dims
  *    (§9.1), and the first-partition header: segmentation (§9.3,
  *    §10), loop-filter params + deltas (§9.4), token-partition
  *    count/sizes (§9.5), quantizer indices + deltas (§9.6), and the
  *    1056-entry coefficient-probability update pass (§9.9, update
  *    flags + defaults extracted from libwebp in [[Vp8Tables]]);
  *  - per-MB intra modes: keyframe Y-mode tree, 16 context-coded
  *    subblock B modes (kf_bmode_prob[above][left]), chroma mode
  *    (§11.2–11.4);
  *  - token decode (§13): the coefficient tree over
  *    [plane][band][ctx] probabilities, category extra bits (cat1–6),
  *    zero-run re-entry, zigzag placement, per-segment dequant with
  *    the Y2 ×2 / ×155/100 and chroma-DC-117 rules (§14.1);
  *  - reconstruction (§12, §14.3–14.5): WHT inverse for Y2, the exact
  *    integer 4×4 iDCT, all 16×16 / chroma / ten 4×4 intra predictors
  *    with the 127/129 frame-edge conventions and the frozen
  *    above-right rule for lower subblock rows;
  *  - the normal AND simple in-loop deblocking filters (§15) with
  *    per-segment/delta levels, sharpness-derived interior limits,
  *    and high-edge-variance logic;
  *  - output: fancy (9·3·3·1 half-pel) or simple chroma upsampling and
  *    libwebp's fixed-point YUV→RGB — both verified value-exact against
  *    WebPDecodeRGBA at fixture-generation time.
  *
  * Intra prediction reads UNFILTERED reconstruction (the loop filter
  * runs after the full frame, matching the reference decoder's saved
  * pre-filter prediction rows). Keyframes only — WebP stills are
  * always keyframes, so inter tools (MVs, refs) are structurally
  * unreachable and not implemented.
  *
  * Scale shape: same as the codec family — a map-only kernel, output
  * bounded by the caller's [[WebpPixels.MaxPixels]] guard before any
  * allocation, every read bounds-checked (reads past the partition end
  * decode as zero bits exactly like the reference's virtual-zeros
  * tail), all-or-nothing null via [[WebpPixels]]'s Corrupt contract.
  */
private[functions] object Vp8Decode {

  // shares the family Corrupt so WebpPixels.parse's all-or-nothing
  // NULL catch covers the lossy path too
  private def bad(): Nothing = throw WebpPixels.Corrupt

  // ---- boolean decoder (RFC 6386 §7.3) ------------------------------
  private final class Bool(src: Array[Byte], from: Int, to: Int) {
    private var pos = from
    private var range = 255
    private var value = (next() << 8) | next()
    private var bitCount = 0
    private def next(): Int =
      if (pos < to) { val b = src(pos) & 0xff; pos += 1; b } else 0
    def bit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val big = split << 8
      var ret = 0
      if (value >= big) { ret = 1; range -= split; value -= big }
      else range = split
      while (range < 128) {
        value <<= 1; range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= next() }
      }
      ret
    }
    def literal(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(128); i += 1 }
      v
    }
    /** flag ? (sign-extended literal) : 0 — the header delta form. */
    def signedDelta(n: Int): Int =
      if (bit(128) == 0) 0
      else { val v = literal(n); if (bit(128) == 1) -v else v }
    def tree(t: Array[Int], probs: Array[Int], probOff: Int): Int = {
      var i = t(0 + bit(probs(probOff)))
      while (i > 0) i = t(i + bit(probs(probOff + (i >> 1))))
      -i
    }
  }

  // ---- mode trees (RFC 6386 §8.2, §11.3–11.4) ------------------------
  // Y modes: DC=0 V=1 H=2 TM=3 B_PRED=4
  private val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  private val KfYModeProb = Array(145, 156, 163, 128)
  // uv modes: DC=0 V=1 H=2 TM=3
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvModeProb = Array(142, 114, 183)
  // B modes in the REFERENCE DECODER's numbering (the extracted
  // kf_bmode_prob context table is indexed by it): DC=0 TM=1 VE=2 HE=3
  // RD=4 VR=5 LD=6 VL=7 HD=8 HU=9 — note RD/VR/LD/VL differ from the
  // RFC's enum order; the tree SHAPE is the RFC's
  private val BModeTree = Array(
    -0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16, -8, -9)
  private val SegmentTree = Array(2, 4, -0, -1, -2, -3)
  // implied B mode of a 16x16-coded neighbor, by Y mode (§11.3)
  private val YModeToBMode = Array(0, 2, 3, 1)

  // ---- token machinery (RFC 6386 §13) --------------------------------
  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val CoeffBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  private val Cat3 = Array(173, 148, 140)
  private val Cat4 = Array(176, 155, 140, 135)
  private val Cat5 = Array(180, 157, 141, 134, 130)
  private val Cat6 = Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)
  private val Cats = Array(Cat3, Cat4, Cat5, Cat6)

  /** coeff prob index: ((plane * 8 + band) * 3 + ctx) * 11 + i */
  @inline private def cpIdx(plane: Int, band: Int, ctx: Int): Int =
    ((plane * 8 + band) * 3 + ctx) * 11

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  @inline private def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
  @inline private def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2

  /** Decoded frame state. */
  final class Frame(val w: Int, val h: Int, val mbW: Int, val mbH: Int) {
    val pw: Int = mbW * 16
    val ph: Int = mbH * 16
    val cpw: Int = mbW * 8
    val cph: Int = mbH * 8
    val y = new Array[Byte](pw * ph)
    val u = new Array[Byte](cpw * cph)
    val v = new Array[Byte](cpw * cph)
  }

  /** Decode the VP8 payload at bytes[from, to) to YUV planes (padded to
    * whole MBs). `applyFilter=false` is the staged bypass-filtering pin.
    */
  def decodeYuvPlanes(bytes: Array[Byte], from: Int, to: Int,
      applyFilter: Boolean): Frame = {
    if (to - from < 10) bad()
    // ---- uncompressed frame tag (§9.1) ----
    val b0 = bytes(from) & 0xff
    val b1 = bytes(from + 1) & 0xff
    val b2 = bytes(from + 2) & 0xff
    val keyframe = (b0 & 1) == 0
    val version = (b0 >> 1) & 7
    val part0Len = (b0 >> 5) | (b1 << 3) | (b2 << 11)
    if (!keyframe || version > 3) bad()
    if ((bytes(from + 3) & 0xff) != 0x9d || (bytes(from + 4) & 0xff) != 0x01 ||
      (bytes(from + 5) & 0xff) != 0x2a) bad()
    val w = ((bytes(from + 6) & 0xff) | ((bytes(from + 7) & 0xff) << 8)) & 0x3fff
    val h = ((bytes(from + 8) & 0xff) | ((bytes(from + 9) & 0xff) << 8)) & 0x3fff
    if (w == 0 || h == 0) bad()
    if (w.toLong * h > WebpPixels.MaxPixels) bad()
    val part0From = from + 10
    val part0To = part0From + part0Len
    if (part0To > to) bad()
    val br = new Bool(bytes, part0From, part0To)

    // ---- first partition header (§9.2–9.11) ----
    br.literal(1) // color space (keyframe)
    br.literal(1) // clamping type
    // segmentation (§9.3)
    var segmentEnabled = false
    var segAbsDelta = false
    val segQuant = new Array[Int](4)
    val segFilter = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    var updateMap = false
    if (br.bit(128) == 1) {
      segmentEnabled = true
      updateMap = br.bit(128) == 1
      val updateData = br.bit(128) == 1
      if (updateData) {
        segAbsDelta = br.bit(128) == 1
        var i = 0
        while (i < 4) { segQuant(i) = br.signedDelta(7); i += 1 }
        i = 0
        while (i < 4) { segFilter(i) = br.signedDelta(6); i += 1 }
      }
      if (updateMap) {
        var i = 0
        while (i < 3) {
          if (br.bit(128) == 1) segTreeProbs(i) = br.literal(8)
          i += 1
        }
      }
    }
    // loop filter (§9.4)
    val simpleFilter = br.bit(128) == 1
    val filterLevel = br.literal(6)
    val sharpness = br.literal(3)
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    if (br.bit(128) == 1) {
      lfDeltaEnabled = true
      if (br.bit(128) == 1) { // update
        var i = 0
        while (i < 4) {
          if (br.bit(128) == 1) {
            refLfDelta(i) = br.literal(6)
            if (br.bit(128) == 1) refLfDelta(i) = -refLfDelta(i)
          }
          i += 1
        }
        i = 0
        while (i < 4) {
          if (br.bit(128) == 1) {
            modeLfDelta(i) = br.literal(6)
            if (br.bit(128) == 1) modeLfDelta(i) = -modeLfDelta(i)
          }
          i += 1
        }
      }
    }
    // token partitions (§9.5)
    val nParts = 1 << br.literal(2)
    val partsStart = part0To + 3 * (nParts - 1)
    if (partsStart > to) bad()
    val partFrom = new Array[Int](nParts)
    val partTo = new Array[Int](nParts)
    var pOff = partsStart
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi + 1 == nParts) to - pOff
        else {
          val o = part0To + 3 * pi
          (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
            ((bytes(o + 2) & 0xff) << 16)
        }
      if (sz < 0 || pOff + sz > to) bad()
      partFrom(pi) = pOff
      partTo(pi) = pOff + sz
      pOff += sz
      pi += 1
    }
    val partBr = Array.tabulate(nParts)(i => new Bool(bytes, partFrom(i), partTo(i)))

    // quantizers (§9.6)
    val yAcQi = br.literal(7)
    val y1dcD = br.signedDelta(4)
    val y2dcD = br.signedDelta(4)
    val y2acD = br.signedDelta(4)
    val uvdcD = br.signedDelta(4)
    val uvacD = br.signedDelta(4)
    @inline def clampQ(v: Int, max: Int): Int =
      if (v < 0) 0 else if (v > max) max else v
    // per-segment dequant factors [seg][y1dc,y1ac,y2dc,y2ac,uvdc,uvac]
    val dq = Array.tabulate(4) { s =>
      val base =
        if (!segmentEnabled) yAcQi
        else if (segAbsDelta) segQuant(s)
        else yAcQi + segQuant(s)
      val q = clampQ(base, 127)
      val y2ac0 = Vp8Tables.AcQ(clampQ(q + y2acD, 127)) * 155 / 100
      Array(
        Vp8Tables.DcQ(clampQ(q + y1dcD, 127)),
        Vp8Tables.AcQ(q),
        Vp8Tables.DcQ(clampQ(q + y2dcD, 127)) * 2,
        if (y2ac0 < 8) 8 else y2ac0,
        Vp8Tables.DcQ(clampQ(q + uvdcD, 117)),
        Vp8Tables.AcQ(clampQ(q + uvacD, 127)))
    }

    br.literal(1) // refresh entropy probs (keyframe)
    // coefficient probability updates (§9.9)
    val coeffProbs = Vp8Tables.CoeffProbs0.clone()
    var ci = 0
    while (ci < 1056) {
      if (br.bit(Vp8Tables.CoeffUpdateProbs(ci)) == 1)
        coeffProbs(ci) = br.literal(8)
      ci += 1
    }
    val useSkip = br.bit(128) == 1
    val skipProb = if (useSkip) br.literal(8) else 0

    // ---- per-MB mode parse (first partition, §11) ----
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val nMb = mbW * mbH
    val mbSeg = new Array[Byte](nMb)
    val mbSkip = new Array[Boolean](nMb)
    val mbYMode = new Array[Byte](nMb)
    val mbUvMode = new Array[Byte](nMb)
    val mbBModes = new Array[Byte](nMb * 16) // valid when ymode==B_PRED
    // B-mode contexts: above per column (4 per MB), left per row-current
    val aboveB = new Array[Byte](mbW * 4) // init B_DC (0)
    val leftB = new Array[Byte](4)
    var mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftB, 0.toByte)
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        if (segmentEnabled && updateMap)
          mbSeg(mi) = br.tree(SegmentTree, segTreeProbs, 0).toByte
        if (useSkip) mbSkip(mi) = br.bit(skipProb) == 1
        val ym = br.tree(KfYModeTree, KfYModeProb, 0)
        mbYMode(mi) = ym.toByte
        if (ym == 4) { // B_PRED: 16 context-coded subblock modes
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3
            val sy = sb >> 2
            val above =
              if (sy == 0) aboveB(mbX * 4 + sx)
              else mbBModes(mi * 16 + sb - 4)
            val left =
              if (sx == 0) leftB(sy)
              else mbBModes(mi * 16 + sb - 1)
            val bm = br.tree(BModeTree, Vp8Tables.KfBModeProb,
              (above * 10 + left) * 9)
            mbBModes(mi * 16 + sb) = bm.toByte
            sb += 1
          }
          // propagate contexts
          var k = 0
          while (k < 4) {
            aboveB(mbX * 4 + k) = mbBModes(mi * 16 + 12 + k)
            leftB(k) = mbBModes(mi * 16 + k * 4 + 3)
            k += 1
          }
        } else {
          val eq = YModeToBMode(ym).toByte
          var k = 0
          while (k < 4) {
            aboveB(mbX * 4 + k) = eq; leftB(k) = eq; k += 1
          }
        }
        mbUvMode(mi) = br.tree(UvModeTree, KfUvModeProb, 0).toByte
        mbX += 1
      }
      mbY += 1
    }

    // ---- residuals: token decode + reconstruction ----
    val frame = new Frame(w, h, mbW, mbH)
    val Y = frame.y
    val U = frame.u
    val V = frame.v
    val pw = frame.pw
    val cpw = frame.cpw
    // padded planes start undefined; prediction edges handled explicitly

    // nonzero contexts: top per MB column (4 Y, 2 U, 2 V, 1 Y2), left per row
    val topNz = new Array[Byte](mbW * 9)
    val leftNz = new Array[Byte](9)
    val coeffs = new Array[Int](400) // 25 blocks x 16, per MB
    val hasCoeffs = new Array[Boolean](nMb)

    /** token-decode one 4x4 block; returns #decoded coeffs (0 = all
      * zero). coeffs written dequantized at zigzag positions.
      */
    def decodeBlock(bt: Bool, out: Array[Int], off: Int, plane: Int,
        ctx0: Int, first: Int, dqDc: Int, dqAc: Int): Int = {
      var n = first
      var p = cpIdx(plane, CoeffBands(n), ctx0)
      var last = 0
      var done = false
      while (!done && n < 16) {
        if (bt.bit(coeffProbs(p)) == 0) done = true // EOB
        else {
          // zero-run loop
          var zero = true
          while (zero && bt.bit(coeffProbs(p + 1)) == 0) {
            n += 1
            if (n == 16) { zero = false; done = true }
            else p = cpIdx(plane, CoeffBands(n), 0)
          }
          if (!done) {
            var v = 0
            var nextCtx = 2
            if (bt.bit(coeffProbs(p + 2)) == 0) { v = 1; nextCtx = 1 }
            else {
              if (bt.bit(coeffProbs(p + 3)) == 0) {
                if (bt.bit(coeffProbs(p + 4)) == 0) v = 2
                else v = 3 + bt.bit(coeffProbs(p + 5))
              } else {
                if (bt.bit(coeffProbs(p + 6)) == 0) {
                  if (bt.bit(coeffProbs(p + 7)) == 0) v = 5 + bt.bit(159)
                  else v = 7 + 2 * bt.bit(165) + bt.bit(145)
                } else {
                  val bit1 = bt.bit(coeffProbs(p + 8))
                  val bit0 = bt.bit(coeffProbs(p + 9 + bit1))
                  val cat = 2 * bit1 + bit0
                  val tab = Cats(cat)
                  v = 0
                  var ti = 0
                  while (ti < tab.length) { v += v + bt.bit(tab(ti)); ti += 1 }
                  v += 3 + (8 << cat)
                }
              }
            }
            if (bt.bit(128) == 1) v = -v
            out(off + Zigzag(n)) = v * (if (n > 0) dqAc else dqDc)
            last = n + 1
            n += 1
            if (n < 16) p = cpIdx(plane, CoeffBands(n), nextCtx)
          }
        }
      }
      last
    }

    // ---- transforms ----
    def idct4x4(c: Array[Int], off: Int, dst: Array[Byte], dOff: Int,
        stride: Int): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = c(off + i) + c(off + i + 8)
        val b1 = c(off + i) - c(off + i + 8)
        val t1 = (c(off + i + 4) * 35468) >> 16
        val t2 = c(off + i + 12) + ((c(off + i + 12) * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = c(off + i + 4) + ((c(off + i + 4) * 20091) >> 16)
        val t4 = (c(off + i + 12) * 35468) >> 16
        val d1 = t3 + t4
        tmp(i) = a1 + d1
        tmp(i + 12) = a1 - d1
        tmp(i + 4) = b1 + c1
        tmp(i + 8) = b1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val o = i * 4
        val a1 = tmp(o) + tmp(o + 2)
        val b1 = tmp(o) - tmp(o + 2)
        val t1 = (tmp(o + 1) * 35468) >> 16
        val t2 = tmp(o + 3) + ((tmp(o + 3) * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = tmp(o + 1) + ((tmp(o + 1) * 20091) >> 16)
        val t4 = (tmp(o + 3) * 35468) >> 16
        val d1 = t3 + t4
        val base = dOff + i * stride
        dst(base) = clip255((dst(base) & 0xff) + ((a1 + d1 + 4) >> 3)).toByte
        dst(base + 1) = clip255((dst(base + 1) & 0xff) + ((b1 + c1 + 4) >> 3)).toByte
        dst(base + 2) = clip255((dst(base + 2) & 0xff) + ((b1 - c1 + 4) >> 3)).toByte
        dst(base + 3) = clip255((dst(base + 3) & 0xff) + ((a1 - d1 + 4) >> 3)).toByte
        i += 1
      }
    }

    def iwht4x4(c: Array[Int], off: Int, out: Array[Int]): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = c(off + i) + c(off + i + 12)
        val b1 = c(off + i + 4) + c(off + i + 8)
        val c1 = c(off + i + 4) - c(off + i + 8)
        val d1 = c(off + i) - c(off + i + 12)
        tmp(i) = a1 + b1
        tmp(i + 4) = c1 + d1
        tmp(i + 8) = a1 - b1
        tmp(i + 12) = d1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val o = i * 4
        val a1 = tmp(o) + tmp(o + 3)
        val b1 = tmp(o + 1) + tmp(o + 2)
        val c1 = tmp(o + 1) - tmp(o + 2)
        val d1 = tmp(o) - tmp(o + 3)
        out(o) = (a1 + b1 + 3) >> 3
        out(o + 1) = (c1 + d1 + 3) >> 3
        out(o + 2) = (a1 - b1 + 3) >> 3
        out(o + 3) = (d1 - c1 + 3) >> 3
        i += 1
      }
    }

    // ---- prediction edge accessors over the padded plane ----
    // above pixel at plane coordinate (px, py-1): 127 when py==0;
    // left pixel at (px-1, py): 129 when px==0;
    // above-left: 127 on top row, 129 on left column (mbY>0), else real.
    @inline def aboveY(px: Int, py: Int): Int =
      if (py == 0) 127
      else if (px >= pw) Y((py - 1) * pw + pw - 1) & 0xff
      else Y((py - 1) * pw + px) & 0xff
    @inline def leftY(px: Int, py: Int): Int =
      if (px == 0) 129 else Y(py * pw + px - 1) & 0xff
    @inline def cornerY(px: Int, py: Int): Int =
      if (py == 0) 127
      else if (px == 0) 129
      else Y((py - 1) * pw + px - 1) & 0xff

    def predict16(mode: Int, x0: Int, y0: Int, mbX: Int, mbY0: Int): Unit = {
      mode match {
        case 0 => // DC
          var sum = 0
          var total = 0
          if (mbY0 > 0) { var i = 0; while (i < 16) { sum += aboveY(x0 + i, y0); i += 1 }; total += 16 }
          if (mbX > 0) { var i = 0; while (i < 16) { sum += leftY(x0, y0 + i); i += 1 }; total += 16 }
          val dc =
            if (total == 32) (sum + 16) >> 5
            else if (total == 16) (sum + 8) >> 4
            else 128
          var r = 0
          while (r < 16) {
            java.util.Arrays.fill(Y, (y0 + r) * pw + x0, (y0 + r) * pw + x0 + 16, dc.toByte)
            r += 1
          }
        case 1 => // V
          var r = 0
          while (r < 16) {
            var i = 0
            while (i < 16) { Y((y0 + r) * pw + x0 + i) = aboveY(x0 + i, y0).toByte; i += 1 }
            r += 1
          }
        case 2 => // H
          var r = 0
          while (r < 16) {
            val l = leftY(x0, y0 + r).toByte
            java.util.Arrays.fill(Y, (y0 + r) * pw + x0, (y0 + r) * pw + x0 + 16, l)
            r += 1
          }
        case _ => // TM
          val p = cornerY(x0, y0)
          var r = 0
          while (r < 16) {
            val l = leftY(x0, y0 + r)
            var i = 0
            while (i < 16) {
              Y((y0 + r) * pw + x0 + i) = clip255(l + aboveY(x0 + i, y0) - p).toByte
              i += 1
            }
            r += 1
          }
      }
    }

    def predictChroma(mode: Int, P: Array[Byte], x0: Int, y0: Int,
        mbX: Int, mbY0: Int): Unit = {
      @inline def ab(px: Int): Int = if (mbY0 == 0) 127 else P((y0 - 1) * cpw + px) & 0xff
      @inline def lf(py: Int): Int = if (mbX == 0) 129 else P(py * cpw + x0 - 1) & 0xff
      @inline def corner: Int =
        if (mbY0 == 0) 127 else if (mbX == 0) 129 else P((y0 - 1) * cpw + x0 - 1) & 0xff
      mode match {
        case 0 =>
          var sum = 0
          var total = 0
          if (mbY0 > 0) { var i = 0; while (i < 8) { sum += ab(x0 + i); i += 1 }; total += 8 }
          if (mbX > 0) { var i = 0; while (i < 8) { sum += lf(y0 + i); i += 1 }; total += 8 }
          val dc =
            if (total == 16) (sum + 8) >> 4
            else if (total == 8) (sum + 4) >> 3
            else 128
          var r = 0
          while (r < 8) {
            java.util.Arrays.fill(P, (y0 + r) * cpw + x0, (y0 + r) * cpw + x0 + 8, dc.toByte)
            r += 1
          }
        case 1 =>
          var r = 0
          while (r < 8) {
            var i = 0
            while (i < 8) { P((y0 + r) * cpw + x0 + i) = ab(x0 + i).toByte; i += 1 }
            r += 1
          }
        case 2 =>
          var r = 0
          while (r < 8) {
            java.util.Arrays.fill(P, (y0 + r) * cpw + x0, (y0 + r) * cpw + x0 + 8, lf(y0 + r).toByte)
            r += 1
          }
        case _ =>
          val p0 = corner
          var r = 0
          while (r < 8) {
            val l = lf(y0 + r)
            var i = 0
            while (i < 8) {
              P((y0 + r) * cpw + x0 + i) = clip255(l + ab(x0 + i) - p0).toByte
              i += 1
            }
            r += 1
          }
      }
    }

    /** 4x4 intra predict subblock at luma plane coords (x0, y0) with the
      * pre-gathered edge: A(0..7) above incl. above-right, L(0..3),
      * tl above-left.
      */
    def predict4(mode: Int, x0: Int, y0: Int, A: Array[Int], L: Array[Int],
        tl: Int): Unit = {
      @inline def put(cx: Int, cy: Int, v: Int): Unit =
        Y((y0 + cy) * pw + x0 + cx) = v.toByte
      mode match {
        case 0 => // B_DC
          var s = 4
          var i = 0
          while (i < 4) { s += A(i) + L(i); i += 1 }
          val dc = (s >> 3).toByte
          var r = 0
          while (r < 4) {
            java.util.Arrays.fill(Y, (y0 + r) * pw + x0, (y0 + r) * pw + x0 + 4, dc)
            r += 1
          }
        case 1 => // B_TM
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) { put(c, r, clip255(L(r) + A(c) - tl)); c += 1 }
            r += 1
          }
        case 2 => // B_VE
          val v0 = avg3(tl, A(0), A(1))
          val v1 = avg3(A(0), A(1), A(2))
          val v2 = avg3(A(1), A(2), A(3))
          val v3 = avg3(A(2), A(3), A(4))
          var r = 0
          while (r < 4) { put(0, r, v0); put(1, r, v1); put(2, r, v2); put(3, r, v3); r += 1 }
        case 3 => // B_HE
          val h0 = avg3(tl, L(0), L(1))
          val h1 = avg3(L(0), L(1), L(2))
          val h2 = avg3(L(1), L(2), L(3))
          val h3 = avg3(L(2), L(3), L(3))
          var c = 0
          while (c < 4) { put(c, 0, h0); put(c, 1, h1); put(c, 2, h2); put(c, 3, h3); c += 1 }
        case 6 => // B_LD (down-left)
          put(0, 0, avg3(A(0), A(1), A(2)))
          val v1 = avg3(A(1), A(2), A(3)); put(1, 0, v1); put(0, 1, v1)
          val v2 = avg3(A(2), A(3), A(4)); put(2, 0, v2); put(1, 1, v2); put(0, 2, v2)
          val v3 = avg3(A(3), A(4), A(5)); put(3, 0, v3); put(2, 1, v3); put(1, 2, v3); put(0, 3, v3)
          val v4 = avg3(A(4), A(5), A(6)); put(3, 1, v4); put(2, 2, v4); put(1, 3, v4)
          val v5 = avg3(A(5), A(6), A(7)); put(3, 2, v5); put(2, 3, v5)
          put(3, 3, avg3(A(6), A(7), A(7)))
        case 4 => // B_RD (down-right)
          put(0, 3, avg3(L(1), L(2), L(3)))
          val v1 = avg3(L(0), L(1), L(2)); put(0, 2, v1); put(1, 3, v1)
          val v2 = avg3(tl, L(0), L(1)); put(0, 1, v2); put(1, 2, v2); put(2, 3, v2)
          val v3 = avg3(A(0), tl, L(0)); put(0, 0, v3); put(1, 1, v3); put(2, 2, v3); put(3, 3, v3)
          val v4 = avg3(A(1), A(0), tl); put(1, 0, v4); put(2, 1, v4); put(3, 2, v4)
          val v5 = avg3(A(2), A(1), A(0)); put(2, 0, v5); put(3, 1, v5)
          put(3, 0, avg3(A(3), A(2), A(1)))
        case 5 => // B_VR (vertical-right)
          put(0, 0, avg2(tl, A(0))); put(1, 2, avg2(tl, A(0)))
          put(1, 0, avg2(A(0), A(1))); put(2, 2, avg2(A(0), A(1)))
          put(2, 0, avg2(A(1), A(2))); put(3, 2, avg2(A(1), A(2)))
          put(3, 0, avg2(A(2), A(3)))
          put(0, 3, avg3(L(2), L(1), L(0)))
          put(0, 2, avg3(L(1), L(0), tl))
          val v1 = avg3(L(0), tl, A(0)); put(0, 1, v1); put(1, 3, v1)
          val v2 = avg3(tl, A(0), A(1)); put(1, 1, v2); put(2, 3, v2)
          val v3 = avg3(A(0), A(1), A(2)); put(2, 1, v3); put(3, 3, v3)
          put(3, 1, avg3(A(1), A(2), A(3)))
        case 7 => // B_VL (vertical-left)
          put(0, 0, avg2(A(0), A(1)))
          val a1 = avg2(A(1), A(2)); put(1, 0, a1); put(0, 2, a1)
          val a2 = avg2(A(2), A(3)); put(2, 0, a2); put(1, 2, a2)
          val a3 = avg2(A(3), A(4)); put(3, 0, a3); put(2, 2, a3)
          put(0, 1, avg3(A(0), A(1), A(2)))
          val b1 = avg3(A(1), A(2), A(3)); put(1, 1, b1); put(0, 3, b1)
          val b2 = avg3(A(2), A(3), A(4)); put(2, 1, b2); put(1, 3, b2)
          val b3 = avg3(A(3), A(4), A(5)); put(3, 1, b3); put(2, 3, b3)
          put(3, 2, avg3(A(4), A(5), A(6)))
          put(3, 3, avg3(A(5), A(6), A(7)))
        case 8 => // B_HD (horizontal-down)
          val a0 = avg2(L(0), tl); put(0, 0, a0); put(2, 1, a0)
          val a1 = avg2(L(1), L(0)); put(0, 1, a1); put(2, 2, a1)
          val a2 = avg2(L(2), L(1)); put(0, 2, a2); put(2, 3, a2)
          put(0, 3, avg2(L(3), L(2)))
          put(3, 0, avg3(A(0), A(1), A(2)))
          put(2, 0, avg3(tl, A(0), A(1)))
          val b0 = avg3(L(0), tl, A(0)); put(1, 0, b0); put(3, 1, b0)
          val b1 = avg3(tl, L(0), L(1)); put(1, 1, b1); put(3, 2, b1)
          val b2 = avg3(L(0), L(1), L(2)); put(1, 2, b2); put(3, 3, b2)
          put(1, 3, avg3(L(1), L(2), L(3)))
        case _ => // B_HU (horizontal-up)
          put(0, 0, avg2(L(0), L(1)))
          val a0 = avg2(L(1), L(2)); put(2, 0, a0); put(0, 1, a0)
          val a1 = avg2(L(2), L(3)); put(2, 1, a1); put(0, 2, a1)
          put(1, 0, avg3(L(0), L(1), L(2)))
          val b0 = avg3(L(1), L(2), L(3)); put(3, 0, b0); put(1, 1, b0)
          val b1 = avg3(L(2), L(3), L(3)); put(3, 1, b1); put(1, 2, b1)
          val l3 = L(3)
          put(3, 2, l3); put(2, 2, l3)
          put(0, 3, l3); put(1, 3, l3); put(2, 3, l3); put(3, 3, l3)
      }
    }

    // ---- main MB loop ----
    mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftNz, 0.toByte)
      val bt = partBr(mbY % nParts)
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        val seg = mbSeg(mi) & 0xff
        val d = dq(seg)
        val ym = mbYMode(mi)
        val isB = ym == 4
        java.util.Arrays.fill(coeffs, 0)
        var nonzero = false
        val nzY = new Array[Int](16) // per-subblock "last coeff" counts
        val nzU = new Array[Int](4)
        val nzV = new Array[Int](4)
        if (mbSkip(mi)) {
          // no residuals; Y/UV nnz contexts reset; the Y2 context is
          // zeroed only for non-B MBs (a skipped B_PRED MB leaves the
          // neighbor's Y2 context untouched, as the reference does)
          var k = 0
          while (k < 8) { leftNz(k) = 0; topNz(mbX * 9 + k) = 0; k += 1 }
          if (!isB) { leftNz(8) = 0; topNz(mbX * 9 + 8) = 0 }
        } else {
          var first = 0
          if (!isB) {
            // Y2 (WHT) block, plane 1
            val ctx = leftNz(8) + topNz(mbX * 9 + 8)
            val nz = decodeBlock(bt, coeffs, 384, 1, ctx, 0, d(2), d(3))
            val got = if (nz > 0) 1 else 0
            leftNz(8) = got.toByte
            topNz(mbX * 9 + 8) = got.toByte
            if (nz > 0) nonzero = true
            // inverse WHT scatters into the 16 Y DC slots
            val dcs = new Array[Int](16)
            iwht4x4(coeffs, 384, dcs)
            var k = 0
            while (k < 16) { coeffs(k * 16) = dcs(k); k += 1 }
            first = 1
          }
          val yPlaneType = if (isB) 3 else 0
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3
            val sy = sb >> 2
            val l = if (sx == 0) leftNz(sy) else nzToCtx(nzY(sb - 1))
            val t = if (sy == 0) topNz(mbX * 9 + sx) else nzToCtx(nzY(sb - 4))
            val nz = decodeBlock(bt, coeffs, sb * 16, yPlaneType, l + t,
              first, d(0), d(1))
            nzY(sb) = nz
            if (nz > 0 || coeffs(sb * 16) != 0) nonzero = true
            if (sx == 3) leftNz(sy) = nzToCtx(nz).toByte
            if (sy == 3) topNz(mbX * 9 + sx) = nzToCtx(nz).toByte
            sb += 1
          }
          // U then V, plane 2
          var c = 0
          while (c < 2) {
            val plane = if (c == 0) U else V
            val nzArr = if (c == 0) nzU else nzV
            var sb2 = 0
            while (sb2 < 4) {
              val sx = sb2 & 1
              val sy = sb2 >> 1
              val lIdx = 4 + c * 2 + sy
              val tIdx = 4 + c * 2 + sx
              val l = if (sx == 0) leftNz(lIdx) else nzToCtx(nzArr(sb2 - 1))
              val t = if (sy == 0) topNz(mbX * 9 + tIdx) else nzToCtx(nzArr(sb2 - 2))
              val nz = decodeBlock(bt, coeffs, 256 + c * 64 + sb2 * 16, 2,
                l + t, 0, d(4), d(5))
              nzArr(sb2) = nz
              if (nz > 0) nonzero = true
              if (sx == 1) leftNz(lIdx) = nzToCtx(nz).toByte
              if (sy == 1) topNz(mbX * 9 + tIdx) = nzToCtx(nz).toByte
              sb2 += 1
            }
            c += 1
          }
        }
        hasCoeffs(mi) = nonzero

        // ---- reconstruction ----
        val x0 = mbX * 16
        val y0 = mbY * 16
        if (!isB) {
          predict16(ym, x0, y0, mbX, mbY)
        } else {
          // subblock loop with edge gathering
          val A = new Array[Int](8)
          val L = new Array[Int](4)
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3
            val sy = sb >> 2
            val bx = x0 + sx * 4
            val by = y0 + sy * 4
            // above pixels A(0..3)
            var i = 0
            while (i < 4) { A(i) = aboveY(bx + i, by); i += 1 }
            // above-right A(4..7): frozen to the MB's top row above-right
            // for lower subblock rows (the reference's replication rule)
            if (sx == 3) {
              if (mbY == 0) { A(4) = 127; A(5) = 127; A(6) = 127; A(7) = 127 }
              else if (mbX == mbW - 1) {
                val rep = Y((y0 - 1) * pw + x0 + 15) & 0xff
                A(4) = rep; A(5) = rep; A(6) = rep; A(7) = rep
              } else {
                var k = 0
                while (k < 4) { A(4 + k) = Y((y0 - 1) * pw + x0 + 16 + k) & 0xff; k += 1 }
              }
            } else {
              // above-right within the MB: the already-reconstructed
              // row above (or the MB-above row for sy == 0)
              var k = 0
              while (k < 4) { A(4 + k) = aboveY(bx + 4 + k, by); k += 1 }
            }
            i = 0
            while (i < 4) { L(i) = leftY(bx, by + i); i += 1 }
            val tl = cornerY(bx, by)
            predict4(mbBModes(mi * 16 + sb), bx, by, A, L, tl)
            // add residual for this subblock
            if (!mbSkip(mi)) idct4x4(coeffs, sb * 16, Y, by * pw + bx, pw)
            sb += 1
          }
        }
        val cx0 = mbX * 8
        val cy0 = mbY * 8
        predictChroma(mbUvMode(mi), U, cx0, cy0, mbX, mbY)
        predictChroma(mbUvMode(mi), V, cx0, cy0, mbX, mbY)
        if (!mbSkip(mi)) {
          if (!isB) {
            var sb = 0
            while (sb < 16) {
              val bx = x0 + (sb & 3) * 4
              val by = y0 + (sb >> 2) * 4
              idct4x4(coeffs, sb * 16, Y, by * pw + bx, pw)
              sb += 1
            }
          }
          var sb = 0
          while (sb < 4) {
            val bx = cx0 + (sb & 1) * 4
            val by = cy0 + (sb >> 1) * 4
            idct4x4(coeffs, 256 + sb * 16, U, by * cpw + bx, cpw)
            idct4x4(coeffs, 320 + sb * 16, V, by * cpw + bx, cpw)
            sb += 1
          }
        }
        mbX += 1
      }
      mbY += 1
    }

    // ---- loop filter (§15) ----
    if (applyFilter && filterLevel > 0) {
      loopFilter(frame, mbSeg, mbYMode, hasCoeffs, simpleFilter, filterLevel,
        sharpness, segmentEnabled, segAbsDelta, segFilter, lfDeltaEnabled,
        refLfDelta, modeLfDelta)
    }
    frame
  }

  @inline private def nzToCtx(nz: Int): Int = if (nz > 0) 1 else 0

  // ---- loop filter ---------------------------------------------------
  private def loopFilter(f: Frame, mbSeg: Array[Byte], mbYMode: Array[Byte],
      hasCoeffs: Array[Boolean], simple: Boolean, baseLevel: Int,
      sharpness: Int, segEnabled: Boolean, segAbs: Boolean,
      segFilter: Array[Int], lfDelta: Boolean, refDelta: Array[Int],
      modeDelta: Array[Int]): Unit = {
    val Y = f.y
    val U = f.u
    val V = f.v
    val pw = f.pw
    val cpw = f.cpw
    @inline def u2s(v: Int): Int = v - 128
    @inline def c128(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v
    @inline def s2u(v: Int): Byte = (c128(v) + 128).toByte

    // one 8-pixel segment filter on plane P at position `i` with pixel
    // step `st` (1 = vertical edge / horizontal filtering, stride =
    // horizontal edge); i points at q0.
    def filterSeg(p: Array[Byte], i: Int, st: Int, edge: Int, interior: Int,
        hevT: Int, mbEdge: Boolean): Unit = {
      val p3 = u2s(p(i - 4 * st) & 0xff)
      val p2 = u2s(p(i - 3 * st) & 0xff)
      val p1 = u2s(p(i - 2 * st) & 0xff)
      val p0 = u2s(p(i - st) & 0xff)
      val q0 = u2s(p(i) & 0xff)
      val q1 = u2s(p(i + st) & 0xff)
      val q2 = u2s(p(i + 2 * st) & 0xff)
      val q3 = u2s(p(i + 3 * st) & 0xff)
      val mask =
        (math.abs(p0 - q0) * 2 + (math.abs(p1 - q1) >> 1)) <= edge &&
          math.abs(p3 - p2) <= interior && math.abs(p2 - p1) <= interior &&
          math.abs(p1 - p0) <= interior && math.abs(q1 - q0) <= interior &&
          math.abs(q2 - q1) <= interior && math.abs(q3 - q2) <= interior
      if (!mask) return
      val hev = math.abs(p1 - p0) > hevT || math.abs(q1 - q0) > hevT
      if (mbEdge && !hev) {
        val w = c128(c128(p1 - q1) + 3 * (q0 - p0))
        val a0 = c128((27 * w + 63) >> 7)
        p(i) = s2u(q0 - a0)
        p(i - st) = s2u(p0 + a0)
        val a1 = c128((18 * w + 63) >> 7)
        p(i + st) = s2u(q1 - a1)
        p(i - 2 * st) = s2u(p1 + a1)
        val a2 = c128((9 * w + 63) >> 7)
        p(i + 2 * st) = s2u(q2 - a2)
        p(i - 3 * st) = s2u(p2 + a2)
      } else {
        val a = c128((if (hev) c128(p1 - q1) else 0) + 3 * (q0 - p0))
        val f1 = c128(a + 4) >> 3
        val f2 = c128(a + 3) >> 3
        val nq0 = q0 - f1
        val np0 = p0 + f2
        p(i) = s2u(nq0)
        p(i - st) = s2u(np0)
        if (!mbEdge && !hev) {
          val a2 = (f1 + 1) >> 1
          p(i + st) = s2u(q1 - a2)
          p(i - 2 * st) = s2u(p1 + a2)
        }
      }
    }

    def filterSegSimple(p: Array[Byte], i: Int, st: Int, edge: Int): Unit = {
      val p1 = u2s(p(i - 2 * st) & 0xff)
      val p0 = u2s(p(i - st) & 0xff)
      val q0 = u2s(p(i) & 0xff)
      val q1 = u2s(p(i + st) & 0xff)
      if ((math.abs(p0 - q0) * 2 + (math.abs(p1 - q1) >> 1)) <= edge) {
        val a = c128(c128(p1 - q1) + 3 * (q0 - p0))
        p(i) = s2u(q0 - (c128(a + 4) >> 3))
        p(i - st) = s2u(p0 + (c128(a + 3) >> 3))
      }
    }

    var mbY = 0
    while (mbY < f.mbH) {
      var mbX = 0
      while (mbX < f.mbW) {
        val mi = mbY * f.mbW + mbX
        val seg = mbSeg(mi) & 0xff
        var level =
          if (!segEnabled) baseLevel
          else if (segAbs) segFilter(seg)
          else baseLevel + segFilter(seg)
        if (lfDelta) {
          level += refDelta(0) // keyframe: INTRA_FRAME
          if (mbYMode(mi) == 4) level += modeDelta(0) // B_PRED
        }
        if (level < 0) level = 0
        if (level > 63) level = 63
        if (level > 0) {
          var interior = level
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            if (interior > 9 - sharpness) interior = 9 - sharpness
          }
          if (interior == 0) interior = 1
          val hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
          val mbLim = (level + 2) * 2 + interior
          val inLim = level * 2 + interior
          val skipInner = !hasCoeffs(mi) && mbYMode(mi) != 4
          val x0 = mbX * 16
          val y0 = mbY * 16
          val cx0 = mbX * 8
          val cy0 = mbY * 8
          if (simple) {
            if (mbX > 0) {
              var r = 0
              while (r < 16) { filterSegSimple(Y, (y0 + r) * pw + x0, 1, mbLim); r += 1 }
            }
            if (!skipInner) {
              var e = 4
              while (e < 16) {
                var r = 0
                while (r < 16) { filterSegSimple(Y, (y0 + r) * pw + x0 + e, 1, inLim); r += 1 }
                e += 4
              }
            }
            if (mbY > 0) {
              var c = 0
              while (c < 16) { filterSegSimple(Y, y0 * pw + x0 + c, pw, mbLim); c += 1 }
            }
            if (!skipInner) {
              var e = 4
              while (e < 16) {
                var c = 0
                while (c < 16) { filterSegSimple(Y, (y0 + e) * pw + x0 + c, pw, inLim); c += 1 }
                e += 4
              }
            }
          } else {
            if (mbX > 0) {
              var r = 0
              while (r < 16) { filterSeg(Y, (y0 + r) * pw + x0, 1, mbLim, interior, hevT, mbEdge = true); r += 1 }
              r = 0
              while (r < 8) {
                filterSeg(U, (cy0 + r) * cpw + cx0, 1, mbLim, interior, hevT, mbEdge = true)
                filterSeg(V, (cy0 + r) * cpw + cx0, 1, mbLim, interior, hevT, mbEdge = true)
                r += 1
              }
            }
            if (!skipInner) {
              var e = 4
              while (e < 16) {
                var r = 0
                while (r < 16) { filterSeg(Y, (y0 + r) * pw + x0 + e, 1, inLim, interior, hevT, mbEdge = false); r += 1 }
                e += 4
              }
              var r = 0
              while (r < 8) {
                filterSeg(U, (cy0 + r) * cpw + cx0 + 4, 1, inLim, interior, hevT, mbEdge = false)
                filterSeg(V, (cy0 + r) * cpw + cx0 + 4, 1, inLim, interior, hevT, mbEdge = false)
                r += 1
              }
            }
            if (mbY > 0) {
              var c = 0
              while (c < 16) { filterSeg(Y, y0 * pw + x0 + c, pw, mbLim, interior, hevT, mbEdge = true); c += 1 }
              c = 0
              while (c < 8) {
                filterSeg(U, cy0 * cpw + cx0 + c, cpw, mbLim, interior, hevT, mbEdge = true)
                filterSeg(V, cy0 * cpw + cx0 + c, cpw, mbLim, interior, hevT, mbEdge = true)
                c += 1
              }
            }
            if (!skipInner) {
              var e = 4
              while (e < 16) {
                var c = 0
                while (c < 16) { filterSeg(Y, (y0 + e) * pw + x0 + c, pw, inLim, interior, hevT, mbEdge = false); c += 1 }
                e += 4
              }
              var c = 0
              while (c < 8) {
                filterSeg(U, (cy0 + 4) * cpw + cx0 + c, cpw, inLim, interior, hevT, mbEdge = false)
                filterSeg(V, (cy0 + 4) * cpw + cx0 + c, cpw, inLim, interior, hevT, mbEdge = false)
                c += 1
              }
            }
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  // ---- YUV -> ARGB (libwebp fixed point + fancy upsampling) ----------
  @inline private def mulHi(v: Int, coeff: Int): Int = (v * coeff) >> 8
  @inline private def clip8(v: Int): Int =
    if ((v & ~16383) == 0) v >> 6 else if (v < 0) 0 else 255

  /** Full decode to (w, h, ARGB) matching WebPDecodeRGBA (fancy
    * upsampling; alpha 255).
    */
  def decodeArgb(bytes: Array[Byte], from: Int, to: Int): (Int, Int, Array[Int]) = {
    val f = decodeYuvPlanes(bytes, from, to, applyFilter = true)
    val w = f.w
    val h = f.h
    val cw = (w + 1) >> 1
    val ch = (h + 1) >> 1
    val out = new Array[Int](w * h)
    val Y = f.y
    val U = f.u
    val V = f.v
    val pw = f.pw
    val cpw = f.cpw
    var yy = 0
    while (yy < h) {
      val j0 = yy >> 1
      var j1 = j0 + (if ((yy & 1) == 1) 1 else -1)
      if (j1 < 0) j1 = 0
      if (j1 > ch - 1) j1 = ch - 1
      var xx = 0
      while (xx < w) {
        val i0 = xx >> 1
        var i1 = i0 + (if ((xx & 1) == 1) 1 else -1)
        if (i1 < 0) i1 = 0
        if (i1 > cw - 1) i1 = cw - 1
        val u = (9 * (U(j0 * cpw + i0) & 0xff) + 3 * (U(j0 * cpw + i1) & 0xff) +
          3 * (U(j1 * cpw + i0) & 0xff) + (U(j1 * cpw + i1) & 0xff) + 8) >> 4
        val v = (9 * (V(j0 * cpw + i0) & 0xff) + 3 * (V(j0 * cpw + i1) & 0xff) +
          3 * (V(j1 * cpw + i0) & 0xff) + (V(j1 * cpw + i1) & 0xff) + 8) >> 4
        val yv = Y(yy * pw + xx) & 0xff
        val r = clip8(mulHi(yv, 19077) + mulHi(v, 26149) - 14234)
        val g = clip8(mulHi(yv, 19077) - mulHi(u, 6419) - mulHi(v, 13320) + 8708)
        val b = clip8(mulHi(yv, 19077) + mulHi(u, 33050) - 17685)
        out(yy * w + xx) = 0xff000000 | (r << 16) | (g << 8) | b
        xx += 1
      }
      yy += 1
    }
    (w, h, out)
  }
}
