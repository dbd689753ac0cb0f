package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._

/** REAL pixel decode over baseline AND progressive JPEG (ITU-T T.81
  * sequential + progressive DCT, Huffman entropy coding), implemented
  * from the public specification: marker
  * walk, DQT quantization tables, DHT canonical Huffman tables
  * (MSB-first codes, decoded by the per-length count/first-code walk),
  * the interleaved MCU scan with per-component sampling factors
  * (4:4:4, 4:2:2, 4:2:0), DC prediction, AC run-length/EOB/ZRL coding,
  * byte-stuffing (FF 00) and restart markers (DRI + RST0-7 cadence
  * with DC-predictor resets), dequantization in zig-zag order, the
  * Loeffler-Ligtenberg-Moshovitz integer IDCT (13-bit fixed point,
  * two passes with the standard descale rounding — the construction
  * every mainstream decoder uses, published independently of any
  * implementation), and the CCIR 601 YCbCr→RGB conversion in EXACT
  * integer fixed point (16-bit constants, round-half-up shift) so the
  * conversion is reproducible arithmetic, not float folklore.
  *
  * Progressive (SOF2, r15): T.81 Annex G spectral selection +
  * successive approximation — per-component coefficient buffers
  * accumulate across scans (interleaved or single-component DC
  * first/refinement, single-component AC bands with EOB-run coding and
  * the correction-bit refinement algorithm), with between-scan
  * DHT/DQT/DRI redefinitions honored, then one dequant+IDCT pass at
  * EOI; pinned BIT-EXACT against the JDK's libjpeg-derived codec over
  * its standard 10-scan progression script.
  *
  * Scope: SOF0 + SOF2, 8-bit precision, 1 (grayscale) or 3
  * (YCbCr) components, sampling factors 1-2. Arithmetic coding,
  * 12-bit, and hierarchical modes are out of scope
  * → NULL ([[ImageDims]] still reports their dimensions). Subsampled
  * chroma upsamples by sample replication — the spec leaves
  * interpolation to the decoder; replication is the deterministic
  * choice, and the driver query uses 4:4:4 where no choice exists.
  *
  * STRICT probe: NULL for missing/duplicate SOI/SOF/SOS, a referenced
  * but undefined quant/Huffman table, an invalid Huffman code, a
  * coefficient run past index 63, bit exhaustion mid-block, a missing
  * or mis-sequenced restart marker, a missing EOI, or trailing bytes
  * after it.
  *
  * Returns struct<width, height, n_px, sum_r, sum_g, sum_b> — the
  * BmpPixels/PngPixels/GifPixels shape. Scale: map-only, codegen'd;
  * component planes are the only buffers, O(padded pixels), capped by
  * the named [[JpegPixels.MaxPixels]] guard before any allocation.
  */
case class JpegPixels(child: Expression) extends UnaryExpression {

  override def dataType: DataType = JpegPixels.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"JpegPixels requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    JpegPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JpegPixels.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): JpegPixels =
    copy(child = newChild)

  override def prettyName: String = "jpeg_pixels"
}

object JpegPixels {

  /** Work guard on declared width·height (~16 M pixels): component
    * planes are O(padded pixels), so size is policy-capped before any
    * allocation.
    */
  val MaxPixels: Long = 16L * 1024 * 1024

  val Schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_px", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  /** T.81 Figure A.6 zig-zag order: zigzag index → natural index. */
  private val ZigZag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Loeffler-Ligtenberg-Moshovitz IDCT constants: round(c · 2^13)
  private val CBits = 13
  private val P1Bits = 2
  private val F_0_298631336 = 2446L
  private val F_0_390180644 = 3196L
  private val F_0_541196100 = 4433L
  private val F_0_765366865 = 6270L
  private val F_0_899976223 = 7373L
  private val F_1_175875602 = 9633L
  private val F_1_501321110 = 12299L
  private val F_1_847759065 = 15137L
  private val F_1_961570560 = 16069L
  private val F_2_053119869 = 16819L
  private val F_2_562915447 = 20995L
  private val F_3_072711026 = 25172L

  private def descale(x: Long, n: Int): Long = (x + (1L << (n - 1))) >> n

  /** In-place 2-D LL&M integer IDCT of a dequantized 8×8 block
    * (natural order); output is the signed sample value (level shift
    * and clamping are the caller's).
    */
  private def idct(b: Array[Long]): Unit = {
    // pass 1: columns, scaled up by PASS1_BITS
    var c = 0
    while (c < 8) {
      val d0 = b(c); val d1 = b(c + 8); val d2 = b(c + 16); val d3 = b(c + 24)
      val d4 = b(c + 32); val d5 = b(c + 40); val d6 = b(c + 48)
      val d7 = b(c + 56)
      if (d1 == 0 && d2 == 0 && d3 == 0 && d4 == 0 && d5 == 0 && d6 == 0 &&
        d7 == 0) {
        val dc = d0 << P1Bits
        b(c) = dc; b(c + 8) = dc; b(c + 16) = dc; b(c + 24) = dc
        b(c + 32) = dc; b(c + 40) = dc; b(c + 48) = dc; b(c + 56) = dc
      } else {
        var z1 = (d2 + d6) * F_0_541196100
        val t2 = z1 - d6 * F_1_847759065
        val t3 = z1 + d2 * F_0_765366865
        val t0 = (d0 + d4) << CBits
        val t1 = (d0 - d4) << CBits
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = d7; var o1 = d5; var o2 = d3; var o3 = d1
        z1 = o0 + o3; var z2 = o1 + o2
        var z3 = o0 + o2; var z4 = o1 + o3
        val z5 = (z3 + z4) * F_1_175875602
        o0 *= F_0_298631336; o1 *= F_2_053119869
        o2 *= F_3_072711026; o3 *= F_1_501321110
        z1 = -z1 * F_0_899976223; z2 = -z2 * F_2_562915447
        z3 = -z3 * F_1_961570560; z4 = -z4 * F_0_390180644
        z3 += z5; z4 += z5
        val r0 = o0 + z1 + z3; val r1 = o1 + z2 + z4
        val r2 = o2 + z2 + z3; val r3 = o3 + z1 + z4
        b(c) = descale(t10 + r3, CBits - P1Bits)
        b(c + 56) = descale(t10 - r3, CBits - P1Bits)
        b(c + 8) = descale(t11 + r2, CBits - P1Bits)
        b(c + 48) = descale(t11 - r2, CBits - P1Bits)
        b(c + 16) = descale(t12 + r1, CBits - P1Bits)
        b(c + 40) = descale(t12 - r1, CBits - P1Bits)
        b(c + 24) = descale(t13 + r0, CBits - P1Bits)
        b(c + 32) = descale(t13 - r0, CBits - P1Bits)
      }
      c += 1
    }
    // pass 2: rows, final descale by CONST_BITS + PASS1_BITS + 3
    var r = 0
    while (r < 64) {
      val d0 = b(r); val d1 = b(r + 1); val d2 = b(r + 2); val d3 = b(r + 3)
      val d4 = b(r + 4); val d5 = b(r + 5); val d6 = b(r + 6); val d7 = b(r + 7)
      var z1 = (d2 + d6) * F_0_541196100
      val t2 = z1 - d6 * F_1_847759065
      val t3 = z1 + d2 * F_0_765366865
      val t0 = (d0 + d4) << CBits
      val t1 = (d0 - d4) << CBits
      val t10 = t0 + t3; val t13 = t0 - t3
      val t11 = t1 + t2; val t12 = t1 - t2
      var o0 = d7; var o1 = d5; var o2 = d3; var o3 = d1
      z1 = o0 + o3; var z2 = o1 + o2
      var z3 = o0 + o2; var z4 = o1 + o3
      val z5 = (z3 + z4) * F_1_175875602
      o0 *= F_0_298631336; o1 *= F_2_053119869
      o2 *= F_3_072711026; o3 *= F_1_501321110
      z1 = -z1 * F_0_899976223; z2 = -z2 * F_2_562915447
      z3 = -z3 * F_1_961570560; z4 = -z4 * F_0_390180644
      z3 += z5; z4 += z5
      val r0 = o0 + z1 + z3; val r1 = o1 + z2 + z4
      val r2 = o2 + z2 + z3; val r3 = o3 + z1 + z4
      b(r) = descale(t10 + r3, CBits + P1Bits + 3)
      b(r + 7) = descale(t10 - r3, CBits + P1Bits + 3)
      b(r + 1) = descale(t11 + r2, CBits + P1Bits + 3)
      b(r + 6) = descale(t11 - r2, CBits + P1Bits + 3)
      b(r + 2) = descale(t12 + r1, CBits + P1Bits + 3)
      b(r + 5) = descale(t12 - r1, CBits + P1Bits + 3)
      b(r + 3) = descale(t13 + r0, CBits + P1Bits + 3)
      b(r + 4) = descale(t13 - r0, CBits + P1Bits + 3)
      r += 8
    }
  }

  /** Canonical JPEG Huffman table (T.81 Annex C): per-length counts +
    * symbols in DHT order; decode is the MSB-first per-length
    * count/first-code walk (the Inflate discipline, other bit order).
    */
  private final class JHuff(val counts: Array[Int], val symbols: Array[Byte]) {
    var valid = true
    private var total = 0
    private var left = 1
    private var l = 1
    while (l <= 16) {
      left <<= 1
      left -= counts(l)
      if (left < 0) valid = false
      total += counts(l)
      l += 1
    }
    if (symbols.length != total) valid = false
  }

  private final class Component {
    var id = 0
    var h = 0
    var v = 0
    var tq = 0
    var td = 0
    var ta = 0
    var pred = 0
    var dcSeen = false // progressive: this component's DC scan arrived
    var plane: Array[Byte] = null
    var planeW = 0
    var planeH = 0
    // progressive state: per-block coefficient store (zigzag index
    // order), the non-interleaved block grid, and the storage grid
    var coefs: Array[Int] = null
    var bw = 0
    var bh = 0
    var blocksW = 0
  }

  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    if (n < 4) return null
    if (bytes(0) != 0xff.toByte || bytes(1) != 0xd8.toByte) return null

    val qt = new Array[Array[Int]](4)
    val dcT = new Array[JHuff](4)
    val acT = new Array[JHuff](4)
    var width = 0
    var height = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    var sosAt = -1
    var progressive = false

    def u16(i: Int): Int =
      ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)

    // --- marker walk to SOS ---
    var p = 2
    while (sosAt < 0) {
      if (p + 4 > n) return null
      if (bytes(p) != 0xff.toByte) return null
      val m = bytes(p + 1) & 0xff
      if (m == 0xff) { p += 1 } // fill bytes allowed before a marker
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2 // standalone
      else {
        val len = u16(p + 2)
        if (len < 2 || p + 2 + len > n) return null
        val seg = p + 4
        val segEnd = p + 2 + len
        m match {
          case 0xdb => // DQT: one or more tables
            var q = seg
            while (q < segEnd) {
              val pq = (bytes(q) & 0xff) >> 4
              val tq = bytes(q) & 0x0f
              if (pq != 0 || tq > 3) return null // 8-bit tables only
              if (q + 65 > segEnd) return null
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) { tab(k) = bytes(q + 1 + k) & 0xff; k += 1 }
              qt(tq) = tab
              q += 65
            }
            if (q != segEnd) return null
          case 0xc4 => // DHT: one or more tables
            var q = seg
            while (q < segEnd) {
              val tc = (bytes(q) & 0xff) >> 4
              val th = bytes(q) & 0x0f
              if (tc > 1 || th > 3) return null
              if (q + 17 > segEnd) return null
              val counts = new Array[Int](17)
              var total = 0
              var k = 1
              while (k <= 16) {
                counts(k) = bytes(q + k) & 0xff
                total += counts(k)
                k += 1
              }
              if (q + 17 + total > segEnd) return null
              val syms = java.util.Arrays.copyOfRange(bytes, q + 17,
                q + 17 + total)
              val h = new JHuff(counts, syms)
              if (!h.valid) return null
              if (tc == 0) dcT(th) = h else acT(th) = h
              q += 17 + total
            }
            if (q != segEnd) return null
          case 0xc0 => // SOF0 baseline
            if (comps != null) return null
            if (len < 8) return null
            val prec = bytes(seg) & 0xff
            height = u16(seg + 1)
            width = u16(seg + 3)
            val nc = bytes(seg + 5) & 0xff
            if (prec != 8 || width < 1 || height < 1) return null
            if (nc != 1 && nc != 3) return null
            if (len != 8 + 3 * nc) return null
            if (width.toLong * height > MaxPixels) return null
            comps = Array.fill(nc)(new Component)
            var k = 0
            while (k < nc) {
              val c = comps(k)
              c.id = bytes(seg + 6 + 3 * k) & 0xff
              val hv = bytes(seg + 7 + 3 * k) & 0xff
              c.h = hv >> 4
              c.v = hv & 0x0f
              c.tq = bytes(seg + 8 + 3 * k) & 0xff
              if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3)
                return null
              k += 1
            }
          case 0xc2 => // SOF2 progressive: same frame header grammar
            if (comps != null) return null
            if (len < 8) return null
            val prec = bytes(seg) & 0xff
            height = u16(seg + 1)
            width = u16(seg + 3)
            val nc = bytes(seg + 5) & 0xff
            if (prec != 8 || width < 1 || height < 1) return null
            if (nc != 1 && nc != 3) return null
            if (len != 8 + 3 * nc) return null
            if (width.toLong * height > MaxPixels) return null
            progressive = true
            comps = Array.fill(nc)(new Component)
            var k = 0
            while (k < nc) {
              val c = comps(k)
              c.id = bytes(seg + 6 + 3 * k) & 0xff
              val hv = bytes(seg + 7 + 3 * k) & 0xff
              c.h = hv >> 4
              c.v = hv & 0x0f
              c.tq = bytes(seg + 8 + 3 * k) & 0xff
              if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3)
                return null
              k += 1
            }
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
              0xcb | 0xcd | 0xce | 0xcf =>
            return null // other frame types: out of scope
          case 0xdd => // DRI
            if (len != 4) return null
            restartInterval = u16(seg)
          case 0xda => // SOS
            if (comps == null) return null
            if (progressive)
              return parseProgressive(bytes, p, qt, dcT, acT, comps,
                width, height, restartInterval)
            val ns = bytes(seg) & 0xff
            if (ns != comps.length || len != 6 + 2 * ns) return null
            var k = 0
            while (k < ns) {
              val cid = bytes(seg + 1 + 2 * k) & 0xff
              val tt = bytes(seg + 2 + 2 * k) & 0xff
              // scan components must appear in frame order (interleaved)
              if (comps(k).id != cid) return null
              comps(k).td = tt >> 4
              comps(k).ta = tt & 0x0f
              if (comps(k).td > 3 || comps(k).ta > 3) return null
              k += 1
            }
            // Ss=0, Se=63, AhAl=0 for baseline
            if ((bytes(segEnd - 3) & 0xff) != 0 ||
              (bytes(segEnd - 2) & 0xff) != 63 ||
              (bytes(segEnd - 1) & 0xff) != 0) return null
            sosAt = segEnd
          case 0xd9 => return null // EOI before any scan
          case _ => () // APPn/COM/other tables: skip
        }
        if (sosAt < 0) p = segEnd
      }
    }

    // tables referenced by the scan must exist
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      if (qt(c.tq) == null || dcT(c.td) == null || acT(c.ta) == null)
        return null
      ci += 1
    }

    var hMax = 1
    var vMax = 1
    comps.foreach { c =>
      if (c.h > hMax) hMax = c.h
      if (c.v > vMax) vMax = c.v
    }
    // grayscale must be 1x1 (no meaning to subsampling a single comp)
    if (comps.length == 1 && (comps(0).h != 1 || comps(0).v != 1))
      return null
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    comps.foreach { c =>
      c.planeW = mcusX * 8 * c.h
      c.planeH = mcusY * 8 * c.v
      c.plane = new Array[Byte](c.planeW * c.planeH)
    }

    // --- entropy-coded segment: MSB-first bits with FF00 stuffing ---
    var bp = sosAt // byte position
    var bitBuf = 0
    var bitCnt = 0
    var hitMarker = false

    def fillBit(): Int = {
      if (bitCnt == 0) {
        if (hitMarker) return -1
        if (bp >= n) return -1
        var b = bytes(bp) & 0xff
        bp += 1
        if (b == 0xff) {
          if (bp >= n) return -1
          val next = bytes(bp) & 0xff
          if (next == 0x00) bp += 1 // stuffed FF
          else { hitMarker = true; bp -= 1; return -1 }
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def decodeHuff(h: JHuff): Int = {
      var code = 0
      var first = 0
      var index = 0
      var l = 1
      while (l <= 16) {
        val bit = fillBit()
        if (bit < 0) return -1
        code |= bit
        val cnt = h.counts(l)
        if (code - first < cnt) return h.symbols(index + code - first) & 0xff
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        l += 1
      }
      -1
    }

    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0
      var i = 0
      while (i < s) {
        val bit = fillBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }

    val block = new Array[Long](64)

    def decodeBlock(c: Component, bx: Int, by: Int): Boolean = {
      java.util.Arrays.fill(block, 0L)
      val q = qt(c.tq)
      val t = decodeHuff(dcT(c.td))
      if (t < 0 || t > 15) return false
      val diff = receiveExtend(t)
      if (diff == Int.MinValue) return false
      c.pred += diff
      block(0) = c.pred.toLong * q(0)
      var k = 1
      while (k < 64) {
        val rs = decodeHuff(acT(c.ta))
        if (rs < 0) return false
        val r = rs >> 4
        val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += r
          if (k > 63) return false
          val v = receiveExtend(s)
          if (v == Int.MinValue) return false
          block(ZigZag(k)) = v.toLong * q(k)
          k += 1
        }
      }
      idct(block)
      // level shift + clamp into the component plane
      val x0 = bx * 8
      val y0 = by * 8
      var yy = 0
      while (yy < 8) {
        var xx = 0
        val row = (y0 + yy) * c.planeW + x0
        while (xx < 8) {
          var v = block(yy * 8 + xx) + 128
          if (v < 0) v = 0
          if (v > 255) v = 255
          c.plane(row + xx) = v.toByte
          xx += 1
        }
        yy += 1
      }
      true
    }

    // --- MCU loop with the restart cadence ---
    var rstIdx = 0
    var mcusSinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          // align, expect RSTn in sequence, reset predictors
          bitCnt = 0
          if (!hitMarker) {
            if (bp + 2 > n || bytes(bp) != 0xff.toByte) return null
          }
          if (bp + 2 > n) return null
          val m = bytes(bp + 1) & 0xff
          if (m != 0xd0 + rstIdx) return null
          bp += 2
          hitMarker = false
          rstIdx = (rstIdx + 1) & 7
          mcusSinceRestart = 0
          comps.foreach(_.pred = 0)
        }
        var k = 0
        while (k < comps.length) {
          val c = comps(k)
          var v = 0
          while (v < c.v) {
            var h = 0
            while (h < c.h) {
              if (!decodeBlock(c, mx * c.h + h, my * c.v + v)) return null
              h += 1
            }
            v += 1
          }
          k += 1
        }
        mcusSinceRestart += 1
        mx += 1
      }
      my += 1
    }

    // --- after the scan: padding bits, then EOI, then nothing ---
    bitCnt = 0
    if (!hitMarker) {
      // skip up to one padding byte boundary: next must be FF D9
      if (bp + 2 > n) return null
    }
    if (bp + 2 > n || bytes(bp) != 0xff.toByte ||
      (bytes(bp + 1) & 0xff) != 0xd9) return null
    if (bp + 2 != n) return null

    emitSums(comps, width, height, hMax, vMax)
  }

  /** Progressive (SOF2) decode — T.81 Annex G spectral selection +
    * successive approximation: coefficients accumulate across scans in
    * per-component zigzag-order buffers; DC scans (interleaved MCU
    * order or single-component) carry diffs shifted by Al, then one
    * refinement bit per block; AC scans are single-component in block
    * raster order with EOB-run coding, and AC refinement applies the
    * correction-bit algorithm (new coefficients placed where the
    * zero-history run expires, ±1<<Al nudges on already-nonzero ones).
    * Dequantization and the shared LL&M IDCT run once at EOI. Entered
    * from [[parse]] at the first SOS; takes over the marker walk
    * (DHT/DQT/DRI redefinitions between scans honored).
    */
  private def parseProgressive(bytes: Array[Byte], sosMarker: Int,
      qt: Array[Array[Int]], dcT: Array[JHuff], acT: Array[JHuff],
      comps: Array[Component], width: Int, height: Int,
      restartInterval0: Int): InternalRow = {
    val n = bytes.length
    var restartInterval = restartInterval0
    // T.81-conformance latch: a quant table is frozen once any scan has
    // referenced it — libjpeg/the JDK latch tables at the component's
    // first scan, so a mid-frame redefinition must NULL, not silently
    // dequantize differently at EOI
    val qtUsed = new Array[Boolean](4)
    def u16(i: Int): Int =
      ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)

    var hMax = 1
    var vMax = 1
    comps.foreach { c =>
      if (c.h > hMax) hMax = c.h
      if (c.v > vMax) vMax = c.v
    }
    if (comps.length == 1 && (comps(0).h != 1 || comps(0).v != 1))
      return null
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * 8 * c.h
      c.planeH = mcusY * 8 * c.v
      c.plane = new Array[Byte](c.planeW * c.planeH)
      val compW = (width * c.h + hMax - 1) / hMax
      val compH = (height * c.v + vMax - 1) / vMax
      c.bw = (compW + 7) / 8
      c.bh = (compH + 7) / 8
      c.blocksW = mcusX * c.h
      c.coefs = new Array[Int](c.blocksW * (mcusY * c.v) * 64)
    }

    // ---- bit reader over an entropy-coded segment ----
    var bp = 0
    var bitBuf = 0
    var bitCnt = 0
    var hitMarker = false
    def fillBit(): Int = {
      if (bitCnt == 0) {
        if (hitMarker || bp >= n) return -1
        val b = bytes(bp) & 0xff
        bp += 1
        if (b == 0xff) {
          if (bp >= n) return -1
          if ((bytes(bp) & 0xff) == 0x00) bp += 1
          else { hitMarker = true; bp -= 1; return -1 }
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def decodeHuff(h: JHuff): Int = {
      var code = 0
      var first = 0
      var index = 0
      var l = 1
      while (l <= 16) {
        val bit = fillBit()
        if (bit < 0) return -1
        code |= bit
        val cnt = h.counts(l)
        if (code - first < cnt) return h.symbols(index + code - first) & 0xff
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        l += 1
      }
      -1
    }
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0
      var i = 0
      while (i < s) {
        val bit = fillBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
    def receive(r: Int): Int = {
      var v = 0
      var i = 0
      while (i < r) {
        val bit = fillBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      v
    }

    var eobrun = 0

    // ---- per-scan decode; returns false on malformation ----
    def decodeScan(scanComps: Array[Component], ss: Int, se: Int,
        ah: Int, al: Int): Boolean = {
      eobrun = 0
      scanComps.foreach(_.pred = 0)
      var rstIdx = 0
      var unitsSince = 0
      def restartCheck(): Boolean = {
        if (restartInterval > 0 && unitsSince == restartInterval) {
          bitCnt = 0
          if (bp + 2 > n || bytes(bp) != 0xff.toByte ||
            (bytes(bp + 1) & 0xff) != 0xd0 + rstIdx) return false
          bp += 2
          hitMarker = false
          rstIdx = (rstIdx + 1) & 7
          unitsSince = 0
          eobrun = 0
          scanComps.foreach(_.pred = 0)
        }
        true
      }

      def dcUnit(c: Component, off: Int): Boolean = {
        if (ah == 0) {
          val t = decodeHuff(dcT(c.td))
          if (t < 0 || t > 15) return false
          val diff = receiveExtend(t)
          if (diff == Int.MinValue) return false
          c.pred += diff
          c.coefs(off) = c.pred << al
        } else {
          val bit = fillBit()
          if (bit < 0) return false
          if (bit == 1) c.coefs(off) |= 1 << al
        }
        true
      }

      def acFirstUnit(c: Component, off: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = decodeHuff(acT(c.ta))
          if (rs < 0) return false
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16
            else {
              val extra = receive(r)
              if (extra == Int.MinValue) return false
              eobrun = (1 << r) - 1 + extra
              return true
            }
          } else {
            k += r
            if (k > se) return false
            val v = receiveExtend(s)
            if (v == Int.MinValue) return false
            c.coefs(off + k) = v << al
            k += 1
          }
        }
        true
      }

      def acRefineUnit(c: Component, off: Int): Boolean = {
        val p1 = 1 << al
        val m1 = -1 << al
        var k = ss
        if (eobrun == 0) {
          var break = false
          while (k <= se && !break) {
            val rs = decodeHuff(acT(c.ta))
            if (rs < 0) return false
            var r = rs >> 4
            val s = rs & 0x0f
            var newval = 0
            if (s != 0) {
              if (s != 1) return false
              val bit = fillBit()
              if (bit < 0) return false
              newval = if (bit == 1) p1 else m1
            } else if (r != 15) {
              val extra = receive(r)
              if (extra == Int.MinValue) return false
              eobrun = (1 << r) + extra
              break = true
            }
            if (!break) {
              // advance over r zero-HISTORY coeffs, correcting nonzero
              var placedOrEnd = false
              while (!placedOrEnd && k <= se) {
                val cur = c.coefs(off + k)
                if (cur != 0) {
                  val bit = fillBit()
                  if (bit < 0) return false
                  if (bit == 1 && (cur & p1) == 0)
                    c.coefs(off + k) = cur + (if (cur >= 0) p1 else m1)
                  k += 1
                } else {
                  if (r == 0) placedOrEnd = true
                  else { r -= 1; k += 1 }
                }
              }
              if (newval != 0) {
                if (k > se) return false
                c.coefs(off + k) = newval
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val cur = c.coefs(off + k)
            if (cur != 0) {
              val bit = fillBit()
              if (bit < 0) return false
              if (bit == 1 && (cur & p1) == 0)
                c.coefs(off + k) = cur + (if (cur >= 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
        true
      }

      if (ss == 0 && scanComps.length > 1) {
        // interleaved DC scan over the full MCU grid
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (!restartCheck()) return false
            var k = 0
            while (k < scanComps.length) {
              val c = scanComps(k)
              var v = 0
              while (v < c.v) {
                var h = 0
                while (h < c.h) {
                  val off =
                    ((my * c.v + v) * c.blocksW + mx * c.h + h) * 64
                  if (!dcUnit(c, off)) return false
                  h += 1
                }
                v += 1
              }
              k += 1
            }
            unitsSince += 1
            mx += 1
          }
          my += 1
        }
      } else {
        // single-component scan (DC or AC) in block raster order
        val c = scanComps(0)
        var by = 0
        while (by < c.bh) {
          var bx = 0
          while (bx < c.bw) {
            if (!restartCheck()) return false
            val off = (by * c.blocksW + bx) * 64
            val ok =
              if (ss == 0) dcUnit(c, off)
              else if (ah == 0) acFirstUnit(c, off)
              else acRefineUnit(c, off)
            if (!ok) return false
            unitsSince += 1
            bx += 1
          }
          by += 1
        }
      }
      true
    }

    // ---- marker loop from the first SOS to EOI ----
    var p = sosMarker
    var done = false
    while (!done) {
      if (p + 2 > n || bytes(p) != 0xff.toByte) return null
      val m = bytes(p + 1) & 0xff
      if (m == 0xff) p += 1 // fill byte
      else if (m == 0xd9) { done = true; p += 2 }
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) return null
      else {
        val len = u16(p + 2)
        if (len < 2 || p + 2 + len > n) return null
        val seg = p + 4
        val segEnd = p + 2 + len
        m match {
          case 0xc4 => // DHT between scans
            var q = seg
            while (q < segEnd) {
              val tc = (bytes(q) & 0xff) >> 4
              val th = bytes(q) & 0x0f
              if (tc > 1 || th > 3) return null
              if (q + 17 > segEnd) return null
              val counts = new Array[Int](17)
              var total = 0
              var k = 1
              while (k <= 16) {
                counts(k) = bytes(q + k) & 0xff
                total += counts(k)
                k += 1
              }
              if (q + 17 + total > segEnd) return null
              val syms = java.util.Arrays.copyOfRange(bytes, q + 17,
                q + 17 + total)
              val h = new JHuff(counts, syms)
              if (!h.valid) return null
              if (tc == 0) dcT(th) = h else acT(th) = h
              q += 17 + total
            }
            if (q != segEnd) return null
            p = segEnd
          case 0xdb => // DQT between scans: only tables no scan has
            var q = seg   // used yet may (re)define
            while (q < segEnd) {
              val pq = (bytes(q) & 0xff) >> 4
              val tq = bytes(q) & 0x0f
              if (pq != 0 || tq > 3) return null
              if (qtUsed(tq)) return null // frozen by a prior scan
              if (q + 65 > segEnd) return null
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) { tab(k) = bytes(q + 1 + k) & 0xff; k += 1 }
              qt(tq) = tab
              q += 65
            }
            if (q != segEnd) return null
            p = segEnd
          case 0xdd =>
            if (len != 4) return null
            restartInterval = u16(seg)
            p = segEnd
          case 0xda => // a scan
            val ns = bytes(seg) & 0xff
            if (ns < 1 || ns > comps.length || len != 6 + 2 * ns)
              return null
            val scanComps = new Array[Component](ns)
            var prevIdx = -1
            var k = 0
            while (k < ns) {
              val cid = bytes(seg + 1 + 2 * k) & 0xff
              val idx = comps.indexWhere(_.id == cid)
              if (idx <= prevIdx) return null // frame order, no dups
              prevIdx = idx
              val c = comps(idx)
              val tt = bytes(seg + 2 + 2 * k) & 0xff
              c.td = tt >> 4
              c.ta = tt & 0x0f
              if (c.td > 3 || c.ta > 3) return null
              scanComps(k) = c
              k += 1
            }
            val ss = bytes(segEnd - 3) & 0xff
            val se = bytes(segEnd - 2) & 0xff
            val ahal = bytes(segEnd - 1) & 0xff
            val ah = ahal >> 4
            val al = ahal & 0x0f
            if (ss > 63 || se > 63 || se < ss || al > 13) return null
            if (ss == 0 && se != 0) return null // DC scans cover only 0
            if (ss > 0 && ns != 1) return null // AC scans: one component
            if (ah != 0 && ah != al + 1) return null
            // table presence: DC-first needs a DC table; AC needs AC
            k = 0
            while (k < ns) {
              val c = scanComps(k)
              if (ss == 0 && ah == 0 && dcT(c.td) == null) return null
              if (ss > 0 && acT(c.ta) == null) return null
              if (qt(c.tq) == null) return null
              // scan-order discipline (Annex G): nothing precedes the
              // component's DC-first scan — not AC, not refinement
              if ((ss > 0 || ah != 0) && !c.dcSeen) return null
              qtUsed(c.tq) = true
              if (ss == 0) c.dcSeen = true
              k += 1
            }
            bp = segEnd
            bitBuf = 0
            bitCnt = 0
            hitMarker = false
            if (!decodeScan(scanComps, ss, se, ah, al)) return null
            bitCnt = 0
            p = bp // positioned at the next marker (or its FF)
          case 0xc0 | 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 |
              0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return null // a second frame
          case _ => p = segEnd // APPn/COM
        }
      }
    }
    if (p != n) return null // trailing bytes after EOI

    // ---- dequantize + IDCT every covered block ----
    val block = new Array[Long](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = qt(c.tq)
      if (q == null) return null
      var by = 0
      while (by < c.bh) {
        var bx = 0
        while (bx < c.bw) {
          val off = (by * c.blocksW + bx) * 64
          var k = 0
          while (k < 64) {
            block(ZigZag(k)) = c.coefs(off + k).toLong * q(k)
            k += 1
          }
          idct(block)
          val x0 = bx * 8
          val y0 = by * 8
          var yy = 0
          while (yy < 8) {
            val row = (y0 + yy) * c.planeW + x0
            var xx = 0
            while (xx < 8) {
              var v = block(yy * 8 + xx) + 128
              if (v < 0) v = 0
              if (v > 255) v = 255
              c.plane(row + xx) = v.toByte
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    emitSums(comps, width, height, hMax, vMax)
  }

  /** Color conversion + channel sums (CCIR 601 integer form) — shared
    * by the baseline and progressive paths.
    */
  private def emitSums(comps: Array[Component], width: Int, height: Int,
      hMax: Int, vMax: Int): InternalRow = {
    var sumR = 0L
    var sumG = 0L
    var sumB = 0L
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        val row = y * c.planeW
        var x = 0
        while (x < width) {
          val v = (c.plane(row + x) & 0xff).toLong
          sumR += v; sumG += v; sumB += v
          x += 1
        }
        y += 1
      }
    } else {
      val yc = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = yc.plane((y * yc.v / vMax) * yc.planeW + x * yc.h / hMax) & 0xff
          val cbv = (cb.plane((y * cb.v / vMax) * cb.planeW + x * cb.h / hMax) & 0xff) - 128
          val crv = (cr.plane((y * cr.v / vMax) * cr.planeW + x * cr.h / hMax) & 0xff) - 128
          var r = ((yv.toLong << 16) + 91881L * crv + 32768L) >> 16
          var g = ((yv.toLong << 16) - 22554L * cbv - 46802L * crv + 32768L) >> 16
          var b = ((yv.toLong << 16) + 116130L * cbv + 32768L) >> 16
          if (r < 0) r = 0; if (r > 255) r = 255
          if (g < 0) g = 0; if (g > 255) g = 255
          if (b < 0) b = 0; if (b > 255) b = 255
          sumR += r; sumG += g; sumB += b
          x += 1
        }
        y += 1
      }
    }
    new GenericInternalRow(Array[Any](width, height,
      width.toLong * height, sumR, sumG, sumB))
  }

  def jpeg_pixels(c: Column): Column =
    GraftColumnBridge.column(JpegPixels(GraftColumnBridge.expression(c)))
}
