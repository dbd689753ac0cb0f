package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** WebP pixel decode — BOTH coding modes: lossless `VP8L` (the full
  * public "WebP Lossless Bitstream Specification", below) and lossy
  * `VP8 ` (the full RFC 6386 keyframe decoder in [[Vp8Decode]]:
  * boolean coder, intra prediction, iDCT/WHT, loop filter, fancy
  * upsampling + fixed-point YUV→RGB — pinned pixel-exact against
  * WebPDecodeRGBA across 20 feature-forcing vectors).
  *
  * Container: RIFF/WEBP chunk walk to the first `VP8L` or `VP8 `
  * chunk (a `VP8X` extended header is skipped and the scan
  * continues). VP8L payload: the 0x2F signature, then
  * a forward LSB-first bitstream holding 14-bit dims, the transform
  * list, and entropy-coded ARGB data.
  *
  * Bitstream machinery implemented in full:
  *  - canonical prefix codes (max length 15) in both the SIMPLE form
  *    (1–2 literal symbols) and the code-length-coded form with the
  *    19-symbol length alphabet, its fixed read order, repeat codes
  *    16/17/18, and the optional max_symbol cut; completeness is
  *    enforced by Kraft sum (single-symbol trees decode with 0 bits,
  *    as the reference table builder does);
  *  - META prefix codes: a subsampled entropy image whose
  *    (red<<8|green) selects one of N groups of 5 trees
  *    (green+length+cache, red, blue, alpha, distance);
  *  - COLOR CACHE (hash 0x1e35a7bd·argb >> (32−bits), inserted on
  *    literal and copied pixels);
  *  - LZ77 backward references: length/distance prefix values with
  *    extra bits, and the 120-entry plane-code neighborhood map
  *    (2-D (dx, dy) offsets folded onto the scanline order; the table
  *    is the spec's, extracted byte-for-byte from the reference
  *    libwebp and verified a permutation of the 8×16 grid);
  *  - the four TRANSFORMS, applied inverse in reverse read order:
  *    PREDICTOR (all 14 modes incl. Select and the clamped
  *    add/subtract pair, block grid from a sub-image), COLOR
  *    (per-block signed 3.5 fixed-point green→red/green→blue/red→blue
  *    deltas), SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded
  *    palette, zero-filled 256-entry lookup like the reference, and
  *    sub-byte pixel BUNDLING for ≤16-color palettes).
  *
  * Returns the family struct <width, height, n_px, sum_r, sum_g,
  * sum_b> (alpha participates in decode, sums stay RGB like the
  * BMP/PNG/GIF/JPEG siblings). Pinned PIXEL-EXACT against the real
  * libwebp encoder AND decoder (driven via ctypes offline; hex
  * resources in WebpPixelsSpec) across flat, gradient, palette,
  * noise, stripe, and photo-like images — plus hand-mutated NULLs.
  *
  * Scale shape: map-only codegen'd expression like the rest of the
  * codec family; output bounded by the named [[WebpPixels.MaxPixels]]
  * guard (w·h checked BEFORE any allocation), decode work O(pixels +
  * payload bits), every read bounds-checked, all-or-nothing NULL.
  */
case class WebpPixels(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpPixels.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WebpPixels requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WebpPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WebpPixels.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : WebpPixels = copy(child = newChild)

  override def prettyName: String = "webp_pixels"
}

object WebpPixels {

  /** Pixel-count guard: 16M px × 4 B/px = the family's 64 MB policy. */
  val MaxPixels: Long = 16L * 1024 * 1024

  private[functions] object Corrupt extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Corrupt

  // ---- forward LSB-first bitstream --------------------------------
  private final class Bits(src: Array[Byte], from: Int, to: Int) {
    private var pos = from.toLong * 8
    private val limit = to.toLong * 8

    def bit(): Int = {
      if (pos >= limit) bad()
      val v = (src((pos >> 3).toInt) >> (pos & 7).toInt) & 1
      pos += 1
      v
    }

    def bits(k: Int): Int = {
      var v = 0
      var j = 0
      while (j < k) { v |= bit() << j; j += 1 }
      v
    }
  }

  // ---- canonical prefix code (max length 15) -----------------------
  /** kind 0: canonical; kind 1: single symbol (0 bits); kind 2: two
    * symbols (1 bit).
    */
  private final class Huff private (kind: Int, s0: Int, s1: Int,
      count: Array[Int], syms: Array[Int]) {
    def decode(b: Bits): Int = kind match {
      case 1 => s0
      case 2 => if (b.bit() == 0) s0 else s1
      case _ =>
        var code = 0
        var first = 0
        var index = 0
        var len = 1
        while (len <= 15) {
          code = (code << 1) | b.bit()
          val c = count(len)
          if (code - first < c) return syms(index + code - first)
          index += c
          first = (first + c) << 1
          len += 1
        }
        bad()
    }
  }

  private object Huff {
    def simple1(s0: Int): Huff = new Huff(1, s0, 0, null, null)
    def simple2(s0: Int, s1: Int): Huff = new Huff(2, s0, s1, null, null)

    def fromLengths(lengths: Array[Int]): Huff = {
      var nUsed = 0
      var only = -1
      var kraft = 0L
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > 15) bad()
        if (l > 0) {
          nUsed += 1
          only = i
          kraft += 1L << (15 - l)
        }
        i += 1
      }
      if (nUsed == 0) bad()
      if (nUsed == 1) return simple1(only) // reference builder: 0-bit root
      if (kraft != (1L << 15)) bad() // incomplete or over-subscribed
      val count = new Array[Int](16)
      i = 0
      while (i < lengths.length) {
        count(lengths(i)) += 1
        i += 1
      }
      count(0) = 0
      val offs = new Array[Int](16)
      var acc = 0
      var l = 1
      while (l <= 15) { offs(l) = acc; acc += count(l); l += 1 }
      val syms = new Array[Int](acc)
      i = 0
      while (i < lengths.length) {
        val len = lengths(i)
        if (len > 0) { syms(offs(len)) = i; offs(len) += 1 }
        i += 1
      }
      new Huff(0, 0, 0, count, syms)
    }
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readPrefixCode(b: Bits, alphabetSize: Int): Huff = {
    if (b.bit() == 1) { // simple code: 1-2 literal symbols
      val nsym = b.bit() + 1
      val first8 = b.bit()
      val s0 = if (first8 == 1) b.bits(8) else b.bits(1)
      if (s0 >= alphabetSize) bad()
      if (nsym == 2) {
        val s1 = b.bits(8)
        if (s1 >= alphabetSize) bad()
        Huff.simple2(s0, s1)
      } else Huff.simple1(s0)
    } else {
      val numCl = 4 + b.bits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = b.bits(3); i += 1 }
      val clCode = Huff.fromLengths(clLens)
      val lengths = new Array[Int](alphabetSize)
      var budget =
        if (b.bit() == 1) {
          val lengthNBits = 2 + 2 * b.bits(3)
          val m = 2 + b.bits(lengthNBits)
          if (m > alphabetSize) alphabetSize else m
        } else alphabetSize
      var prevLen = 8
      i = 0
      while (i < alphabetSize && budget > 0) {
        budget -= 1
        val c = clCode.decode(b)
        if (c < 16) {
          lengths(i) = c
          i += 1
          if (c != 0) prevLen = c
        } else {
          val (rep, fill) = c match {
            case 16 => (3 + b.bits(2), prevLen)
            case 17 => (3 + b.bits(3), 0)
            case _ => (11 + b.bits(7), 0)
          }
          if (i + rep > alphabetSize) bad()
          var j = 0
          while (j < rep) { lengths(i) = fill; i += 1; j += 1 }
        }
      }
      Huff.fromLengths(lengths)
    }
  }

  // ---- LZ77 value coding -------------------------------------------
  /** Length/distance prefix value (spec §"LZ77 backward reference"). */
  private def prefixValue(symbol: Int, b: Bits): Int = {
    if (symbol < 4) return symbol + 1
    val extraBits = (symbol - 2) >> 1
    val offset = (2 + (symbol & 1)) << extraBits
    offset + b.bits(extraBits) + 1
  }

  /** The 120 plane codes' (dx, dy) neighborhood, packed dy·16+(8−dx) —
    * extracted byte-for-byte from the reference libwebp's
    * plane_to_code_lut (inverted) and verified a permutation of the
    * 8×16 grid. Entry for plane code c is DistIdx(c−1).
    */
  private val DistIdx: Array[Int] = Array(
    24, 7, 23, 25, 40, 6, 39, 41, 22, 26, 38, 42, 56, 5, 55, 57, 21, 27,
    54, 58, 37, 43, 72, 4, 71, 73, 20, 28, 53, 59, 70, 74, 36, 44, 88,
    69, 75, 52, 60, 3, 87, 89, 19, 29, 86, 90, 35, 45, 68, 76, 85, 91,
    51, 61, 104, 2, 103, 105, 18, 30, 102, 106, 34, 46, 84, 92, 67, 77,
    101, 107, 50, 62, 120, 1, 119, 121, 83, 93, 17, 31, 100, 108, 66,
    78, 118, 122, 33, 47, 117, 123, 49, 63, 99, 109, 82, 94, 0, 116,
    124, 65, 79, 16, 32, 98, 110, 48, 115, 125, 81, 95, 64, 114, 126,
    97, 111, 80, 113, 127, 96, 112)

  private def planeCodeToDistance(xsize: Int, planeCode: Int): Int = {
    if (planeCode > 120) planeCode - 120
    else {
      val packed = DistIdx(planeCode - 1)
      val dy = packed >> 4
      val dx = 8 - (packed & 0xf)
      val d = dy * xsize + dx
      if (d >= 1) d else 1
    }
  }

  // ---- entropy-coded ARGB image ------------------------------------
  private def divUp(a: Int, shift: Int): Int = (a + (1 << shift) - 1) >> shift

  /** Decode one spatially-coded image. `allowMeta` is true only for the
    * level-0 (main) image.
    */
  private def decodeEntropyImage(b: Bits, xsize: Int, ysize: Int,
      allowMeta: Boolean): Array[Int] = {
    if (xsize <= 0 || ysize <= 0) bad()
    val nPix = xsize.toLong * ysize
    if (nPix > MaxPixels) bad()

    val cacheBits = if (b.bit() == 1) b.bits(4) else 0
    if (cacheBits > 11) bad()
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null

    var metaImg: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (allowMeta && b.bit() == 1) {
      metaBits = b.bits(3) + 2
      metaW = divUp(xsize, metaBits)
      val metaH = divUp(ysize, metaBits)
      metaImg = decodeEntropyImage(b, metaW, metaH, allowMeta = false)
      var i = 0
      var mx = 0
      while (i < metaImg.length) {
        val g = (metaImg(i) >> 8) & 0xffff
        if (g > mx) mx = g
        i += 1
      }
      numGroups = mx + 1
    }

    val greenAlpha = 256 + 24 + cacheSize
    val groups = new Array[Array[Huff]](numGroups)
    var gi = 0
    while (gi < numGroups) {
      groups(gi) = Array(
        readPrefixCode(b, greenAlpha),
        readPrefixCode(b, 256),
        readPrefixCode(b, 256),
        readPrefixCode(b, 256),
        readPrefixCode(b, 40))
      gi += 1
    }

    val out = new Array[Int](nPix.toInt)
    var pos = 0
    var x = 0
    var y = 0
    val total = nPix.toInt

    def insert(px: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px

    var group = groups(0)
    def refreshGroup(): Unit =
      if (metaImg != null) {
        val g = (metaImg((y >> metaBits) * metaW + (x >> metaBits)) >> 8) &
          0xffff
        group = groups(g)
      }

    refreshGroup()
    while (pos < total) {
      val s = group(0).decode(b)
      if (s < 256) {
        val r = group(1).decode(b)
        val bl = group(2).decode(b)
        val a = group(3).decode(b)
        val px = (a << 24) | (r << 16) | (s << 8) | bl
        out(pos) = px
        insert(px)
        pos += 1
        x += 1
        if (x == xsize) { x = 0; y += 1 }
        if (pos < total) refreshGroup()
      } else if (s < 280) {
        val length = prefixValue(s - 256, b)
        val distSym = group(4).decode(b)
        val planeCode = prefixValue(distSym, b)
        val dist = planeCodeToDistance(xsize, planeCode)
        if (dist > pos || length > total - pos) bad()
        var j = 0
        while (j < length) {
          val px = out(pos - dist)
          out(pos) = px
          insert(px)
          pos += 1
          j += 1
        }
        x = pos % xsize
        y = pos / xsize
        if (pos < total) refreshGroup()
      } else {
        val idx = s - 280
        if (cache == null || idx >= cacheSize) bad()
        out(pos) = cache(idx)
        pos += 1
        x += 1
        if (x == xsize) { x = 0; y += 1 }
        if (pos < total) refreshGroup()
      }
    }
    out
  }

  // ---- transforms ---------------------------------------------------
  private final case class Transform(ttype: Int, sizeBits: Int,
      data: Array[Int], origXsize: Int, numColors: Int)

  private def avg2(a: Int, c: Int): Int =
    (((a ^ c) & 0xfefefefe) >>> 1) + (a & c)

  private def addPixels(p: Int, q: Int): Int = {
    val ag = ((p & 0xff00ff00) >>> 8) + ((q & 0xff00ff00) >>> 8)
    val rb = (p & 0x00ff00ff) + (q & 0x00ff00ff)
    (((ag & 0x00ff00ff) << 8) | (rb & 0x00ff00ff))
  }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int = clamp255(((l >>> sh) & 0xff) +
      ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val a = avg2(l, t)
    def ch(sh: Int): Int = {
      val av = (a >>> sh) & 0xff
      clamp255(av + (av - ((tl >>> sh) & 0xff)) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    def sub3(sh: Int): Int = {
      val a = (t >>> sh) & 0xff
      val bb = (l >>> sh) & 0xff
      val c = (tl >>> sh) & 0xff
      math.abs(bb - c) - math.abs(a - c)
    }
    val paMinusPb = sub3(24) + sub3(16) + sub3(8) + sub3(0)
    if (paMinusPb <= 0) t else l
  }

  private def predict(mode: Int, l: Int, t: Int, tr: Int, tl: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(t, l, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(l, t, tl)
      case _ => bad()
    }

  private def inversePredictor(px: Array[Int], xsize: Int, ysize: Int,
      tr: Transform): Unit = {
    val bits = tr.sizeBits
    val blockW = divUp(xsize, bits)
    var y = 0
    var pos = 0
    while (y < ysize) {
      var x = 0
      while (x < xsize) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1) // L
          else if (x == 0) px(pos - xsize) // T
          else {
            val mode =
              (tr.data((y >> bits) * blockW + (x >> bits)) >> 8) & 0xff
            val l = px(pos - 1)
            val t = px(pos - xsize)
            // TR is ALWAYS px[pos - xsize + 1], exactly as the reference
            // reads top[1]: for the last column that index lands on the
            // CURRENT row's first pixel, which is already reconstructed
            val trp = px(pos - xsize + 1)
            val tlp = px(pos - xsize - 1)
            predict(mode, l, t, trp, tlp)
          }
        px(pos) = addPixels(px(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def colorDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  private def inverseColor(px: Array[Int], xsize: Int, ysize: Int,
      tr: Transform): Unit = {
    val bits = tr.sizeBits
    val blockW = divUp(xsize, bits)
    var y = 0
    var pos = 0
    while (y < ysize) {
      var x = 0
      while (x < xsize) {
        val m = tr.data((y >> bits) * blockW + (x >> bits))
        val g2r = m & 0xff
        val g2b = (m >> 8) & 0xff
        val r2b = (m >> 16) & 0xff
        val p = px(pos)
        val g = (p >> 8) & 0xff
        var r = (p >> 16) & 0xff
        var bl = p & 0xff
        r = (r + colorDelta(g2r, g)) & 0xff
        bl = (bl + colorDelta(g2b, g)) & 0xff
        bl = (bl + colorDelta(r2b, r)) & 0xff
        px(pos) = (p & 0xff00ff00) | (r << 16) | bl
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val bl = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | bl
      i += 1
    }
  }

  private def inverseColorIndexing(px: Array[Int], packedXsize: Int,
      ysize: Int, tr: Transform): Array[Int] = {
    val xsize = tr.origXsize
    // reference behavior: a zero-filled 256-entry lookup — an index
    // past the palette yields 0x00000000, never an exception
    val lut = new Array[Int](256)
    var i = 0
    while (i < tr.numColors) { lut(i) = tr.data(i); i += 1 }
    val widthBits =
      if (tr.numColors > 16) 0
      else if (tr.numColors > 4) 1
      else if (tr.numColors > 2) 2
      else 3
    if (widthBits == 0) {
      i = 0
      while (i < px.length) {
        px(i) = lut((px(i) >> 8) & 0xff)
        i += 1
      }
      px
    } else {
      val out = new Array[Int](xsize * ysize)
      val perByte = 1 << widthBits // indices bundled per green byte
      val idxBits = 8 >> widthBits
      val idxMask = (1 << idxBits) - 1
      var y = 0
      while (y < ysize) {
        var x = 0
        while (x < xsize) {
          val packed = (px(y * packedXsize + (x >> widthBits)) >> 8) & 0xff
          val sub = x & (perByte - 1)
          out(y * xsize + x) = lut((packed >> (sub * idxBits)) & idxMask)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // ---- level-0 stream -----------------------------------------------
  private def decodeVp8l(src: Array[Byte], from: Int, to: Int)
      : (Int, Int, Array[Int]) = {
    if (to - from < 5) bad()
    if ((src(from) & 0xff) != 0x2f) bad()
    val b = new Bits(src, from + 1, to)
    val width = b.bits(14) + 1
    val height = b.bits(14) + 1
    b.bit() // alpha hint
    if (b.bits(3) != 0) bad() // version
    if (width.toLong * height > MaxPixels) bad()
    (width, height, decodeVp8lBody(b, width, height))
  }

  /** The headerless VP8L body (transforms + entropy-coded data +
    * inverse transforms) — also the coding of an ALPH chunk's
    * compressed alpha plane, which carries no signature/dims/version.
    */
  private def decodeVp8lBody(b: Bits, width: Int, height: Int)
      : Array[Int] = {
    var xsize = width
    val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
    var seen = 0
    while (b.bit() == 1) {
      val t = b.bits(2)
      if ((seen & (1 << t)) != 0) bad() // each transform at most once
      seen |= 1 << t
      t match {
        case 0 | 1 => // PREDICTOR / COLOR: block grid sub-image
          val sizeBits = b.bits(3) + 2
          val data = decodeEntropyImage(b, divUp(xsize, sizeBits),
            divUp(height, sizeBits), allowMeta = false)
          transforms += Transform(t, sizeBits, data, xsize, 0)
        case 2 => // SUBTRACT_GREEN
          transforms += Transform(2, 0, null, xsize, 0)
        case _ => // COLOR_INDEXING
          val numColors = b.bits(8) + 1
          val raw = decodeEntropyImage(b, numColors, 1, allowMeta = false)
          // palette entries are DELTA-coded per channel
          var i = 1
          while (i < raw.length) {
            raw(i) = addPixels(raw(i), raw(i - 1))
            i += 1
          }
          transforms += Transform(3, 0, raw, xsize, numColors)
          if (numColors <= 2) xsize = divUp(xsize, 3)
          else if (numColors <= 4) xsize = divUp(xsize, 2)
          else if (numColors <= 16) xsize = divUp(xsize, 1)
      }
    }

    var px = decodeEntropyImage(b, xsize, height, allowMeta = true)
    // inverse transforms in REVERSE read order; width expands back at
    // each color-indexing
    var curX = xsize
    var ti = transforms.length - 1
    while (ti >= 0) {
      val tr = transforms(ti)
      tr.ttype match {
        case 0 => inversePredictor(px, curX, height, tr)
        case 1 => inverseColor(px, curX, height, tr)
        case 2 => inverseSubtractGreen(px)
        case _ =>
          px = inverseColorIndexing(px, curX, height, tr)
          curX = tr.origXsize
      }
      ti -= 1
    }
    if (curX != width) bad()
    px
  }

  /** Decode an ALPH chunk (WebP container spec: 1 header byte —
    * 2-bit compression method raw|VP8L, 2-bit filter, 2-bit
    * preprocessing — then the plane) and merge it into `argb`'s alpha
    * bytes. The VP8L method is the HEADERLESS body coding with the
    * alpha value in the green channel; filters are the container
    * spec's horizontal/vertical/gradient predictors (first row falls
    * back to horizontal, first column to above — the reference
    * unfilter kernels). DECLARED BOUND: preprocessing=1 (lossy-alpha
    * level smoothing, emitted only at alpha_quality<100) NULLs — the
    * smoothing pass is a quality transform, not a bitstream coding,
    * and decoding without it would silently disagree with the
    * reference decoder.
    */
  private def applyAlpha(bytes: Array[Byte], from: Int, to: Int,
      w: Int, h: Int, argb: Array[Int]): Unit = {
    if (to - from < 1 || to > bytes.length) bad()
    val hdr = bytes(from) & 0xff
    if ((hdr >> 6) != 0) bad() // reserved bits
    val method = hdr & 3
    val filter = (hdr >> 2) & 3
    val pre = (hdr >> 4) & 3
    if (pre != 0) bad()
    val plane: Array[Byte] = method match {
      case 0 =>
        if (to - from - 1 < w.toLong * h) bad()
        java.util.Arrays.copyOfRange(bytes, from + 1, from + 1 + w * h)
      case 1 =>
        val px = decodeVp8lBody(new Bits(bytes, from + 1, to), w, h)
        val out = new Array[Byte](w * h)
        var i = 0
        while (i < out.length) { out(i) = ((px(i) >> 8) & 0xff).toByte; i += 1 }
        out
      case _ => bad()
    }
    if (filter > 0) {
      var y = 0
      while (y < h) {
        if (y == 0 || filter == 1) { // horizontal (filters 2/3 fall back
          // to horizontal on the first row)
          var pred = if (y == 0) 0 else plane((y - 1) * w) & 0xff
          var x = 0
          while (x < w) {
            val v = (pred + plane(y * w + x)) & 0xff
            plane(y * w + x) = v.toByte
            pred = v
            x += 1
          }
        } else if (filter == 2) { // vertical
          var x = 0
          while (x < w) {
            plane(y * w + x) =
              ((plane((y - 1) * w + x) + plane(y * w + x)) & 0xff).toByte
            x += 1
          }
        } else { // gradient
          var left = plane((y - 1) * w) & 0xff
          var topLeft = left
          var x = 0
          while (x < w) {
            val top = plane((y - 1) * w + x) & 0xff
            var g = left + top - topLeft
            if (g < 0) g = 0
            if (g > 255) g = 255
            left = (g + plane(y * w + x)) & 0xff
            plane(y * w + x) = left.toByte
            topLeft = top
            x += 1
          }
        }
        y += 1
      }
    }
    var i = 0
    while (i < argb.length) {
      argb(i) = (argb(i) & 0x00ffffff) | ((plane(i) & 0xff) << 24)
      i += 1
    }
  }

  /** Decode to the raw ARGB array — exposed so the spec can pin pixels
    * value-for-value against the reference libwebp decoder.
    */
  def decodeArgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val n = bytes.length
    if (n < 20 || bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'E' ||
      bytes(10) != 'B' || bytes(11) != 'P') bad()
    def le32(i: Int): Long = (bytes(i) & 0xffL) |
      ((bytes(i + 1) & 0xffL) << 8) | ((bytes(i + 2) & 0xffL) << 16) |
      ((bytes(i + 3) & 0xffL) << 24)
    val riffEnd = math.min(n.toLong, 8 + le32(4)).toInt
    var p = 12
    var guard = 0
    var alphaOff = -1
    var alphaEnd = -1
    while (p + 8 <= riffEnd && guard < n / 8 + 1) {
      val size = le32(p + 4)
      val dataOff = p + 8
      if (size > riffEnd - dataOff) bad()
      if (bytes(p) == 'V' && bytes(p + 1) == 'P' && bytes(p + 2) == '8' &&
        bytes(p + 3) == 'L') {
        return decodeVp8l(bytes, dataOff, dataOff + size.toInt)
      }
      // VP8X (extended header) and metadata chunks are walked past;
      // an ALPH chunk (lossy alpha plane) is recorded and merged into
      // the VP8 decode; lossy 'VP8 ' decodes via the RFC 6386 keyframe
      // decoder ([[Vp8Decode]]), pinned pixel-exact vs WebPDecodeRGBA
      if (bytes(p) == 'A' && bytes(p + 1) == 'L' && bytes(p + 2) == 'P' &&
        bytes(p + 3) == 'H' && alphaOff < 0) {
        alphaOff = dataOff
        alphaEnd = dataOff + size.toInt
      }
      if (bytes(p) == 'V' && bytes(p + 1) == 'P' && bytes(p + 2) == '8' &&
        bytes(p + 3) == ' ') {
        val r = Vp8Decode.decodeArgb(bytes, dataOff, dataOff + size.toInt)
        if (alphaOff >= 0) applyAlpha(bytes, alphaOff, alphaEnd, r._1, r._2,
          r._3)
        return r
      }
      p = dataOff + size.toInt + (size.toInt & 1) // chunks pad to even
      guard += 1
    }
    bad()
  }

  /** Static parse kernel shared by eval and generated code. */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    try {
      val (w, h, px) = decodeArgb(bytes)
      var sumR = 0L
      var sumG = 0L
      var sumB = 0L
      var i = 0
      while (i < px.length) {
        val p = px(i)
        sumR += (p >>> 16) & 0xff
        sumG += (p >>> 8) & 0xff
        sumB += p & 0xff
        i += 1
      }
      new GenericInternalRow(Array[Any](w, h, w.toLong * h, sumR, sumG,
        sumB))
    } catch { case Corrupt => null }
  }

  def webp_pixels(c: Column): Column =
    GraftColumnBridge.column(WebpPixels(GraftColumnBridge.expression(c)))
}
