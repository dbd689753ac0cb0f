package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._

/** REAL pixel decode over GIF containers (GIF87a/89a + the LZW variant
  * the spec embeds) — the third format whose pixel path is fully
  * implemented from the public specification, after BMP (raw) and PNG
  * (DEFLATE); with [[JpegPixels]] landing alongside it, nothing on
  * the image-codec line is stubbed anymore.
  *
  * Decode path: 6-byte signature (`GIF87a`/`GIF89a`) → logical screen
  * descriptor (LE dims, global-color-table flag/size) → optional GCT →
  * block walk (extensions skipped by their sub-block framing) → the
  * FIRST image descriptor (optional local color table overrides the
  * GCT; LATER images — animation frames — are walked structurally and
  * counted by [[GifFrames]], their pixels never decoded: disposal/
  * compositing is out of scope by declaration, the decoded pixels are
  * always the first frame's) → LZW
  * data: sub-blocks concatenated, codes read LSB-first at variable
  * width (min-code-size+1 … 12 bits), the standard dictionary decoder
  * (clear resets, end terminates, the `code == next` self-referencing
  * case emits prev+first(prev), widths bump when the table reaches
  * 2^width) — every emitted index mapped through the active palette
  * into exact per-channel BIGINT sums.
  *
  * INTERLACED images are accepted: interlacing only permutes ROW
  * ORDER (the four-pass scheme), and per-channel sums are
  * row-order-invariant — width/height/n_px/sums are identical either
  * way, so the probe's outputs are exact without materializing rows.
  *
  * STRICT probe: NULL for a bad signature, missing palette, a pixel
  * index outside the active palette, any invalid LZW code (a code past
  * `next`, a non-literal first code after clear), pixel count ≠
  * width·height (both directions), a truncated code or sub-block
  * stream, a missing image/trailer, or trailing bytes after the
  * trailer.
  *
  * Returns struct<width, height, n_px, sum_r, sum_g, sum_b> — the
  * BmpPixels/PngPixels shape. Scale: map-only, codegen'd; no pixel
  * buffer is materialized (sums accumulate in registers) and emission
  * HALTS the moment it exceeds width·height, so work is bounded by
  * min(declared pixels, input-driven expansion) with declared pixels
  * capped by the named [[GifPixels.MaxPixels]] guard — LZW's quadratic
  * worst-case expansion cannot buy unbounded work from a small blob.
  */
case class GifPixels(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GifPixels.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"GifPixels requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    GifPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GifPixels.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): GifPixels =
    copy(child = newChild)

  override def prettyName: String = "gif_pixels"
}

object GifPixels {

  /** Zip-bomb guard on declared width·height (~64 M pixels): LZW
    * expands, so work must be capped by POLICY, not input size.
    */
  val MaxPixels: Long = 64L * 1024 * 1024

  val Schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_px", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  /** Static parse kernel shared by eval and generated code: the
    * pixel-schema projection of [[full]] (first-frame pixels).
    */
  def parse(bytes: Array[Byte]): InternalRow = {
    val f = full(bytes)
    if (f == null) null
    else new GenericInternalRow(f.values.take(6))
  }

  /** Frame-count kernel for [[GifFrames]]: the same strict decode (the
    * first frame's pixels are fully validated), surfacing slot 6.
    */
  def frameCount(bytes: Array[Byte]): java.lang.Integer = {
    val f = full(bytes)
    if (f == null) null else f.values(6).asInstanceOf[java.lang.Integer]
  }

  /** The real kernel: first-frame decode + structural animation walk.
    * Returns (w, h, n_px, sum_r, sum_g, sum_b, n_frames) or null.
    */
  private def full(bytes: Array[Byte]): GenericInternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    if (n < 6 + 7 + 1) return null
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != '8' || (bytes(4) != '7' && bytes(4) != '9') ||
      bytes(5) != 'a') return null

    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)

    // --- logical screen descriptor + optional global color table ---
    val screenW = u16(6)
    val screenH = u16(8)
    val lsdPacked = bytes(10) & 0xff
    var p = 13
    var gctOff = -1
    var gctSize = 0
    if ((lsdPacked & 0x80) != 0) {
      gctSize = 1 << ((lsdPacked & 0x07) + 1)
      gctOff = p
      p += 3 * gctSize
      if (p > n) return null
    }
    if (screenW < 1 || screenH < 1) return null

    // --- block walk to the first image descriptor ---
    var imgOff = -1
    while (imgOff < 0) {
      if (p >= n) return null
      val b = bytes(p) & 0xff
      p += 1
      if (b == 0x2c) imgOff = p
      else if (b == 0x21) { // extension: label + sub-blocks
        p += 1
        if (p > n) return null
        var len = -1
        while (len != 0) {
          if (p >= n) return null
          len = bytes(p) & 0xff
          p += 1 + len
          if (p > n) return null
        }
      } else return null // trailer before any image, or junk
    }
    if (imgOff + 9 > n) return null
    val w = u16(imgOff + 4)
    val h = u16(imgOff + 6)
    val imgPacked = bytes(imgOff + 8) & 0xff
    p = imgOff + 9
    var palOff = gctOff
    var palSize = gctSize
    if ((imgPacked & 0x80) != 0) { // local color table
      palSize = 1 << ((imgPacked & 0x07) + 1)
      palOff = p
      p += 3 * palSize
      if (p > n) return null
    }
    if (palOff < 0) return null // no active palette at all
    if (w < 1 || h < 1) return null
    val npx = w.toLong * h
    if (npx > MaxPixels) return null

    // --- concatenate the LZW data sub-blocks ---
    if (p >= n) return null
    val minCode = bytes(p) & 0xff
    p += 1
    if (minCode < 2 || minCode > 8) return null
    var total = 0
    var q = p
    var len = -1
    while (len != 0) {
      if (q >= n) return null
      len = bytes(q) & 0xff
      total += len
      q += 1 + len
      if (q > n) return null
    }
    val data = new Array[Byte](total)
    var di = 0
    var r = p
    len = -1
    while (len != 0) {
      len = bytes(r) & 0xff
      System.arraycopy(bytes, r + 1, data, di, len)
      di += len
      r += 1 + len
    }
    p = q

    // --- after the first image: more frames (animation) are WALKED
    // structurally (descriptor + optional LCT + LZW sub-block framing —
    // never decoded: work stays bounded by the first frame), extensions
    // skipped, then the trailer. Disposal/compositing is out of scope by
    // declaration: the decoded pixels are the FIRST frame's.
    var sawTrailer = false
    var frames = 1
    while (!sawTrailer) {
      if (p >= n) return null
      val b = bytes(p) & 0xff
      p += 1
      if (b == 0x3b) sawTrailer = true
      else if (b == 0x21) {
        p += 1
        if (p > n) return null
        var l2 = -1
        while (l2 != 0) {
          if (p >= n) return null
          l2 = bytes(p) & 0xff
          p += 1 + l2
          if (p > n) return null
        }
      } else if (b == 0x2c) { // a later animation frame
        if (frames >= 65536) return null // structural guard
        if (p + 9 > n) return null
        val fw = u16(p + 4); val fh = u16(p + 6)
        if (fw < 1 || fh < 1) return null
        val fPacked = bytes(p + 8) & 0xff
        p += 9
        if ((fPacked & 0x80) != 0) { // local color table
          p += 3 * (1 << ((fPacked & 0x07) + 1))
          if (p > n) return null
        }
        if (p >= n) return null
        val mcs = bytes(p) & 0xff
        p += 1
        if (mcs < 2 || mcs > 8) return null
        var l2 = -1
        while (l2 != 0) { // LZW data sub-blocks, skipped by framing
          if (p >= n) return null
          l2 = bytes(p) & 0xff
          p += 1 + l2
          if (p > n) return null
        }
        frames += 1
      } else return null // junk
    }
    if (p != n) return null // trailing bytes after the trailer

    // --- LZW decode straight into the channel sums ---
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4096)
    var next = clear + 2
    var width = minCode + 1
    var prev = -1
    var bit = 0L
    val nBits = total.toLong * 8
    var count = 0L
    var sumR = 0L
    var sumG = 0L
    var sumB = 0L

    def emitIndex(idx: Int): Boolean = {
      if (idx >= palSize) return false
      if (count >= npx) return false
      val o = palOff + 3 * idx
      sumR += bytes(o) & 0xff
      sumG += bytes(o + 1) & 0xff
      sumB += bytes(o + 2) & 0xff
      count += 1
      true
    }
    // walk code's chain onto the stack; returns its FIRST index, -1 bad
    def emitString(code: Int): Int = {
      var c = code
      var sp = 0
      while (c >= clear + 2) { // a table entry
        stack(sp) = suffix(c)
        sp += 1
        c = prefix(c)
        if (sp >= 4096) return -1
      }
      if (c >= clear) return -1 // chain must root at a literal
      val first = c
      if (!emitIndex(c)) return -1
      while (sp > 0) {
        sp -= 1
        if (!emitIndex(stack(sp))) return -1
      }
      first
    }

    var done = false
    while (!done) {
      if (bit + width > nBits) return null
      var code = 0
      var i = 0
      while (i < width) {
        code |= ((data((bit >> 3).toInt) >> (bit & 7).toInt) & 1) << i
        bit += 1
        i += 1
      }
      if (code == clear) {
        next = clear + 2
        width = minCode + 1
        prev = -1
      } else if (code == end) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) return null // first code must be a literal
        if (!emitIndex(code)) return null
        prev = code
      } else {
        var first = 0
        if (code < next) {
          first = emitString(code)
          if (first < 0) return null
        } else if (code == next && next < 4096) {
          // the self-referencing case: prev's string + its first index
          first = emitString(prev)
          if (first < 0 || !emitIndex(first)) return null
        } else return null
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    if (count != npx) return null
    new GenericInternalRow(Array[Any](w, h, npx, sumR, sumG, sumB, frames))
  }

  def gif_pixels(c: Column): Column =
    GraftColumnBridge.column(GifPixels(GraftColumnBridge.expression(c)))

  def gif_frames(c: Column): Column =
    GraftColumnBridge.column(GifFrames(GraftColumnBridge.expression(c)))
}

/** Frame count of a GIF (1 for stills, N for animations) under the same
  * strict decode as [[GifPixels]] — the first frame's pixel stream is
  * fully validated, later frames are walked by their sub-block framing.
  * NULL for anything GifPixels would reject.
  */
case class GifFrames(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"GifFrames requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val r = GifPixels.frameCount(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Integer ${ev.value}$$box =
        graft.functions.GifPixels.frameCount($c);
      ${ev.isNull} = ${ev.value}$$box == null;
      ${ev.value} = ${ev.isNull} ? -1 : ${ev.value}$$box.intValue();
    """)

  override protected def withNewChildInternal(newChild: Expression): GifFrames =
    copy(child = newChild)

  override def prettyName: String = "gif_frames"
}
