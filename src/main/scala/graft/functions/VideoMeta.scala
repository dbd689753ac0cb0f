package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL video-container header parsing over opaque binary media columns —
  * the video rung completing the [[ImageDims]]/[[AudioMeta]] triad (same
  * honest-multimodal discipline: pure byte arithmetic against a PUBLIC
  * spec, nothing stubbed). Walks the ISO base-media file format
  * (ISO/IEC 14496-12, the MP4/MOV container): big-endian u32 box sizes
  * with 4-char types, `size==1` → 64-bit largesize, `size==0` → box
  * extends to end of enclosure; reads the major brand from `ftyp`, then
  * inside `moov` finds `mvhd` (FullBox: version 0 → u32 timescale at +12
  * and u32 duration at +16 of the payload; version 1 → u64 times with the
  * u32 timescale between) and counts `trak` children. Per the spec,
  * all-ones duration means "unknown" and surfaces as NULL duration.
  *
  * Header-prefix parse by design: `mdat` payloads are never read — at
  * 100 TB the engine extracts brand/timescale/duration/track-count from
  * the first KB of each blob, the ffprobe shape, not a decode.
  *
  * Returns NULL (whole struct) for anything unrecognized: `moov` before
  * any `ftyp` (the spec orders ftyp "as early as possible"; a strict
  * metadata probe treats the inversion as corrupt), truncated or
  * overflowing box sizes, a `moov` without `mvhd`, an unknown mvhd
  * version, zero timescale, or a non-printable brand. Corrupt headers
  * are first-class input, pinned by the adversarial gate.
  *
  * Scale shape: map-only, box walks capped at 1024 boxes per level
  * (structural guard against adversarial box chains), codegen'd so it
  * fuses into the scan like the rest of the ByteStats family. Binary
  * payloads never shuffle.
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoMeta.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"VideoMeta requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    VideoMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VideoMeta.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)

  override def prettyName: String = "video_meta"
}

object VideoMeta {
  val Schema: StructType = StructType(Seq(
    StructField("brand", StringType, nullable = true),
    StructField("timescale", IntegerType, nullable = true),
    StructField("duration", LongType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true)))

  /** Static parse kernel shared by eval and generated code. Returns null
    * for unrecognized/corrupt/truncated input.
    */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length.toLong
    if (n < 16) return null
    var p = 0L
    var guard = 0
    var brand: UTF8String = null
    while (guard < 1024 && p + 8 <= n) {
      val size0 = be32(bytes, p.toInt)
      var hdr = 8L
      var size = size0
      if (size0 == 1L) { // 64-bit largesize
        if (p + 16 > n) return null
        size = be64(bytes, p.toInt + 8)
        hdr = 16L
      } else if (size0 == 0L) { // box extends to end of file
        size = n - p
      }
      // Overflow-free bound: p <= n is a loop invariant (p only advances
      // by sizes already proven <= n - p), so n - p never overflows —
      // whereas `p + size > n` wraps negative for a crafted largesize
      // near Long.MaxValue and would let p go negative.
      if (size < hdr || size > n - p) return null
      val t0 = bytes(p.toInt + 4); val t1 = bytes(p.toInt + 5)
      val t2 = bytes(p.toInt + 6); val t3 = bytes(p.toInt + 7)
      if (t0 == 'f' && t1 == 't' && t2 == 'y' && t3 == 'p') {
        if (size < hdr + 8) return null // major brand + minor version
        val b = p + hdr
        var i = 0
        while (i < 4) { // 4cc brands are printable ASCII
          val c = bytes((b + i).toInt) & 0xff
          if (c < 0x20 || c > 0x7e) return null
          i += 1
        }
        brand = UTF8String.fromBytes(bytes, b.toInt, 4)
      } else if (t0 == 'm' && t1 == 'o' && t2 == 'o' && t3 == 'v') {
        if (brand == null) return null // moov before ftyp — strict probe
        return parseMoov(bytes, p + hdr, p + size, brand)
      }
      p += size
      guard += 1
    }
    null // no moov found
  }

  /** Walk moov's children: find mvhd, count trak boxes. */
  private def parseMoov(bytes: Array[Byte], start: Long, end: Long,
      brand: UTF8String): InternalRow = {
    val n = bytes.length.toLong
    var p = start
    var guard = 0
    var tracks = 0
    var haveMvhd = false
    var timescale = 0L
    var duration = 0L
    var durationKnown = false
    while (guard < 1024 && p + 8 <= end) {
      val size0 = be32(bytes, p.toInt)
      var hdr = 8L
      var size = size0
      if (size0 == 1L) {
        if (p + 16 > end) return null
        size = be64(bytes, p.toInt + 8)
        hdr = 16L
      } else if (size0 == 0L) {
        size = end - p
      }
      // Same overflow-free form as parse(): p <= end <= n are invariants
      // (parse proved the moov size fits, children prove theirs here), so
      // end - p is non-negative and a wrap-prone `p + size` never forms.
      if (size < hdr || size > end - p) return null
      val t0 = bytes(p.toInt + 4); val t1 = bytes(p.toInt + 5)
      val t2 = bytes(p.toInt + 6); val t3 = bytes(p.toInt + 7)
      if (t0 == 'm' && t1 == 'v' && t2 == 'h' && t3 == 'd') {
        val b = p + hdr
        val boxEnd = p + size // fields must sit inside mvhd itself,
        if (b + 4 > boxEnd) return null // never in a sibling box
        val version = bytes(b.toInt) & 0xff
        if (version == 0) {
          // verflags(4) creation(4) modification(4) timescale(4) duration(4)
          if (b + 20 > boxEnd) return null
          timescale = be32(bytes, b.toInt + 12)
          duration = be32(bytes, b.toInt + 16)
          durationKnown = duration != 0xffffffffL
        } else if (version == 1) {
          // verflags(4) creation(8) modification(8) timescale(4) duration(8)
          if (b + 32 > boxEnd) return null
          timescale = be32(bytes, b.toInt + 20)
          duration = be64(bytes, b.toInt + 24)
          durationKnown = duration != -1L // u64 all-ones
        } else return null
        if (timescale < 1 || timescale > Int.MaxValue) return null
        if (durationKnown && duration < 0) return null // >2^63 u64 — corrupt
        haveMvhd = true
      } else if (t0 == 't' && t1 == 'r' && t2 == 'a' && t3 == 'k') {
        tracks += 1
      }
      p += size
      guard += 1
    }
    if (!haveMvhd) return null
    new GenericInternalRow(Array[Any](
      brand, timescale.toInt,
      if (durationKnown) duration else null, tracks))
  }

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** Column entry point: video_meta(binary) → struct<brand:string,
    * timescale:int, duration:bigint, n_tracks:int>
    * (NULL if unparseable; NULL duration = spec "unknown").
    */
  def video_meta(c: Column): Column =
    GraftColumnBridge.column(VideoMeta(GraftColumnBridge.expression(c)))
}
