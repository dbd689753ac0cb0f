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
  * Round 16 adds the EBML container (Matroska/WebM, RFC 8794 + the
  * public Matroska element registry): varint ID/size walk through the
  * EBML header (DocType → brand), Segment → Info (TimestampScale ns per
  * tick → ticks-per-second timescale; float Duration → whole ticks) and
  * Tracks (TrackEntry count), stopping at the first Cluster.
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
    // EBML (Matroska/WebM, RFC 8794): the 0x1A45DFA3 header magic
    if ((bytes(0) & 0xff) == 0x1a && (bytes(1) & 0xff) == 0x45 &&
        (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3)
      return parseEbml(bytes)
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

  // --- EBML (Matroska/WebM, RFC 8794 + the public Matroska element
  // registry). Header-prefix discipline like the MP4 walk: the walk
  // STOPS at the first Cluster (media payloads are never read), so
  // brand/timescale/duration/track-count come from the first KB.
  // Mapping into the shared schema: brand = the EBML DocType ("webm" /
  // "matroska"), timescale = ticks-per-second derived from Matroska's
  // TimestampScale (ns per tick, default 1_000_000 → 1000 ticks/s;
  // a scale that does not divide 1e9 evenly is outside this probe's
  // integer contract → whole-struct NULL, a declared bound), duration
  // = the Duration float rounded to whole ticks (absent → NULL, the
  // same "unknown" surface as MP4's all-ones sentinel), n_tracks =
  // TrackEntry count under Tracks.

  private val EbmlHeader = 0x1A45DFA3L
  private val EbmlDocType = 0x4282L
  private val MkvSegment = 0x18538067L
  private val MkvInfo = 0x1549A966L
  private val MkvTimestampScale = 0x2AD7B1L
  private val MkvDuration = 0x4489L
  private val MkvTracks = 0x1654AE6BL
  private val MkvTrackEntry = 0xAEL
  private val MkvCluster = 0x1F43B675L

  /** Read an EBML element ID at p: 1-4 bytes, marker bit KEPT (the
    * registry writes IDs with it). Returns (value, width) packed as
    * value<<4 | width, or -1 on malformed/truncated input.
    */
  private def ebmlId(b: Array[Byte], p: Long, end: Long): Long = {
    if (p >= end) return -1
    val b0 = b(p.toInt) & 0xff
    if (b0 == 0) return -1
    val w = java.lang.Integer.numberOfLeadingZeros(b0) - 24 + 1
    if (w > 4 || p + w > end) return -1
    var v = b0.toLong
    var i = 1
    while (i < w) { v = (v << 8) | (b(p.toInt + i) & 0xff); i += 1 }
    (v << 4) | w
  }

  /** Read an EBML size at p: 1-8 bytes, marker bit STRIPPED. Returns
    * value<<4 | width; all-VINT_DATA-ones means "unknown size" and is
    * surfaced as value -2 (allowed for Segment only). -1 = malformed.
    */
  private def ebmlSize(b: Array[Byte], p: Long, end: Long): Long = {
    if (p >= end) return -1
    val b0 = b(p.toInt) & 0xff
    if (b0 == 0) return -1
    val w = java.lang.Integer.numberOfLeadingZeros(b0) - 24 + 1
    if (w > 8 || p + w > end) return -1
    var v = (b0 & (0xff >>> w)).toLong
    var allOnes = (b0 & (0xff >>> w)) == (0xff >>> w)
    var i = 1
    while (i < w) {
      val x = b(p.toInt + i) & 0xff
      allOnes &&= x == 0xff
      v = (v << 8) | x
      i += 1
    }
    if (allOnes) return (-2L << 4) | w // unknown size
    if (v > Int.MaxValue) return -1    // far beyond any header prefix
    (v << 4) | w
  }

  /** EBML walk: header DocType → Segment → Info (TimestampScale,
    * Duration) + Tracks (TrackEntry count), stopping at Cluster.
    */
  private def parseEbml(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length.toLong
    // EBML header: id already matched; a known size is mandatory here
    val hs = ebmlSize(bytes, 4, n)
    if (hs < 0 || (hs >> 4) < 0) return null
    val hLen = hs >> 4
    var p = 4 + (hs & 0xf)
    val hEnd = p + hLen
    if (hEnd > n) return null
    var docType: UTF8String = null
    var guard = 0
    while (guard < 1024 && p < hEnd) {
      val id = ebmlId(bytes, p, hEnd)
      if (id < 0) return null
      p += id & 0xf
      val sz = ebmlSize(bytes, p, hEnd)
      if (sz < 0 || (sz >> 4) < 0) return null // unknown size: not here
      p += sz & 0xf
      val len = sz >> 4
      if (p + len > hEnd) return null
      if ((id >> 4) == EbmlDocType) {
        var i = 0 // DocType is ASCII per the spec
        while (i < len) {
          val c = bytes((p + i).toInt) & 0xff
          if (c < 0x20 || c > 0x7e) return null
          i += 1
        }
        docType = UTF8String.fromBytes(bytes, p.toInt, len.toInt)
      }
      p += len
      guard += 1
    }
    if (docType == null || p != hEnd) return null
    // Segment (unknown size allowed: streamed files end at EOF)
    val sid = ebmlId(bytes, p, n)
    if (sid < 0 || (sid >> 4) != MkvSegment) return null
    p += sid & 0xf
    val ssz = ebmlSize(bytes, p, n)
    if (ssz == -1L) return null // malformed (unknown size -2 is allowed)
    p += ssz & 0xf
    val segEnd = if ((ssz >> 4) == -2L) n else p + (ssz >> 4)
    if (segEnd > n) return null
    var tsScale = 1000000L // Matroska default: ns per tick
    var haveInfo = false
    var durTicks: Any = null
    var tracks = 0
    guard = 0
    var done = false
    while (guard < 1024 && p < segEnd && !done) {
      val id = ebmlId(bytes, p, segEnd)
      if (id < 0) return null
      val idv = id >> 4
      if (idv == MkvCluster) {
        // media starts: the header prefix ends here (an unknown-size
        // cluster is fine — it is never skipped, the walk stops)
        done = true
      } else {
      p += id & 0xf
      val sz = ebmlSize(bytes, p, segEnd)
      if (sz < 0 || (sz >> 4) < 0) return null // unknown-size children: out
      p += sz & 0xf
      val len = sz >> 4
      if (p + len > segEnd) return null
      if (idv == MkvInfo) {
        haveInfo = true
        val iEnd = p + len
        var q = p
        var g2 = 0
        while (g2 < 1024 && q < iEnd) {
          val cid = ebmlId(bytes, q, iEnd)
          if (cid < 0) return null
          q += cid & 0xf
          val csz = ebmlSize(bytes, q, iEnd)
          if (csz < 0 || (csz >> 4) < 0) return null
          q += csz & 0xf
          val clen = csz >> 4
          if (q + clen > iEnd) return null
          if ((cid >> 4) == MkvTimestampScale) {
            if (clen < 1 || clen > 8) return null
            var v = 0L
            var i = 0
            while (i < clen) { v = (v << 8) | (bytes((q + i).toInt) & 0xff); i += 1 }
            if (v < 1) return null
            tsScale = v
          } else if ((cid >> 4) == MkvDuration) {
            val d =
              if (clen == 4) java.lang.Float.intBitsToFloat(
                be32(bytes, q.toInt).toInt).toDouble
              else if (clen == 8) java.lang.Double.longBitsToDouble(
                be64(bytes, q.toInt))
              else return null
            if (d.isNaN || d.isInfinite || d < 0 ||
                d > 9.2e18) return null
            durTicks = Math.round(d)
          }
          q += clen
          g2 += 1
        }
        if (q != iEnd) return null
      } else if (idv == MkvTracks) {
        val tEnd = p + len
        var q = p
        var g2 = 0
        while (g2 < 1024 && q < tEnd) {
          val cid = ebmlId(bytes, q, tEnd)
          if (cid < 0) return null
          q += cid & 0xf
          val csz = ebmlSize(bytes, q, tEnd)
          if (csz < 0 || (csz >> 4) < 0) return null
          q += csz & 0xf
          val clen = csz >> 4
          if (q + clen > tEnd) return null
          if ((cid >> 4) == MkvTrackEntry) tracks += 1
          q += clen
          g2 += 1
        }
        if (q != tEnd) return null
      }
      p += len
      }
      guard += 1
    }
    if (!haveInfo) return null
    // ticks-per-second only when TimestampScale divides 1e9 evenly —
    // the integer-timescale contract of the shared schema
    if (1000000000L % tsScale != 0) return null
    val ticksPerSec = 1000000000L / tsScale
    new GenericInternalRow(Array[Any](
      docType, ticksPerSec.toInt, durTicks, tracks))
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
