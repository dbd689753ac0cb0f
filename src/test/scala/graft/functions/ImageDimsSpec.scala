package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ImageDims against HAND-WRITTEN header bytes taken from the
  * public format specs — not round-tripped through the query's own
  * construction, so a matching construct/parse bug (e.g. both sides
  * little-endian) cannot hide here — these pins caught a real fourcc
  * transposition ('WEPB') in the first WebP build. Covers PNG (RFC
  * 2083 §3), baseline and progressive JPEG (ITU-T T.81 §B) with
  * APP0/COM/DQT segments and restart/TEM standalone markers, GIF87a +
  * GIF89a Logical Screen Descriptors, all three WebP chunk flavors
  * (VP8 lossy incl. the scaling-bit mask, VP8L packed minus-one dims,
  * VP8X u24le canvas), and the corrupt shapes that must yield NULL.
  */
class ImageDimsSpec extends SparkSpec {
  import spark.implicits._

  private def dims(payloads: Array[Byte]*): Seq[Option[(String, Int, Int)]] =
    payloads.toSeq.toDF("b")
      .select(ImageDims.image_dims(col("b")).as("d"))
      .select(col("d.format"), col("d.width"), col("d.height"))
      .collect().map { r =>
        if (r.isNullAt(0)) None
        else Some((r.getString(0), r.getInt(1), r.getInt(2)))
      }.toSeq

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // The 8-byte PNG signature + IHDR chunk of a real 640x480 RGBA PNG
  // (length 13, type IHDR, w=0x280, h=0x1E0, depth 8, color 6).
  private val png640 = hx(
    "89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08 06 00 00 00")

  // Baseline JPEG: SOI, JFIF APP0 (16 bytes), DQT (stub), SOF0 with
  // h=0x010=16, w=0x0020=32, 3 components.
  private val jpeg32x16 = hx(
    "FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 00 00" +
      " FFDB 0005 112233" +
      " FFC0 0011 08 0010 0020 03 011100 021101 031101" +
      " FFD9")

  // Progressive JPEG: SOI, COM segment (variable length), restart +
  // TEM standalone markers (no length field — the walk must skip them
  // without reading one), SOF2 with h=1, w=65535.
  private val jpegProg = hx(
    "FFD8 FFFE 0007 68656C6C6F" +
      " FFD0 FF01" +
      " FFC2 000B 08 0001 FFFF 01 011100" +
      " FFD9")

  test("real header bytes parse to their true dimensions") {
    assert(dims(png640, jpeg32x16, jpegProg) == Seq(
      Some(("png", 640, 480)),
      Some(("jpeg", 32, 16)),
      Some(("jpeg", 65535, 1))))
  }

  // GIF89a, 320x200 Logical Screen Descriptor (LE u16 dims).
  private val gif320 = hx("474946383961 4001 C800 F7 00 00")
  // GIF87a, 2x2 — the older signature must parse too.
  private val gif87 = hx("474946383761 0200 0200 00 00 00")

  // WebP VP8 lossy keyframe, 640x480: RIFF/WEBP, 'VP8 ' chunk, 3-byte
  // frame tag, 9D 01 2A sync, LE dims — the height field carries a
  // nonzero upscaling hint in its top bits, which the parser must mask.
  private val webpVp8 = hx(
    "52494646 16000000 57454250 56503820 0A000000 301900 9D012A 8002 E041")
  // WebP VP8L lossless, 800x600: 0x2F signature then the packed
  // little-endian (w-1) | (h-1)<<14 field = 0x95C31F.
  private val webpVp8l = hx(
    "52494646 11000000 57454250 5650384C 05000000 2F 1FC39500")
  // WebP VP8X extended, 16383x4096: u24le canvas-minus-one pair.
  private val webpVp8x = hx(
    "52494646 16000000 57454250 56503858 0A000000 02000000 FE3F00 FF0F00")

  test("GIF and WebP header bytes parse to their true dimensions") {
    assert(dims(gif320, gif87, webpVp8, webpVp8l, webpVp8x) == Seq(
      Some(("gif", 320, 200)),
      Some(("gif", 2, 2)),
      Some(("webp", 640, 480)),
      Some(("webp", 800, 600)),
      Some(("webp", 16383, 4096))))
  }

  test("corrupt GIF and WebP headers yield NULL") {
    val gifBadVersion = hx("474946383061 4001 C800 F7 00 00") // GIF80a
    val gifZeroWidth = hx("474946383961 0000 C800 F7 00 00")
    val webpUnknownChunk = hx( // ALPH first: container ok, no dims
      "52494646 10000000 57454250 414C5048 04000000 00000000")
    val vp8NoSync = hx(
      "52494646 16000000 57454250 56503820 0A000000 301900 000000 8002 E001")
    val vp8lTrunc = hx( // cut before the packed dims field
      "52494646 0D000000 57454250 5650384C 05000000 2F")
    val riffNotWebp = hx("52494646 16000000 57415645 56503820")
    assert(dims(gifBadVersion, gifZeroWidth, webpUnknownChunk, vp8NoSync,
      vp8lTrunc, riffNotWebp) == Seq.fill(6)(None))
  }

  test("corrupt and truncated headers yield NULL") {
    val truncPng = hx("89504E470D0A1A0A") // signature only
    val wrongChunk = hx( // signature but first chunk is not IHDR
      "89504E470D0A1A0A 0000000D 49444154 00000280 000001E0 08 06 00 00 00")
    val zeroWidth = hx( // IHDR with width 0
      "89504E470D0A1A0A 0000000D 49484452 00000000 000001E0 08 06 00 00 00")
    val soiOnly = hx("FFD8")
    val eoiBeforeSof = hx("FFD8 FFD9")
    val sosBeforeSof = hx("FFD8 FFDA 0002")
    val badMarker = hx("FFD8 00C0 000B 08 0010 0020 03 011100 021101 031101")
    val badSegLen = hx("FFD8 FFFE 0001 FFC0") // segment length < 2
    val truncSof = hx("FFD8 FFC0 000B 08 0010") // SOF cut before width
    val text = "just some text bytes".getBytes("UTF-8")
    assert(dims(truncPng, wrongChunk, zeroWidth, soiOnly, eoiBeforeSof,
      sosBeforeSof, badMarker, badSegLen, truncSof, text,
      Array.empty[Byte]) == Seq.fill(11)(None))
  }

  test("null input yields NULL") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(ImageDims.image_dims(col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
  }
}
