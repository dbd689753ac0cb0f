package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ImageDims against HAND-WRITTEN header bytes taken from the
  * public format specs — not round-tripped through the query's own
  * construction, so a matching construct/parse bug (e.g. both sides
  * little-endian) cannot hide here. Covers PNG (RFC 2083 §3), baseline
  * and progressive JPEG (ITU-T T.81 §B) with APP0/COM/DQT segments and
  * restart/TEM standalone markers, and the corrupt shapes that must
  * yield NULL.
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
