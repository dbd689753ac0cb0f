package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins BmpPixels against HAND-WRITTEN BMP bytes laid out from the
  * public BITMAPFILEHEADER/BITMAPINFOHEADER spec — not round-tripped
  * through the query's construction. Covers bottom-up and top-down
  * (negative height) orientations with NON-uniform pixels (each channel
  * a distinct sum, so a BGR swap or a stride slip cannot cancel), the
  * 4-byte row padding, and the corrupt shapes that must yield NULL.
  */
class BmpPixelsSpec extends SparkSpec {
  import spark.implicits._

  private def px(payloads: Array[Byte]*)
      : Seq[Option[(Int, Int, Long, Long, Long, Long)]] =
    payloads.toSeq.toDF("b")
      .select(BmpPixels.bmp_pixels(col("b")).as("p"))
      .select(col("p.width"), col("p.height"), col("p.n_px"),
        col("p.sum_r"), col("p.sum_g"), col("p.sum_b"))
      .collect().map { r =>
        if (r.isNullAt(0)) None
        else Some((r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      }.toSeq

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def header(heightHex: String): String =
    "424D 46000000 00000000 36000000" +            // BM, size, res, offset 54
      " 28000000 02000000 " + heightHex +          // info 40, w=2, h
      " 0100 1800 00000000 10000000" +             // planes, 24bpp, BI_RGB
      " 00000000 00000000 00000000 00000000"
  // two 8-byte rows (6 pixel bytes + 2 pad): BGR sums B=55 G=77 R=99
  private val pixels =
    " 0A141E 28323C 0000" +
      " 010203 040506 0000"

  private val bottomUp = hx(header("02000000") + pixels)
  private val topDown = hx(header("FEFFFFFF") + pixels) // height = -2

  test("real BMP bytes decode to exact per-channel pixel sums, " +
    "both orientations") {
    assert(px(bottomUp, topDown) == Seq(
      Some((2, 2, 4L, 99L, 77L, 55L)),
      Some((2, 2, 4L, 99L, 77L, 55L))))
  }

  test("non-decodable and corrupt shapes yield NULL") {
    val bpp8 = hx(header("02000000").replace(" 0100 1800 ", " 0100 0800 ") +
      pixels)
    val rle = hx(header("02000000").replace(" 00000000 10000000",
      " 01000000 10000000") + pixels)
    val truncated = hx(header("02000000") + " 0A141E 28323C 0000") // 1 row
    val offsetInHeader = hx((header("02000000") + pixels)
      .replaceAll("36000000 28000000", "0A000000 28000000"))
    val zeroWidth = hx((header("02000000") + pixels)
      .replaceAll("28000000 02000000", "28000000 00000000"))
    val magicOnly = hx("424D")
    val text = "just some text bytes".getBytes("UTF-8")
    assert(px(bpp8, rle, truncated, offsetInHeader, zeroWidth, magicOnly,
      text, Array.empty[Byte]) == Seq.fill(8)(None))
  }

  test("null input yields NULL") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(BmpPixels.bmp_pixels(col("b")).as("p")).collect()
    assert(out(0).isNullAt(0))
  }
}
