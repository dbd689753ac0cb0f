package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the VP8L decoder PIXEL-EXACT against the reference libwebp:
  * every vector was encoded by the real libwebp encoder
  * (WebPEncodeLosslessRGBA via ctypes) and its expected ARGB bytes
  * verified by the real libwebp DECODER (WebPDecodeRGBA) at generation
  * time — md5s below are of that reference output. Shapes chosen to
  * force distinct bitstream features: flat (LZ77/cache), gradient
  * (predictors + subtract-green), 4- and 2-color palettes
  * (color-indexing with 2- and 8-per-byte pixel BUNDLING), noise with
  * a live alpha channel (literal-heavy trees), photo-like (predictor +
  * color-transform blocks), stripes (backward references), and a
  * 300×200 mixed image (meta prefix-code groups).
  */
class WebpPixelsSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): Array[Byte] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/webp/$name"))
    try src.mkString.trim.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    finally src.close()
  }

  private def argbMd5(px: Array[Int]): String = {
    val b = new Array[Byte](px.length * 4)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      b(4 * i) = (p >>> 24).toByte
      b(4 * i + 1) = (p >>> 16).toByte
      b(4 * i + 2) = (p >>> 8).toByte
      b(4 * i + 3) = p.toByte
      i += 1
    }
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString
  }

  // (name, w, h, sumR, sumG, sumB, reference-decoder argb md5)
  private val vectors = Seq(
    ("flat", 33, 17, 5610L, 112200L, 16830L,
      "6b22341985807a4d8a5ac6e9fdebe75f"),
    ("gradient", 64, 48, 387072L, 360960L, 415488L,
      "3e59ec33fd54270d572509cc139affe5"),
    ("palette4", 37, 23, 81451L, 81451L, 54315L,
      "fb07746bda75405c41da332f591f3335"),
    ("palette2", 50, 9, 57375L, 57375L, 0L,
      "14ffd56706db71605efd5cb861c52aa3"),
    ("noise", 40, 30, 148928L, 155281L, 154512L,
      "328e177a653c91ff06ba733ff250063b"),
    ("photo", 160, 120, 2866567L, 2678942L, 2386294L,
      "5610e4d07b40b3a858d920783841f5f9"),
    ("stripes", 128, 64, 942080L, 942080L, 942080L,
      "0a40effd77cdb34e35d4270459425498"),
    ("big", 300, 200, 6639100L, 6336300L, 4312500L,
      "a781ea5815e803e52ec755cba95771b5"))

  test("real libwebp frames decode pixel-exact (argb md5 vs reference)") {
    for ((name, w, h, _, _, _, md5) <- vectors) {
      val (dw, dh, px) = WebpPixels.decodeArgb(res(s"$name.hex"))
      assert((dw, dh) == (w, h), s"$name dims")
      assert(argbMd5(px) == md5, s"$name pixels differ from reference")
    }
  }

  test("struct output carries the exact channel sums") {
    val rows = vectors.map { case (name, _, _, _, _, _, _) =>
      Tuple1(res(s"$name.hex"))
    }.toDF("b")
      .select(WebpPixels.webp_pixels(col("b")).as("p"))
      .select("p.width", "p.height", "p.n_px", "p.sum_r", "p.sum_g", "p.sum_b")
      .collect()
    vectors.zip(rows).foreach { case ((name, w, h, r, g, bl, _), row) =>
      assert(row.getInt(0) == w && row.getInt(1) == h &&
        row.getLong(2) == w.toLong * h && row.getLong(3) == r &&
        row.getLong(4) == g && row.getLong(5) == bl, s"$name sums")
    }
  }

  test("VP8X extended container: metadata chunks walked past to VP8L") {
    // the gradient VP8L chunk wrapped in VP8X + an odd-sized EXIF chunk
    // (pad byte live) — the shape real webp files with metadata use;
    // libwebp decodes it to the same pixels (validated at generation)
    val (w, h, px) = WebpPixels.decodeArgb(res("vp8x_gradient.hex"))
    assert((w, h) == (64, 48))
    assert(argbMd5(px) == "3e59ec33fd54270d572509cc139affe5")
  }

  test("strict NULL contract") {
    val good = res("photo.hex")
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val badRiff = mut(b => b(0) = 'X')
    val badSig = mut(b => b(20) = 0x30) // VP8L payload signature != 0x2F
    val truncated = good.take(good.length / 2)
    // lossy VP8: flip the chunk fourcc to 'VP8 ' — out of scope
    val lossy = mut { b => b(15) = ' ' }
    val raw = "not a webp".getBytes
    val out = Seq(badRiff, badSig, truncated, lossy, raw,
      Array.empty[Byte]).map(WebpPixels.parse)
    assert(out.forall(_ == null))
    // bit rot inside the entropy stream must never decode quietly:
    // either NULL or different pixels, never an exception
    val rot = mut(b => b(40) = (b(40) ^ 0x10).toByte)
    val r = WebpPixels.parse(rot)
    if (r != null) {
      val (_, _, px) = WebpPixels.decodeArgb(rot)
      assert(argbMd5(px) != vectors.find(_._1 == "photo").get._7)
    }
  }

  test("null input yields NULL; SQL surface registered") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(WebpPixels.webp_pixels(col("b")).as("p")).collect()
    assert(out(0).isNullAt(0))
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(res("flat.hex"))).toDF("b")
      .selectExpr("webp_pixels(b).n_px AS n").collect()
    assert(r(0).getLong(0) == 33L * 17)
  }
}
