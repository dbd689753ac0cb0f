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
    // a VP8L payload under a lossy fourcc parses as a VP8 frame tag
    // with keyframe=0 (0x2F is odd) — malformed, NULLs
    val lossyFourcc = mut { b => b(15) = ' ' }
    val raw = "not a webp".getBytes
    val out = Seq(badRiff, badSig, truncated, lossyFourcc, raw,
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

  // ---- lossy (`VP8 `) battery: (name, w, h, sumR, sumG, sumB,
  // reference WebPDecodeRGBA rgba md5) — tools/gen_vp8_fixtures.py +
  // gen_vp8_fixtures_adv.py; every vector round-trip-validated against
  // libwebp at generation time
  private val lossyVectors = Seq(
    ("alpha_best", 96, 64, 755761L, 683681L, 757348L,
      "648294efdec49314a7e56b39c3fc3e00"),
    ("alpha_blocky", 96, 64, 755864L, 684549L, 756664L,
      "eff191c6614bd3d8cb508c2ad0e8dc64"),
    ("alpha_default", 96, 64, 756327L, 683884L, 757088L,
      "724b5868f0d2be5d352502e85356fcfa"),
    ("alpha_gfilt", 96, 64, 755233L, 683860L, 756914L,
      "0d6d02ec83e95dab75e0be72184a8276"),
    ("alpha_nofilter", 96, 64, 755955L, 685013L, 757037L,
      "a1aa3edf708e8ef1ebc06dfba60c9e04"),
    ("alpha_raw", 96, 64, 755233L, 683860L, 756914L,
      "0d6d02ec83e95dab75e0be72184a8276"),
    ("alpha_vfilt", 96, 64, 755233L, 683860L, 756914L,
      "0d6d02ec83e95dab75e0be72184a8276"),
    ("lossy_autofilter", 160, 128, 2596505L, 2598811L, 2606797L,
      "05970af54b0bbb6d6060a9559d9e0903"),
    ("lossy_flat_q75", 32, 24, 53072L, 107622L, 161720L,
      "478899eeda4a0c888ed9149c984b1a12"),
    ("lossy_grad_q10", 64, 48, 391150L, 389646L, 389353L,
      "47c3006ac1c19225b3581707516b7bf9"),
    ("lossy_grad_q50", 64, 48, 390642L, 390128L, 391221L,
      "aa30e618b21dde2a899ce544f1cb9b9e"),
    ("lossy_grad_q90", 64, 48, 390388L, 390015L, 389875L,
      "63ff428d248f134ce77a48acd9f8baf5"),
    ("lossy_method0", 160, 128, 2600001L, 2596920L, 2611606L,
      "26c9d93d865a5a6bceb08756d65725b8"),
    ("lossy_method6", 160, 128, 2599496L, 2598154L, 2607046L,
      "7d970691117960e0e9173bc084cb9fe7"),
    ("lossy_nofilterenc", 160, 128, 2597879L, 2598853L, 2606633L,
      "e5d236400fcd17ff881c25e96cb401c9"),
    ("lossy_noise_q50", 40, 40, 207458L, 206370L, 201804L,
      "3482f9df67af3a3bc3d6ad98bc282b01"),
    ("lossy_odd_q75", 17, 13, 43314L, 44125L, 45219L,
      "4dfb58e09932d1f1b718c1190264470d"),
    ("lossy_parts8", 160, 128, 2594227L, 2599319L, 2601814L,
      "4845770c4f84cb1aa2057b91a8568427"),
    ("lossy_photo_q10", 176, 144, 3201410L, 3289727L, 3189374L,
      "deb8099e31eb9f0b3a5a70aca362d5bd"),
    ("lossy_photo_q75", 176, 144, 3203242L, 3289283L, 3187468L,
      "05d380f972bded8f9b2dbe296ac66dc7"),
    ("lossy_q1", 160, 128, 2601981L, 2598236L, 2613310L,
      "4eb4eca0cd3d37072169a95f37c79253"),
    ("lossy_q100", 160, 128, 2602887L, 2597030L, 2611675L,
      "7ebdc245cc0a6e3d3449dc4a6e66941b"),
    ("lossy_seg1", 160, 128, 2596441L, 2599232L, 2605823L,
      "02b0fea08a8d6996f3ef062f8fe1402d"),
    ("lossy_sharp7", 160, 128, 2596964L, 2598746L, 2605283L,
      "8f72651dd17e7b03af74f5b39cc9dece"),
    ("lossy_simplefilter", 160, 128, 2596210L, 2597171L, 2604943L,
      "f8b779cfba233ff333524a13af2caf35"),
    ("lossy_stripes_q50", 48, 32, 184643L, 184612L, 116460L,
      "65cecde9ccef68541c047d13a50d86c8"),
    ("lossy_tiny_q75", 5, 3, 1943L, 1859L, 1939L,
      "8ebcd9c812d810da281176d3713a4cbe")
  )

  private def rgbaMd5(px: Array[Int]): String = {
    // the reference hash is over RGBA byte order with alpha 255
    val b = new Array[Byte](px.length * 4)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      b(4 * i) = (p >>> 16).toByte
      b(4 * i + 1) = (p >>> 8).toByte
      b(4 * i + 2) = p.toByte
      b(4 * i + 3) = (p >>> 24).toByte
      i += 1
    }
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString
  }

  test("lossy VP8: 27 libwebp streams decode RGBA-exact " +
      "(qualities 1-100, segments, B_PRED modes, 8 token partitions, " +
      "simple/normal/none loop filter, sharpness, odd dims, and " +
      "VP8X+ALPH alpha: raw + VP8L-coded planes under all four " +
      "filters — the md5 covers the alpha bytes)") {
    for ((name, w, h, r, g, bl, md5) <- lossyVectors) {
      val (ww, hh, px) = WebpPixels.decodeArgb(res(s"$name.hex"))
      assert((ww, hh) == (w, h), s"$name dims")
      assert(rgbaMd5(px) == md5, s"$name pixels vs WebPDecodeRGBA")
      val row = WebpPixels.parse(res(s"$name.hex"))
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
      assert(row.getInt(0) == w && row.getInt(1) == h &&
        row.getLong(2) == w.toLong * h && row.getLong(3) == r &&
        row.getLong(4) == g && row.getLong(5) == bl, s"$name sums")
    }
  }

  test("lossy VP8 NULL contract: malformed frames never decode quietly") {
    val good = res("lossy_photo_q75.hex")
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    // VP8 payload starts at 20: frame tag(3) + start code 9D 01 2A
    val interFrame = mut(b => b(20) = (b(20) | 1).toByte) // not a keyframe
    val badStart = mut(b => b(23) = 0x00)
    val truncated = good.take(40)
    val hugePart0 = mut { b => b(22) = 0x7f.toByte } // part0 len past end
    val out = Seq(interFrame, badStart, truncated, hugePart0)
      .map(WebpPixels.parse)
    assert(out.forall(_ == null))
    // bit rot inside a token partition: NULL or different pixels, never
    // an exception
    val rot = mut(b => b(b.length / 2) = (b(b.length / 2) ^ 0x10).toByte)
    val r = WebpPixels.parse(rot)
    if (r != null) {
      val (_, _, px) = WebpPixels.decodeArgb(rot)
      assert(rgbaMd5(px) !=
        lossyVectors.find(_._1 == "lossy_photo_q75").get._7)
    }
  }
}
