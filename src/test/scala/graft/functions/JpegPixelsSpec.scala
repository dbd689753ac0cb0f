package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins JpegPixels against the JDK's JPEG codec (libjpeg-derived — an
  * independent implementation of T.81): random grayscale and
  * metadata-forced 4:4:4 color images round-trip BIT-EXACT (the LL&M
  * integer IDCT and the CCIR 601 fixed-point color conversion agree
  * sample-for-sample with the reference decoder), while default 4:2:0
  * output agrees within a 1-per-pixel sum tolerance — chroma
  * upsampling interpolation is the one degree of freedom T.81 leaves
  * to decoders (libjpeg interpolates, this probe replicates; on
  * DC-flat chroma the two coincide, which the hand-built 4:2:0 vector
  * pins exactly). Hand-built DC-only streams additionally pin the
  * restart-marker cadence (DRI + RST sequence checks + predictor
  * resets) and the 4:2:0 MCU interleave, and the strict NULL contract
  * covers malformed scan headers, undefined tables, invalid Huffman
  * codes, coefficient overruns, truncation, missing EOI and trailing
  * bytes. PROGRESSIVE (SOF2) streams — the JDK writer's standard
  * 10-scan progression script — round-trip bit-exact since r15.
  */
class JpegPixelsSpec extends SparkSpec {
  import spark.implicits._

  private def px(payloads: Array[Byte]*)
      : Seq[Option[(Int, Int, Long, Long, Long, Long)]] =
    payloads.toSeq.toDF("b")
      .select(JpegPixels.jpeg_pixels(col("b")).as("p"))
      .select(col("p.width"), col("p.height"), col("p.n_px"),
        col("p.sum_r"), col("p.sum_g"), col("p.sum_b"))
      .collect().map { r =>
        if (r.isNullAt(0)) None
        else Some((r.getInt(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      }.toSeq

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // --- JDK encoders ---
  private def jdkEncode(img: java.awt.image.BufferedImage, quality: Float,
      force444: Boolean, progressive: Boolean = false): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    var md: javax.imageio.metadata.IIOMetadata = null
    if (force444) {
      val itype =
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
      md = w.getDefaultImageMetadata(itype, p)
      val tree = md.getAsTree("javax_imageio_jpeg_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val comps = tree.getElementsByTagName("sof").item(0).getChildNodes
      for (i <- 0 until comps.getLength) {
        val c = comps.item(i).asInstanceOf[org.w3c.dom.Element]
        c.setAttribute("HsamplingFactor", "1")
        c.setAttribute("VsamplingFactor", "1")
      }
      md.setFromTree("javax_imageio_jpeg_image_1.0", tree)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, md), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  /** JDK-decoded channel sums straight off the raster (getRGB would
    * gamma-transform grayscale).
    */
  private def jdkSums(jpg: Array[Byte]): (Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    val ras = img.getRaster
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      if (ras.getNumBands == 1) {
        val v = ras.getSample(x, y, 0); sr += v; sg += v; sb += v
      } else {
        sr += ras.getSample(x, y, 0); sg += ras.getSample(x, y, 1)
        sb += ras.getSample(x, y, 2)
      }
    }
    (sr, sg, sb)
  }

  private def randomImage(w: Int, h: Int, gray: Boolean, seed: Int)
      : java.awt.image.BufferedImage = {
    val rng = new scala.util.Random(seed)
    val img = new java.awt.image.BufferedImage(w, h,
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rng.nextInt(1 << 24))
    img
  }

  test("grayscale: BIT-EXACT against the JDK decoder") {
    for ((w, h, q, seed) <- Seq((16, 16, 0.9f, 1), (24, 17, 0.5f, 2),
      (8, 8, 1.0f, 3), (61, 43, 0.75f, 4), (100, 80, 0.3f, 5))) {
      val jpg = jdkEncode(randomImage(w, h, gray = true, seed), q,
        force444 = false)
      val (sr, sg, sb) = jdkSums(jpg)
      assert(px(jpg) == Seq(Some((w, h, w.toLong * h, sr, sg, sb))),
        s"gray w=$w h=$h q=$q")
    }
  }

  test("4:4:4 color: BIT-EXACT against the JDK decoder") {
    for ((w, h, q, seed) <- Seq((24, 19, 0.9f, 11), (8, 8, 1.0f, 12),
      (40, 33, 0.6f, 13), (64, 48, 0.75f, 14))) {
      val jpg = jdkEncode(randomImage(w, h, gray = false, seed), q,
        force444 = true)
      val (sr, sg, sb) = jdkSums(jpg)
      assert(px(jpg) == Seq(Some((w, h, w.toLong * h, sr, sg, sb))),
        s"color444 w=$w h=$h q=$q")
    }
  }

  test("4:2:0 color: sums within the upsampling freedom (<= 1/px)") {
    for ((w, h, q, seed) <- Seq((40, 33, 0.9f, 21), (64, 48, 0.75f, 22))) {
      val jpg = jdkEncode(randomImage(w, h, gray = false, seed), q,
        force444 = false)
      val (sr, sg, sb) = jdkSums(jpg)
      val Seq(Some((pw, ph, npx, mr, mg, mb))) = px(jpg)
      assert(pw == w && ph == h && npx == w.toLong * h)
      assert(math.abs(mr - sr) <= npx && math.abs(mg - sg) <= npx &&
        math.abs(mb - sb) <= npx, s"420 w=$w h=$h q=$q: " +
        s"${mr - sr}/${mg - sg}/${mb - sb}")
    }
  }

  private def hasSof2(jpg: Array[Byte]): Boolean =
    jpg.sliding(2).exists(p => p(0) == 0xff.toByte && p(1) == 0xc2.toByte)

  private def gradientImage(w: Int, h: Int, gray: Boolean)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / math.max(1, w - 1)
      val g = (y * 255) / math.max(1, h - 1)
      val b = ((x + y) * 255) / math.max(1, w + h - 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  test("PROGRESSIVE grayscale: BIT-EXACT against the JDK decoder " +
      "(DC first+refine, AC spectral bands, successive approximation)") {
    for ((w, h, q, seed) <- Seq((16, 16, 0.9f, 31), (24, 17, 0.5f, 32),
      (61, 43, 0.75f, 33), (100, 80, 0.3f, 34), (8, 8, 1.0f, 35))) {
      val jpg = jdkEncode(randomImage(w, h, gray = true, seed), q,
        force444 = false, progressive = true)
      assert(hasSof2(jpg), "JDK writer must emit SOF2")
      val (sr, sg, sb) = jdkSums(jpg)
      assert(px(jpg) == Seq(Some((w, h, w.toLong * h, sr, sg, sb))),
        s"prog gray w=$w h=$h q=$q")
    }
    // smooth gradients: DC-dominated scans, EOB-run-heavy AC scans
    for ((w, h, q) <- Seq((64, 48, 0.8f), (33, 29, 0.4f))) {
      val jpg = jdkEncode(gradientImage(w, h, gray = true), q,
        force444 = false, progressive = true)
      val (sr, sg, sb) = jdkSums(jpg)
      assert(px(jpg) == Seq(Some((w, h, w.toLong * h, sr, sg, sb))),
        s"prog gray gradient w=$w h=$h q=$q")
    }
  }

  test("PROGRESSIVE 4:4:4 color: BIT-EXACT against the JDK decoder") {
    for ((w, h, q, seed) <- Seq((24, 19, 0.9f, 41), (40, 33, 0.6f, 42),
      (64, 48, 0.75f, 43), (8, 8, 1.0f, 44))) {
      val jpg = jdkEncode(randomImage(w, h, gray = false, seed), q,
        force444 = true, progressive = true)
      assert(hasSof2(jpg))
      val (sr, sg, sb) = jdkSums(jpg)
      assert(px(jpg) == Seq(Some((w, h, w.toLong * h, sr, sg, sb))),
        s"prog color444 w=$w h=$h q=$q")
    }
    val jpg = jdkEncode(gradientImage(48, 40, gray = false), 0.7f,
      force444 = true, progressive = true)
    val (sr, sg, sb) = jdkSums(jpg)
    assert(px(jpg) == Seq(Some((48, 40, 48L * 40, sr, sg, sb))))
  }

  test("PROGRESSIVE 4:2:0 color: sums within the upsampling freedom") {
    for ((w, h, q, seed) <- Seq((40, 33, 0.9f, 51), (64, 48, 0.75f, 52))) {
      val jpg = jdkEncode(randomImage(w, h, gray = false, seed), q,
        force444 = false, progressive = true)
      assert(hasSof2(jpg))
      val (sr, sg, sb) = jdkSums(jpg)
      val Seq(Some((pw, ph, npx, mr, mg, mb))) = px(jpg)
      assert(pw == w && ph == h && npx == w.toLong * h)
      assert(math.abs(mr - sr) <= npx && math.abs(mg - sg) <= npx &&
        math.abs(mb - sb) <= npx, s"prog420 w=$w h=$h q=$q: " +
        s"${mr - sr}/${mg - sg}/${mb - sb}")
    }
  }

  test("PROGRESSIVE NULL contract: truncation and table gaps") {
    val good = jdkEncode(randomImage(32, 24, gray = true, 61), 0.8f,
      force444 = false, progressive = true)
    assert(px(good.take(good.length / 2)) == Seq(None), "truncated")
    assert(px(good.dropRight(2)) == Seq(None), "missing EOI")
    assert(px(good :+ 0x00.toByte) == Seq(None), "trailing byte")

    // mid-frame DQT redefining a table a scan already used: libjpeg/
    // the JDK latch tables at the first scan, so this must NULL rather
    // than dequantize differently at EOI (r16, from the r15 advisor)
    def hx(s: String) = s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    val redef = {
      val eoiAt = good.length - 2
      good.take(eoiAt) ++ hx("FFDB 0043 00" + "10" * 64) ++
        good.drop(eoiAt)
    }
    assert(px(redef) == Seq(None), "mid-frame DQT redefinition")
    // an UNUSED table id may still be defined between scans
    val defNew = {
      val eoiAt = good.length - 2
      good.take(eoiAt) ++ hx("FFDB 0043 03" + "10" * 64) ++
        good.drop(eoiAt)
    }
    assert(px(defNew).head.isDefined, "unused-table DQT is fine")
  }

  test("PROGRESSIVE scan order: AC or refinement before DC is NULL") {
    val good = jdkEncode(randomImage(32, 24, gray = true, 62), 0.8f,
      force444 = false, progressive = true)
    // find the scans; the JDK's progression script opens with the DC
    // scan — dropping it makes the first remaining scan AC-first
    def scanOffsets(b: Array[Byte]): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var p = 2
      while (p + 4 <= b.length) {
        if ((b(p) & 0xff) == 0xff && (b(p + 1) & 0xff) == 0xda) out += p
        p += 1
      }
      out.toSeq
    }
    val scans = scanOffsets(good)
    assert(scans.length >= 2)
    val acFirst = good.take(scans.head) ++ good.drop(scans(1))
    assert(px(acFirst) == Seq(None))
  }

  // --- hand-built DC-only streams (trivial tables: DC category t is
  // the 4-bit code t; AC EOB is the 1-bit code 0) ---
  private val dqt8 = "FFDB 0043 00" + "08" * 64
  private val dhtDc =
    "FFC4 001F 00" + "0000000C" + "00" * 12 + "000102030405060708090A0B"
  private val dhtAc = "FFC4 0014 10" + "01" + "00" * 15 + "00"

  private final class BitWriter {
    private val bytes = scala.collection.mutable.ArrayBuffer.empty[Int]
    private var cur = 0
    private var nbits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | b
      nbits += 1
      if (nbits == 8) {
        bytes += cur
        if (cur == 0xff) bytes += 0x00 // byte stuffing
        cur = 0; nbits = 0
      }
    }
    def bits(v: Int, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bit((v >> i) & 1))
    def dcBlock(diff: Int): Unit = {
      val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(
        math.abs(diff))
      bits(cat, 4)
      if (cat > 0) bits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      bit(0) // AC EOB
    }
    def hexAligned: String = {
      while (nbits != 0) bit(1) // pad with 1s
      bytes.map("%02X".format(_)).mkString
    }
  }

  private def be16(v: Int): String = "%04X".format(v)

  test("hand-built DC-only grayscale with DRI + restart markers") {
    // 24x8: three MCUs, DRI=1 -> RST0 after MCU0, RST1 after MCU1;
    // predictors RESET at each restart, so every diff is the raw dc
    val grays = Seq(200, 64, 130)
    val parts = grays.map { g =>
      val bw = new BitWriter; bw.dcBlock(g - 128); bw.hexAligned
    }
    val entropy = parts(0) + "FFD0" + parts(1) + "FFD1" + parts(2)
    val jpg = hx("FFD8" + dqt8 + dhtDc + dhtAc +
      "FFC0 000B 08" + be16(8) + be16(24) + "01 011100" +
      "FFDD 0004 0001" +
      "FFDA 0008 01 0100 00 3F 00" + entropy + "FFD9")
    val sum = grays.map(_ * 64L).sum
    assert(px(jpg) == Seq(Some((24, 8, 192L, sum, sum, sum))))
    // a mis-sequenced restart (RST1 first) must NULL
    val bad = hx("FFD8" + dqt8 + dhtDc + dhtAc +
      "FFC0 000B 08" + be16(8) + be16(24) + "01 011100" +
      "FFDD 0004 0001" +
      "FFDA 0008 01 0100 00 3F 00" + parts(0) + "FFD1" + parts(1) +
      "FFD0" + parts(2) + "FFD9")
    assert(px(bad) == Seq(None))
  }

  test("hand-built DC-only 4:2:0 color: MCU interleave + flat chroma") {
    // one 16x16 MCU: four Y blocks (2x2 sampling) + one Cb + one Cr.
    // flat chroma makes upsampling interpolation-independent.
    val y = 150; val cb = 100; val cr = 140
    val bw = new BitWriter
    bw.dcBlock(y - 128) // Y block 0: diff = dc
    bw.dcBlock(0) // Y blocks 1-3: same dc -> diff 0
    bw.dcBlock(0)
    bw.dcBlock(0)
    bw.dcBlock(cb - 128)
    bw.dcBlock(cr - 128)
    val jpg = hx("FFD8" + dqt8 + dhtDc + dhtAc +
      "FFC0 0011 08" + be16(16) + be16(16) + "03 012200 021100 031100" +
      "FFDA 000C 03 0100 0200 0300 00 3F 00" + bw.hexAligned + "FFD9")
    def conv(yv: Int, cbv: Int, crv: Int): (Long, Long, Long) = {
      def cl(v: Long) = math.max(0L, math.min(255L, v))
      (cl(((yv.toLong << 16) + 91881L * (crv - 128) + 32768L) >> 16),
        cl(((yv.toLong << 16) - 22554L * (cbv - 128) - 46802L * (crv - 128)
          + 32768L) >> 16),
        cl(((yv.toLong << 16) + 116130L * (cbv - 128) + 32768L) >> 16))
    }
    val (r, g, b) = conv(y, cb, cr)
    assert(px(jpg) == Seq(Some((16, 16, 256L, 256L * r, 256L * g, 256L * b))))
  }

  test("strict NULL contract") {
    val preEntropy = "FFD8" + dqt8 + dhtDc + dhtAc +
      "FFC0 000B 08" + be16(8) + be16(8) + "01 011100" +
      "FFDA 0008 01 0100 00 3F 00"
    val entropy = {
      val bw = new BitWriter; bw.dcBlock(72 - 128); bw.hexAligned
    }
    val goodHex = preEntropy + entropy
    val good = hx(goodHex + "FFD9")
    assert(px(good) == Seq(Some((8, 8, 64L, 64L * 72, 64L * 72, 64L * 72))))
    // SOF2 with a BASELINE-SHAPED scan header (Ss=0,Se=63): invalid in
    // a progressive frame (DC scans cover coefficient 0 only)
    val progressive = hx(goodHex.replace("FFC0 000B", "FFC2 000B") + "FFD9")
    // DC code 1100 = category 12: not among the 12 defined symbols
    val badHuff = hx(preEntropy + "CF" + "FFD9")
    val noEoi = hx(goodHex)
    val trailing = hx(goodHex + "FFD9 00")
    val noDqt = hx(("FFD8" + dhtDc + dhtAc +
      "FFC0 000B 08" + be16(8) + be16(8) + "01 011100" +
      "FFDA 0008 01 0100 00 3F 00CF") + "FFD9")
    val truncated = good.take(good.length - 40)
    val text = "surely not a jpeg".getBytes("UTF-8")
    assert(px(progressive, badHuff, noEoi, trailing, noDqt, truncated,
      text, Array.empty[Byte]) == Seq.fill(8)(None))
  }

  test("null input yields NULL; SQL surface registered") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(JpegPixels.jpeg_pixels(col("b")).as("p")).collect()
    assert(out(0).isNullAt(0))
    GraftFunctions.register(spark)
    val jpg = jdkEncode(randomImage(8, 8, gray = true, 7), 0.9f,
      force444 = false)
    val r = Seq(Tuple1(jpg)).toDF("b")
      .selectExpr("jpeg_pixels(b).n_px AS n").collect()
    assert(r(0).getLong(0) == 64L)
  }
}
