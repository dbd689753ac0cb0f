package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins GifPixels three independent ways: (1) HAND-COMPUTED LZW bit
  * streams assembled from the spec on paper — the [1,1,1,1] mcs=2
  * stream whose last literal is emitted at the POST-BUMP width (pins
  * the width-increase timing) and a [2,2,2] stream exercising the
  * self-referencing `code == next` case; (2) spec-faithful generated
  * vectors (an independent pure-python encoder, resource hex) with
  * real dictionary growth across multiple width bumps, interlacing
  * (sums are row-order-invariant — the reason interlace is in scope),
  * a local color table overriding a deliberately-wrong global one, and
  * comment/graphic-control extensions on both sides of the image;
  * (3) the strict NULL contract: bad signature, missing palette, pixel
  * index outside the palette, a code past `next`, a non-literal first
  * code, pixel count off by one in both directions, truncated stream,
  * missing trailer, trailing bytes, raw text. Animated GIFs (round 16)
  * decode the FIRST frame and count the rest — frame counts and
  * first-frame pixels pinned vs javax.imageio's reader, corrupt later
  * frames still NULL the whole file.
  */
class GifPixelsSpec extends SparkSpec {
  import spark.implicits._

  private def px(payloads: Array[Byte]*)
      : Seq[Option[(Int, Int, Long, Long, Long, Long)]] =
    payloads.toSeq.toDF("b")
      .select(GifPixels.gif_pixels(col("b")).as("p"))
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

  private def res(name: String): Array[Byte] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/gif/$name"))
    try hx(src.mkString.trim) finally src.close()
  }

  // GIF89a, 2x2 screen, GCT 4 entries: (10,20,30) (1,2,3) (100,0,200)
  // (5,6,7); mcs=2
  private val gct4 = "0A141E 010203 6400C8 050607"
  private def gif2x2(lzwDataHex: String, mcs: Int = 2,
      imgW: String = "0200", imgH: String = "0200",
      lsdPacked: String = "81", tail: String = "3B"): Array[Byte] =
    hx("474946383961 0200 0200 " + lsdPacked + " 00 00 " + gct4 +
      " 2C 0000 0000 " + imgW + " " + imgH + " 00 " +
      "%02X".format(mcs) + lzwDataHex + " 00 " + tail)

  test("hand-computed LZW: width-bump timing on [1,1,1,1] at mcs=2") {
    // codes: CLEAR(4)@3b, 1@3b, 6@3b, 1@3b (the decoder's add after
    // this one makes next=8=2^3 -> bump), END(5)@4b
    // bits 001 100 011 100 1010 => bytes 8C 53
    // pixels: four of palette[1] = (1,2,3)
    val v = gif2x2(" 02 8C53")
    assert(px(v) == Seq(Some((2, 2, 4L, 4L, 8L, 12L))))
  }

  test("hand-computed LZW: the self-referencing code==next case") {
    // [2,2,2] needs a 1x3 image: CLEAR(4), 2, 6(==next: prev+first),
    // END => bits 001 010 011 101 => pixels three of palette[2]
    // bits flat: 0,0,1,0,1,0,0,1,1,1,0,1 => byte0=10110100=0x2C? LSB:
    // b0=0 b1=0 b2=1 b3=0 b4=1 b5=0 b6=0 b7=1 -> 4+16+128=0x94;
    // byte1: b0=1 b1=1 b2=0 b3=1 -> 1+2+8=0x0B
    val v = gif2x2(" 02 940B", imgW = "0100", imgH = "0300")
    assert(px(v) == Seq(Some((1, 3, 3L, 300L, 0L, 600L))))
  }

  test("generated real-LZW vectors: growth, width bumps, 101x83") {
    assert(px(res("plain.hex"), res("big.hex")) == Seq(
      Some((13, 11, 143L, 7982L, 12584L, 14170L)),
      Some((101, 83, 8383L, 938465L, 959137L, 1079649L))))
  }

  test("interlaced image: sums are row-order-invariant") {
    assert(px(res("interlaced.hex")) ==
      Seq(Some((13, 11, 143L, 7982L, 12584L, 14170L))))
  }

  test("REAL encoder output decodes: javax.imageio GIF writer") {
    // the JDK's own GIF encoder (an independent canonical
    // implementation) over the SAME palettes/pixels as the generated
    // vectors — it writes interlaced streams at mcs=8; sums must match
    // the hand-computed expectations exactly
    assert(px(res("imageio.hex"), res("imageio_big.hex")) == Seq(
      Some((13, 11, 143L, 7982L, 12584L, 14170L)),
      Some((101, 83, 8383L, 938465L, 959137L, 1079649L))))
  }

  test("local color table wins over a wrong global; extensions skip") {
    assert(px(res("lct.hex")) ==
      Seq(Some((13, 11, 143L, 7982L, 12584L, 14170L))))
  }

  test("strict NULL contract") {
    val badSig = {
      val b = gif2x2(" 02 8C53"); b(4) = '8'; b
    }
    // LSD says no GCT and the image has no LCT: no active palette
    val noPalette = hx("474946383961 0200 0200 00 00 00" +
      " 2C 0000 0000 0200 0200 00 02 02 8C53 00 3B")
    // palette has 4 entries but a literal 3 is fine; shrink the GCT to
    // 2 entries (lsdPacked 80) while mcs=2 keeps literal space 0..3:
    // stream emits index 2 >= palSize 2
    val idxPastPalette = hx("474946383961 0200 0200 80 00 00" +
      " 0A141E 010203" +
      " 2C 0000 0000 0100 0300 00 02 02 940B 00 3B")
    // count mismatches: the 4-pixel stream under a 1x3 and a 2x3 image
    val tooMany = gif2x2(" 02 8C53", imgW = "0100", imgH = "0300")
    val tooFew = gif2x2(" 02 8C53", imgW = "0200", imgH = "0300")
    // a code past next: CLEAR, literal 1, then 7 while next=6
    // bits: 001 100 111 -> bytes 0xCC 0x01
    val codePastNext = gif2x2(" 02 CC01")
    // first code after clear is not a literal: CLEAR then 6
    // bits: 001 011 -> 0,0,1,0,1,1 -> 0x34
    val nonLiteralFirst = gif2x2(" 01 34")
    // truncated: bits run out before END
    val truncated = gif2x2(" 01 8C")
    val noTrailer = gif2x2(" 02 8C53", tail = "")
    val trailingJunk = gif2x2(" 02 8C53", tail = "3B 00")
    val text = "certainly not a gif".getBytes("UTF-8")
    assert(px(badSig, noPalette, idxPastPalette, tooMany, tooFew,
      codePastNext, nonLiteralFirst, truncated, noTrailer, trailingJunk,
      text, Array.empty[Byte]) == Seq.fill(12)(None))
  }

  private def frames(payloads: Array[Byte]*): Seq[Option[Int]] =
    payloads.toSeq.toDF("b")
      .select(GifPixels.gif_frames(col("b")).as("f"))
      .collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq

  test("animated GIF: first-frame pixels decode, later frames counted") {
    // two identical 2x2 frames, all-index-1 pixels -> first frame sums
    // (1,2,3)*4; a GCE extension between them (realistic GIF89a shape)
    val twoFrames = gif2x2(" 02 8C53",
      tail = "21F9 04 04 0A00 00 00" + // graphic control ext
        " 2C 0000 0000 0200 0200 00 02 02 8C53 00 3B")
    // a NETSCAPE looping application extension before frame 2, and a
    // LOCAL color table on frame 2 (walked, never read)
    val looped = gif2x2(" 02 8C53",
      tail = "21FF 0B 4E45545343415045322E30 03 010000 00" +
        " 2C 0000 0000 0200 0200 81" + " 0A141E 010203 6400C8 050607" +
        " 02 02 8C53 00 3B")
    assert(px(twoFrames, looped) == Seq(
      Some((2, 2, 4L, 4L, 8L, 12L)), Some((2, 2, 4L, 4L, 8L, 12L))))
    assert(frames(gif2x2(" 02 8C53"), twoFrames, looped) ==
      Seq(Some(1), Some(2), Some(2)))
    // corrupt SECOND frames still NULL the whole file: zero dims, a bad
    // min-code-size, truncated sub-blocks, a truncated local table
    val zeroDim = gif2x2(" 02 8C53",
      tail = "2C 0000 0000 0000 0200 00 02 02 8C53 00 3B")
    val badMcs = gif2x2(" 02 8C53",
      tail = "2C 0000 0000 0200 0200 00 01 02 8C53 00 3B")
    val truncSub = gif2x2(" 02 8C53",
      tail = "2C 0000 0000 0200 0200 00 02 FF 8C53")
    val truncLct = gif2x2(" 02 8C53",
      tail = "2C 0000 0000 0200 0200 82 0A141E")
    assert(px(zeroDim, badMcs, truncSub, truncLct) == Seq.fill(4)(None))
    assert(frames(zeroDim, badMcs, truncSub, truncLct) == Seq.fill(4)(None))
  }

  test("animated frame count + first frame pinned vs javax.imageio") {
    val twoFrames = gif2x2(" 02 8C53",
      tail = "21F9 04 04 0A00 00 00" +
        " 2C 0000 0000 0200 0200 00 02 02 8C53 00 3B")
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(twoFrames))
    val rd = javax.imageio.ImageIO.getImageReaders(in).next()
    rd.setInput(in)
    assert(rd.getNumImages(true) == 2)
    val img = rd.read(0)
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    rd.dispose()
    assert(px(twoFrames) == Seq(Some((2, 2, 4L, sr, sg, sb))))
    assert(frames(twoFrames) == Seq(Some(2)))
  }

  test("null input yields NULL; SQL surface registered") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(GifPixels.gif_pixels(col("b")).as("p")).collect()
    assert(out(0).isNullAt(0))
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(res("plain.hex"))).toDF("b")
      .selectExpr("gif_pixels(b).n_px AS n").collect()
    assert(r(0).getLong(0) == 143L)
  }
}
