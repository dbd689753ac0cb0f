package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins PngPixels against HAND-WRITTEN PNG bytes assembled from the
  * public specs (PNG chunk grammar, RFC 1950 zlib, RFC 1951 stored
  * blocks) — not round-tripped through the query's own construction, so
  * a matching construct/parse bug cannot hide. Checksums in these
  * vectors come from java.util.zip.{CRC32, Adler32} — the JDK's
  * INDEPENDENT implementations of the specs the decoder verifies with
  * (graft.functions.Checksums) — so the verification paths are
  * differentially covered here, not self-confirmed. Covers a
  * single-IDAT stored stream, the zlib stream split across two IDAT
  * chunks, multiple stored blocks (including an empty final block),
  * the INTEGRITY contract (a flipped chunk CRC-32 or zlib Adler-32
  * NULLs), hand-computed reconstruction for all FIVE standard filter
  * types (None/Sub/Up/Average/Paeth, incl. the mod-256 wrap),
  * REAL-ENCODER files (python zlib: a Z_FIXED fixed-Huffman 2x2 and a
  * dynamic-Huffman 16x100, stored as resource hex with binascii-crc32
  * chunk trailers — output of independent implementations of the same
  * RFCs), and the NULL contract: reserved BTYPE, undefined filter
  * types, wrong NLEN, truncation, RGBA/interlace/depth declarations,
  * IHDR-not-first, FDICT, bad FCHECK, raw text.
  */
class PngPixelsSpec extends SparkSpec {
  import spark.implicits._

  private def px(payloads: Array[Byte]*)
      : Seq[Option[(Int, Int, Long, Long, Long, Long)]] =
    payloads.toSeq.toDF("b")
      .select(PngPixels.png_pixels(col("b")).as("p"))
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

  private val sig = "89504E47 0D0A1A0A"

  /** Chunk with a REAL CRC-32 (JDK CRC32 over type + data). */
  private def chunk(typ: String, dataHex: String): String = {
    val data = hx(dataHex)
    val len = data.length
    val c = new java.util.zip.CRC32()
    c.update(hx(typ)); c.update(data)
    f"$len%08X $typ $dataHex ${c.getValue}%08X"
  }

  /** Big-endian Adler-32 hex (JDK Adler32) of a raw-hex scanline stream. */
  private def adler(rawHex: String): String = {
    val a = new java.util.zip.Adler32()
    a.update(hx(rawHex))
    f"${a.getValue}%08X"
  }

  // 2x2, depth 8, colour type 2 (RGB), no interlace
  private def ihdrChunk(depth: String = "08", colorType: String = "02",
      interlace: String = "00"): String =
    chunk("49484452",
      s"00000002 00000002 $depth $colorType 00 00 $interlace")
  private val ihdr2x2 = ihdrChunk()
  // raw scanlines: row0 = filter 0, (1,2,3) (4,5,6);
  //                row1 = filter 0, (250,0,128) (7,8,9)
  // sums: r = 1+4+250+7 = 262, g = 2+5+0+8 = 15, b = 3+6+128+9 = 146
  private val raw2x2 = "00 010203 040506" + " 00 FA0080 070809" // 14 bytes
  private val iend = chunk("49454E44", "")
  private val expect2x2 = Some((2, 2, 4L, 262L, 15L, 146L))
  // one final stored block LEN=14 NLEN=~14 around raw2x2, real Adler
  private val okData = "7801 01 0E00 F1FF " + raw2x2 + " " + adler(raw2x2)

  test("single-IDAT stored-deflate RGB PNG decodes to exact sums") {
    val v = hx(sig + ihdr2x2 + chunk("49444154", okData) + iend)
    assert(px(v) == Seq(expect2x2))
  }

  test("zlib stream split across two IDAT chunks concatenates") {
    val idat1 = chunk("49444154", "7801 01 0E00 F1FF")
    val idat2 = chunk("49444154", raw2x2 + " " + adler(raw2x2))
    val v = hx(sig + ihdr2x2 + idat1 + idat2 + iend)
    assert(px(v) == Seq(expect2x2))
  }

  test("multiple stored blocks, including an empty final block") {
    // block1 (not final) carries row0 (7 bytes), block2 (final) row1
    val twoBlocks = chunk("49444154",
      "7801 00 0700 F8FF 00 010203 040506 01 0700 F8FF 00 FA0080 070809 " +
        adler(raw2x2))
    // block1 carries all 14 bytes, final block is EMPTY (LEN=0)
    val emptyFinal = chunk("49444154",
      "7801 00 0E00 F1FF " + raw2x2 + " 01 0000 FFFF " + adler(raw2x2))
    val a = hx(sig + ihdr2x2 + twoBlocks + iend)
    val b = hx(sig + ihdr2x2 + emptyFinal + iend)
    assert(px(a, b) == Seq(expect2x2, expect2x2))
  }

  test("all five filter types reconstruct per RFC 2083 §6 (hand-computed)") {
    def img(rawHex: String): Array[Byte] =
      hx(sig + ihdr2x2 + chunk("49444154",
        "7801 01 0E00 F1FF " + rawHex + " " + adler(rawHex)) + iend)
    // Sub: row0 filter 1, raw (1,2,3)(4,5,6) -> px (1,2,3)(5,7,9);
    //      row1 filter 0, (250,0,128)(7,8,9)
    val sub = img("01 010203 040506 00 FA0080 070809")
    // Up: row0 filter 0 (1,2,3)(4,5,6);
    //     row1 filter 2, raw (10,20,30)(1,2,3) -> (11,22,33)(5,7,9)
    val up = img("00 010203 040506 02 0A141E 010203")
    // Average: row0 filter 3, raw (16,32,48)(10,10,10)
    //   -> (16,32,48)(18,26,34); row1 filter 3, raw all 2
    //   -> (10,18,26)(16,24,32)
    val avg = img("03 102030 0A0A0A 03 020202 020202")
    // Paeth: row0 filter 4, raw (5,6,7)(8,9,10) -> (5,6,7)(13,15,17);
    //   row1 filter 4, raw all 1 -> (6,7,8)(14,16,18)
    val paeth = img("04 050607 08090A 04 010101 010101")
    // Sub with mod-256 wrap: (250,0,0) then +10 -> (4,0,0); row1 zeros
    val wrap = img("01 FA0000 0A0000 00 000000 000000")
    assert(px(sub, up, avg, paeth, wrap) == Seq(
      Some((2, 2, 4L, 263L, 17L, 149L)),
      Some((2, 2, 4L, 21L, 36L, 51L)),
      Some((2, 2, 4L, 60L, 100L, 140L)),
      Some((2, 2, 4L, 38L, 44L, 50L)),
      Some((2, 2, 4L, 254L, 0L, 0L))))
  }

  test("integrity: flipped chunk CRC-32 or zlib Adler-32 is NULL") {
    val good = hx(sig + ihdr2x2 + chunk("49444154", okData) + iend)
    // flip one bit in the IDAT chunk's CRC (last 4 bytes before IEND's
    // 12-byte chunk)
    val badIdatCrc = good.clone()
    badIdatCrc(good.length - 13) = (badIdatCrc(good.length - 13) ^ 1).toByte
    // flip one bit in the IHDR CRC
    val badIhdrCrc = good.clone()
    badIhdrCrc(8 + 8 + 13) = (badIhdrCrc(8 + 8 + 13) ^ 1).toByte
    // wrong Adler: correct framing, trailer off by one
    val badAdlerHex = {
      val a = new java.util.zip.Adler32()
      a.update(hx(raw2x2))
      f"${(a.getValue + 1) & 0xffffffffL}%08X"
    }
    val badAdler = hx(sig + ihdr2x2 +
      chunk("49444154", "7801 01 0E00 F1FF " + raw2x2 + " " + badAdlerHex) +
      iend)
    // flip a PIXEL byte but keep the (now stale) checksums
    val bitRot = good.clone()
    bitRot(8 + 8 + 13 + 4 + 8 + 7) = 0x7f.toByte
    assert(px(good, badIdatCrc, badIhdrCrc, badAdler, bitRot) ==
      Seq(expect2x2, None, None, None, None))
  }

  test("corrupt and out-of-scope shapes yield NULL") {
    def mk(idatData: String, ihdr: String = ihdr2x2): Array[Byte] =
      hx(sig + ihdr + chunk("49444154", idatData) + iend)
    val reservedBtype = mk("7801 07 0E00 F1FF " + raw2x2 + " " + adler(raw2x2))
    val badNlen = mk("7801 01 0E00 F0FF " + raw2x2 + " " + adler(raw2x2))
    val truncated = mk("7801 01 0E00 F1FF 00 010203") // body short
    val shortStream = // one row only
      mk("7801 01 0700 F8FF 00 010203 040506 " + adler("00 010203 040506"))
    val filteredRaw = "05 010203 040506 00 FA0080 070809"
    val filteredRow =
      mk("7801 01 0E00 F1FF " + filteredRaw + " " + adler(filteredRaw))
    val fdictSet = mk("7820 01 0E00 F1FF " + raw2x2 + " " + adler(raw2x2))
    val badFcheck = mk("7802 01 0E00 F1FF " + raw2x2 + " " + adler(raw2x2))
    // rgba/interlaced are IN scope since r15 — these lanes stay NULL
    // because okData's raw size doesn't match the RGBA / Adam7 layout
    val rgba = mk(okData, ihdrChunk(colorType = "06"))
    val depth16 = mk(okData, ihdrChunk(depth = "10")) // raw-size mismatch
    val interlaced = mk(okData, ihdrChunk(interlace = "01"))
    val ihdrNotFirst = hx(sig + chunk("67414D41", "00000000") + ihdr2x2 +
      chunk("49444154", okData) + iend)
    val noIdat = hx(sig + ihdr2x2 + iend)
    val text = "just some text bytes, not a png".getBytes("UTF-8")
    assert(px(reservedBtype, badNlen, truncated, shortStream, filteredRow,
      fdictSet, badFcheck, rgba, depth16, interlaced, ihdrNotFirst, noIdat,
      text, Array.empty[Byte]) == Seq.fill(14)(None))
  }

  test("REAL encoder output decodes: fixed-Huffman and dynamic-Huffman") {
    def res(name: String): Array[Byte] = {
      val src = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream(s"/png/$name"))
      try hx(src.mkString.trim) finally src.close()
    }
    // python zlib Z_FIXED over the spec's 2x2 scanlines; python zlib
    // level 9 over a 16x100 image big enough that the encoder emits a
    // DYNAMIC-Huffman block (verified at generation: BTYPE=10); chunk
    // CRCs written by python binascii.crc32
    val fixed = res("fixed_2x2.hex")
    val dyn = res("dynamic_16x100.hex")
    assert(px(fixed, dyn) == Seq(
      expect2x2,
      Some((16, 100, 1600L, 62940L, 64223L, 64688L))))
  }

  test("more than 1024 chunks decode: the cap derives from input size") {
    // libpng-family encoders emit one IDAT per ~8KB; a fixed 1024-chunk
    // guard rejected valid PNGs past ~8MB compressed (r11 advice). Re-
    // chunk the 2x2 zlib stream into ONE-BYTE IDATs (boundaries are
    // arbitrary per ISO 15948) -> ~1400 chunks, must still decode.
    val zHex = ("7801 01 0E00 F1FF " + raw2x2 + " " + adler(raw2x2))
      .replace(" ", "")
    val manyIdats = zHex.grouped(2).map(b => chunk("49444154", b)).mkString
    val v = hx(sig + ihdr2x2 + manyIdats + iend)
    assert(px(v) == Seq(expect2x2))
  }

  test("slack byte between deflate terminator and Adler trailer is NULL") {
    val idat = chunk("49444154",
      "7801 01 0E00 F1FF " + raw2x2 + " 00 " + adler(raw2x2))
    val v = hx(sig + ihdr2x2 + idat + iend)
    assert(px(v) == Seq(None))
  }

  test("null input yields NULL") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(PngPixels.png_pixels(col("b")).as("p")).collect()
    assert(out(0).isNullAt(0))
  }

  test("registered on the SQL surface") {
    graft.functions.GraftFunctions.register(spark)
    val v = hx(sig + ihdr2x2 + chunk("49444154", okData) + iend)
    val out = Seq(Tuple1(v)).toDF("b")
      .selectExpr("png_pixels(b).sum_r AS r").collect()
    assert(out(0).getLong(0) == 262L)
  }

  // ---- r15 battery: color types 0/2/3/4/6, depths 1/2/4/8, Adam7 ----
  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/png/$name.hex")
    assert(in != null, s"missing /png/$name.hex")
    try hx(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
    finally in.close()
  }

  /** Reference channel sums via the JDK's PNG reader — raster samples
    * for gray forms (getRGB would gamma-transform), getRGB for palette
    * (the IndexColorModel lookup is exact), raw bands for RGB(A).
    */
  private def jdkPngSums(png: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    if (img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) {
      for (y <- 0 until h; x <- 0 until w) {
        val v = img.getRGB(x, y)
        sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
      }
    } else {
      val ras = img.getRaster
      val nb = ras.getNumBands
      val ss = ras.getSampleModel.getSampleSize(0)
      // depth < 8 scales up; depth 16 projects via the HIGH byte (the
      // strip-16 convention the decoder documents)
      def proj(v: Int): Int =
        if (ss == 16) v >> 8 else v * (255 / ((1 << ss) - 1))
      for (y <- 0 until h; x <- 0 until w) {
        if (nb <= 2) {
          val v = proj(ras.getSample(x, y, 0))
          sr += v; sg += v; sb += v
        } else {
          sr += proj(ras.getSample(x, y, 0))
          sg += proj(ras.getSample(x, y, 1))
          sb += proj(ras.getSample(x, y, 2))
        }
      }
    }
    (w, h, sr, sg, sb)
  }

  test("r15 battery: gray 1/2/4/8/16, palette 1/2/4/8, gray+alpha, " +
      "RGBA 8/16, and Adam7 interlace all match the JDK decoder") {
    val names = Seq("rgba8", "gray8", "gray4", "gray2", "gray1", "graya8",
      "pal8", "pal4", "pal2", "pal1", "rgb8_adam7", "rgba8_adam7",
      "gray8_adam7", "pal8_adam7", "tiny_adam7", "rgb16", "gray16",
      "rgba16_adam7")
    for (name <- names) {
      val png = res(name)
      val (w, h, sr, sg, sb) = jdkPngSums(png)
      assert(px(png) == Seq(Some((w, h, w.toLong * h, sr, sg, sb))),
        s"$name vs JDK")
    }
  }

  test("r15 battery NULL lanes: missing PLTE, palette index overrun, " +
      "PLTE on grayscale") {
    val pal = res("pal4")
    // strip the PLTE chunk: palette type with no palette -> NULL
    def dropChunk(png: Array[Byte], typ: String): Array[Byte] = {
      var p = 8
      while (p + 8 <= png.length) {
        val len = ((png(p) & 0xff) << 24) | ((png(p + 1) & 0xff) << 16) |
          ((png(p + 2) & 0xff) << 8) | (png(p + 3) & 0xff)
        val t = new String(png, p + 4, 4, "ISO-8859-1")
        if (t == typ)
          return png.take(p) ++ png.drop(p + 12 + len)
        p += 12 + len
      }
      png
    }
    val noPlte = dropChunk(pal, "PLTE")
    assert(px(noPlte) == Seq(None))

    // ---- palette index overrun: shrink pal4's PLTE below the max
    // index actually used (found via the JDK raster), rebuilding the
    // chunk with a real CRC so ONLY the overrun trips the NULL ----
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val len = Array((data.length >> 24).toByte, (data.length >> 16).toByte,
        (data.length >> 8).toByte, data.length.toByte)
      val body = typ.getBytes("ISO-8859-1") ++ data
      val crc = new java.util.zip.CRC32
      crc.update(body)
      val c = crc.getValue
      len ++ body ++ Array((c >> 24).toByte, (c >> 16).toByte,
        (c >> 8).toByte, c.toByte)
    }
    def replaceChunk(png: Array[Byte], typ: String,
        repl: Array[Byte]): Array[Byte] = {
      var p = 8
      while (p + 8 <= png.length) {
        val len = ((png(p) & 0xff) << 24) | ((png(p + 1) & 0xff) << 16) |
          ((png(p + 2) & 0xff) << 8) | (png(p + 3) & 0xff)
        val t = new String(png, p + 4, 4, "ISO-8859-1")
        if (t == typ) return png.take(p) ++ repl ++ png.drop(p + 12 + len)
        p += 12 + len
      }
      fail(s"no $typ chunk")
    }
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pal))
    val ras = img.getRaster
    var maxIdx = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      maxIdx = math.max(maxIdx, ras.getSample(x, y, 0))
    assert(maxIdx >= 1) // the fixture uses more than one palette entry
    // keep exactly maxIdx entries: the max index in use is now out of
    // range, everything else about the file stays valid
    val shrunk = replaceChunk(pal, "PLTE",
      chunk("PLTE", Array.fill(3 * maxIdx)(0x10.toByte)))
    assert(px(shrunk) == Seq(None))

    // ---- PLTE attached to a GRAYSCALE image (forbidden for color
    // types 0/4 by the spec): insert a valid 2-entry PLTE before IDAT ----
    val gray = res("gray8")
    def insertBeforeIdat(png: Array[Byte], ins: Array[Byte]): Array[Byte] = {
      var p = 8
      while (p + 8 <= png.length) {
        val len = ((png(p) & 0xff) << 24) | ((png(p + 1) & 0xff) << 16) |
          ((png(p + 2) & 0xff) << 8) | (png(p + 3) & 0xff)
        val t = new String(png, p + 4, 4, "ISO-8859-1")
        if (t == "IDAT") return png.take(p) ++ ins ++ png.drop(p)
        p += 12 + len
      }
      fail("no IDAT")
    }
    val grayWithPlte = insertBeforeIdat(gray,
      chunk("PLTE", Array.fill(6)(0x20.toByte)))
    assert(px(gray).head.isDefined) // the base fixture itself decodes
    assert(px(grayWithPlte) == Seq(None))
  }

}
