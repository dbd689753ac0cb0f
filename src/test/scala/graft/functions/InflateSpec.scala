package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Inflate decoder DIFFERENTIALLY against java.util.zip's
  * Deflater — an independent reference implementation of the same RFC:
  * round-trips across compression levels (1/6/9 — different block-type
  * mixes), strategies (default, filtered, Huffman-only), input shapes
  * (random bytes, highly repetitive LZ77-heavy runs, all-zero,
  * single-byte, empty), and multi-block streams; plus hand malformation
  * checks (reserved BTYPE, bad stored NLEN, truncation, distance before
  * output start, wrong declared size). Pure JVM test — no Spark session
  * needed.
  */
class InflateSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte], level: Int,
      strategy: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level, true) // raw deflate
    d.setStrategy(strategy)
    d.setInput(data)
    d.finish()
    val outBuf = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!d.finished) {
      val n = d.deflate(buf)
      outBuf.write(buf, 0, n)
    }
    d.end()
    outBuf.toByteArray
  }

  private def roundtrip(data: Array[Byte], level: Int, strategy: Int): Unit = {
    val z = deflate(data, level, strategy)
    val out = new Array[Byte](data.length)
    val n = Inflate.inflate(z, 0, out)
    assert(n == data.length,
      s"len=${data.length} level=$level strategy=$strategy: got $n")
    assert(java.util.Arrays.equals(out, data),
      s"len=${data.length} level=$level strategy=$strategy: bytes differ")
  }

  private val rng = new scala.util.Random(1234)

  test("round-trips random data across levels and strategies") {
    val strategies = Seq(java.util.zip.Deflater.DEFAULT_STRATEGY,
      java.util.zip.Deflater.FILTERED, java.util.zip.Deflater.HUFFMAN_ONLY)
    for (len <- Seq(1, 2, 63, 64, 255, 4096, 70000);
         level <- Seq(1, 6, 9); st <- strategies) {
      val data = new Array[Byte](len)
      rng.nextBytes(data)
      roundtrip(data, level, st)
    }
  }

  test("round-trips LZ77-heavy repetitive data (long matches, overlaps)") {
    val pat = "abcabcabcabd".getBytes
    val runs = Array.fill(50000)(pat(rng.nextInt(pat.length)))
    roundtrip(runs, 9, java.util.zip.Deflater.DEFAULT_STRATEGY)
    roundtrip(Array.fill[Byte](100000)(0), 9,
      java.util.zip.Deflater.DEFAULT_STRATEGY)
    val text = ("the quick brown fox jumps over the lazy dog " * 3000).getBytes
    roundtrip(text, 6, java.util.zip.Deflater.DEFAULT_STRATEGY)
  }

  test("round-trips level-0 stored streams and empty input") {
    val data = new Array[Byte](300000) // > 65535: multiple stored blocks
    rng.nextBytes(data)
    roundtrip(data, 0, java.util.zip.Deflater.DEFAULT_STRATEGY)
    roundtrip(Array.empty[Byte], 6, java.util.zip.Deflater.DEFAULT_STRATEGY)
  }

  test("malformed streams are rejected, never thrown or mis-sized") {
    def bad(hex: String, dstLen: Int): Unit = {
      val src = hex.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      val out = new Array[Byte](dstLen)
      assert(Inflate.inflate(src, 0, out) != dstLen, s"accepted: $hex")
    }
    bad("07 0000", 1)             // reserved BTYPE=11
    bad("01 0200 FEFF 61", 2)     // stored: one byte short
    bad("01 0200 FDFD 6161", 2)   // stored: NLEN mismatch
    bad("", 1)                    // empty stream
    // fixed-huffman: a back-reference before any output: code for
    // length-3 match immediately (sym 257 = 7 bits 0000001), dist 0
    bad("82 01", 3)
    // valid stream but wrong declared size: "a" deflated, dst of 2
    val z = deflate(Array[Byte]('a'), 6,
      java.util.zip.Deflater.DEFAULT_STRATEGY)
    val out = new Array[Byte](2)
    assert(Inflate.inflate(z, 0, out) != 2)
  }

  test("decodes a REAL zlib fixed-Huffman stream (Z_FIXED encoder output)") {
    // python zlib, strategy Z_FIXED, raw PNG scanlines of the 2x2 image:
    // zlib-wrapped, so inflate starts at offset 2
    val hex = "78016360646266616563f8c5d0c0cec1090008e301a8"
    val src = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val want = Array[Byte](0, 1, 2, 3, 4, 5, 6, 0, 250.toByte, 0,
      128.toByte, 7, 8, 9)
    val out = new Array[Byte](want.length)
    assert(Inflate.inflate(src, 2, out) == want.length)
    assert(java.util.Arrays.equals(out, want))
  }
}
