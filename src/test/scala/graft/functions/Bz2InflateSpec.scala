package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bz2Inflate pinned against TWO independent implementations:
  *  - bzip2(1) CLI output, frozen here as hex constants (levels 1 and
  *    9, a concatenated two-stream file, an RLE1-heavy payload);
  *  - commons-compress (on the Spark classpath), used to round-trip a
  *    battery of generated payloads — unicode, random bytes, long
  *    runs, empty-ish, multi-block at level 1 — through
  *    BZip2CompressorOutputStream and back through bz2_inflate.
  * Plus the family's NULL-on-corrupt contract: flipped CRC, truncated
  * stream, bad magics, garbage after the footer, the deprecated
  * randomized bit.
  */
class Bz2InflateSpec extends SparkSpec {
  import spark.implicits._

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def inflate(blobs: Array[Byte]*): Seq[Option[Array[Byte]]] =
    blobs.toSeq.toDF("b")
      .select(Bz2Inflate.bz2_inflate(col("b")))
      .collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getAs[Array[Byte]](0))).toSeq

  // bzip2(1) output, generated once and frozen (see file history):
  //   printf 'hello bzip2 world\n' | bzip2 -9
  private val Cli9 = "425a6839314159265359a4534a50000003d98000104000100016" +
    "64d0902000229813686a100001c3dc58f1dc8e1380fc5dc914e14242914d2940"
  //   (printf 'alpha\n' | bzip2 -1; printf 'beta\n' | bzip2 -9) — two
  //   concatenated streams in one file (the pbzip2 layout)
  private val CliCat = "425a683131415926535911bb3195000001418000102044400" +
    "020002183419a09698e2ee48a70a1202376632a425a68393141592653597f980fb2" +
    "000001418000103200040020002183419a085c71772453850907f980fb20"
  //   'z'*1000 + 'ab'*30 + 'z'*255 | bzip2 -1 — RLE1 counts + long runs
  private val CliRuns = "425a6831314159265359668ef4f300001f8181b0000010008" +
    "00008200030cd008a699f1160ad094130bb9229c284833477a798"

  test("decodes bzip2(1) output: level 9, simple text") {
    assert(new String(inflate(unhex(Cli9)).head.get, "UTF-8") ==
      "hello bzip2 world\n")
  }

  test("concatenated streams decode as one payload (pbzip2 layout)") {
    assert(new String(inflate(unhex(CliCat)).head.get, "UTF-8") ==
      "alpha\nbeta\n")
  }

  test("RLE1 runs and RUNA/RUNB zero-runs decode (bzip2 -1)") {
    assert(new String(inflate(unhex(CliRuns)).head.get, "UTF-8") ==
      "z" * 1000 + "ab" * 30 + "z" * 255)
  }

  test("round-trips commons-compress output across payload shapes") {
    val payloads: Seq[Array[Byte]] = Seq(
      "".getBytes("UTF-8"),
      "a".getBytes("UTF-8"),
      "héllo wörld 🙂 中文".getBytes("UTF-8"),
      ("the quick brown fox " * 500).getBytes("UTF-8"),
      Array.fill(4)('q'.toByte) ++ Array.fill(259)('r'.toByte),
      Array.tabulate(65536)(i => (i * 131 % 251).toByte), // pseudo-random
      Array.fill(300000)('x'.toByte) // multi-block at level 1
    )
    val blobs = payloads.zipWithIndex.map { case (p, i) =>
      val bos = new java.io.ByteArrayOutputStream()
      val z = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(bos, if (i == 6) 1 else 9)
      z.write(p); z.close()
      bos.toByteArray
    }
    val got = inflate(blobs: _*)
    payloads.zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(g.isDefined, s"payload $i NULLed")
      assert(java.util.Arrays.equals(g.get, want), s"payload $i mismatch")
    }
  }

  test("NULL on corruption: CRC flip, truncation, bad magic, trailing " +
    "garbage, randomized bit") {
    val good = unhex(Cli9)
    val crcFlip = good.clone(); crcFlip(10) = (crcFlip(10) ^ 1).toByte
    val badMagic = good.clone(); badMagic(0) = 'C'.toByte
    val truncated = good.take(good.length - 3)
    val trailing = good ++ Array[Byte](0x42)
    // the randomized bit is the bit right after the 32-bit block CRC;
    // block magic starts at byte 4, so CRC ends at bit 4*8+48+32 = 112
    // bits = byte 14 bit 0
    val randomized = good.clone()
    randomized(14) = (randomized(14) ^ 0x80).toByte
    val got = inflate(crcFlip, badMagic, truncated, trailing, randomized)
    assert(got == Seq(None, None, None, None, None))
    // and the untouched blob still decodes (guards the vectors above)
    assert(inflate(good).head.isDefined)
  }

  test("decompression bomb: output cap NULLs, does not OOM") {
    // 64 MB of zeros compresses to ~some KB; cap is exactly MaxOutputBytes
    val bos = new java.io.ByteArrayOutputStream()
    val z = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bos, 9)
    val chunk = new Array[Byte](1 << 20)
    (0 until 65) .foreach(_ => z.write(chunk)) // 65 MB > 64 MB cap
    z.close()
    assert(inflate(bos.toByteArray).head.isEmpty)
  }
}
