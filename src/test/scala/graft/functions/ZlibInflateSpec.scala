package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ZlibInflate against java.util.zip.Deflater — the zlib stream is
  * the Deflater's NATIVE output format, so round-trips exercise real
  * fixed- and dynamic-Huffman streams with real Adler trailers across
  * sizes/levels — plus the growth ladder (outputs far beyond the
  * 4×input floor), the 64 MB zip-bomb cap, and the NULL contract:
  * FDICT, bad FCHECK, wrong CM, flipped Adler, a flipped payload byte
  * under a stale Adler, truncation, raw text.
  */
class ZlibInflateSpec extends SparkSpec {
  import spark.implicits._

  private def unz(payloads: Array[Byte]*): Seq[Option[Seq[Byte]]] =
    payloads.toSeq.toDF("b")
      .select(ZlibInflate.zlib_inflate(col("b")).as("d"))
      .collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getAs[Array[Byte]](0).toSeq))
      .toSeq

  private def deflate(p: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(p); d.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
    d.end()
    buf.toByteArray
  }

  test("JDK Deflater round-trips across payloads and levels") {
    val rng = new scala.util.Random(23)
    val payloads = Seq(
      Array.empty[Byte],
      "z".getBytes,
      ("lorem ipsum " * 5000).getBytes, // 60 KB from a 200-byte-ish blob
      { val a = new Array[Byte](100000); rng.nextBytes(a); a },
      Array.fill[Byte](1 << 20)(7)) // 1 MB of RLE: deep growth ladder
    for (p <- payloads; level <- Seq(0, 1, 6, 9)) {
      val z = deflate(p, level)
      val out = ZlibInflate.unzlib(z)
      assert(out != null && java.util.Arrays.equals(out, p),
        s"round-trip len=${p.length} level=$level")
    }
  }

  test("growth ladder: output far beyond the 4x-input floor") {
    // 8 MB of zeros deflates to ~8 KB: the decoder must double from
    // the 64 KB floor up through 8 MB
    val p = new Array[Byte](8 << 20)
    val out = ZlibInflate.unzlib(deflate(p, 9))
    assert(out != null && out.length == p.length && out.forall(_ == 0))
  }

  test("the 64 MB cap NULLs a bomb instead of decoding it") {
    val p = new Array[Byte](80 << 20) // 80 MB of zeros > MaxOutputBytes
    assert(ZlibInflate.unzlib(deflate(p, 9)) == null)
  }

  test("NULL contract") {
    val text = "integrity matters at the lakehouse gate".getBytes("UTF-8")
    val good = deflate(text, 6)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val fdict = mut(b => b(1) = 0x20) // CMF 78: FCHECK also valid
    val badFcheck = mut(b => b(1) = 0x02)
    val badCm = mut(b => b(0) = 0x79)
    val badAdler = mut(b => b(b.length - 1) = (b(b.length - 1) ^ 1).toByte)
    val bitRot = mut(b => b(4) = (b(4) ^ 0x10).toByte)
    val truncated = good.take(good.length - 5)
    val raw = "not zlib data".getBytes("UTF-8")
    assert(unz(fdict, badFcheck, badCm, badAdler, bitRot, truncated, raw,
      Array.empty[Byte]) == Seq.fill(8)(None))
    assert(unz(good) == Seq(Some(text.toSeq)))
    // SLACK bytes between the deflate terminator and the Adler trailer:
    // the trailer still matches (it's read from the last 4 bytes) but a
    // real zlib decoder rejects the stream — so must we (r11 advice)
    val slack = good.take(good.length - 4) ++
      Array[Byte](0) ++ good.takeRight(4)
    assert(unz(slack) == Seq(None))
  }

  test("null input yields NULL; SQL surface registered") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(ZlibInflate.zlib_inflate(col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(deflate("ok".getBytes, 6))).toDF("b")
      .selectExpr("CAST(zlib_inflate(b) AS STRING) AS t").collect()
    assert(r(0).getString(0) == "ok")
  }
}
