package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins GzipInflate against REAL python-gzip encoder output (an
  * independent RFC 1952 implementation): a plain member, a member with
  * FNAME set (the common .gz-with-filename shape), and a hand-framed
  * member with FEXTRA + FHCRC — plus a JVM-side differential round-trip
  * over random/repetitive payloads via GZIPOutputStream, the INTEGRITY
  * contract (trailer CRC-32 and header CRC-16 are VERIFIED — real
  * encoder trailers pass, a flipped bit NULLs; the JDK encoders whose
  * output decodes here write their CRCs with java.util.zip, an
  * implementation independent of graft.functions.Checksums), and the
  * NULL contract: wrong magic/CM, reserved FLG bits, lying ISIZE (both
  * directions), truncation, and raw text.
  */
class GzipInflateSpec extends SparkSpec {
  import spark.implicits._

  private def gunzip(payloads: Array[Byte]*): Seq[Option[String]] =
    payloads.toSeq.toDF("b")
      .select(GzipInflate.gzip_inflate(col("b")).cast("string").as("t"))
      .collect().map(r => Option(r.getString(0))).toSeq

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private val text =
    "the quick brown fox jumps over the lazy dog, 42 times."
  // python gzip, mtime=0
  private val plain = hx(
    "1f8b08000000000002ff2bc94855282ccd4cce56482aca2fcf5348cbaf50c82acd2d" +
      "2856c82f4b2d5228014ae72456552aa4e4a7eb289818299464e6a616eb010044f430" +
      "4936000000")
  // python gzip with FNAME 'doc.txt'
  private val named = hx(
    "1f8b08083930000002ff646f632e747874002bc94855282ccd4cce56482aca2fcf53" +
      "48cbaf50c82acd2d2856c82f4b2d5228014ae72456552aa4e4a7eb289818299464e6" +
      "a616eb010044f4304936000000")
  // hand-framed FEXTRA (6 bytes) + FHCRC; the header CRC-16 at bytes
  // 18..19 is computed with the JDK's CRC32 (independent of the
  // Checksums table the decoder verifies with)
  private val extraHcrc = {
    val b = hx(
      "1f8b0806000000000003060041420200787900002bc94855282ccd4cce56482aca2f" +
        "cf5348cbaf50c82acd2d2856c82f4b2d5228014ae72456552aa4e4a7eb2898182994" +
        "64e6a616eb010044f4304936000000")
    val c = new java.util.zip.CRC32()
    c.update(b, 0, 18)
    b(18) = (c.getValue & 0xff).toByte
    b(19) = ((c.getValue >> 8) & 0xff).toByte
    b
  }

  test("real encoder members decode; FNAME/FEXTRA/FHCRC fields skip") {
    assert(gunzip(plain, named, extraHcrc) ==
      Seq(Some(text), Some(text), Some(text)))
  }

  test("JVM differential round-trip: GZIPOutputStream across payloads") {
    val rng = new scala.util.Random(9)
    val payloads = Seq(
      Array.empty[Byte],
      "x".getBytes,
      Array.fill[Byte](100000)(7),
      { val a = new Array[Byte](70000); rng.nextBytes(a); a },
      ("word " * 20000).getBytes)
    payloads.foreach { p =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(p); gz.close()
      val out = GzipInflate.gunzip(bos.toByteArray)
      assert(out != null && java.util.Arrays.equals(out, p),
        s"round-trip failed at len=${p.length}")
    }
  }

  test("corrupt members are NULL") {
    def mut(b: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = b.clone(); f(c); c
    }
    val badMagic = mut(plain)(_(0) = 0x1e.toByte)
    val badCm = mut(plain)(_(2) = 9)
    val reservedFlg = mut(plain)(_(3) = 0x40.toByte)
    val isizeHigh = mut(plain)(b => b(b.length - 4) = (text.length + 1).toByte)
    val isizeLow = mut(plain)(b => b(b.length - 4) = (text.length - 1).toByte)
    val truncated = plain.take(plain.length - 12)
    val rawText = "definitely not gzip".getBytes("UTF-8")
    assert(gunzip(badMagic, badCm, reservedFlg, isizeHigh, isizeLow,
      truncated, rawText, Array.empty[Byte]) == Seq.fill(8)(None))
  }

  test("integrity: flipped trailer CRC-32 or header CRC-16 is NULL") {
    val badCrc = plain.clone()
    badCrc(badCrc.length - 8) = (badCrc(badCrc.length - 8) ^ 1).toByte
    val badHcrc = extraHcrc.clone()
    badHcrc(18) = (badHcrc(18) ^ 1).toByte
    // flip a DEFLATE byte but keep the (now stale) trailer: content no
    // longer matches the CRC claim -> NULL, not garbage
    val bitRot = plain.clone()
    bitRot(12) = (bitRot(12) ^ 0x40).toByte
    assert(gunzip(badCrc, badHcrc, bitRot) == Seq(None, None, None))
  }

  test("null input yields NULL; SQL surface registered") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(GzipInflate.gzip_inflate(col("b")).as("t")).collect()
    assert(out(0).isNullAt(0))
    graft.functions.GraftFunctions.register(spark)
    val r = Seq(Tuple1(plain)).toDF("b")
      .selectExpr("CAST(gzip_inflate(b) AS STRING) AS t").collect()
    assert(r(0).getString(0) == text)
  }
}
