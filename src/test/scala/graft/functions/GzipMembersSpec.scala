package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins GzipMembers against REAL encoder output: concatenated
  * GZIPOutputStream members (the JDK encoder — real DEFLATE streams
  * whose extents only the decoder can find) across member counts and
  * payload shapes, a python-gzip + FNAME + hand-framed FEXTRA/FHCRC
  * member mix (reusing GzipInflateSpec's vectors), single-member
  * equivalence with gzip_inflate, and the strict NULL contract:
  * trailing garbage after the last member, a corrupt SECOND member
  * (all-or-nothing), flipped per-member CRC/ISIZE, truncation mid
  * member, empty input.
  */
class GzipMembersSpec extends SparkSpec {
  import spark.implicits._

  private def members(payloads: Array[Byte]*)
      : Seq[Option[Seq[Seq[Byte]]]] =
    payloads.toSeq.toDF("b")
      .select(GzipMembers.gzip_members(col("b")).as("m"))
      .collect().map { r =>
        if (r.isNullAt(0)) None
        else Some(r.getSeq[Array[Byte]](0).map(_.toSeq))
      }.toSeq

  private def gz(p: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(p); g.close(); bos.toByteArray
  }

  private val a = "first record payload, compressible aaaaaa".getBytes
  private val b = ("second " * 500).getBytes
  private val c = Array.empty[Byte]
  private val rnd = { val x = new Array[Byte](50000)
    new scala.util.Random(31).nextBytes(x); x }

  test("concatenated JDK members decode in order; 1 member == gunzip") {
    val blob = gz(a) ++ gz(b) ++ gz(c) ++ gz(rnd)
    assert(members(blob) ==
      Seq(Some(Seq(a.toSeq, b.toSeq, c.toSeq, rnd.toSeq))))
    val one = gz(b)
    assert(members(one) == Seq(Some(Seq(b.toSeq))))
    assert(GzipInflate.gunzip(one).toSeq == b.toSeq)
  }

  test("python + FNAME + FEXTRA/FHCRC member shapes walk correctly") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    val text = "the quick brown fox jumps over the lazy dog, 42 times."
    val plain = hx(
      "1f8b08000000000002ff2bc94855282ccd4cce56482aca2fcf5348cbaf50c82acd2d" +
        "2856c82f4b2d5228014ae72456552aa4e4a7eb289818299464e6a616eb010044f430" +
        "4936000000")
    val named = hx(
      "1f8b08083930000002ff646f632e747874002bc94855282ccd4cce56482aca2fcf53" +
        "48cbaf50c82acd2d2856c82f4b2d5228014ae72456552aa4e4a7eb289818299464e6" +
        "a616eb010044f4304936000000")
    val blob = plain ++ named ++ gz(a)
    assert(members(blob) ==
      Seq(Some(Seq(text.getBytes.toSeq, text.getBytes.toSeq, a.toSeq))))
  }

  test("strict NULL contract: all members or nothing") {
    val good = gz(a) ++ gz(b)
    val trailingJunk = good ++ "x".getBytes
    val corruptSecond = {
      val x = good.clone(); x(gz(a).length) = 0x1e; x
    }
    val badCrc2 = {
      val x = good.clone(); x(x.length - 8) = (x(x.length - 8) ^ 1).toByte
      x
    }
    val badIsize2 = {
      val x = good.clone(); x(x.length - 4) = (x(x.length - 4) ^ 1).toByte
      x
    }
    val truncated = good.take(good.length - 3)
    val bitRot = {
      val x = good.clone(); x(gz(a).length + 12) =
        (x(gz(a).length + 12) ^ 0x40).toByte
      x
    }
    assert(members(trailingJunk, corruptSecond, badCrc2, badIsize2,
      truncated, bitRot, "plain".getBytes, Array.empty[Byte]) ==
      Seq.fill(8)(None))
    assert(members(good) == Seq(Some(Seq(a.toSeq, b.toSeq))))
  }

  test("null input yields NULL; SQL surface registered") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(GzipMembers.gzip_members(col("b")).as("m")).collect()
    assert(out(0).isNullAt(0))
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(gz(a) ++ gz(b))).toDF("b")
      .selectExpr("size(gzip_members(b)) AS n").collect()
    assert(r(0).getInt(0) == 2)
  }
}
