package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differentially pins the spec-implemented Checksums kernels against
  * the JDK's java.util.zip.{CRC32, Adler32} AND Spark's builtin crc32()
  * — three independent implementations of the same public specs — over
  * empty/short/random/repetitive/long payloads (the long one crosses
  * Adler's 5552-byte modular-reduction stride many times), plus the
  * adler32 column function's null behavior, codegen path and SQL
  * registration.
  */
class ChecksumsSpec extends SparkSpec {
  import spark.implicits._

  private val payloads: Seq[Array[Byte]] = {
    val rng = new scala.util.Random(17)
    Seq(
      Array.empty[Byte],
      Array[Byte](0),
      "a".getBytes,
      "the quick brown fox".getBytes,
      Array.fill[Byte](5552)(0x41),
      Array.fill[Byte](5553)(-1),
      { val a = new Array[Byte](200000); rng.nextBytes(a); a },
      ("word " * 10000).getBytes)
  }

  test("crc32 matches java.util.zip.CRC32 and Spark's builtin") {
    payloads.foreach { p =>
      val jdk = new java.util.zip.CRC32()
      jdk.update(p)
      assert(Checksums.crc32(p, 0, p.length) == jdk.getValue,
        s"crc32 vs JDK at len=${p.length}")
    }
    val spark32 = payloads.map(Tuple1(_)).toDF("b")
      .select(crc32(col("b")).as("c")).collect().map(_.getLong(0))
    assert(spark32.toSeq ==
      payloads.map(p => Checksums.crc32(p, 0, p.length)))
  }

  test("adler32 matches java.util.zip.Adler32; offset slices too") {
    payloads.foreach { p =>
      val jdk = new java.util.zip.Adler32()
      jdk.update(p)
      assert(Checksums.adler32(p, 0, p.length) == jdk.getValue,
        s"adler32 vs JDK at len=${p.length}")
    }
    // a mid-array slice: the (from, len) addressing is load-bearing
    val big = payloads.last
    val jdk = new java.util.zip.Adler32()
    jdk.update(big, 7, 1234)
    assert(Checksums.adler32(big, 7, 1234) == jdk.getValue)
    val jcrc = new java.util.zip.CRC32()
    jcrc.update(big, 7, 1234)
    assert(Checksums.crc32(big, 7, 1234) == jcrc.getValue)
  }

  test("adler32 column function: values, null, SQL surface") {
    val out = payloads.map(Tuple1(_)).toDF("b")
      .select(Checksums.adler32_fn(col("b")).as("a"))
      .collect().map(_.getLong(0))
    assert(out.toSeq ==
      payloads.map(p => Checksums.adler32(p, 0, p.length)))
    val nulls = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(Checksums.adler32_fn(col("b")).as("a")).collect()
    assert(nulls(0).isNullAt(0))
    GraftFunctions.register(spark)
    val sql = Seq(Tuple1("abc".getBytes)).toDF("b")
      .selectExpr("adler32(b) AS a").collect()
    assert(sql(0).getLong(0) == 0x024d0127L) // RFC 1950 example domain
  }
}
