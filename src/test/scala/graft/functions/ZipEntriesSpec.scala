package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ZipEntries against REAL encoder output — java.util.zip.
  * ZipOutputStream, an independent APPNOTE implementation that writes
  * the STREAMING shape (flag bit 3, zero sizes in the local header,
  * data descriptors after payloads): exactly what a directory-driven
  * reader must handle and a naive local-header walk cannot. Covers
  * deflated and stored entries, empty payloads, an archive comment
  * (the EOCD backward scan is load-bearing), an empty archive, a
  * 100-entry archive, and the strict NULL contract over mutations:
  * flipped central CRC, flipped payload byte under a stale CRC, lying
  * EOCD counts / directory size / offset, encrypted flag, unknown
  * method, truncation, raw text.
  */
class ZipEntriesSpec extends SparkSpec {
  import spark.implicits._

  private def entries(payloads: Array[Byte]*)
      : Seq[Option[Seq[(String, Int, Long, String)]]] =
    payloads.toSeq.toDF("b")
      .select(ZipEntries.zip_entries(col("b")).as("e"))
      .collect().map { r =>
        if (r.isNullAt(0)) None
        else Some(r.getSeq[org.apache.spark.sql.Row](0).map(e =>
          (e.getString(0), e.getInt(1), e.getLong(2), e.getString(3))))
      }.toSeq

  private def md5hex(b: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(b).map("%02x".format(_)).mkString
  }

  /** Real streaming zip via the JDK: deflated unless stored=true. */
  private def jdkZip(comment: String = null,
      entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    if (comment != null) z.setComment(comment)
    entries.foreach { case (name, data, stored) =>
      val e = new java.util.zip.ZipEntry(name)
      if (stored) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(data.length)
        e.setCompressedSize(data.length)
        val c = new java.util.zip.CRC32(); c.update(data)
        e.setCrc(c.getValue)
      }
      z.putNextEntry(e); z.write(data); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val textA = "the quick brown fox, 42 times over".getBytes("UTF-8")
  private val textB = ("repetitive " * 2000).getBytes("UTF-8")

  test("real JDK streaming zip (flag bit 3): deflated + stored + empty") {
    val zip = jdkZip(entries = Seq(
      ("a.txt", textA, false),
      ("dir/b.txt", textB, false),
      ("raw.bin", textA, true),
      ("empty.txt", Array.empty[Byte], false)))
    assert(entries(zip) == Seq(Some(Seq(
      ("a.txt", 8, textA.length.toLong, md5hex(textA)),
      ("dir/b.txt", 8, textB.length.toLong, md5hex(textB)),
      ("raw.bin", 0, textA.length.toLong, md5hex(textA)),
      ("empty.txt", 8, 0L, md5hex(Array.empty[Byte]))))))
  }

  test("archive comment: the EOCD backward scan lands correctly") {
    val zip = jdkZip(comment = "PK lookalike bait in a comment",
      entries = Seq(("c.txt", textA, false)))
    assert(entries(zip) ==
      Seq(Some(Seq(("c.txt", 8, textA.length.toLong, md5hex(textA))))))
  }

  test("empty archive is an empty array; 100 entries round-trip") {
    // the canonical empty zip: a lone EOCD (the JDK refuses to write
    // zero-entry archives, so hand-framed per APPNOTE)
    val empty = Array[Byte]('P', 'K', 5, 6) ++ new Array[Byte](18)
    val many = jdkZip(entries =
      (0 until 100).map(i => (s"f$i", s"payload $i".getBytes, i % 2 == 0)))
    val got = entries(empty, many)
    assert(got(0) == Some(Seq()))
    assert(got(1).get.size == 100)
    assert(got(1).get(7) ==
      ("f7", 8, 9L, md5hex("payload 7".getBytes)))
    assert(got(1).get(8) ==
      ("f8", 0, 9L, md5hex("payload 8".getBytes)))
  }

  test("strict NULL contract over mutations") {
    val good = jdkZip(entries = Seq(("a.txt", textA, false)))
    val n = good.length
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    // locate the central directory (PK\1\2) and EOCD (PK\5\6)
    def find(sig: Array[Byte]): Int =
      (0 until n - 3).find(i => good(i) == sig(0) && good(i + 1) == sig(1) &&
        good(i + 2) == sig(2) && good(i + 3) == sig(3)).get
    val cd = find(Array('P', 'K', 1, 2))
    val eocd = find(Array('P', 'K', 5, 6))
    val badCrc = mut(b => b(cd + 16) = (b(cd + 16) ^ 1).toByte)
    // flip a payload byte: the (now stale) central CRC must catch it
    val bitRot = mut { b =>
      val dataOff = 30 + 5 + 0 // name "a.txt", no local extra... but the
      // JDK writes a local extra field; find the payload by flipping a
      // byte just before the central directory instead (inside the data
      // descriptor region would be dead space — flip mid-deflate-stream)
      b(cd - 30) = (b(cd - 30) ^ 0x20).toByte
    }
    val badCount = mut(b => b(eocd + 8) = 2)
    val badCdSize = mut(b => b(eocd + 12) = (b(eocd + 12) ^ 1).toByte)
    val badCdOff = mut(b => b(eocd + 16) = (b(eocd + 16) + 1).toByte)
    val encrypted = mut(b => b(cd + 8) = (b(cd + 8) | 1).toByte)
    val badMethod = mut(b => b(cd + 10) = 99.toByte)
    val truncated = good.take(n - 3)
    val noEocd = good.take(eocd)
    val text = "not a zip at all, sorry".getBytes("UTF-8")
    assert(entries(badCrc, bitRot, badCount, badCdSize, badCdOff, encrypted,
      badMethod, truncated, noEocd, text, Array.empty[Byte]) ==
      Seq.fill(11)(None))
  }

  test("null input yields NULL; SQL surface registered") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(ZipEntries.zip_entries(col("b")).as("e")).collect()
    assert(out(0).isNullAt(0))
    GraftFunctions.register(spark)
    val zip = jdkZip(entries = Seq(("x", "y".getBytes, false)))
    val r = Seq(Tuple1(zip)).toDF("b")
      .selectExpr("size(zip_entries(b)) AS n").collect()
    assert(r(0).getInt(0) == 1)
  }
}
