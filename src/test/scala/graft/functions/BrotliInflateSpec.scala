package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BrotliInflate pinned against real libbrotli output: every fixture
  * under /brotli/ was produced by libbrotli (via pyarrow's bundled
  * encoder) at the named quality and frozen as hex — q0/q1 fast-path
  * streams, q11 streams exercising context modeling and multiple block
  * types, a 4 KB incompressible stream (uncompressed meta-blocks), a
  * 300 KB incompressible stream (multi-meta-block + uncompressed), a
  * 75 KB run-heavy stream (long copies + distance ring), and the empty
  * stream. libbrotli also VALIDATED the hand-built uncompressed and
  * metadata meta-block layouts used below (it decodes them to the same
  * bytes — asserted at fixture-generation time).
  *
  * Static-dictionary references (distance past the window, §8) decode
  * via the Appendix A data + Appendix B transforms extracted from the
  * SAME libbrotli (tools/extract_brotli_dict.py) — pinned here with
  * q5/q9/q11 English prose, the single-word reference stream, and the
  * 16 formerly-NULL quality-sweep streams, all now byte-exact.
  */
class BrotliInflateSpec extends SparkSpec {
  import spark.implicits._

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli/$name.hex")
    assert(in != null, s"missing /brotli/$name.hex")
    try unhex(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
    finally in.close()
  }

  private def inflate(blobs: Array[Byte]*): Seq[Option[Array[Byte]]] =
    blobs.toSeq.toDF("b")
      .select(BrotliInflate.brotli_inflate(col("b")))
      .collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getAs[Array[Byte]](0))).toSeq

  private def pin(name: String): Unit = {
    val got = inflate(fixture(name))
    assert(got.head.isDefined, s"$name: NULL")
    assert(java.util.Arrays.equals(got.head.get, fixture(name + "_payload")),
      s"$name: payload mismatch")
  }

  test("q1 fast-path stream decodes (simple prefix codes)") { pin("Q1Hello") }

  test("q0 stream decodes (single-tree meta-block)") { pin("Q0Text") }

  test("q11 dictionary-free text decodes (context modes + repeats)") {
    // rot13 of an English sentence: identical statistical shape, zero
    // static-dictionary words — exercises q11's context modeling
    // without crossing the declared dictionary bound
    pin("Q11Rot13")
  }

  test("q11 mixed-structure stream decodes (multi-block-type shapes)") {
    pin("Q11Mix")
  }

  test("q11 30 KB structured stream decodes (deep context modeling)") {
    // 30 KB of dictionary-free prose + digit tables + hex lines → a
    // 7 KB q11 stream: multiple literal trees, nontrivial context
    // maps, long-range copies — the heaviest entropy shapes libbrotli
    // emits without the dictionary
    pin("Q11Big")
  }

  test("q11 REAL English text decodes THROUGH dictionary references") {
    // libbrotli q11 on natural English emits static-dictionary
    // references; the rot13 twin above is the dictionary-free contrast
    // proving the entropy machinery alone also holds
    pin("Q11Text")
  }

  test("q5/q9/q11 dictionary-dense prose decodes byte-exact " +
      "(words + ferment + omit + prefix/suffix transforms)") {
    // 4.6 KB of prose built to hit the transform families: sentence-
    // initial capitals (ferment-first), ALL-CAPS (ferment-all),
    // quoted/punctuated words (prefix/suffix), plural/-ing/-ed forms
    // (omit-last); every stream libbrotli-roundtrip-validated at
    // generation time
    pin("Q5Eng"); pin("Q9Eng"); pin("Q11Eng")
  }

  test("q11 run-free periodic text decodes (copies + ring buffer)") {
    pin("Q11Abc")
  }

  test("q9 long-run stream decodes (multi-kilobyte copies)") { pin("Q9Runs") }

  test("incompressible 4 KB decodes (uncompressed meta-block path)") {
    pin("Q11Rand")
  }

  test("incompressible 300 KB decodes (multiple meta-blocks)") {
    pin("Q5BigRand")
  }

  test("the empty stream decodes to zero bytes") {
    val got = inflate(fixture("Q11Empty"))
    assert(got.head.isDefined && got.head.get.length == 0)
  }

  test("a pure static-dictionary reference decodes (single word)") {
    // libbrotli q11 encodes the single word "information" as ONE
    // dictionary reference — distance past the (empty) window
    pin("Q11Dict")
  }

  test("hand-built uncompressed meta-block layout (libbrotli-validated)") {
    // wbits16, ISLAST=0/MNIBBLES=4/MLEN-1/ISUNCOMPRESSED=1, aligned raw
    // bytes, then the empty last block 0x03 — the llm_crawl_br lane's
    // column construction
    val body = "uncompressed brotli body!".getBytes("UTF-8")
    val l = body.length - 1
    val hdr = Array(((l & 0xf) << 4).toByte, ((l >> 4) & 0xff).toByte,
      (((l >> 12) & 0xf) | 0x10).toByte)
    val stream = hdr ++ body ++ Array(0x03.toByte)
    assert(java.util.Arrays.equals(inflate(stream).head.get, body))
  }

  test("hand-built metadata block skips (value+1 bytes, then data)") {
    // wbits16, metadata block (MSKIPBYTES=1, value 4 -> skip 5 bytes),
    // then an uncompressed block, then last-empty; layout validated
    // against libbrotli at fixture-generation time
    val data = "after metadata".getBytes("UTF-8")
    val l = data.length - 1
    // bits: 0 (wbits16), 0 (ISLAST), 11 (MNIBBLES=0 -> metadata),
    // 0 (reserved), 01 (MSKIPBYTES=1), 8-bit skip value 4 (-> skip 4+1
    // bytes), align; then the 5 skipped bytes; then the data block
    val metaBits = {
      var acc = 0L; var n = 0
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      def push(v: Long, w: Int): Unit = {
        acc |= v << n; n += w
        while (n >= 8) { out += (acc & 0xff).toByte; acc >>= 8; n -= 8 }
      }
      push(0, 1); push(0, 1); push(3, 2); push(0, 1); push(1, 2); push(4, 8)
      if (n > 0) { out += (acc & 0xff).toByte }
      out.toArray
    }
    val dataSeg = {
      var acc = 0L; var n = 0
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      def push(v: Long, w: Int): Unit = {
        acc |= v << n; n += w
        while (n >= 8) { out += (acc & 0xff).toByte; acc >>= 8; n -= 8 }
      }
      push(0, 1); push(0, 2); push(l, 16); push(1, 1)
      if (n > 0) { out += (acc & 0xff).toByte }
      out.toArray
    }
    val stream = metaBits ++ "XXXXX".getBytes("UTF-8") ++ dataSeg ++ data ++
      Array(0x03.toByte)
    assert(java.util.Arrays.equals(inflate(stream).head.get, data))
  }

  test("the llm_source_br compressed-lane template decodes " +
      "(libbrotli-validated golden)") {
    // the exact column-space construction llm_source_br emits for
    // "golden brotli compressed lane vector!", frozen from the design
    // prototype that libbrotli round-tripped: empty-metadata alignment,
    // all-len-8 literal code, single command 504, 22594-space padding
    val got = inflate(fixture("CompressedLane"))
    assert(got.head.isDefined, "CompressedLane: NULL")
    assert(java.util.Arrays.equals(got.head.get,
      fixture("CompressedLane_payload")))
  }

  test("quality sweep: 72 libbrotli streams (q0-q11 x 6 shapes) pinned") {
    // every encoder quality emits different structure mixes (uncompressed
    // blocks, simple codes, full context modeling, block splitting,
    // static-dictionary references from q4 up on the runs/utf8 shapes) —
    // the sweep pins all of them across six payload shapes, every one a
    // byte-exact roundtrip now that the dictionary decodes.
    val in = getClass.getResourceAsStream("/brotli/quality_sweep.txt")
    assert(in != null)
    val rows = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    assert(rows.size == 72)
    assert(rows.count(_.split(" ")(2) == "rt") == 72)
    val failures = rows.flatMap { line =>
      val Array(name, q, exp, chex, phex) = line.split(" ", 5)
      val got = inflate(unhex(chex)).head
      (exp, got) match {
        case ("rt", Some(g)) if java.util.Arrays.equals(g, unhex(phex)) =>
          None
        case ("null", None) => None
        case ("null", Some(g)) =>
          Some(s"$name $q: decoded where the dictionary bound expected NULL" +
            s" (${if (java.util.Arrays.equals(g, unhex(phex))) "correctly!"
            else "WRONG BYTES"})")
        case ("rt", Some(_)) => Some(s"$name $q: WRONG BYTES")
        case ("rt", None) => Some(s"$name $q: NULL where roundtrip expected")
        case other => Some(s"$name $q: unexpected $other")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("NULL-on-corrupt family contract") {
    val good = fixture("Q1Hello")
    val truncated = good.dropRight(3)
    val flipped = good.clone(); flipped(5) = (flipped(5) ^ 0x40).toByte
    val trailing = good ++ Array(0x55.toByte)
    val garbage = Array.fill[Byte](16)(0x5a)
    val empty = Array.emptyByteArray
    val got = inflate(truncated, trailing, garbage, empty)
    assert(got.forall(_.isEmpty),
      s"corrupt lanes must all NULL: ${got.map(_.isDefined)}")
    // flipped mid-stream bits either NULL or decode to different bytes —
    // brotli has no checksum, so a bit flip may still parse; assert the
    // result is never silently EQUAL to the original payload
    val f = inflate(flipped)
    assert(f.head.isEmpty ||
      !java.util.Arrays.equals(f.head.get, fixture("Q1Hello_payload")))
  }

  test("decompression bomb cap: 100 MB of zeros in 172 bytes NULLs") {
    // libbrotli q11 output for 100 MB of zero bytes — a textbook
    // decompression bomb; the 64 MB family cap must NULL it instead of
    // allocating
    assert(inflate(fixture("Q11Zeros100M")).head.isEmpty)
  }
}
