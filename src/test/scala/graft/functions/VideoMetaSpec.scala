package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins VideoMeta against HAND-WRITTEN ISO-BMFF bytes taken from the
  * public spec (ISO/IEC 14496-12) — not round-tripped through the
  * query's own construction, so a matching construct/parse bug (e.g.
  * both sides little-endian) cannot hide here. Covers mvhd version 0
  * and version 1, free/skip boxes before moov, non-mvhd-first moov
  * children, 64-bit largesize boxes, size==0 (to end of file), the
  * all-ones "unknown duration" sentinel, and the corrupt shapes that
  * must yield NULL.
  */
class VideoMetaSpec extends SparkSpec {
  import spark.implicits._

  private def meta(payloads: Array[Byte]*)
      : Seq[Option[(String, Int, Option[Long], Int)]] =
    payloads.toSeq.toDF("b")
      .select(VideoMeta.video_meta(col("b")).as("m"))
      .select(col("m.brand"), col("m.timescale"), col("m.duration"),
        col("m.n_tracks"))
      .collect().map { r =>
        if (r.isNullAt(0) && r.isNullAt(1)) None
        else Some((r.getString(0), r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getInt(3)))
      }.toSeq

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private val mvhdTail80 = // rate, volume, reserved, unity matrix, next_track
    "00010000 01000000 0000000000000000" +
      " 000100000000000000000000 000000000001000000000000 000000000000000040000000" +
      " 000000000000000000000000 000000000000000000000000 00000002"

  // ftyp(isom) + moov[ mvhd v0 (timescale 1000, duration 30000) + 1 trak ]
  private val v0 = hx(
    "00000014 66747970 69736F6D 00000000 69736F6D" +
      " 00000084 6D6F6F76" +
      " 0000006C 6D766864 00000000 00000000 00000000 000003E8 00007530" +
      mvhdTail80 +
      " 00000010 7472616B 0000000000000000")

  // ftyp(mp42) + free + moov[ udta + mvhd v1 (timescale 90000,
  // duration 2^32+5 — needs the 64-bit field) + 2 traks ]; moov uses a
  // 64-bit largesize header (size==1 + u64), mvhd is NOT the first child.
  private val v1 = hx(
    "00000014 66747970 6D703432 00000001 6D703432" +
      " 0000000C 66726565 DEADBEEF" +
      " 00000001 6D6F6F76 00000000000000B4" +
      " 0000000C 75647461 00000000" +
      " 00000078 6D766864 01000000 0000000000000000 0000000000000000" +
      " 00015F90 0000000100000005" + mvhdTail80 +
      " 00000010 7472616B 0000000000000000" +
      " 00000010 7472616B 0000000000000000")

  // ftyp(3gp4) + moov with size==0 (extends to EOF) whose mvhd v0 has
  // the all-ones unknown-duration sentinel; 3 traks.
  private val unknownDur = hx(
    "00000014 66747970 33677034 00000000 33677034" +
      " 00000000 6D6F6F76" +
      " 0000006C 6D766864 00000000 00000000 00000000 00000064 FFFFFFFF" +
      mvhdTail80 +
      " 00000010 7472616B 0000000000000000" +
      " 00000010 7472616B 0000000000000000" +
      " 00000010 7472616B 0000000000000000")

  test("real ISO-BMFF bytes parse to their true metadata") {
    assert(meta(v0, v1, unknownDur) == Seq(
      Some(("isom", 1000, Some(30000L), 1)),
      Some(("mp42", 90000, Some(4294967301L), 2)),
      Some(("3gp4", 100, None, 3))))
  }

  test("corrupt and truncated headers yield NULL") {
    val moovBeforeFtyp = hx(
      "00000008 6D6F6F76 00000014 66747970 69736F6D 00000000 69736F6D")
    val noMoov = hx("00000014 66747970 69736F6D 00000000 69736F6D")
    val emptyMoov = hx( // moov present but no mvhd child
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        " 00000018 6D6F6F76 00000010 7472616B 0000000000000000")
    val badSize = hx( // moov declares more bytes than exist
      "00000014 66747970 69736F6D 00000000 69736F6D 000000FF 6D6F6F76")
    val tinyBox = hx( // box size 4 < header size
      "00000014 66747970 69736F6D 00000000 69736F6D 00000004 6D6F6F76")
    val zeroTimescale = hx(
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        " 00000074 6D6F6F76" +
        " 0000006C 6D766864 00000000 00000000 00000000 00000000 00007530" +
        mvhdTail80)
    val badVersion = hx( // mvhd version 7
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        " 00000074 6D6F6F76" +
        " 0000006C 6D766864 07000000 00000000 00000000 000003E8 00007530" +
        mvhdTail80)
    val truncMvhd = hx( // mvhd cut before the duration field
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        " 00000018 6D6F6F76 00000010 6D766864 00000000 00000000")
    val unprintableBrand = hx(
      "00000014 66747970 0102030405000000 69736F6D")
    val text = "just some text bytes".getBytes("UTF-8")
    // Crafted 64-bit largesize near Long.MaxValue: a naive `p + size > n`
    // bound wraps negative and admits the box, sending the walk to an
    // attacker-controlled negative offset (AIOOBE instead of NULL). The
    // overflow-free `size > n - p` form must reject it.
    val overflowLargesize = hx(
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        " 00000001 6D6F6F76 7FFFFFFFFFFFFFF0")
    // Same wrap inside parseMoov: a valid moov whose CHILD declares the
    // overflowing largesize.
    val overflowChild = hx(
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        " 00000018 6D6F6F76 00000001 66726565 7FFFFFFFFFFFFFF0")
    assert(meta(moovBeforeFtyp, noMoov, emptyMoov, badSize, tinyBox,
      zeroTimescale, badVersion, truncMvhd, unprintableBrand, text,
      overflowLargesize, overflowChild,
      Array.empty[Byte]) == Seq.fill(13)(None))
  }

  // --- EBML (Matroska/WebM, RFC 8794) ---

  private def f32h(v: Float): String =
    "%08X".format(java.lang.Float.floatToIntBits(v))
  private def f64h(v: Double): String =
    "%016X".format(java.lang.Double.doubleToLongBits(v))

  // EBML header with just a DocType (the only child this probe reads)
  private def ebmlHdr(docType: String): String = {
    val dt = docType.getBytes("US-ASCII").map("%02X".format(_)).mkString
    "1A45DFA3 " + "%02X".format(0x80 | (3 + docType.length)) +
      " 4282 " + "%02X".format(0x80 | docType.length) + dt
  }
  private val trackEntry = "AE 83 D78101" // TrackNumber 1

  test("WebM: DocType + TimestampScale + float32 Duration + 2 tracks") {
    // Info: TimestampScale 1e6 (default spelled out) + Duration 90000.0f
    val info = "1549A966 8E" + " 2AD7B1 83 0F4240" + " 4489 84 " +
      f32h(90000.0f)
    val tracks = "1654AE6B 8A " + trackEntry + trackEntry
    val v = hx(ebmlHdr("webm") + " 18538067 A2 " + info + tracks)
    assert(meta(v) == Seq(Some(("webm", 1000, Some(90000L), 2))))
  }

  test("Matroska: unknown-size Segment, default scale, double Duration," +
      " Void skipped, walk stops at an unknown-size Cluster") {
    val info = "1549A966 8B" + " 4489 88 " + f64h(48000.0)
    val tracks = "1654AE6B 85 " + trackEntry
    val v = hx(ebmlHdr("matroska") + " 18538067 01FFFFFFFFFFFFFF" +
      " EC 82 0000" + // Void element, skipped by size
      info + tracks +
      " 1F43B675 01FFFFFFFFFFFFFF DEADBEEF") // cluster: never entered
    assert(meta(v) == Seq(Some(("matroska", 1000, Some(48000L), 1))))
  }

  test("EBML: 1 ns TimestampScale; absent Duration/Tracks") {
    val info = "1549A966 88" + " 2AD7B1 84 3B9ACA00" // 1e9 ns -> 1 tick/s
    val v = hx(ebmlHdr("webm") + " 18538067 8D " + info)
    assert(meta(v) == Seq(Some(("webm", 1, None, 0))))
  }

  test("malformed EBML yields NULL") {
    val noDocType = hx("1A45DFA3 84 EC 82 0000" +
      " 18538067 8D 1549A966 88 2AD7B1 84 3B9ACA00")
    // TimestampScale 3 does not divide 1e9 — outside the integer contract
    val ts3 = hx(ebmlHdr("webm") +
      " 18538067 8A 1549A966 85 2AD7B1 81 03")
    val zeroTs = hx(ebmlHdr("webm") +
      " 18538067 8A 1549A966 85 2AD7B1 81 00")
    // Duration with a 3-byte float is not a float width
    val badDur = hx(ebmlHdr("webm") +
      " 18538067 8B 1549A966 86 4489 83 000000")
    // negative Duration
    val negDur = hx(ebmlHdr("webm") +
      " 18538067 8C 1549A966 87 4489 84 " + f32h(-5.0f))
    val noInfo = hx(ebmlHdr("webm") + " 18538067 85 " + trackEntry)
    // child size overruns its parent
    val overrun = hx(ebmlHdr("webm") + " 18538067 84 1549A966 8E 00")
    // unknown-size Info (only Segment/Cluster may be unknown)
    val unkInfo = hx(ebmlHdr("webm") + " 18538067 8C 1549A966 01FFFFFFFFFFFFFF")
    val truncated = hx("1A45DFA3 87 4282")
    assert(meta(noDocType, ts3, zeroTs, badDur, negDur, noInfo, overrun,
      unkInfo, truncated) == Seq.fill(9)(None))
  }

  test("null input yields NULL") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(VideoMeta.video_meta(col("b")).as("m")).collect()
    assert(out(0).isNullAt(0))
  }
}
