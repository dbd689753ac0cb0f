package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins AudioMeta against HAND-WRITTEN RIFF/WAVE header bytes taken from
  * the public container spec — not round-tripped through the query's own
  * construction, so a matching construct/parse bug (e.g. both sides
  * big-endian) cannot hide here. Covers canonical 44-byte PCM, IEEE-float
  * with the 18-byte fmt body, LIST/JUNK chunks before fmt (the walk must
  * walk), odd-sized chunk padding, a compressed codec tag (frames NULL),
  * and the corrupt shapes that must yield NULL.
  */
class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  private def meta(payloads: Array[Byte]*)
      : Seq[Option[(String, Int, Int, Int, Option[Long])]] =
    payloads.toSeq.toDF("b")
      .select(AudioMeta.audio_meta(col("b")).as("m"))
      .select(col("m.codec"), col("m.channels"), col("m.sample_rate"),
        col("m.bits"), col("m.n_frames"))
      .collect().map { r =>
        if (r.isNullAt(0) && r.isNullAt(1)) None
        else Some((r.getString(0), r.getInt(1), r.getInt(2),
          if (r.isNullAt(3)) -1 else r.getInt(3), // -1 = NULL bits (mp3)
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      }.toSeq

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // Canonical 44-byte header of a real 8 kHz mono 16-bit PCM WAV
  // (the textbook example): fmt tag 1, 1 channel, rate 0x1F40=8000 LE,
  // byte rate 16000, block align 2, bits 16, data size 8 bytes = 4 frames.
  private val pcm8k = hx(
    "52494646 24000000 57415645" +            // RIFF <size> WAVE
      " 666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      " 64617461 08000000 0011223344556677")

  // IEEE-float stereo 44.1 kHz, 32-bit, fmt body 18 bytes (cbSize=0),
  // a JUNK chunk before fmt and a LIST chunk between fmt and data; data
  // size 32 bytes / block align 8 = 4 frames. Walk must skip both.
  private val f32 = hx(
    "52494646 64000000 57415645" +
      " 4A554E4B 04000000 DEADBEEF" +          // JUNK, 4 bytes
      " 666D7420 12000000 0300 0200 44AC0000 20620500 0800 2000 0000" +
      " 4C495354 06000000 494E464F 0000" +     // LIST, 6 bytes
      " 64617461 20000000")                    // declared, payload absent

  // Odd-sized chunk before fmt: RIFF pads chunks to even length — a
  // 3-byte chunk occupies 4; if padding is not applied the fmt id
  // misaligns and the parse must NOT succeed by accident.
  private val oddPad = hx(
    "52494646 40000000 57415645" +
      " 434F4D4D 03000000 414243 00" +         // 'COMM', 3 bytes + pad
      " 666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      " 64617461 04000000 00112233")

  // Compressed codec (tag 0x0011 = IMA ADPCM): metadata parses, but
  // block align is the codec block size, so n_frames must be NULL and
  // the whole-frames divisibility constraint must not apply.
  private val adpcm = hx(
    "52494646 30000000 57415645" +
      " 666D7420 10000000 1100 0100 401F0000 E90C0000 0001 0400" +
      " 64617461 05010000")                    // 261 % 256 != 0 — fine

  test("real header bytes parse to their true metadata") {
    assert(meta(pcm8k, f32, oddPad, adpcm) == Seq(
      Some(("pcm", 1, 8000, 16, Some(4L))),
      Some(("float", 2, 44100, 32, Some(4L))),
      Some(("pcm", 1, 8000, 16, Some(2L))),
      Some(("other", 1, 8000, 4, None))))
  }

  test("FLAC STREAMINFO parses; malformed FLAC is NULL") {
    // hand-packed: rate 44100 (0x0AC44), 2 channels, 16 bits,
    // total 441000 (0x6BAA8) -> 64-bit field 0x0AC442F00006BAA8
    val flac = hx("664C6143 80000022 10001000 000000 000000" +
      " 0AC442F00006BAA8" + " 00" * 16)
    assert(meta(flac) ==
      Seq(Some(("flac", 2, 44100, 16, Some(441000L)))))
    // STREAMINFO must be FIRST (here: a type-4 block leads)
    val notFirst = flac.clone(); notFirst(4) = 0x04
    // wrong STREAMINFO length
    val badLen = flac.clone(); badLen(7) = 0x21
    val truncated = flac.take(20)
    // a zero sample rate is invalid per the spec
    val zeroRate = hx("664C6143 80000022 10001000 000000 000000" +
      " 000002F00006BAA8" + " 00" * 16)
    assert(meta(notFirst, badLen, truncated, zeroRate) ==
      Seq(None, None, None, None))
  }

  test("corrupt and truncated headers yield NULL") {
    val truncRiff = hx("52494646 24000000")           // no form type
    val aviForm = hx("52494646 24000000 41564920")     // RIFF but AVI
    val dataBeforeFmt = hx(
      "52494646 24000000 57415645 64617461 04000000 00112233")
    val zeroChannels = hx(
      "52494646 24000000 57415645" +
        " 666D7420 10000000 0100 0000 401F0000 803E0000 0200 1000" +
        " 64617461 04000000")
    val zeroAlign = hx(
      "52494646 24000000 57415645" +
        " 666D7420 10000000 0100 0100 401F0000 803E0000 0000 1000" +
        " 64617461 04000000")
    val shortFmt = hx( // fmt body declared 12 < 16
      "52494646 24000000 57415645 666D7420 0C000000 0100 0100 401F0000 803E")
    val raggedData = hx( // PCM data size 5 not divisible by align 2
      "52494646 24000000 57415645" +
        " 666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
        " 64617461 05000000")
    val noData = hx( // fmt only, walk runs off the end
      "52494646 24000000 57415645" +
        " 666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000")
    val text = "just some text bytes".getBytes("UTF-8")
    assert(meta(truncRiff, aviForm, dataBeforeFmt, zeroChannels, zeroAlign,
      shortFmt, raggedData, noData, text,
      Array.empty[Byte]) == Seq.fill(10)(None))
  }

  // --- MP3 (ISO/IEC 11172-3 / 13818-3 Layer III) ---
  // Spec values are HAND-COMPUTED from the public tables (no mp3 tool
  // exists in this environment): MPEG1 Layer III frame size =
  // 144*bitrate/rate + pad; MPEG2/2.5 = 72*bitrate/rate + pad.

  test("CBR MPEG1 Layer III: header fields + frame-count estimate") {
    // 0xFFFB = sync + MPEG1 + Layer III + no CRC; 0x90 = bitrate idx 9
    // (128 kbps) + rate idx 0 (44100) + no pad; 0x00 = stereo.
    // frameSize = 144*128000/44100 = 417 (floor). Three whole frames plus
    // 5 trailing junk bytes (an ID3v1 stub) -> 3*1152 = 3456 samples.
    val frame = hx("FFFB9000") ++ Array.fill(413)(0x55.toByte)
    val cbr = frame ++ frame ++ frame ++ Array.fill(5)(0x20.toByte)
    assert(meta(cbr) == Seq(Some(("mp3", 2, 44100, -1, Some(3456L)))))
  }

  test("ID3v2 skip + Xing VBR frame count (MPEG2 mono)") {
    // ID3v2.4, no footer, syncsafe size 10 -> audio at offset 20.
    val id3 = hx("494433 0400 00 0000000A") ++ Array.fill(10)(0.toByte)
    // 0xFFF3 = MPEG2 + Layer III + no CRC; 0x80 = idx 8 (64 kbps) +
    // rate idx 0 (22050); 0xC0 = mono. frameSize = 72*64000/22050 = 208.
    // Side info (MPEG2 mono) = 9 bytes, then Xing flags=1 frames=100.
    val xing = hx("FFF380C0") ++ Array.fill(9)(0.toByte) ++
      "Xing".getBytes("US-ASCII") ++ hx("00000001 00000064") ++
      Array.fill(208 - 4 - 9 - 12)(0.toByte)
    assert(meta(id3 ++ xing) ==
      Seq(Some(("mp3", 1, 22050, -1, Some(57600L)))))
  }

  test("Xing behind a CRC-16: protection bit shifts the tag offset") {
    // 0xFFF2 = MPEG2 + Layer III + CRC PRESENT; tag sits at 4+2+9.
    val f = hx("FFF280C0 BEEF") ++ Array.fill(9)(0.toByte) ++
      "Info".getBytes("US-ASCII") ++ hx("00000001 00000007") ++
      Array.fill(208 - 6 - 9 - 12)(0.toByte)
    assert(meta(f) == Seq(Some(("mp3", 1, 22050, -1, Some(4032L)))))
  }

  test("free-format bitrate: metadata parses, frames NULL") {
    // bitrate index 0 -> frame size not derivable from the header
    val f = hx("FFFB0000") ++ Array.fill(64)(0.toByte)
    assert(meta(f) == Seq(Some(("mp3", 2, 44100, -1, None))))
  }

  test("malformed mp3 shapes yield NULL") {
    val rsvdLayer = hx("FFF99000") ++ Array.fill(500)(0.toByte) // layer 00
    val rsvdVer = hx("FFEB9000") ++ Array.fill(500)(0.toByte)   // ver 01
    val badRate = hx("FFFB9C00") ++ Array.fill(500)(0.toByte)   // rate idx 3
    val badBitrate = hx("FFFBF000") ++ Array.fill(500)(0.toByte) // idx 15
    val shortFrame = hx("FFFB9000") ++ Array.fill(50)(0.toByte) // < 417
    val id3Trunc = hx("494433 0400 00 7F7F7F7F") // declared size >> blob
    val id3NonSyncsafe = hx("494433 0400 00 00000080") ++
      Array.fill(200)(0.toByte) // size byte with high bit set
    val id3ThenJunk = hx("494433 0400 00 00000002 0000") ++
      hx("41414141") ++ Array.fill(500)(0.toByte) // no sync at offset 12
    assert(meta(rsvdLayer, rsvdVer, badRate, badBitrate, shortFrame,
      id3Trunc, id3NonSyncsafe, id3ThenJunk) == Seq.fill(8)(None))
  }

  test("null input yields NULL") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(AudioMeta.audio_meta(col("b")).as("m")).collect()
    assert(out(0).isNullAt(0))
  }
}
