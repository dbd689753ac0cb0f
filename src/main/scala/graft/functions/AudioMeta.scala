package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio-header parsing over opaque binary media columns — the audio
  * sibling of [[ImageDims]] (same honest-multimodal discipline: pure byte
  * arithmetic against a PUBLIC container spec, nothing stubbed). Decodes
  * FLAC (the `fLaC` magic + mandatory-first STREAMINFO block, RFC 9639:
  * big-endian bit-packed sample rate/channels/bits/total-samples),
  * MP3 (MPEG-1/2/2.5 Layer III per ISO/IEC 11172-3 and 13818-3: an
  * optional ID3v2 prefix skipped by its syncsafe size, the 32-bit frame
  * header's version/layer/bitrate-index/samplerate-index/channel-mode
  * fields against the public bitrate and sample-rate tables, the
  * LAME/Xing `Xing`/`Info` tag after the side info for VBR frame counts,
  * and the CBR fixed-frame-size estimate otherwise) and
  * the RIFF/WAVE header (the 1991 Microsoft/IBM Multimedia Programming
  * Interface spec, as restated by RFC 2361 and every public WAV
  * reference): `RIFF` + little-endian u32 size + `WAVE`, then a chunk
  * walk — 4-byte id, LE u32 size, payload padded to even length — to the
  * mandatory `fmt ` chunk (LE u16 codec tag, u16 channels, u32 sample
  * rate, u32 byte rate, u16 block align, u16 bits/sample) and then the
  * `data` chunk, whose DECLARED size divided by block align gives the
  * sample-frame count.
  *
  * Header-prefix parse by design: the data payload itself is never read
  * (frames come from the declared size), so at 100 TB the engine can
  * extract duration/rate/layout metadata from just the first KB of each
  * blob — the probe-tool shape (ffprobe-style), not a decode.
  *
  * Returns NULL (whole struct) for anything unrecognized: wrong
  * signatures (including RIFF forms that are not WAVE, e.g. `AVI `),
  * truncated or malformed chunks, `data` before `fmt ` (the spec orders
  * fmt first), zero channels/rate/block-align, or a declared data size
  * that is not a whole number of frames. Corrupt headers are first-class
  * input, pinned by the adversarial gate.
  *
  * Scale shape: map-only, chunk walk capped at 1024 chunks (structural
  * guard against adversarial padding chains; real files reach fmt/data
  * within a handful), codegen'd so it fuses into the scan like the rest
  * of the ByteStats family. Binary payloads never shuffle.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMeta.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"AudioMeta requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioMeta.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)

  override def prettyName: String = "audio_meta"
}

object AudioMeta {
  val Schema: StructType = StructType(Seq(
    StructField("codec", StringType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true)))

  private val Pcm = UTF8String.fromString("pcm")
  private val Float32 = UTF8String.fromString("float")
  private val Other = UTF8String.fromString("other")

  /** Static parse kernel shared by eval and generated code. Returns null
    * for unrecognized/corrupt/truncated input.
    */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    // FLAC: `fLaC` magic, then the MANDATORY-FIRST STREAMINFO metadata
    // block (type 0, length 34, RFC 9639): big-endian bit-packed
    // sample rate (20 bits), channels-1 (3), bits-1 (5), total
    // samples (36). Header-prefix parse like the WAV path — frames
    // come from the declared total, no audio frame is read.
    if (n >= 8 && bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
        bytes(3) == 'C') {
      val blockType = bytes(4) & 0x7f // high bit = last-metadata flag
      val len = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) |
        (bytes(7) & 0xff)
      if (blockType != 0 || len != 34 || n < 8 + 34) return null
      val b = 8
      val rate = ((bytes(b + 10) & 0xffL) << 12) |
        ((bytes(b + 11) & 0xffL) << 4) | ((bytes(b + 12) & 0xf0L) >> 4)
      val ch = (((bytes(b + 12) & 0x0e) >> 1) + 1)
      val bps = ((((bytes(b + 12) & 0x01) << 4) |
        ((bytes(b + 13) & 0xf0) >> 4)) + 1)
      val total = ((bytes(b + 13) & 0x0fL) << 32) |
        ((bytes(b + 14) & 0xffL) << 24) | ((bytes(b + 15) & 0xffL) << 16) |
        ((bytes(b + 16) & 0xffL) << 8) | (bytes(b + 17) & 0xffL)
      if (rate < 1) return null // 0 is invalid per the spec
      return new GenericInternalRow(Array[Any](
        UTF8String.fromString("flac"), ch, rate.toInt, bps, total))
    }
    // MP3: optional ID3v2 prefix, then the first MPEG Layer III frame
    // header. Strict probe: the frame must start EXACTLY at the post-tag
    // offset (no sync scan — a probe that hunts for sync bits would
    // accept arbitrary binary as mp3).
    if (n >= 4 && ((bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') ||
        ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0)))
      return parseMp3(bytes)
    // RIFF signature + WAVE form type. The RIFF size field (bytes 4..7)
    // describes the remaining FILE length; a header-prefix parse must not
    // require the payload to be present, so it is deliberately unchecked.
    if (n < 12 ||
        bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' ||
        bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' ||
        bytes(11) != 'E') return null
    var p = 12
    var guard = 0
    // fmt fields, valid once fmtSeen
    var fmtSeen = false
    var codecTag = 0
    var channels = 0
    var sampleRate = 0L
    var blockAlign = 0
    var bits = 0
    while (guard < 1024 && p + 8 <= n) {
      val id0 = bytes(p); val id1 = bytes(p + 1)
      val id2 = bytes(p + 2); val id3 = bytes(p + 3)
      val size = le32(bytes, p + 4) // unsigned: 0..2^32-1, oversize
      val body = p + 8              // chunks fail the Int.MaxValue guard
      if (id0 == 'f' && id1 == 'm' && id2 == 't' && id3 == ' ') {
        // PCM fmt body is 16 bytes; extensible forms are longer (18/40)
        // with the same first 16 — we need only those.
        if (size < 16 || body + 16 > n) return null
        codecTag = le16(bytes, body)
        channels = le16(bytes, body + 2)
        sampleRate = le32(bytes, body + 4)
        blockAlign = le16(bytes, body + 12)
        bits = le16(bytes, body + 14)
        if (channels < 1 || sampleRate < 1 || sampleRate > Int.MaxValue ||
            blockAlign < 1) return null
        fmtSeen = true
      } else if (id0 == 'd' && id1 == 'a' && id2 == 't' && id3 == 'a') {
        if (!fmtSeen) return null // spec: fmt precedes data
        // For PCM/float, declared-size ÷ block-align is the sample-frame
        // count and a remainder means a corrupt header. For compressed
        // codecs block align is the CODEC block size, so a frame count
        // is not derivable from the header: frames → NULL, no remainder
        // constraint.
        val uncompressed = codecTag == 1 || codecTag == 3
        if (uncompressed && size % blockAlign != 0) return null
        val codec = codecTag match {
          case 1 => Pcm      // WAVE_FORMAT_PCM
          case 3 => Float32  // WAVE_FORMAT_IEEE_FLOAT
          case _ => Other
        }
        val frames: Any = if (uncompressed) size / blockAlign else null
        return new GenericInternalRow(Array[Any](
          codec, channels, sampleRate.toInt, bits, frames))
      }
      // chunks pad to even total length (RIFF word alignment)
      val next = body.toLong + size + (size & 1L)
      if (next > Int.MaxValue) return null
      p = next.toInt
      guard += 1
    }
    null
  }

  // Layer III bitrates (kbit/s) per ISO/IEC 11172-3 Table B.2 (MPEG-1)
  // and 13818-3 (MPEG-2/2.5 share one Layer III column). Index 0 is
  // "free format" (frame size not derivable), 15 is forbidden.
  private val Mp3BitrateV1 = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  private val Mp3BitrateV2 = Array(
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)
  // Sample rates by version (MPEG1 / MPEG2 / MPEG2.5), index 3 reserved.
  private val Mp3RateV1 = Array(44100, 48000, 32000, -1)
  private val Mp3RateV2 = Array(22050, 24000, 16000, -1)
  private val Mp3RateV25 = Array(11025, 12000, 8000, -1)

  /** MPEG-1/2/2.5 Layer III header parse: ID3v2 skip → frame header →
    * Xing/Info VBR tag or CBR frame-count estimate. Returns the
    * AudioMeta row (codec "mp3", bits NULL — lossy audio has no PCM bit
    * depth in the header) or null for anything malformed: truncated or
    * mis-sized ID3 tags, a missing sync word at the post-tag offset,
    * reserved version/layer, forbidden bitrate or sample-rate indices,
    * or a first frame that does not fit in the blob.
    */
  private def parseMp3(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    var p = 0
    // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4); footer flag 0x10
    // adds a trailing 10 bytes (after the tag body — still before audio).
    if (n >= 3 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      if (n < 10) return null
      val flags = bytes(5) & 0xff
      var sz = 0
      var i = 6
      while (i < 10) { // syncsafe: each byte's high bit must be clear
        val b = bytes(i) & 0xff
        if ((b & 0x80) != 0) return null
        sz = (sz << 7) | b
        i += 1
      }
      p = 10 + sz + (if ((flags & 0x10) != 0) 10 else 0)
      if (p < 0 || p + 4 > n) return null
    }
    // Frame header: AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM (A sync, B version,
    // C layer, D protection, E bitrate idx, F samplerate idx, G padding,
    // I channel mode).
    if ((bytes(p) & 0xff) != 0xff || (bytes(p + 1) & 0xe0) != 0xe0)
      return null
    val versionId = (bytes(p + 1) >> 3) & 0x3 // 0=2.5, 1=rsvd, 2=MPEG2, 3=MPEG1
    val layer = (bytes(p + 1) >> 1) & 0x3     // 1 = Layer III
    if (versionId == 1 || layer != 1) return null
    val mpeg1 = versionId == 3
    val crcPresent = (bytes(p + 1) & 0x1) == 0 // protection bit 0 = CRC-16
    val brIdx = (bytes(p + 2) >> 4) & 0xf
    val srIdx = (bytes(p + 2) >> 2) & 0x3
    val padding = (bytes(p + 2) >> 1) & 0x1
    val mode = (bytes(p + 3) >> 6) & 0x3      // 3 = single channel
    val rate = versionId match {
      case 3 => Mp3RateV1(srIdx)
      case 2 => Mp3RateV2(srIdx)
      case _ => Mp3RateV25(srIdx)
    }
    val kbps = if (mpeg1) Mp3BitrateV1(brIdx) else Mp3BitrateV2(brIdx)
    if (rate < 0 || kbps < 0) return null // reserved indices
    val channels = if (mode == 3) 1 else 2
    val spf = if (mpeg1) 1152L else 576L // samples per frame, Layer III
    val codec = UTF8String.fromString("mp3")
    if (kbps == 0) // free format: size not derivable — metadata only
      return new GenericInternalRow(Array[Any](
        codec, channels, rate, null, null))
    val frameSize = (spf / 8L * kbps * 1000L / rate + padding).toInt
    if (p + frameSize > n) return null // first frame must be complete
    // Xing/Info tag: after the side info (and the CRC-16 when present).
    // Side info bytes per ISO 11172-3 §2.4.1.7: MPEG1 mono 17 / stereo 32,
    // MPEG2/2.5 mono 9 / stereo 17.
    val sideInfo =
      if (mpeg1) { if (channels == 1) 17 else 32 }
      else { if (channels == 1) 9 else 17 }
    val x = p + 4 + (if (crcPresent) 2 else 0) + sideInfo
    if (x + 8 <= p + frameSize &&
        ((bytes(x) == 'X' && bytes(x + 1) == 'i' && bytes(x + 2) == 'n' &&
          bytes(x + 3) == 'g') ||
         (bytes(x) == 'I' && bytes(x + 1) == 'n' && bytes(x + 2) == 'f' &&
          bytes(x + 3) == 'o'))) {
      val flags = ((bytes(x + 4) & 0xff) << 24) |
        ((bytes(x + 5) & 0xff) << 16) | ((bytes(x + 6) & 0xff) << 8) |
        (bytes(x + 7) & 0xff)
      if ((flags & 1) != 0) { // FRAMES field present
        if (x + 12 > p + frameSize) return null
        val frames = ((bytes(x + 8) & 0xffL) << 24) |
          ((bytes(x + 9) & 0xffL) << 16) | ((bytes(x + 10) & 0xffL) << 8) |
          (bytes(x + 11) & 0xffL)
        return new GenericInternalRow(Array[Any](
          codec, channels, rate, null, frames * spf))
      }
      // a Xing tag without a frame count: duration unknown
      return new GenericInternalRow(Array[Any](
        codec, channels, rate, null, null))
    }
    // CBR estimate: whole frames that fit after the audio offset — the
    // ffprobe shape (trailing ID3v1 tags make a remainder normal, so no
    // divisibility constraint here, unlike WAV's declared-size contract).
    val frames = (n - p).toLong / frameSize
    new GenericInternalRow(Array[Any](
      codec, channels, rate, null, frames * spf))
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Column entry point: audio_meta(binary) → struct<codec:string,
    * channels:int, sample_rate:int, bits:int, n_frames:bigint>
    * (NULL if unparseable).
    */
  def audio_meta(c: Column): Column =
    GraftColumnBridge.column(AudioMeta(GraftColumnBridge.expression(c)))
}
