package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** In-engine ZSTANDARD decompression — the FULL RFC 8878 decoder, not a
  * stored-block subset: zstd is the dominant compression for modern
  * training shards (jsonl.zst corpora, parquet ZSTD pages, Kafka
  * payloads), the one family a 100 TB pipeline cannot skip.
  *
  * Frame walk (RFC 8878 §3.1.1): magic 0xFD2FB528 (LE), frame header
  * (descriptor with content-size/single-segment/checksum/dictionary-id
  * flags, window descriptor with the exponent+mantissa window size),
  * then data blocks under a 3-byte LE header (last-block bit, type,
  * size) — Raw, RLE, or Compressed, each regenerating at most
  * Block_Maximum_Size = min(Window_Size, 128 KB) — and the optional
  * Content_Checksum: the LOW 4 BYTES of XXH64(content, 0)
  * ([[Checksums.xxh64]], pinned against lz4-java's independent
  * XXHash64), VERIFIED. The input is a frame SEQUENCE as zstd(1)
  * treats a .zst file: frames decode and concatenate, SKIPPABLE frames
  * (magic 0x184D2A5X + LE u32 size — shared with the LZ4 container
  * spec) are skipped; anything else between frames rejects.
  *
  * Compressed blocks (§3.1.1.3):
  *  - Literals (§3.1.1.3.1): Raw / RLE / (Treeless-)Huffman-Compressed,
  *    with 1- or 4-stream layouts (6-byte jump table), each stream a
  *    BACKWARD bitstream (§3.1.1.7: sentinel 1-bit, zero-fill below
  *    the start, EXACT consumption required). The Huffman tree
  *    description (§4.2.1) is either direct 4-bit weights or an
  *    FSE-COMPRESSED weight stream (two interleaved states, its own
  *    forward-parsed table, accuracy ≤ 6); the last weight is implicit
  *    (the power-of-two completion), table cells filled weight-
  *    ascending in natural symbol order.
  *  - Sequences (§3.1.1.3.2): per-field symbol tables for literal
  *    lengths (36 codes), offsets, and match lengths (53 codes), each
  *    in Predefined_Mode (the RFC's default distributions, accuracy
  *    6/5/6), RLE_Mode, FSE_Compressed_Mode (table description §4.1.1:
  *    variable-bit probability parse with the low/high threshold trick
  *    and -1 "less-than-one" symbols placed from the table's top), or
  *    Repeat_Mode (previous table of the SAME frame). Decoding is the
  *    three-state interleave over one backward bitstream — init order
  *    LL/OF/ML, value-bit reads OF/ML/LL, state updates LL/ML/OF,
  *    last sequence exempt — with the three REPEAT OFFSETS (init
  *    1,4,8 or the dictionary's; the literals-length-0 shift and the
  *    rep1−1 special case per §3.1.1.5) and overlap-replicating match
  *    copies bounded by the frame start minus the supplied
  *    dictionary's content (no further reach).
  *
  * DICTIONARIES (RFC 8878 §5) are supported through the two-argument
  * form `zstd_inflate_dict(blob, dict)` (r12 verdict #4 — small-record
  * shards in real corpora use trained dictionaries): both FORMATTED
  * dictionaries (magic 0xEC30A437, dictionary id, entropy tables in
  * the spec order Huffman/OF/ML/LL, three validated repeat offsets,
  * content) and RAW-CONTENT dictionaries (no magic — the bytes are
  * history only, default tables and reps). The dictionary initializes
  * the frame's entropy state (a first-block Treeless/Repeat_Mode reads
  * the dictionary tables) and its content is reachable match history
  * BELOW the frame start. ID discipline: a frame declaring a nonzero
  * Dictionary_ID requires a formatted dictionary with the SAME id; the
  * one-argument form still rejects any nonzero id (out-of-band data by
  * definition). Everything else a real encoder emits decodes. Pinned three ways in ZstdInflateSpec: real zstd(1)
  * CLI frames across levels/shapes, zstd-jni (the reference C library
  * Spark ships for parquet), and aircompressor (an independent
  * pure-Java implementation), plus hand-mutated NULL vectors.
  *
  * Sizing: a declared Frame_Content_Size is an exact-output contract
  * and the frame's decode limit; without one the buffer grows
  * geometrically, CLAMPED to the named [[ZstdInflate.MaxOutputBytes]]
  * zip-bomb guard (the family policy — only an actual write past the
  * limit fails). Window_Size past the cap rejects for the same reason.
  * NULL for: bad magic/reserved bits, dictionary frames without a
  * matching supplied dictionary, oversized
  * windows/blocks, any malformed Huffman/FSE description, a bitstream
  * not consumed EXACTLY, an offset before the frame, output past the
  * guard or unequal to the declared size, a content-checksum
  * mismatch, a truncated skippable frame, or inter-frame garbage —
  * all-or-nothing NULL, nothing partial.
  */
case class ZstdInflate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ZstdInflate requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ZstdInflate.unzstd(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ZstdInflate.unzstd($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : ZstdInflate = copy(child = newChild)

  override def prettyName: String = "zstd_inflate"
}

object ZstdInflate {

  /** Zip-bomb guard on total decompressed output (~64 MB, the family
    * policy); also the ceiling on accepted Window_Size.
    */
  val MaxOutputBytes: Long = 64L * 1024 * 1024

  /** Control-flow signal for "this input is not a valid frame" — caught
    * once at the kernel boundary and turned into NULL. Stackless: it is
    * data validation, not an error condition.
    */
  private object Corrupt extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Corrupt

  // ------------------------------------------------------------------
  // bitstreams
  // ------------------------------------------------------------------

  /** BACKWARD bitstream (RFC 8878 §3.1.1.7): fields were appended
    * LSB-first by the encoder, so the decoder treats bytes[from, to) as
    * one little-endian integer and reads fields from the TOP. The last
    * byte carries a sentinel 1-bit above the payload (a zero last byte
    * is corrupt); reads below the start zero-fill and drive `avail`
    * negative — validity is the final EXACT-consumption check
    * (`avail == 0`), matching the reference decoder's overflow rule.
    */
  private final class BackBits(src: Array[Byte], from: Int, to: Int) {
    if (to <= from) bad()
    private val lastByte = src(to - 1) & 0xff
    if (lastByte == 0) bad()
    var avail: Long = (to - 1 - from).toLong * 8 +
      (31 - Integer.numberOfLeadingZeros(lastByte))

    private def bit(i: Long): Int =
      if (i < 0) 0
      else (src(from + (i >> 3).toInt) >> (i & 7).toInt) & 1

    def peek(k: Int): Int = {
      var v = 0
      var j = 0
      while (j < k) { v |= bit(avail - k + j) << j; j += 1 }
      v
    }

    def skip(k: Int): Unit = avail -= k

    def read(k: Int): Int = { val v = peek(k); avail -= k; v }

    def readLong(k: Int): Long = {
      var v = 0L
      var j = 0
      while (j < k) { v |= bit(avail - k + j).toLong << j; j += 1 }
      avail -= k
      v
    }
  }

  /** FORWARD bitstream (FSE table descriptions, §4.1.1): LSB-first
    * within each byte, never past `to`.
    */
  private final class FwdBits(src: Array[Byte], from: Int, to: Int) {
    private var pos = 0L
    private val limit = (to - from).toLong * 8

    def read(k: Int): Int = {
      if (pos + k > limit) bad()
      var v = 0
      var j = 0
      while (j < k) {
        val i = pos + j
        v |= ((src(from + (i >> 3).toInt) >> (i & 7).toInt) & 1) << j
        j += 1
      }
      pos += k
      v
    }

    /** Table descriptions consume a whole number of bytes. */
    def bytesConsumed: Int = ((pos + 7) >> 3).toInt
  }

  // ------------------------------------------------------------------
  // FSE
  // ------------------------------------------------------------------

  private final class FseTable(val accLog: Int, size: Int) {
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val newState = new Array[Int](size)
  }

  /** Decoding-table build from normalized counts (§4.1.1): "less than
    * one" (−1) symbols take single cells from the table's top; positive
    * counts spread with the (size/2 + size/8 + 3) step skipping the
    * occupied top; each cell's (nbBits, newState) follow from the
    * per-symbol occurrence counter.
    */
  private def buildFse(norm: Array[Int], maxSym: Int, accLog: Int): FseTable = {
    val size = 1 << accLog
    val t = new FseTable(accLog, size)
    var highThreshold = size - 1
    var s = 0
    while (s <= maxSym) {
      if (norm(s) == -1) {
        if (highThreshold < 0) bad()
        t.symbol(highThreshold) = s
        highThreshold -= 1
      }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s <= maxSym) {
      var i = 0
      while (i < norm(s)) {
        t.symbol(pos) = s
        do pos = (pos + step) & mask while (pos > highThreshold)
        i += 1
      }
      s += 1
    }
    if (pos != 0) bad() // spread must return to origin exactly
    val next = new Array[Int](maxSym + 1)
    s = 0
    while (s <= maxSym) {
      next(s) = if (norm(s) == -1) 1 else math.max(norm(s), 0)
      s += 1
    }
    var i = 0
    while (i < size) {
      val sym = t.symbol(i)
      val x = next(sym)
      next(sym) += 1
      if (x <= 0) bad()
      val nb = accLog - (31 - Integer.numberOfLeadingZeros(x))
      t.nbBits(i) = nb
      t.newState(i) = (x << nb) - size
      i += 1
    }
    t
  }

  /** A 1-symbol "table" for RLE_Mode: state 0, zero bits, always `sym`. */
  private def rleFse(sym: Int): FseTable = {
    val t = new FseTable(0, 1)
    t.symbol(0) = sym
    t
  }

  /** FSE table description (§4.1.1): 4-bit accuracy (+5), then
    * variable-bit probabilities with the low/high threshold trick, −1
    * for less-than-one, and 2-bit zero-run flags after a zero.
    * @return (normalized counts, maxSymbol, accuracyLog)
    */
  private def readFseNorm(f: FwdBits, maxAccLog: Int,
      maxSymAllowed: Int): (Array[Int], Int, Int) = {
    val accLog = f.read(4) + 5
    if (accLog > maxAccLog) bad()
    var remaining = (1 << accLog) + 1
    var threshold = 1 << accLog
    var nbBits = accLog + 1
    val norm = new Array[Int](maxSymAllowed + 1)
    var sym = 0
    var prev0 = false
    while (remaining > 1) {
      if (sym > maxSymAllowed) bad()
      if (prev0) {
        var rep = f.read(2)
        while (rep == 3) {
          sym += 3
          if (sym > maxSymAllowed) bad()
          rep = f.read(2)
        }
        sym += rep
        if (sym > maxSymAllowed) bad()
        prev0 = false
      } else {
        val max = (2 * threshold - 1) - remaining
        val low = f.read(nbBits - 1)
        var count =
          if (low < max) low
          else {
            val full = low | (f.read(1) << (nbBits - 1))
            if (full >= threshold) full - max else full
          }
        count -= 1 // −1 encodes "less than one"
        remaining -= (if (count < 0) -count else count)
        norm(sym) = count
        sym += 1
        prev0 = count == 0
        while (remaining > 0 && remaining < threshold) {
          nbBits -= 1
          threshold >>= 1
        }
        if (remaining <= 0) bad()
      }
    }
    if (remaining != 1) bad()
    (norm, sym - 1, accLog)
  }

  // RFC 8878 §3.1.1.3.2.2: predefined distributions
  private val LlDefaultNorm = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefaultNorm = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefaultNorm = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val LlDefaultTable = buildFse(LlDefaultNorm, 35, 6)
  private lazy val MlDefaultTable = buildFse(MlDefaultNorm, 52, 6)
  private lazy val OfDefaultTable = buildFse(OfDefaultNorm, 28, 5)

  // §3.1.1.3.2.1.1: literal-length code baselines / extra bits
  private val LlBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
    14, 15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  // §3.1.1.3.2.1.1: match-length code baselines / extra bits
  private val MlBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ------------------------------------------------------------------
  // Huffman
  // ------------------------------------------------------------------

  private final class HufTable(val tableLog: Int) {
    val symbol = new Array[Byte](1 << tableLog)
    val nbBits = new Array[Byte](1 << tableLog)
  }

  /** §4.2.1: weights → table. Explicit weights cover symbols
    * 0..nWeights−1; the LAST symbol's weight is implicit (completes the
    * weight sum to a power of two). Max 11 bits. Cells fill weight-
    * ascending (longest codes first), natural symbol order within a
    * weight — the spec's canonical assignment.
    */
  private def buildHuf(w: Array[Int], nWeights: Int): HufTable = {
    if (nWeights < 1 || nWeights > 255) bad()
    var total = 0L
    var i = 0
    while (i < nWeights) {
      if (w(i) < 0 || w(i) > 11) bad()
      if (w(i) > 0) total += 1L << (w(i) - 1)
      i += 1
    }
    if (total == 0) bad()
    val tableLog = 64 - java.lang.Long.numberOfLeadingZeros(total) // highbit+1
    if (tableLog > 11) bad()
    val rest = (1L << tableLog) - total
    if (rest <= 0 || (rest & (rest - 1)) != 0) bad()
    val lastW = java.lang.Long.numberOfTrailingZeros(rest).toInt + 1
    val nSyms = nWeights + 1
    val weights = java.util.Arrays.copyOf(w, nSyms)
    weights(nWeights) = lastW
    val t = new HufTable(tableLog.toInt)
    var pos = 0
    var weight = 1
    while (weight <= tableLog) {
      var s = 0
      while (s < nSyms) {
        if (weights(s) == weight) {
          val cells = 1 << (weight - 1)
          val nb = (tableLog + 1 - weight).toByte
          var c = 0
          while (c < cells) {
            t.symbol(pos) = s.toByte
            t.nbBits(pos) = nb
            pos += 1
            c += 1
          }
        }
        s += 1
      }
      weight += 1
    }
    if (pos != (1 << tableLog)) bad()
    t
  }

  /** Huffman tree description (§4.2.1): headerByte ≥ 128 → direct
    * 4-bit weights (headerByte − 127 of them, high nibble first);
    * otherwise headerByte = compressed size of an FSE weight stream
    * (accuracy ≤ 6, TWO interleaved states alternating until the
    * backward bitstream is exhausted — the overflow rule emits the
    * other state's symbol and stops).
    * @return (table, bytes consumed including the header byte)
    */
  private def readHufTree(src: Array[Byte], from: Int, to: Int): (HufTable, Int) = {
    if (from >= to) bad()
    val hdr = src(from) & 0xff
    if (hdr >= 128) {
      val nWeights = hdr - 127
      val nBytes = (nWeights + 1) / 2
      if (from + 1 + nBytes > to) bad()
      val w = new Array[Int](nWeights)
      var i = 0
      while (i < nWeights) {
        val b = src(from + 1 + (i >> 1)) & 0xff
        w(i) = if ((i & 1) == 0) b >>> 4 else b & 0x0f
        i += 1
      }
      (buildHuf(w, nWeights), 1 + nBytes)
    } else {
      val cSize = hdr
      if (cSize == 0 || from + 1 + cSize > to) bad()
      val f = new FwdBits(src, from + 1, from + 1 + cSize)
      val (norm, maxSym, accLog) = readFseNorm(f, 6, 255)
      val table = buildFse(norm, maxSym, accLog)
      val descBytes = f.bytesConsumed
      if (descBytes >= cSize) bad()
      val bb = new BackBits(src, from + 1 + descBytes, from + 1 + cSize)
      var s1 = bb.read(accLog)
      var s2 = bb.read(accLog)
      val w = new Array[Int](256)
      var n = 0
      var done = false
      while (!done) {
        if (n >= 255) bad()
        w(n) = table.symbol(s1); n += 1
        s1 = table.newState(s1) + bb.read(table.nbBits(s1))
        if (bb.avail < 0) {
          if (n >= 255) bad()
          w(n) = table.symbol(s2); n += 1
          done = true
        } else {
          if (n >= 255) bad()
          w(n) = table.symbol(s2); n += 1
          s2 = table.newState(s2) + bb.read(table.nbBits(s2))
          if (bb.avail < 0) {
            if (n >= 255) bad()
            w(n) = table.symbol(s1); n += 1
            done = true
          }
        }
      }
      (buildHuf(w, n), 1 + cSize)
    }
  }

  /** One Huffman stream: peek tableLog bits, emit, consume the entry's
    * length; the stream must be consumed EXACTLY.
    */
  private def hufDecodeStream(src: Array[Byte], from: Int, to: Int,
      t: HufTable, out: Array[Byte], o0: Int, count: Int): Unit = {
    val bb = new BackBits(src, from, to)
    val tl = t.tableLog
    var o = o0
    var i = 0
    while (i < count) {
      val idx = bb.peek(tl)
      out(o) = t.symbol(idx)
      bb.skip(t.nbBits(idx))
      o += 1
      i += 1
    }
    if (bb.avail != 0) bad()
  }

  // ------------------------------------------------------------------
  // block decode
  // ------------------------------------------------------------------

  /** Per-frame entropy state: repeat offsets persist across blocks, the
    * Huffman table serves Treeless_Literals_Block, the three FSE tables
    * serve Repeat_Mode.
    */
  private final class FrameState {
    var rep1 = 1L
    var rep2 = 4L
    var rep3 = 8L
    var huf: HufTable = null
    var llT: FseTable = null
    var ofT: FseTable = null
    var mlT: FseTable = null
  }

  private val BlockMaxCeiling = 128 * 1024

  /** Decode one Compressed_Block from src[from, to) into dst at
    * `produced`, never writing at/past dLimit nor matching before
    * frameStart minus the dictionary content `dictC` (RFC 8878 §5:
    * dictionary bytes are virtual history just below the frame).
    * @return bytes regenerated.
    */
  private def decodeBlock(src: Array[Byte], from: Int, to: Int,
      dst: Array[Byte], produced0: Int, dLimit: Int, frameStart: Int,
      st: FrameState, blockMax: Int, windowSize: Long,
      dictC: Array[Byte]): Int = {
    var p = from
    if (p >= to) bad()

    // ---- literals section (§3.1.1.3.1) ----
    val h0 = src(p) & 0xff
    val litType = h0 & 3
    var litLen = 0
    var lit: Array[Byte] = null
    if (litType <= 1) { // Raw or RLE
      if (((h0 >> 2) & 1) == 0) { litLen = h0 >>> 3; p += 1 }
      else if (((h0 >> 3) & 1) == 0) {
        if (p + 2 > to) bad()
        litLen = (h0 >>> 4) | ((src(p + 1) & 0xff) << 4)
        p += 2
      } else {
        if (p + 3 > to) bad()
        litLen = (h0 >>> 4) | ((src(p + 1) & 0xff) << 4) |
          ((src(p + 2) & 0xff) << 12)
        p += 3
      }
      if (litLen > blockMax) bad()
      lit = new Array[Byte](litLen)
      if (litType == 0) { // Raw
        if (p + litLen > to) bad()
        System.arraycopy(src, p, lit, 0, litLen)
        p += litLen
      } else { // RLE
        if (p + 1 > to) bad()
        java.util.Arrays.fill(lit, src(p))
        p += 1
      }
    } else { // Compressed (2) / Treeless (3)
      val sf = (h0 >> 2) & 3
      var regSize = 0
      var cSize = 0
      var nStreams = 4
      if (sf == 0 || sf == 1) {
        if (p + 3 > to) bad()
        val h = h0 | ((src(p + 1) & 0xff) << 8) | ((src(p + 2) & 0xff) << 16)
        regSize = (h >>> 4) & 0x3ff
        cSize = (h >>> 14) & 0x3ff
        if (sf == 0) nStreams = 1
        p += 3
      } else if (sf == 2) {
        if (p + 4 > to) bad()
        val h = h0 | ((src(p + 1) & 0xff) << 8) |
          ((src(p + 2) & 0xff) << 16) | ((src(p + 3) & 0xff) << 24)
        regSize = (h >>> 4) & 0x3fff
        cSize = (h >>> 18) & 0x3fff
        p += 4
      } else {
        if (p + 5 > to) bad()
        val h = (h0.toLong) | ((src(p + 1) & 0xffL) << 8) |
          ((src(p + 2) & 0xffL) << 16) | ((src(p + 3) & 0xffL) << 24) |
          ((src(p + 4) & 0xffL) << 32)
        regSize = ((h >>> 4) & 0x3ffff).toInt
        cSize = ((h >>> 22) & 0x3ffff).toInt
        p += 5
      }
      if (regSize > blockMax || p + cSize > to) bad()
      var q = p
      val qEnd = p + cSize
      val huf =
        if (litType == 2) {
          val (t, used) = readHufTree(src, q, qEnd)
          q += used
          st.huf = t
          t
        } else {
          if (st.huf == null) bad() // Treeless with no previous tree
          st.huf
        }
      lit = new Array[Byte](regSize)
      litLen = regSize
      if (nStreams == 1) {
        if (q >= qEnd) bad()
        hufDecodeStream(src, q, qEnd, huf, lit, 0, regSize)
      } else {
        if (q + 6 > qEnd) bad()
        def le16(i: Int): Int = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8)
        val s1 = le16(q)
        val s2 = le16(q + 2)
        val s3 = le16(q + 4)
        q += 6
        val rest = qEnd - q
        val s4 = rest - s1 - s2 - s3
        if (s4 <= 0) bad()
        val r = (regSize + 3) / 4
        val last = regSize - 3 * r
        if (last < 0) bad()
        hufDecodeStream(src, q, q + s1, huf, lit, 0, r)
        hufDecodeStream(src, q + s1, q + s1 + s2, huf, lit, r, r)
        hufDecodeStream(src, q + s1 + s2, q + s1 + s2 + s3, huf, lit, 2 * r, r)
        hufDecodeStream(src, q + s1 + s2 + s3, qEnd, huf, lit, 3 * r, last)
      }
      p = qEnd
    }

    // ---- sequences section (§3.1.1.3.2) ----
    if (p >= to) bad()
    val b0 = src(p) & 0xff
    var nbSeq = 0
    if (b0 == 0) { p += 1 }
    else if (b0 < 128) { nbSeq = b0; p += 1 }
    else if (b0 < 255) {
      if (p + 2 > to) bad()
      nbSeq = ((b0 - 128) << 8) + (src(p + 1) & 0xff)
      p += 2
    } else {
      if (p + 3 > to) bad()
      nbSeq = (src(p + 1) & 0xff) + ((src(p + 2) & 0xff) << 8) + 0x7f00
      p += 3
    }

    var produced = produced0
    if (nbSeq == 0) {
      // literals-only block; nothing may follow the count byte
      if (p != to) bad()
      if (litLen > dLimit - produced) bad()
      System.arraycopy(lit, 0, dst, produced, litLen)
      return litLen
    }

    if (p >= to) bad()
    val modes = src(p) & 0xff
    if ((modes & 3) != 0) bad() // reserved bits
    p += 1

    def loadTable(mode: Int, prev: FseTable, default: FseTable,
        maxAcc: Int, maxSym: Int): FseTable = mode match {
      case 0 => default
      case 1 =>
        if (p >= to) bad()
        val sym = src(p) & 0xff
        p += 1
        if (sym > maxSym) bad()
        rleFse(sym)
      case 2 =>
        val f = new FwdBits(src, p, to)
        val (norm, maxS, accLog) = readFseNorm(f, maxAcc, maxSym)
        p += f.bytesConsumed
        buildFse(norm, maxS, accLog)
      case _ =>
        if (prev == null) bad()
        prev
    }
    // table parse order in the stream: LL, OF, ML (§3.1.1.3.2.1)
    val llT = loadTable((modes >> 6) & 3, st.llT, LlDefaultTable, 9, 35)
    val ofT = loadTable((modes >> 4) & 3, st.ofT, OfDefaultTable, 8, 31)
    val mlT = loadTable((modes >> 2) & 3, st.mlT, MlDefaultTable, 9, 52)
    st.llT = llT; st.ofT = ofT; st.mlT = mlT

    if (p >= to) bad()
    val bb = new BackBits(src, p, to)
    var llState = bb.read(llT.accLog)
    var ofState = bb.read(ofT.accLog)
    var mlState = bb.read(mlT.accLog)

    var litPos = 0
    var i = 0
    while (i < nbSeq) {
      val ofCode = ofT.symbol(ofState)
      if (ofCode > 31) bad()
      val offVal = (1L << ofCode) + bb.readLong(ofCode)
      val mlCode = mlT.symbol(mlState)
      if (mlCode > 52) bad()
      val ml = MlBase(mlCode) + bb.read(MlBits(mlCode))
      val llCode = llT.symbol(llState)
      if (llCode > 35) bad()
      val ll = LlBase(llCode) + bb.read(LlBits(llCode))

      // repeat offsets (§3.1.1.5)
      var offset = 0L
      if (offVal > 3) {
        offset = offVal - 3
        st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
      } else {
        val idx = offVal.toInt + (if (ll == 0) 1 else 0)
        if (idx == 1) offset = st.rep1
        else if (idx == 2) {
          offset = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
        } else if (idx == 3) {
          offset = st.rep3
          st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
        } else { // ll == 0 && offVal == 3
          offset = st.rep1 - 1
          if (offset < 1) bad()
          st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
        }
      }

      if (i < nbSeq - 1) { // last sequence: no state update
        llState = llT.newState(llState) + bb.read(llT.nbBits(llState))
        mlState = mlT.newState(mlState) + bb.read(mlT.nbBits(mlState))
        ofState = ofT.newState(ofState) + bb.read(ofT.nbBits(ofState))
      }

      // execute: ll literals, then the match
      if (ll > litLen - litPos || ll > dLimit - produced) bad()
      System.arraycopy(lit, litPos, dst, produced, ll)
      litPos += ll
      produced += ll
      val mSrc = produced.toLong - offset
      // spec strictness: a match may reach neither before the frame's
      // history (frame output + supplied dictionary content) nor past
      // the declared window extended by that content (encoders respect
      // Window_Size — the multi-implementation differential pins no
      // false reject)
      if (mSrc < frameStart.toLong - dictC.length || offset <= 0 ||
        offset > windowSize + dictC.length) bad()
      if (ml > dLimit - produced) bad()
      var m = mSrc
      var k = 0
      while (k < ml) { // byte-by-byte: overlap replication is the point
        dst(produced) =
          if (m < frameStart)
            dictC(dictC.length - (frameStart - m.toInt))
          else dst(m.toInt)
        produced += 1
        m += 1
        k += 1
      }
      i += 1
    }
    if (bb.avail != 0) bad() // exact consumption
    val remLit = litLen - litPos
    if (remLit > dLimit - produced) bad()
    System.arraycopy(lit, litPos, dst, produced, remLit)
    produced += remLit
    if (produced - produced0 > blockMax) bad()
    produced - produced0
  }

  // ------------------------------------------------------------------
  // frame walk
  // ------------------------------------------------------------------

  /** Parsed RFC 8878 §5 dictionary (or raw-content fallback). */
  private final class Dict(
      val id: Long,
      val content: Array[Byte],
      val huf: HufTable,
      val llT: FseTable,
      val ofT: FseTable,
      val mlT: FseTable,
      val rep1: Long, val rep2: Long, val rep3: Long,
      val formatted: Boolean)

  private val NoDict = new Dict(0L, new Array[Byte](0),
    null, null, null, null, 1L, 4L, 8L, false)

  /** Parse a dictionary blob: formatted (magic 0xEC30A437 LE) or raw
    * content. Formatted layout per §5: magic, LE32 id, entropy tables
    * in the order Huffman / Offsets / Match_Lengths / Literals_Lengths
    * (same descriptions and accuracy caps as in-frame), THREE LE32
    * repeat offsets (non-zero, ≤ content size), then content. An EMPTY
    * blob means "no dictionary" (the two-arg form's neutral element).
    */
  private def parseDict(d: Array[Byte]): Dict = {
    if (d.length == 0) return NoDict
    if (d.length < 8 ||
      !((d(0) & 0xff) == 0x37 && (d(1) & 0xff) == 0xA4 &&
        (d(2) & 0xff) == 0x30 && (d(3) & 0xff) == 0xEC))
      return new Dict(0L, d, null, null, null, null, 1L, 4L, 8L, false)
    var p = 4
    val id = (d(p) & 0xffL) | ((d(p + 1) & 0xffL) << 8) |
      ((d(p + 2) & 0xffL) << 16) | ((d(p + 3) & 0xffL) << 24)
    p += 4
    val (huf, used) = readHufTree(d, p, d.length)
    p += used
    def fse(maxAcc: Int, maxSym: Int): FseTable = {
      val f = new FwdBits(d, p, d.length)
      val (norm, maxS, accLog) = readFseNorm(f, maxAcc, maxSym)
      p += f.bytesConsumed
      buildFse(norm, maxS, accLog)
    }
    val ofT = fse(8, 31)
    val mlT = fse(9, 52)
    val llT = fse(9, 35)
    if (p + 12 > d.length) bad()
    def le32(i: Int): Long = (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) | ((d(i + 3) & 0xffL) << 24)
    val r1 = le32(p); val r2 = le32(p + 4); val r3 = le32(p + 8)
    p += 12
    val content = java.util.Arrays.copyOfRange(d, p, d.length)
    if (r1 == 0 || r2 == 0 || r3 == 0 ||
      r1 > content.length || r2 > content.length || r3 > content.length)
      bad()
    new Dict(id, content, huf, llT, ofT, mlT, r1, r2, r3, true)
  }

  /** Static kernel shared by eval and generated code. */
  def unzstd(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null) return null
    try decode(bytes, NoDict)
    catch { case Corrupt => null }
  }

  /** Two-argument kernel: decode with a supplied dictionary (empty =
    * none).
    */
  def unzstdDict(bytes: Array[Byte], dict: Array[Byte]): Array[Byte] = {
    if (bytes == null) return null
    try decode(bytes, if (dict == null) NoDict else parseDict(dict))
    catch { case Corrupt => null }
  }

  private def decode(bytes: Array[Byte], dict: Dict): Array[Byte] = {
    val n = bytes.length
    if (n < 8) bad()
    def u32(i: Int): Long = (bytes(i) & 0xffL) |
      ((bytes(i + 1) & 0xffL) << 8) | ((bytes(i + 2) & 0xffL) << 16) |
      ((bytes(i + 3) & 0xffL) << 24)
    var dst = new Array[Byte](0)
    var produced = 0
    def ensure(min: Long): Unit = {
      if (min > dst.length) {
        val want = math.min(MaxOutputBytes,
          math.max(math.max(dst.length.toLong * 2, min), 65536L))
        dst = java.util.Arrays.copyOf(dst, want.toInt)
      }
    }
    var p = 0
    while (p < n) {
      if (p + 4 > n) bad()
      val magic = u32(p)
      if ((magic & 0xfffffff0L) == 0x184d2a50L) {
        // skippable frame (shared with the LZ4 container spec)
        if (p + 8 > n) bad()
        val sz = u32(p + 4)
        if (sz > n - p - 8) bad()
        p += 8 + sz.toInt
      } else if (magic == 0xfd2fb528L) {
        p += 4
        // ---- frame header (§3.1.1.1) ----
        if (p >= n) bad()
        val fhd = bytes(p) & 0xff
        p += 1
        val fcsFlag = fhd >>> 6
        val singleSeg = ((fhd >> 5) & 1) != 0
        if ((fhd & 0x08) != 0) bad() // reserved bit
        val hasChecksum = ((fhd >> 2) & 1) != 0
        val dictFlag = fhd & 3
        var windowSize = 0L
        if (!singleSeg) {
          if (p >= n) bad()
          val wd = bytes(p) & 0xff
          p += 1
          val windowLog = 10 + (wd >>> 3)
          val base = 1L << windowLog
          windowSize = base + (base >>> 3) * (wd & 7)
        }
        val dictBytes = dictFlag match {
          case 0 => 0
          case 1 => 1
          case 2 => 2
          case _ => 4
        }
        if (p + dictBytes > n) bad()
        var dictId = 0L
        var i = 0
        while (i < dictBytes) {
          dictId |= (bytes(p + i) & 0xffL) << (8 * i)
          i += 1
        }
        p += dictBytes
        // ID discipline: a declared id needs a formatted dict with the
        // SAME id; an id-less frame may still use any supplied dict
        if (dictId != 0 && !(dict.formatted && dict.id == dictId)) bad()
        val fcsBytes = fcsFlag match {
          case 0 => if (singleSeg) 1 else 0
          case 1 => 2
          case 2 => 4
          case _ => 8
        }
        if (p + fcsBytes > n) bad()
        var contentSize = -1L
        if (fcsBytes > 0) {
          contentSize = 0L
          i = 0
          while (i < fcsBytes) {
            contentSize |= (bytes(p + i) & 0xffL) << (8 * i)
            i += 1
          }
          if (fcsBytes == 2) contentSize += 256
          p += fcsBytes
          if (contentSize < 0 ||
            produced + contentSize > MaxOutputBytes) bad()
        }
        if (singleSeg) windowSize = math.max(contentSize, 0L)
        if (windowSize > MaxOutputBytes) bad() // policy cap
        val blockMax =
          math.min(math.max(windowSize, 1L), BlockMaxCeiling.toLong).toInt

        val frameStart = produced
        if (contentSize >= 0) ensure(frameStart + contentSize)
        val st = new FrameState
        st.rep1 = dict.rep1; st.rep2 = dict.rep2; st.rep3 = dict.rep3
        st.huf = dict.huf
        st.llT = dict.llT; st.ofT = dict.ofT; st.mlT = dict.mlT
        var last = false
        while (!last) {
          if (p + 3 > n) bad()
          val bh = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
            ((bytes(p + 2) & 0xff) << 16)
          p += 3
          last = (bh & 1) != 0
          val btype = (bh >> 1) & 3
          val bsize = bh >>> 3
          val dLimit =
            if (contentSize >= 0) (frameStart + contentSize).toInt
            else {
              ensure(math.min(MaxOutputBytes, produced.toLong + blockMax))
              dst.length
            }
          btype match {
            case 0 => // Raw
              if (bsize > blockMax || p + bsize > n) bad()
              if (bsize > dLimit - produced) bad()
              System.arraycopy(bytes, p, dst, produced, bsize)
              produced += bsize
              p += bsize
            case 1 => // RLE: bsize is the REGENERATED count, 1 payload byte
              if (bsize > blockMax || p + 1 > n) bad()
              if (bsize > dLimit - produced) bad()
              java.util.Arrays.fill(dst, produced, produced + bsize, bytes(p))
              produced += bsize
              p += 1
            case 2 => // Compressed
              if (bsize > blockMax || p + bsize > n) bad()
              produced += decodeBlock(bytes, p, p + bsize, dst, produced,
                dLimit, frameStart, st, blockMax,
                math.max(windowSize, 1L), dict.content)
              p += bsize
            case _ => bad() // Reserved
          }
        }
        if (contentSize >= 0 && (produced - frameStart).toLong != contentSize)
          bad()
        if (hasChecksum) {
          if (p + 4 > n) bad()
          val want = u32(p)
          val got = Checksums.xxh64(dst, frameStart, produced - frameStart,
            0L) & 0xffffffffL
          if (got != want) bad()
          p += 4
        }
      } else bad() // not a zstd frame, not skippable
    }
    if (produced == dst.length) dst
    else java.util.Arrays.copyOf(dst, produced)
  }

  def zstd_inflate(c: Column): Column =
    GraftColumnBridge.column(ZstdInflate(GraftColumnBridge.expression(c)))

  def zstd_inflate_dict(c: Column, dict: Column): Column =
    GraftColumnBridge.column(ZstdInflateDict(
      GraftColumnBridge.expression(c), GraftColumnBridge.expression(dict)))
}

/** Two-argument dictionary form: `zstd_inflate_dict(blob, dict)` — see
  * [[ZstdInflate]]'s dictionary paragraph. Null-safe on BOTH arguments
  * (the family's expression convention); pass an EMPTY dictionary for
  * "no dictionary" — it is the neutral element, decoding exactly like
  * the one-argument form.
  */
case class ZstdInflateDict(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ZstdInflateDict requires (BINARY, BINARY), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(blob: Any, dict: Any): Any =
    ZstdInflate.unzstdDict(blob.asInstanceOf[Array[Byte]],
      dict.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, d) => s"""
      ${ev.value} = graft.functions.ZstdInflate.unzstdDict($b, $d);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZstdInflateDict =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zstd_inflate_dict"
}
