package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL PDF text extraction over opaque binary columns — the single
  * biggest real-world document format on the crawl line (CommonCrawl-
  * adjacent corpora treat PDF as a first-class modality), implemented
  * from the PUBLIC specification (ISO 32000-1 / the Adobe PDF 1.7
  * reference) with nothing stubbed.
  *
  * Pipeline: `%PDF-` header probe → `startxref` at the tail → classic
  * xref TABLE(s) (20-byte entries, multi-subsection, `/Prev`-chained
  * incremental updates with newest-wins merging) → trailer → `/Root`
  * catalog → `/Pages` tree walk (Kids recursion, `/Resources`
  * inheritance) → per-page `/Contents` streams (single or array,
  * `/Length` possibly indirect) decoded (`/FlateDecode` via the
  * in-engine [[ZlibInflate]] kernel, or no filter) → a content-stream
  * interpreter over the text operators: `BT`/`ET`, `Tf` (font select),
  * `Tj`, `'`, `"` and `TJ` (array show; a kerning adjustment ≤ −180
  * thousandths of an em renders as one space — the deterministic
  * spelling of the extractor-standard word-gap heuristic), with line
  * structure from `T*`, `'`, `"`, `Td`/`TD` (ty ≠ 0) and `Tm` (emitted
  * lazily: a pending line break materializes only when text follows).
  *
  * Character decoding per simple font: a `/ToUnicode` CMap when present
  * (bfchar + bfrange incl. the array form) wins per code; otherwise
  * `/WinAnsiEncoding` / `/MacRomanEncoding` decode through the JDK's
  * windows-1252 / x-MacRoman tables (independent canonical
  * implementations of the same public tables), and StandardEncoding
  * (also the no-`/Encoding` default) through the Appendix D table spelled
  * out below; unmapped codes surface as U+FFFD, never silently vanish.
  * An `/Encoding` DICT uses its `/BaseEncoding` (`/Differences` arrays
  * are a declared bound — applying them needs the full Adobe glyph
  * list).
  *
  * STRICT probe — whole-result NULL for the declared out-of-scope
  * surface and for corruption: `/Encrypt` in any trailer, xref STREAMS
  * (`N 0 obj` where the table should be), any filter other than
  * FlateDecode, composite (`/Type0`) fonts without usable codes, inline
  * images (`BI`), missing/dangling Root/Pages/Kids, malformed objects,
  * offsets outside the blob, and cycle/depth/page/object caps (named
  * below) against crafted bombs. Form XObjects (`Do`) are ignored, not
  * NULLed — their text is outside the page's own content stream
  * (declared).
  *
  * Scale shape: map-only, codegen'd; output capped at [[PdfText.MaxOut]]
  * chars and inflation bounded by ZlibInflate's own 64 MB cap, so work
  * per row is bounded by POLICY like the rest of the codec family.
  * Reference behaviors mirrored: /root/reference has no PDF path — this
  * is beyond-reference surface for the 100 TB pipeline brief.
  */
case class PdfText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"PdfText requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PdfText.extract(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PdfText.extract($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PdfText =
    copy(child = newChild)

  override def prettyName: String = "pdf_text"
}

object PdfText {

  /** Output cap (chars): a bomb guard, like the codec family's 64 MB. */
  val MaxOut: Int = 16 * 1024 * 1024
  private val MaxObjects = 65536
  private val MaxPages = 4096
  private val MaxDepth = 32
  private val MaxXrefChain = 16

  // ---------------- PDF object model ----------------

  private sealed trait Obj
  private case class PNum(v: Double) extends Obj
  private case class PName(s: String) extends Obj
  private case class PStr(bytes: Array[Byte]) extends Obj
  private case class PArr(items: Vector[Obj]) extends Obj
  private case class PDict(m: Map[String, Obj]) extends Obj
  private case class PRef(num: Int) extends Obj
  private case class PStream(dict: PDict, raw: Array[Byte]) extends Obj
  private case object PNull extends Obj
  private case class PBool(v: Boolean) extends Obj

  /** Structural failure: unwinds to a NULL result. */
  private final class Bad extends RuntimeException(null, null, false, false)
  private def bad(): Nothing = throw new Bad

  private def isWs(c: Int): Boolean =
    c == 0x00 || c == 0x09 || c == 0x0a || c == 0x0c || c == 0x0d ||
      c == 0x20
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** A lexer/parser cursor over the whole file (also reused for content
    * streams, which share the object syntax for operands).
    */
  private final class Lexer(val b: Array[Byte], var p: Int, val end: Int) {

    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (p < end && isWs(b(p) & 0xff)) p += 1
        if (p < end && b(p) == '%') { // comment to end of line
          while (p < end && b(p) != '\n' && b(p) != '\r') p += 1
        } else go = false
      }
    }

    def peek(): Int = { skipWs(); if (p < end) b(p) & 0xff else -1 }

    /** A bare keyword/operator token (obj, stream, R, BT, Tj, ...). */
    def keyword(): String = {
      skipWs()
      val s = p
      while (p < end && !isWs(b(p) & 0xff) && !isDelim(b(p) & 0xff)) p += 1
      if (p == s) bad()
      new String(b, s, p - s, java.nio.charset.StandardCharsets.US_ASCII)
    }

    def expect(kw: String): Unit = if (keyword() != kw) bad()

    def name(): String = {
      skipWs()
      if (p >= end || b(p) != '/') bad()
      p += 1
      val sb = new java.lang.StringBuilder
      while (p < end && !isWs(b(p) & 0xff) && !isDelim(b(p) & 0xff)) {
        val c = b(p) & 0xff
        if (c == '#' && p + 2 < end) { // #xx hex escape in names
          val h = hexVal(b(p + 1)) * 16 + hexVal(b(p + 2))
          if (h < 0) bad()
          sb.append(h.toChar)
          p += 3
        } else { sb.append(c.toChar); p += 1 }
      }
      sb.toString
    }

    private def hexVal(x: Byte): Int = {
      val c = x & 0xff
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    }

    def number(): Double = {
      skipWs()
      val s = p
      if (p < end && (b(p) == '+' || b(p) == '-')) p += 1
      var digits = false
      while (p < end && b(p) >= '0' && b(p) <= '9') { p += 1; digits = true }
      if (p < end && b(p) == '.') {
        p += 1
        while (p < end && b(p) >= '0' && b(p) <= '9') { p += 1; digits = true }
      }
      if (!digits) bad()
      java.lang.Double.parseDouble(
        new String(b, s, p - s, java.nio.charset.StandardCharsets.US_ASCII))
    }

    /** Literal string `(...)`: balanced parens, the spec's escapes,
      * in-string EOLs normalized to \n.
      */
    def literalString(): Array[Byte] = {
      if (p >= end || b(p) != '(') bad()
      p += 1
      val out = new java.io.ByteArrayOutputStream
      var depth = 1
      while (depth > 0) {
        if (p >= end) bad()
        val c = b(p) & 0xff
        p += 1
        if (c == '\\') {
          if (p >= end) bad()
          val e = b(p) & 0xff
          p += 1
          e match {
            case 'n' => out.write(0x0a)
            case 'r' => out.write(0x0d)
            case 't' => out.write(0x09)
            case 'b' => out.write(0x08)
            case 'f' => out.write(0x0c)
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case 0x0d => // line continuation: \CR or \CRLF
              if (p < end && b(p) == '\n') p += 1
            case 0x0a => // \LF
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && p < end && b(p) >= '0' && b(p) <= '7') {
                v = v * 8 + (b(p) - '0'); p += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other) // spec: backslash dropped
          }
        } else if (c == '(') { depth += 1; out.write('(') }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(')') }
        else if (c == 0x0d) { // EOL in a string reads as \n
          if (p < end && b(p) == '\n') p += 1
          out.write(0x0a)
        } else out.write(c)
      }
      out.toByteArray
    }

    def hexString(): Array[Byte] = {
      if (p >= end || b(p) != '<') bad()
      p += 1
      val out = new java.io.ByteArrayOutputStream
      var hi = -1
      var done = false
      while (!done) {
        if (p >= end) bad()
        val c = b(p) & 0xff
        p += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi * 16) // odd count: pad with 0
          done = true
        } else if (!isWs(c)) {
          val v = hexVal(c.toByte)
          if (v < 0) bad()
          if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 }
        }
      }
      out.toByteArray
    }

    /** Parse one object (no stream handling — the Doc layer adds it). */
    def obj(depth: Int): Obj = {
      if (depth > MaxDepth) bad()
      skipWs()
      if (p >= end) bad()
      val c = b(p) & 0xff
      if (c == '/') PName(name())
      else if (c == '(') PStr(literalString())
      else if (c == '[') {
        p += 1
        val items = Vector.newBuilder[Obj]
        while (peek() != ']') items += obj(depth + 1)
        p += 1
        PArr(items.result())
      } else if (c == '<') {
        if (p + 1 < end && b(p + 1) == '<') {
          p += 2
          val m = Map.newBuilder[String, Obj]
          while (peek() != '>') {
            val k = name()
            m += k -> obj(depth + 1)
          }
          if (p + 1 >= end || b(p + 1) != '>') bad()
          p += 2
          PDict(m.result())
        } else PStr(hexString())
      } else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val v = number()
        // "n g R" indirect reference lookahead
        if (v >= 0 && v == v.floor) {
          val save = p
          skipWs()
          if (p < end && b(p) >= '0' && b(p) <= '9') {
            try {
              number() // generation (unused: offsets key on number)
              skipWs()
              if (p < end && b(p) == 'R' &&
                  (p + 1 >= end || isWs(b(p + 1) & 0xff) ||
                    isDelim(b(p + 1) & 0xff))) {
                p += 1
                return PRef(v.toInt)
              }
            } catch { case _: Bad => }
          }
          p = save
        }
        PNum(v)
      } else {
        val kw = keyword()
        kw match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case _ => bad()
        }
      }
    }
  }

  // ---------------- document layer ----------------

  private final class Doc(bytes: Array[Byte]) {
    private val n = bytes.length
    private val offsets = mutable.LongMap.empty[Long] // objNum -> offset
    private val cache = mutable.LongMap.empty[Obj]
    var trailer: Map[String, Obj] = Map.empty

    def load(): Unit = {
      // header probe
      if (n < 16 || bytes(0) != '%' || bytes(1) != 'P' || bytes(2) != 'D' ||
        bytes(3) != 'F' || bytes(4) != '-') bad()
      // find the last `startxref` in the tail window
      val tail = math.max(0, n - 1024)
      var at = -1
      var i = tail
      while (i + 9 <= n) {
        if (bytes(i) == 's' && matches(i, "startxref")) at = i
        i += 1
      }
      if (at < 0) bad()
      val lx = new Lexer(bytes, at + 9, n)
      val start = lx.number()
      if (start < 0 || start >= n) bad()
      // walk the /Prev chain, newest first; later (older) entries must
      // not override earlier (newer) ones
      var off = start.toLong
      var hops = 0
      while (off >= 0) {
        if (hops >= MaxXrefChain) bad()
        hops += 1
        val t = parseXrefAt(off)
        if (trailer.isEmpty) trailer = t
        if (t.contains("Encrypt")) bad() // declared bound
        off = t.get("Prev") match {
          case Some(PNum(v)) if v >= 0 && v < n => v.toLong
          case Some(_) => bad()
          case None => -1L
        }
      }
    }

    private def matches(i: Int, s: String): Boolean = {
      if (i + s.length > n) return false
      var k = 0
      while (k < s.length) {
        if (bytes(i + k) != s.charAt(k)) return false
        k += 1
      }
      true
    }

    /** Classic xref table at `off`; xref STREAMS (an `obj` keyword
      * here) are the declared bound → Bad.
      */
    private def parseXrefAt(off: Long): Map[String, Obj] = {
      val lx = new Lexer(bytes, off.toInt, n)
      if (lx.keyword() != "xref") bad()
      var kw: String = null
      while (kw == null) {
        lx.skipWs()
        val c = lx.peek()
        if (c >= '0' && c <= '9') {
          val first = lx.number()
          val count = lx.number()
          if (first < 0 || count < 0 || count > MaxObjects) bad()
          var k = 0
          while (k < count) {
            val o = lx.number() // 10-digit offset
            val g = lx.number() // 5-digit generation (unused)
            val t = lx.keyword() // n / f
            if (g < 0) bad()
            val num = first.toLong + k
            if (t == "n") {
              if (o < 0 || o >= n) bad()
              if (!offsets.contains(num)) offsets(num) = o.toLong
            } else if (t == "f") {
              if (!offsets.contains(num)) offsets(num) = -1L
            } else bad()
            k += 1
          }
        } else kw = lx.keyword()
      }
      if (kw != "trailer") bad()
      lx.obj(0) match {
        case PDict(m) => m
        case _ => bad()
      }
    }

    /** Load `num 0 obj ... endobj`, attaching stream data when present. */
    def fetch(num: Int): Obj = cache.getOrElseUpdate(num.toLong, {
      if (cache.size > MaxObjects) bad()
      val off = offsets.getOrElse(num.toLong, -1L)
      if (off < 0) return PNull // free / absent object reads as null
      val lx = new Lexer(bytes, off.toInt, n)
      if (lx.number().toInt != num) bad()
      lx.number() // generation
      lx.expect("obj")
      val o = lx.obj(0)
      lx.skipWs()
      if (lx.p + 6 <= n && matches(lx.p, "stream")) {
        val dict = o match { case d: PDict => d; case _ => bad() }
        var q = lx.p + 6
        // spec: `stream` is followed by CRLF or LF (not bare CR)
        if (q < n && bytes(q) == '\r') q += 1
        if (q < n && bytes(q) == '\n') q += 1
        val len = resolve(dict.m.getOrElse("Length", bad()), 0) match {
          case PNum(v) if v >= 0 && q + v <= n => v.toInt
          case _ => bad()
        }
        val raw = java.util.Arrays.copyOfRange(bytes, q, q + len)
        PStream(dict, raw)
      } else o
    })

    def resolve(o: Obj, depth: Int): Obj = {
      if (depth > MaxDepth) bad()
      o match {
        case PRef(num) => resolve(fetch(num), depth + 1)
        case other => other
      }
    }

    /** Decoded stream bytes: no filter, or FlateDecode (incl. the
      * 1-element array form). Anything else is the declared bound.
      */
    def streamData(s: PStream): Array[Byte] = {
      val filt = s.dict.m.get("Filter").map(resolve(_, 0))
      filt match {
        case None => s.raw
        case Some(PName("FlateDecode")) => inflate(s.raw)
        case Some(PArr(Vector(PName("FlateDecode")))) => inflate(s.raw)
        case Some(PArr(Vector())) => s.raw
        case _ => bad()
      }
    }

    private def inflate(raw: Array[Byte]): Array[Byte] = {
      val out = ZlibInflate.unzlib(raw)
      if (out == null) bad()
      out
    }
  }

  // ---------------- encodings ----------------

  private def byteTable(cs: java.nio.charset.Charset): Array[String] = {
    val t = new Array[String](256)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    var i = 0
    while (i < 256) {
      t(i) = dec.decode(
        java.nio.ByteBuffer.wrap(Array(i.toByte))).toString
      dec.reset()
      i += 1
    }
    t
  }

  private lazy val WinAnsiTable: Array[String] =
    byteTable(java.nio.charset.Charset.forName("windows-1252"))
  private lazy val MacRomanTable: Array[String] =
    byteTable(java.nio.charset.Charset.forName("x-MacRoman"))

  /** PDF Annex D StandardEncoding: ASCII with the two typographic-quote
    * substitutions, plus the defined high range; undefined codes →
    * U+FFFD (never silently dropped).
    */
  private lazy val StandardTable: Array[String] = {
    val t = Array.fill(256)("�")
    var i = 32
    while (i < 127) { t(i) = i.toChar.toString; i += 1 }
    t(0x27) = "’" // quoteright
    t(0x60) = "‘" // quoteleft
    val high = Map(
      0xa1 -> "¡", 0xa2 -> "¢", 0xa3 -> "£",
      0xa4 -> "⁄", 0xa5 -> "¥", 0xa6 -> "ƒ",
      0xa7 -> "§", 0xa8 -> "¤", 0xa9 -> "'",
      0xaa -> "“", 0xab -> "«", 0xac -> "‹",
      0xad -> "›", 0xae -> "ﬁ", 0xaf -> "ﬂ",
      0xb1 -> "–", 0xb2 -> "†", 0xb3 -> "‡",
      0xb4 -> "·", 0xb6 -> "¶", 0xb7 -> "•",
      0xb8 -> "‚", 0xb9 -> "„", 0xba -> "”",
      0xbb -> "»", 0xbc -> "…", 0xbd -> "‰",
      0xbf -> "¿", 0xc1 -> "`", 0xc2 -> "´",
      0xc3 -> "ˆ", 0xc4 -> "˜", 0xc5 -> "¯",
      0xc6 -> "˘", 0xc7 -> "˙", 0xc8 -> "¨",
      0xca -> "˚", 0xcb -> "¸", 0xcd -> "˝",
      0xce -> "˛", 0xcf -> "ˇ", 0xd0 -> "—",
      0xe1 -> "Æ", 0xe3 -> "ª", 0xe8 -> "Ł",
      0xe9 -> "Ø", 0xea -> "Œ", 0xeb -> "º",
      0xf1 -> "æ", 0xf5 -> "ı", 0xf8 -> "ł",
      0xf9 -> "ø", 0xfa -> "œ", 0xfb -> "ß")
    high.foreach { case (k, v) => t(k) = v }
    t
  }

  private final case class Font(
      table: Array[String],
      toUnicode: Map[Int, String])

  private def buildFont(doc: Doc, o: Obj): Font = {
    val d = doc.resolve(o, 0) match { case d: PDict => d; case _ => bad() }
    doc.resolve(d.m.getOrElse("Subtype", PNull), 0) match {
      case PName("Type0") => bad() // composite fonts: declared bound
      case _ =>
    }
    val table = doc.resolve(d.m.getOrElse("Encoding", PNull), 0) match {
      case PName("WinAnsiEncoding") => WinAnsiTable
      case PName("MacRomanEncoding") => MacRomanTable
      case PName("StandardEncoding") => StandardTable
      case PDict(m) => // /Differences: declared bound — BaseEncoding only
        doc.resolve(m.getOrElse("BaseEncoding", PNull), 0) match {
          case PName("WinAnsiEncoding") => WinAnsiTable
          case PName("MacRomanEncoding") => MacRomanTable
          case _ => StandardTable
        }
      case PNull => StandardTable
      case _ => bad()
    }
    val toUni = doc.resolve(d.m.getOrElse("ToUnicode", PNull), 0) match {
      case s: PStream => parseToUnicode(doc.streamData(s))
      case PNull => Map.empty[Int, String]
      case _ => bad()
    }
    Font(table, toUni)
  }

  /** bfchar/bfrange sections of a ToUnicode CMap (1–2 byte codes). */
  private def parseToUnicode(data: Array[Byte]): Map[Int, String] = {
    val lx = new Lexer(data, 0, data.length)
    val m = Map.newBuilder[Int, String]
    def codeOf(b: Array[Byte]): Int = {
      if (b.isEmpty || b.length > 2) bad()
      b.foldLeft(0)((a, x) => (a << 8) | (x & 0xff))
    }
    def strOf(b: Array[Byte]): String = {
      if (b.length % 2 != 0) bad()
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    var guard = 0
    while (guard < 65536 && { lx.skipWs(); lx.p < lx.end }) {
      guard += 1
      val c = lx.peek()
      val tok: Either[String, Obj] =
        if (c == '<' && lx.p + 1 < lx.end && lx.b(lx.p + 1) == '<') {
          Right(lx.obj(0))
        } else if (c == '/' || c == '(' || c == '<' || c == '[' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
          Right(lx.obj(0))
        } else Left(lx.keyword())
      tok match {
        case Left("beginbfchar") =>
          var go = true
          while (go) {
            lx.skipWs()
            if (lx.peek() == '<') {
              val src = codeOf(lx.hexString())
              lx.skipWs()
              val dst = strOf(lx.hexString())
              m += src -> dst
            } else { if (lx.keyword() != "endbfchar") bad(); go = false }
          }
        case Left("beginbfrange") =>
          var go = true
          while (go) {
            lx.skipWs()
            if (lx.peek() == '<') {
              val lo = codeOf(lx.hexString())
              lx.skipWs()
              val hi = codeOf(lx.hexString())
              if (hi < lo || hi - lo > 65535) bad()
              lx.skipWs()
              if (lx.peek() == '[') {
                lx.obj(0) match {
                  case PArr(items) =>
                    if (items.length != hi - lo + 1) bad()
                    items.zipWithIndex.foreach {
                      case (PStr(sb), k) => m += (lo + k) -> strOf(sb)
                      case _ => bad()
                    }
                  case _ => bad()
                }
              } else {
                val base = lx.hexString()
                val s0 = strOf(base)
                if (s0.isEmpty) bad()
                var k = 0
                while (k <= hi - lo) {
                  val last = s0.length - 1
                  m += (lo + k) ->
                    (s0.substring(0, last) + (s0.charAt(last) + k).toChar)
                  k += 1
                }
              }
            } else { if (lx.keyword() != "endbfrange") bad(); go = false }
          }
        case _ => // cmap boilerplate (dicts, defs, usecmap, ...)
      }
    }
    m.result()
  }

  // ---------------- content interpreter ----------------

  private final class Emitter {
    private val sb = new java.lang.StringBuilder
    private var pendingBreak = false
    def lineBreak(): Unit = pendingBreak = true
    def text(s: String): Unit = {
      if (s.isEmpty) return
      if (pendingBreak) {
        if (sb.length > 0 && sb.charAt(sb.length - 1) != '\n')
          sb.append('\n')
        pendingBreak = false
      }
      if (sb.length + s.length > MaxOut) bad()
      sb.append(s)
    }
    def result(): String = sb.toString
  }

  private def runContent(doc: Doc, content: Array[Byte],
      fonts: Map[String, Obj], fontCache: mutable.Map[Obj, Font],
      out: Emitter): Unit = {
    val lx = new Lexer(content, 0, content.length)
    var operands = List.empty[Obj]
    var font: Font = null
    def showBytes(bytes: Array[Byte]): Unit = {
      val f = if (font != null) font else Font(StandardTable, Map.empty)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < bytes.length) {
        val c = bytes(i) & 0xff
        sb.append(f.toUnicode.getOrElse(c, f.table(c)))
        i += 1
      }
      out.text(sb.toString)
    }
    def numArg(k: Int): Double = operands.reverse.lift(k) match {
      case Some(PNum(v)) => v
      case _ => bad()
    }
    while ({ lx.skipWs(); lx.p < lx.end }) {
      val c = lx.peek()
      if (c == '/' || c == '(' || c == '<' || c == '[' || c == '+' ||
        c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        operands = lx.obj(0) :: operands
      } else {
        val op = lx.keyword()
        op match {
          case "BT" | "ET" => out.lineBreak()
          case "Tf" =>
            operands.reverse.headOption match {
              case Some(PName(fn)) =>
                val fo = fonts.getOrElse(fn, bad())
                font = fontCache.getOrElseUpdate(fo, buildFont(doc, fo))
              case _ => bad()
            }
          case "Tj" =>
            operands match {
              case PStr(s) :: _ => showBytes(s)
              case _ => bad()
            }
          case "'" =>
            out.lineBreak()
            operands match {
              case PStr(s) :: _ => showBytes(s)
              case _ => bad()
            }
          case "\"" =>
            out.lineBreak()
            operands match {
              case PStr(s) :: _ => showBytes(s)
              case _ => bad()
            }
          case "TJ" =>
            operands match {
              case PArr(items) :: _ =>
                items.foreach {
                  case PStr(s) => showBytes(s)
                  case PNum(v) =>
                    // the extractor-standard word-gap heuristic, made
                    // deterministic: ≤ -180/1000 em reads as a space
                    if (v <= -180) out.text(" ")
                  case _ => bad()
                }
              case _ => bad()
            }
          case "Td" | "TD" =>
            if (numArg(1) != 0) out.lineBreak()
          case "T*" => out.lineBreak()
          case "Tm" =>
            out.lineBreak()
          case "BI" => bad() // inline images: declared bound
          case _ => // Tc/Tw/Tz/TL/Ts/Tr, graphics ops, Do, ...: ignored
        }
        operands = Nil
      }
    }
  }

  // ---------------- page tree ----------------

  def extract(bytes: Array[Byte]): UTF8String = {
    if (bytes == null) return null
    try {
      val doc = new Doc(bytes)
      doc.load()
      val root = doc.resolve(doc.trailer.getOrElse("Root", bad()), 0) match {
        case d: PDict => d
        case _ => bad()
      }
      val pagesRoot = doc.resolve(root.m.getOrElse("Pages", bad()), 0)
      val out = new Emitter
      val fontCache = mutable.Map.empty[Obj, Font]
      var pageCount = 0

      def walk(node: Obj, inheritedRes: Obj, depth: Int): Unit = {
        if (depth > MaxDepth) bad()
        val d = doc.resolve(node, 0) match {
          case x: PDict => x
          case _ => bad()
        }
        val res = d.m.getOrElse("Resources", inheritedRes)
        doc.resolve(d.m.getOrElse("Type", PNull), 0) match {
          case PName("Pages") =>
            doc.resolve(d.m.getOrElse("Kids", bad()), 0) match {
              case PArr(kids) => kids.foreach(walk(_, res, depth + 1))
              case _ => bad()
            }
          case PName("Page") =>
            pageCount += 1
            if (pageCount > MaxPages) bad()
            val fonts: Map[String, Obj] =
              doc.resolve(res, 0) match {
                case PDict(rm) => doc.resolve(
                  rm.getOrElse("Font", PNull), 0) match {
                  case PDict(fm) => fm
                  case PNull => Map.empty
                  case _ => bad()
                }
                case PNull => Map.empty
                case _ => bad()
              }
            val contents = d.m.get("Contents").map(doc.resolve(_, 0))
            val streams: Seq[PStream] = contents match {
              case None => Nil
              case Some(s: PStream) => Seq(s)
              case Some(PArr(items)) => items.map(doc.resolve(_, 0)).map {
                case s: PStream => s
                case _ => bad()
              }
              case Some(PNull) => Nil
              case _ => bad()
            }
            if (streams.nonEmpty) {
              // the spec: multiple Contents parts form ONE stream with
              // whitespace between parts
              val parts = streams.map(doc.streamData)
              val total = parts.map(_.length.toLong).sum + parts.length
              if (total > MaxOut.toLong * 4) bad()
              val joined = new java.io.ByteArrayOutputStream
              parts.foreach { pt => joined.write(pt); joined.write('\n') }
              out.lineBreak()
              runContent(doc, joined.toByteArray, fonts, fontCache, out)
            }
          case _ => bad()
        }
      }

      walk(pagesRoot, PNull, 0)
      UTF8String.fromString(out.result())
    } catch {
      case _: Bad => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NumberFormatException => null
      case _: StackOverflowError => null
    }
  }

  def pdf_text(c: Column): Column =
    GraftColumnBridge.column(PdfText(GraftColumnBridge.expression(c)))
}
