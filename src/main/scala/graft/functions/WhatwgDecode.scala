package graft.functions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WHATWG HTML encoding sniffing + decode over raw crawl bytes — what a
  * BROWSER does to a fetched page, which is what a crawl pipeline must
  * reproduce to match the text real users saw (the naive "trust the
  * Content-Type header, default UTF-8" path mislabels the two most
  * common real-world cases: latin-1-labeled pages using 0x80–0x9F
  * punctuation, and pages whose charset arrives only via `<meta>`).
  *
  * Implements the public WHATWG Encoding + HTML standards' sniffing
  * subset, in precedence order:
  *  1. BOM sniff (EF BB BF / FF FE / FE FF) — overrides everything,
  *     and the matched BOM is consumed before decode, per the spec's
  *     `decode` algorithm;
  *  2. the transport-layer charset label, run through the spec's
  *     label→encoding table (the load-bearing rows: every latin-1 /
  *     ascii-family label — iso-8859-1, latin1, us-ascii, cp819, … —
  *     maps to windows-1252, whose 0x80–0x9F are PRINTABLE; utf-16 maps
  *     to utf-16le). Unrecognized labels are IGNORED and sniffing
  *     continues, per the spec;
  *  3. the `<meta>` prescan over the first 1024 bytes: `<!--…-->`
  *     comments skipped, tags skipped attribute-by-attribute (quoted
  *     values may contain `>`), `charset` attributes and
  *     `http-equiv=content-type` + `content="…charset=…"` pragmas both
  *     honored, and the spec's post-fixups applied (a utf-16 family
  *     result becomes utf-8, x-user-defined becomes windows-1252);
  *  4. the utf-8 default.
  *
  * Decode maps malformed sequences to U+FFFD (the spec's replacement
  * behavior), never errors. Supported canonical encodings: utf-8,
  * utf-16le, utf-16be, windows-1252 — the set that covers the BOM +
  * label-table + prescan paths above; [[WhatwgEncoding]] surfaces which
  * one fired, so coverage is observable per row.
  *
  * Scale shape: map-only, codegen'd, prescan capped at 1024 bytes by
  * spec — fuses into the scan like the rest of the HTTP family.
  */
case class WhatwgDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WhatwgDecode requires (BINARY, STRING), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(body: Any, label: Any): Any =
    WhatwgDecode.decode(body.asInstanceOf[Array[Byte]],
      label.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, l) => s"""
      ${ev.value} = graft.functions.WhatwgDecode.decode($b, $l);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WhatwgDecode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "whatwg_decode"
}

/** The sniffed canonical encoding name ("utf-8" / "utf-16le" /
  * "utf-16be" / "windows-1252") for (body, transport label) — the
  * observable side of [[WhatwgDecode]].
  */
case class WhatwgEncoding(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WhatwgEncoding requires (BINARY, STRING), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(body: Any, label: Any): Any =
    WhatwgDecode.sniffName(body.asInstanceOf[Array[Byte]],
      label.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, l) => s"""
      ${ev.value} = graft.functions.WhatwgDecode.sniffName($b, $l);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WhatwgEncoding =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "whatwg_encoding"
}

object WhatwgDecode {

  private val Win1252: Charset = Charset.forName("windows-1252")

  /** WHATWG label→encoding table, restricted to the four encodings this
    * sniffer supports. Labels are the spec's, pre-lowercased; lookup
    * trims the spec's ASCII whitespace set.
    */
  private val Labels: Map[String, String] = {
    val utf8 = Seq("unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8",
      "utf-8", "utf8", "x-unicode20utf8")
    val w1252 = Seq("ansi_x3.4-1968", "ascii", "cp1252", "cp819",
      "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1",
      "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1", "latin1",
      "us-ascii", "windows-1252", "x-cp1252")
    val u16le = Seq("csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
      "unicodefeff", "utf-16", "utf-16le")
    val u16be = Seq("unicodefffe", "utf-16be")
    (utf8.map(_ -> "utf-8") ++ w1252.map(_ -> "windows-1252") ++
      u16le.map(_ -> "utf-16le") ++ u16be.map(_ -> "utf-16be") ++
      Seq("x-user-defined" -> "x-user-defined")).toMap
  }

  /** Spec "get an encoding": trim ASCII whitespace, lowercase, look up.
    * Returns null for failure (unrecognized label) — the caller then
    * CONTINUES sniffing, per the HTML standard.
    */
  private def labelToEncoding(label: String): String = {
    if (label == null) return null
    var a = 0
    var b = label.length
    def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    while (a < b && isWs(label.charAt(a))) a += 1
    while (b > a && isWs(label.charAt(b - 1))) b -= 1
    if (a >= b) return null
    Labels.getOrElse(label.substring(a, b).toLowerCase(java.util.Locale.ROOT),
      null)
  }

  /** (encoding name, bytes to skip) after BOM + label + prescan +
    * default. bomSkip > 0 only when a BOM matched.
    */
  private def sniff(bytes: Array[Byte], label: UTF8String): (String, Int) = {
    val n = bytes.length
    // 1. BOM — overrides even the transport label (WHATWG `decode`)
    if (n >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb &&
        (bytes(2) & 0xff) == 0xbf) return ("utf-8", 3)
    if (n >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      return ("utf-16le", 2)
    if (n >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      return ("utf-16be", 2)
    // 2. transport-layer label (unrecognized → keep sniffing)
    val fromLabel =
      labelToEncoding(if (label == null) null else label.toString)
    if (fromLabel != null && fromLabel != "x-user-defined")
      return (fromLabel, 0)
    if (fromLabel == "x-user-defined") return ("windows-1252", 0)
    // 3. <meta> prescan over the first 1024 bytes
    val fromMeta = prescan(bytes)
    if (fromMeta != null) return (fromMeta, 0)
    // 4. default (this engine's documented choice; the spec leaves the
    // no-information default locale-dependent)
    ("utf-8", 0)
  }

  def sniffName(bytes: Array[Byte], label: UTF8String): UTF8String = {
    if (bytes == null) return null
    UTF8String.fromString(sniff(bytes, label)._1)
  }

  def decode(bytes: Array[Byte], label: UTF8String): UTF8String = {
    if (bytes == null) return null
    val (enc, skip) = sniff(bytes, label)
    val cs = enc match {
      case "utf-8" => StandardCharsets.UTF_8
      case "utf-16le" => StandardCharsets.UTF_16LE
      case "utf-16be" => StandardCharsets.UTF_16BE
      case _ => Win1252
    }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val out = dec.decode(
      java.nio.ByteBuffer.wrap(bytes, skip, bytes.length - skip)).toString
    UTF8String.fromString(out)
  }

  // --- the HTML standard's "prescan a byte stream to determine its
  // encoding", over at most the first 1024 bytes ---

  private def lower(b: Byte): Int = {
    val c = b & 0xff
    if (c >= 'A' && c <= 'Z') c + 32 else c
  }

  private def isSpace(c: Int): Boolean =
    c == 0x09 || c == 0x0a || c == 0x0c || c == 0x0d || c == 0x20

  private def matchesAt(b: Array[Byte], i: Int, limit: Int,
      s: String): Boolean = {
    if (i + s.length > limit) return false
    var k = 0
    while (k < s.length) {
      if (lower(b(i + k)) != s.charAt(k)) return false
      k += 1
    }
    true
  }

  private def prescan(bytes: Array[Byte]): String = {
    val limit = math.min(bytes.length, 1024)
    var i = 0
    while (i < limit) {
      if (matchesAt(bytes, i, limit, "<!--")) {
        // skip to the first "-->" (overlap allowed per spec: search
        // starts at the comment's own "--")
        var j = i + 2
        var found = -1
        while (found < 0 && j + 3 <= limit) {
          if (bytes(j) == '-' && bytes(j + 1) == '-' && bytes(j + 2) == '>')
            found = j + 3
          j += 1
        }
        if (found < 0) return null
        i = found
      } else if (matchesAt(bytes, i, limit, "<meta") && i + 5 < limit &&
          (isSpace(lower(bytes(i + 5))) || bytes(i + 5) == '/')) {
        val r = prescanMeta(bytes, i + 5, limit)
        if (r != null) {
          var enc = r
          // spec post-fixups for prescan results
          if (enc == "utf-16le" || enc == "utf-16be") enc = "utf-8"
          if (enc == "x-user-defined") enc = "windows-1252"
          return enc
        }
        i = skipTag(bytes, i + 5, limit)
        if (i < 0) return null
      } else if (bytes(i) == '<' && i + 1 < limit &&
          (isLetter(bytes(i + 1)) ||
            (bytes(i + 1) == '/' && i + 2 < limit && isLetter(bytes(i + 2))))) {
        i = skipTag(bytes, i + 1, limit)
        if (i < 0) return null
      } else if (bytes(i) == '<' && i + 1 < limit &&
          (bytes(i + 1) == '!' || bytes(i + 1) == '?' || bytes(i + 1) == '/')) {
        // bogus comment / PI: skip to '>'
        var j = i + 1
        while (j < limit && bytes(j) != '>') j += 1
        if (j >= limit) return null
        i = j + 1
      } else i += 1
    }
    null
  }

  private def isLetter(b: Byte): Boolean = {
    val c = lower(b)
    c >= 'a' && c <= 'z'
  }

  /** Skip a tag attribute-by-attribute (quoted values may contain '>').
    * Returns the index after '>', or -1 if the tag never closes.
    */
  private def skipTag(bytes: Array[Byte], start: Int, limit: Int): Int = {
    var i = start
    while (i < limit) {
      val c = bytes(i) & 0xff
      if (c == '>') return i + 1
      if (c == '"' || c == '\'') {
        i += 1
        while (i < limit && (bytes(i) & 0xff) != c) i += 1
        if (i >= limit) return -1
      }
      i += 1
    }
    -1
  }

  /** Walk a meta tag's attributes; returns the canonical encoding or
    * null. Implements the spec's precedence: a `charset` attribute wins;
    * otherwise `http-equiv=content-type` (got-pragma) + a charset inside
    * `content` applies.
    */
  private def prescanMeta(bytes: Array[Byte], start: Int,
      limit: Int): String = {
    var i = start
    var gotPragma = false
    var charsetEnc: String = null
    var contentEnc: String = null
    var done = false
    while (!done && i < limit) {
      // spec "get an attribute": skip whitespace and '/'
      while (i < limit &&
        (isSpace(bytes(i) & 0xff) || bytes(i) == '/')) i += 1
      if (i >= limit) return null
      if (bytes(i) == '>') done = true
      else {
        val nameSb = new java.lang.StringBuilder
        var c = lower(bytes(i))
        while (i < limit && c != '=' && !isSpace(c) && c != '>' && c != '/') {
          nameSb.append(c.toChar)
          i += 1
          if (i < limit) c = lower(bytes(i))
        }
        if (i >= limit) return null
        var value: String = null
        while (i < limit && isSpace(bytes(i) & 0xff)) i += 1
        if (i < limit && bytes(i) == '=') {
          i += 1
          while (i < limit && isSpace(bytes(i) & 0xff)) i += 1
          if (i >= limit) return null
          val q = bytes(i) & 0xff
          val sb = new java.lang.StringBuilder
          if (q == '"' || q == '\'') {
            i += 1
            while (i < limit && (bytes(i) & 0xff) != q) {
              sb.append(lower(bytes(i)).toChar)
              i += 1
            }
            if (i >= limit) return null
            i += 1
          } else {
            while (i < limit && !isSpace(bytes(i) & 0xff) &&
              bytes(i) != '>') {
              sb.append(lower(bytes(i)).toChar)
              i += 1
            }
          }
          value = sb.toString
        }
        val name = nameSb.toString
        if (name == "http-equiv" && value != null &&
          value == "content-type") gotPragma = true
        else if (name == "charset" && value != null && charsetEnc == null)
          charsetEnc = labelToEncoding(value)
        else if (name == "content" && value != null && contentEnc == null)
          contentEnc = charsetFromContent(value)
      }
    }
    if (charsetEnc != null) charsetEnc
    else if (gotPragma && contentEnc != null) contentEnc
    else null
  }

  /** Spec "extract a character encoding from a meta element": find
    * "charset", skip spaces, '=', then a quoted or `;`/space-delimited
    * value.
    */
  private def charsetFromContent(content: String): String = {
    val s = content // already lowercased by the attribute reader
    var from = 0
    while (true) {
      val at = s.indexOf("charset", from)
      if (at < 0) return null
      var i = at + 7
      while (i < s.length && isSpace(s.charAt(i))) i += 1
      if (i < s.length && s.charAt(i) == '=') {
        i += 1
        while (i < s.length && isSpace(s.charAt(i))) i += 1
        if (i >= s.length) return null
        val q = s.charAt(i)
        val end =
          if (q == '"' || q == '\'') {
            val e = s.indexOf(q, i + 1)
            if (e < 0) return null
            return labelToEncoding(s.substring(i + 1, e))
          } else {
            var e = i
            while (e < s.length && s.charAt(e) != ';' &&
              !isSpace(s.charAt(e))) e += 1
            e
          }
        return labelToEncoding(s.substring(i, end))
      }
      from = at + 7
    }
    null // unreachable
  }

  private def isSpace(c: Char): Boolean =
    c == 0x09 || c == 0x0a || c == 0x0c || c == 0x0d || c == ' '

  def whatwg_decode(body: Column, label: Column): Column =
    GraftColumnBridge.column(WhatwgDecode(
      GraftColumnBridge.expression(body), GraftColumnBridge.expression(label)))

  def whatwg_encoding(body: Column, label: Column): Column =
    GraftColumnBridge.column(WhatwgEncoding(
      GraftColumnBridge.expression(body), GraftColumnBridge.expression(label)))
}
