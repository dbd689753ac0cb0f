package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction (tag/script/style strip + entity decode +
  * whitespace canon) — the missing stage between the crawl family's
  * WARC payloads and the gopher/langid quality filters: a real crawl
  * corpus hits this on 100 % of documents before any text metric makes
  * sense (r12 verdict "what's missing" #1). One linear scan, codegen'd,
  * map-only — fuses into the decode chain
  * `html_text(warc payload ← gzip_inflate(blob))`.
  *
  * Extraction contract (LENIENT, browser-shaped — broken markup
  * DEGRADES deterministically, it never fails; only NULL input is
  * NULL):
  *  - `<script …>…</script>` and `<style …>…</style>` drop with their
  *    CONTENT (case-insensitive; the close tag must be `</script`
  *    followed by `>` or whitespace or `/`); unterminated → drops to
  *    end of input.
  *  - `<!-- … -->` comments drop; unterminated → drops to end.
  *  - `<![CDATA[ … ]]>` keeps its content RAW (character data: no
  *    entity decode inside); unterminated → rest is raw content.
  *  - any other `<` followed by a letter, `/`, `!` or `?` is a tag:
  *    skipped to the matching `>` — QUOTED attribute values may contain
  *    `>` (`title="a>b"`), so quotes are honored while scanning — and
  *    replaced by ONE space (so `a</p><p>b` never glues words);
  *    unterminated tag → drops to end. A bare `<` before anything else
  *    is literal text (what browsers render).
  *  - entities: the core named set (`&amp; &lt; &gt; &quot; &apos;`,
  *    plus `&nbsp;` → a PLAIN space so the canon collapses it) and
  *    numeric `&#NNN;` / `&#xHH;` for any valid non-surrogate code
  *    point ≤ U+10FFFF. Anything else (unknown name, malformed or
  *    out-of-range number, missing `;`) is left VERBATIM — decoding
  *    must never invent characters.
  *  - whitespace canon: runs of [ \t\n\r\f] collapse to one
  *    space, then trim — the repo-wide `[\s\x0b]+` token alphabet, so
  *    extracted text feeds the quality filters with identical
  *    segmentation on both engines.
  *
  * Accepts STRING or BINARY input (a WARC payload arrives as bytes;
  * decoded as UTF-8). Output is never longer than the input (tags and
  * entities only shrink) — no expansion guard needed.
  */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType || child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"HtmlText requires STRING or BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      HtmlText.extract(input.asInstanceOf[UTF8String].toString)
    case BinaryType =>
      HtmlText.extract(new String(input.asInstanceOf[Array[Byte]],
        java.nio.charset.StandardCharsets.UTF_8))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType => nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.HtmlText.extract($c.toString());
      """)
      case _ => nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.HtmlText.extract(
          new java.lang.String($c, java.nio.charset.StandardCharsets.UTF_8));
      """)
    }

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlText = copy(child = newChild)

  override def prettyName: String = "html_text"
}

object HtmlText {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == 0x0B.toChar

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Case-insensitive region match of lowercase `pat` at s(i). */
  private def matchesCi(s: String, i: Int, pat: String): Boolean =
    i + pat.length <= s.length &&
      s.regionMatches(true, i, pat, 0, pat.length)

  /** Index just past the closing `>` of `</name …>` at or after `from`;
    * -1 if no proper close tag exists. The close tag's name must be
    * followed by `>`, whitespace or `/` (so `</scripty>` does not end a
    * script block).
    */
  private def findClose(s: String, from: Int, name: String): Int = {
    val pat = "</" + name
    var i = from
    val limit = s.length - pat.length
    while (i <= limit) {
      if (s.regionMatches(true, i, pat, 0, pat.length)) {
        val after = i + pat.length
        if (after >= s.length) return -1
        val c = s.charAt(after)
        if (c == '>' || c == '/' || isWs(c)) {
          val gt = s.indexOf('>', after)
          return if (gt < 0) -1 else gt + 1
        }
      }
      i += 1
    }
    -1
  }

  /** Index just past the `>` closing the tag whose `<` is at `lt`,
    * honoring single/double-quoted attribute values; -1 if unterminated.
    */
  private def tagEnd(s: String, lt: Int): Int = {
    var i = lt + 1
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    -1
  }

  /** The core named-entity set; `&nbsp;` maps to a PLAIN space so the
    * whitespace canon collapses it (documented in the class contract).
    */
  private val Named = Seq("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** Decode the entity starting at the `&` at s(i); returns
    * (decoded-or-null, index-just-past) — null decoded means "not an
    * entity, keep the & verbatim".
    */
  private def entity(s: String, i: Int): (String, Int) = {
    val n = s.length
    if (i + 1 >= n) return (null, i + 1)
    if (s.charAt(i + 1) == '#') {
      var j = i + 2
      var hex = false
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        hex = true; j += 1
      }
      val digits = new StringBuilder
      val maxDigits = if (hex) 6 else 7
      while (j < n && digits.length <= maxDigits && {
        val c = s.charAt(j)
        if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F')
        else c >= '0' && c <= '9'
      }) { digits.append(s.charAt(j)); j += 1 }
      if (digits.isEmpty || digits.length > maxDigits || j >= n ||
        s.charAt(j) != ';') return (null, i + 1)
      val cp = java.lang.Integer.parseInt(digits.toString,
        if (hex) 16 else 10)
      if (cp <= 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF))
        return (null, i + 1)
      (new String(Character.toChars(cp)), j + 1)
    } else {
      Named.collectFirst {
        case (nm, v) if matchesCi(s, i + 1, nm) &&
          i + 1 + nm.length < n && s.charAt(i + 1 + nm.length) == ';' =>
          (v, i + nm.length + 2)
      }.getOrElse((null, i + 1))
    }
  }

  def extract(html: String): UTF8String = {
    if (html == null) return null
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (matchesCi(html, i, "<!--")) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          out.append(' ')
        } else if (matchesCi(html, i, "<![CDATA[")) {
          val end = html.indexOf("]]>", i + 9)
          if (end < 0) { out.append(html, i + 9, n); i = n }
          else { out.append(html, i + 9, end); i = end + 3 }
        } else if (matchesCi(html, i, "<script") &&
          (i + 7 >= n || !isAsciiLetter(html.charAt(i + 7)))) {
          val end = findClose(html, i + 7, "script")
          i = if (end < 0) n else end
          out.append(' ')
        } else if (matchesCi(html, i, "<style") &&
          (i + 6 >= n || !isAsciiLetter(html.charAt(i + 6)))) {
          val end = findClose(html, i + 6, "style")
          i = if (end < 0) n else end
          out.append(' ')
        } else if (i + 1 < n && {
          val c1 = html.charAt(i + 1)
          isAsciiLetter(c1) || c1 == '/' || c1 == '!' || c1 == '?'
        }) {
          val end = tagEnd(html, i)
          i = if (end < 0) n else end
          out.append(' ')
        } else { out.append(c); i += 1 }
      } else if (c == '&') {
        val (dec, next) = entity(html, i)
        if (dec == null) { out.append(c); i += 1 }
        else { out.append(dec); i = next }
      } else { out.append(c); i += 1 }
    }
    // whitespace canon: [\s\x0b]+ -> one space, trim
    val canon = new java.lang.StringBuilder(out.length)
    var j = 0
    var pendingSpace = false
    while (j < out.length) {
      val c = out.charAt(j)
      if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && canon.length > 0) canon.append(' ')
        pendingSpace = false
        canon.append(c)
      }
      j += 1
    }
    UTF8String.fromString(canon.toString)
  }

  def html_text(c: Column): Column =
    GraftColumnBridge.column(HtmlText(GraftColumnBridge.expression(c)))
}
