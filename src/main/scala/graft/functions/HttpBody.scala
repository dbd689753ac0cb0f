package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTTP/1.x response parsing (`http_body(bytes) → struct(status,
  * content_encoding, body)`) — the layer between a WARC response
  * record's payload and the content decoders: real crawl records store
  * the COMPLETE HTTP response (status line + headers + body), and the
  * body frequently rides `Transfer-Encoding: chunked` and/or
  * `Content-Encoding: gzip|br`. Until r14 the crawl lanes treated the
  * WARC payload as the bare document; this closes the gap the way
  * CommonCrawl consumers actually process records (RFC 9112 message
  * framing):
  *
  *  - status line `HTTP/1.x NNN [reason]` → status code;
  *  - CRLF header block, names case-insensitive, values trimmed
  *    (`content-encoding` is surfaced lowercased for the decoder
  *    dispatch; `Transfer-Encoding: chunked` and `Content-Length`
  *    drive framing);
  *  - chunked decoding: ASCII-hex size lines (chunk extensions after
  *    `;` ignored per spec), CRLF-terminated data chunks, the `0`
  *    terminator, trailer section ending at the empty line;
  *  - Content-Length framing: exactly N bytes;
  *  - neither: the body is the remainder (the connection-close form —
  *    what a captured WARC payload holds).
  *
  * Family contract: malformed status line / header block / chunk
  * framing, a size line that is not pure hex, chunk data running past
  * the input, a Content-Length longer than the input, or TRAILING
  * GARBAGE after a framed body NULLs the whole result; the dechunked
  * body is capped at [[HttpBody.MaxBodyBytes]] (the family 64 MB bomb
  * cap). Map-only, codegen'd; composes as
  * `brotli_inflate(http_body(warc_payloads(...)[0]).body)`.
  */
case class HttpBody(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HttpBody.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"HttpBody requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    HttpBody.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HttpBody.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : HttpBody = copy(child = newChild)

  override def prettyName: String = "http_body"
}

object HttpBody {

  val Schema: StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("content_encoding", StringType, nullable = true),
    StructField("body", BinaryType, nullable = false),
    // the Content-Type value with ONLY its case-insensitive tokens
    // lowercased (RFC 9110: media type, parameter names, and the
    // charset value); other parameter VALUES — e.g. a multipart
    // boundary — are case-sensitive and keep their original case.
    // Null when the header is absent.
    StructField("content_type", StringType, nullable = true)))

  /** Family-wide decompression/dechunk bomb cap. */
  val MaxBodyBytes: Int = 64 * 1024 * 1024

  /** Static parse kernel shared by eval and generated code; null on any
    * malformation.
    */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    var p = 0

    def line(from: Int): (String, Int) = {
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= n) return (null, -1)
      (new String(bytes, from, i - from,
        java.nio.charset.StandardCharsets.ISO_8859_1), i + 2)
    }

    val (status0, p1) = line(p)
    if (status0 == null) return null
    p = p1
    // "HTTP/1.x NNN[ reason]"
    val sl = status0.split(" ", 3)
    if (sl.length < 2 || !sl(0).startsWith("HTTP/1.")) return null
    val status =
      try Integer.parseInt(sl(1))
      catch { case _: NumberFormatException => return null }
    if (status < 100 || status > 599) return null

    var contentEncoding: String = null
    var contentType: String = null
    var contentLength = -1L
    var chunked = false
    var headerDone = false
    var guard = 0
    while (!headerDone) {
      guard += 1
      if (guard > 4096) return null
      val (h, pn) = line(p)
      if (h == null) return null
      p = pn
      if (h.isEmpty) headerDone = true
      else {
        val c = h.indexOf(':')
        if (c <= 0) return null
        val name = h.substring(0, c).trim.toLowerCase
        val value = h.substring(c + 1).trim
        name match {
          case "content-encoding" => contentEncoding = value.toLowerCase
          case "content-type" => contentType = canonContentType(value)
          case "content-length" =>
            contentLength =
              try java.lang.Long.parseLong(value)
              catch { case _: NumberFormatException => return null }
            if (contentLength < 0) return null
          case "transfer-encoding" =>
            if (value.toLowerCase.split(",").map(_.trim).contains("chunked"))
              chunked = true
          case _ => ()
        }
      }
    }

    val body: Array[Byte] =
      if (chunked) {
        // RFC 9112 §7.1: hex size line (extensions after ';' ignored),
        // data + CRLF per chunk, 0-size terminator, trailer section
        val out = new java.io.ByteArrayOutputStream()
        var done = false
        while (!done) {
          val (szLine, pn) = line(p)
          if (szLine == null) return null
          p = pn
          val szHex = {
            val semi = szLine.indexOf(';')
            (if (semi >= 0) szLine.substring(0, semi) else szLine).trim
          }
          if (szHex.isEmpty ||
            !szHex.forall(ch => Character.digit(ch, 16) >= 0)) return null
          if (szHex.length > 7) return null // > 0xFFFFFFF: over any cap
          val sz = Integer.parseInt(szHex, 16)
          if (sz == 0) {
            // trailer section: header lines until the empty line
            var trailerDone = false
            var tGuard = 0
            while (!trailerDone) {
              tGuard += 1
              if (tGuard > 4096) return null
              val (t, tn) = line(p)
              if (t == null) return null
              p = tn
              if (t.isEmpty) trailerDone = true
            }
            done = true
          } else {
            if (out.size().toLong + sz > MaxBodyBytes) return null
            // long arithmetic: p near n with sz up to 0xFFFFFFF would
            // overflow int and skip the bound check
            if (p.toLong + sz + 2 > n) return null
            out.write(bytes, p, sz)
            p += sz
            if (!(bytes(p) == '\r' && bytes(p + 1) == '\n')) return null
            p += 2
          }
        }
        if (p != n) return null // trailing garbage after the terminator
        out.toByteArray
      } else if (contentLength >= 0) {
        if (contentLength > MaxBodyBytes) return null
        if (p + contentLength != n) return null // short OR trailing bytes
        java.util.Arrays.copyOfRange(bytes, p, n)
      } else {
        java.util.Arrays.copyOfRange(bytes, p, n) // connection-close form
      }

    new GenericInternalRow(Array[Any](
      status,
      if (contentEncoding == null) null
      else UTF8String.fromString(contentEncoding),
      body,
      if (contentType == null) null
      else UTF8String.fromString(contentType)))
  }

  /** RFC 9110-aware Content-Type canonicalization: the media type,
    * parameter names and the `charset` value are case-insensitive and
    * lowercase here; any OTHER parameter value (a multipart boundary,
    * most importantly) is case-sensitive and preserved byte-for-byte —
    * including `;` inside quoted strings, which must not split params
    * (r16, from the r15 advisor).
    */
  private def canonContentType(v: String): String = {
    val out = new java.lang.StringBuilder(v.length)
    val name = new java.lang.StringBuilder
    var i = 0
    var lowering = true // media type first
    var afterEq = false
    var inQ = false
    while (i < v.length) {
      val c = v.charAt(i)
      if (inQ) {
        out.append(if (lowering) Character.toLowerCase(c) else c)
        if (c == '"') inQ = false
      } else if (c == ';') {
        out.append(';'); name.setLength(0); afterEq = false; lowering = true
      } else if (c == '=' && !afterEq) {
        out.append('=')
        afterEq = true
        lowering = name.toString.trim.equalsIgnoreCase("charset")
      } else if (c == '"') {
        inQ = true
        out.append('"')
      } else {
        if (!afterEq) name.append(c)
        out.append(if (lowering) Character.toLowerCase(c) else c)
      }
      i += 1
    }
    out.toString
  }

  def http_body(c: Column): Column =
    GraftColumnBridge.column(HttpBody(GraftColumnBridge.expression(c)))
}
