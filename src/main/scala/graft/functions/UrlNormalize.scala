package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 URL parsing + normalization for web-crawl curation — the
  * string sibling of the [[ImageDims]]/[[AudioMeta]]/[[VideoMeta]] header
  * parsers (same discipline: pure character arithmetic against a PUBLIC
  * spec, codegen'd, map-only, whole-struct NULL on anything malformed).
  *
  * Crawl-scale dedup keys on the URL, and raw crawl URLs spell the same
  * resource many ways. This applies the spec's own equivalence rules —
  * syntax-based normalization (RFC 3986 §6.2.2) plus the http/https
  * scheme-based rules (§6.2.3):
  *
  *   - scheme and host lowercased (§6.2.2.1; both are defined
  *     case-insensitive);
  *   - percent-encoding normalized in userinfo/path/query: hex digits
  *     uppercased, escapes of UNRESERVED characters (ALPHA / DIGIT /
  *     "-" / "." / "_" / "~", §2.3) decoded to the literal character
  *     (§6.2.2.2); an invalid escape (truncated or non-hex) is not a URI
  *     at all → NULL;
  *   - dot-segments removed from the path by the §5.2.4 algorithm
  *     (empty segments are preserved — "//x" is a real, distinct path);
  *   - empty path → "/" and the scheme's default port (http 80,
  *     https 443) dropped, as is an empty-port ":" (§6.2.3);
  *   - the fragment is stripped: it never reaches the server (§3.5), so
  *     two URLs differing only in fragment fetch the same document —
  *     the crawl-identity convention.
  *
  * Scope is deliberately the crawl case: only http/https (anything else
  * → NULL), host must be a bracketed IP-literal or an ASCII reg-name of
  * unreserved characters (percent-escaped or internationalized raw-
  * unicode hosts → NULL — a curation FILTER rejects what it cannot
  * canonicalize rather than guessing). Userinfo is preserved verbatim
  * apart from escape normalization (it is case-sensitive, §3.2.1).
  *
  * Returns struct<scheme, host, port, path, query, url>: `port` is the
  * EFFECTIVE port (explicit or scheme default — the group-by-endpoint
  * key), `query` is NULL when no "?" was present (distinct from an empty
  * query, which the spec keeps), and `url` is the recomposed (§5.3)
  * normalized form. Map-only and codegen'd: at 100 TB this fuses into
  * the scan and the dedup that follows shuffles only the canonical key.
  */
case class UrlNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = UrlNormalize.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"UrlNormalize requires STRING input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    UrlNormalize.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlNormalize.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): UrlNormalize =
    copy(child = newChild)

  override def prettyName: String = "url_normalize"
}

object UrlNormalize {
  val Schema: StructType = StructType(Seq(
    StructField("scheme", StringType, nullable = true),
    StructField("host", StringType, nullable = true),
    StructField("port", IntegerType, nullable = true),
    StructField("path", StringType, nullable = true),
    StructField("query", StringType, nullable = true),
    StructField("url", StringType, nullable = true)))

  /** Static parse kernel shared by eval and generated code. Returns null
    * for anything that is not a well-formed absolute http/https URL.
    */
  def parse(u: UTF8String): InternalRow = {
    if (u == null) return null
    val s = u.toString
    val ss = s.indexOf("://")
    if (ss <= 0) return null
    // scheme = ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )  (§3.1)
    var k = 0
    while (k < ss) {
      val c = s.charAt(k)
      val ok =
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (k > 0 && ((c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'))
      if (!ok) return null
      k += 1
    }
    val scheme = s.substring(0, ss).toLowerCase(java.util.Locale.ROOT)
    val defPort = scheme match {
      case "http"  => 80
      case "https" => 443
      case _       => return null
    }
    // authority runs to the first '/', '?' or '#'  (§3.2)
    var j = ss + 3
    while (j < s.length && s.charAt(j) != '/' && s.charAt(j) != '?' &&
        s.charAt(j) != '#') j += 1
    val authority = s.substring(ss + 3, j)
    if (authority.isEmpty) return null
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at) else null
    val hostport = authority.substring(at + 1)
    var host: String = null
    var portStr: String = null
    if (hostport.startsWith("[")) { // IP-literal (§3.2.2)
      val rb = hostport.indexOf(']')
      if (rb < 0) return null
      host = hostport.substring(0, rb + 1)
      val rest = hostport.substring(rb + 1)
      if (rest.nonEmpty) {
        if (rest.charAt(0) != ':') return null
        portStr = rest.substring(1)
      }
    } else {
      val c = hostport.lastIndexOf(':')
      if (c >= 0) {
        host = hostport.substring(0, c)
        portStr = hostport.substring(c + 1)
      } else host = hostport
    }
    if (host.isEmpty) return null
    host = host.toLowerCase(java.util.Locale.ROOT)
    // reg-name restricted to unreserved ASCII; IP-literals to hex/:/.
    k = 0
    while (k < host.length) {
      val c = host.charAt(k)
      val ok =
        if (host.charAt(0) == '[')
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
            c == ':' || c == '.' || c == '[' || c == ']'
        else
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
            c == '-' || c == '.' || c == '_' || c == '~'
      if (!ok) return null
      k += 1
    }
    var port = defPort
    if (portStr != null && portStr.nonEmpty) { // empty ":" just drops (§6.2.3)
      var p = 0
      k = 0
      while (k < portStr.length) {
        val c = portStr.charAt(k)
        if (c < '0' || c > '9') return null
        p = p * 10 + (c - '0')
        if (p > 65535) return null
        k += 1
      }
      port = p
    }
    // path to '?'/'#', query to '#', fragment dropped (§3.5)
    var path = ""
    if (j < s.length && s.charAt(j) == '/') {
      var q = j
      while (q < s.length && s.charAt(q) != '?' && s.charAt(q) != '#') q += 1
      path = s.substring(j, q)
      j = q
    }
    var query: String = null
    if (j < s.length && s.charAt(j) == '?') {
      var f = j + 1
      while (f < s.length && s.charAt(f) != '#') f += 1
      query = s.substring(j + 1, f)
    }
    val pathN0 = percentNormalize(path)
    if (pathN0 == null) return null
    var pathN = removeDotSegments(pathN0)
    if (pathN.isEmpty) pathN = "/" // empty path ≡ "/" for http (§6.2.3)
    var queryN: String = null
    if (query != null) {
      queryN = percentNormalize(query)
      if (queryN == null) return null
    }
    var userinfoN: String = null
    if (userinfo != null) {
      userinfoN = percentNormalize(userinfo)
      if (userinfoN == null) return null
    }
    val sb = new java.lang.StringBuilder(scheme).append("://")
    if (userinfoN != null) sb.append(userinfoN).append('@')
    sb.append(host)
    if (port != defPort) sb.append(':').append(port)
    sb.append(pathN)
    if (queryN != null) sb.append('?').append(queryN)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(scheme), UTF8String.fromString(host), port,
      UTF8String.fromString(pathN),
      if (queryN == null) null else UTF8String.fromString(queryN),
      UTF8String.fromString(sb.toString)))
  }

  /** §6.2.2.2: uppercase escape hex, decode escapes of unreserved
    * characters. Null on a truncated or non-hex escape (not a URI).
    */
  private def percentNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length) return null
        val h = hex(s.charAt(i + 1)); val l = hex(s.charAt(i + 2))
        if (h < 0 || l < 0) return null
        val v = (h << 4) | l
        val unreserved =
          (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
            (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' ||
            v == '~'
        if (unreserved) sb.append(v.toChar)
        else sb.append('%').append(upHex(s.charAt(i + 1)))
          .append(upHex(s.charAt(i + 2)))
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def upHex(c: Char): Char =
    if (c >= 'a' && c <= 'f') (c - 32).toChar else c

  /** The remove_dot_segments algorithm, transcribed from §5.2.4. Empty
    * segments are preserved and ".." never climbs above the root. The
    * input buffer strictly shrinks every step, so it terminates.
    */
  private def removeDotSegments(path: String): String = {
    var input = path
    val output = new java.lang.StringBuilder(path.length)
    while (input.nonEmpty) {
      if (input.startsWith("../")) input = input.substring(3)
      else if (input.startsWith("./")) input = input.substring(2)
      else if (input.startsWith("/./")) input = input.substring(2)
      else if (input == "/.") input = "/"
      else if (input.startsWith("/../")) {
        input = input.substring(3)
        val idx = output.lastIndexOf("/")
        output.setLength(if (idx < 0) 0 else idx)
      } else if (input == "/..") {
        input = "/"
        val idx = output.lastIndexOf("/")
        output.setLength(if (idx < 0) 0 else idx)
      } else if (input == "." || input == "..") input = ""
      else {
        val start = if (input.charAt(0) == '/') 1 else 0
        val slash = input.indexOf('/', start)
        val end = if (slash < 0) input.length else slash
        output.append(input, 0, end)
        input = input.substring(end)
      }
    }
    output.toString
  }

  /** Column entry point: url_normalize(string) → struct<scheme:string,
    * host:string, port:int, path:string, query:string, url:string>
    * (NULL if not a well-formed absolute http/https URL).
    */
  def url_normalize(c: Column): Column =
    GraftColumnBridge.column(UrlNormalize(GraftColumnBridge.expression(c)))
}
