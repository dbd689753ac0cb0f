package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC record parsing (ISO 28500 — the Web ARChive format, the
  * container CommonCrawl and every serious crawl pipeline actually
  * ships): a blob of CONCATENATED WARC records parsed to per-record
  * metadata — completing the crawl source story beside [[GzipInflate]]
  * (a crawl segment is records-inside-gzip: `gzip_inflate` opens the
  * member, this opens the records).
  *
  * Grammar per the spec: each record is `WARC/<version>` CRLF, header
  * fields (`Name: value` CRLF, names CASE-INSENSITIVE), an empty line,
  * exactly Content-Length payload bytes, then CRLF CRLF before the next
  * record. Returns one struct per record:
  * (rec_type, target_uri, content_length, payload_md5) — WARC-Type and
  * WARC-Target-URI read case-insensitively (angle brackets around the
  * URI, the WARC/1.0 spelling, stripped), the payload digested to md5
  * hex so content round-trips are oracle-checkable without shipping
  * payload bytes out of the expression.
  *
  * STRICT probe: any malformation — missing version line, a header
  * line without a colon, missing/negative/non-numeric Content-Length,
  * payload running past the input, or a missing record terminator —
  * NULLs the WHOLE array (a truncated crawl segment is corrupt input,
  * not half-good data; the family's NULL-on-corrupt contract).
  *
  * Scale shape: map-only, codegen'd, one linear pass over the blob;
  * record count bounded by input size (every record consumes ≥ 4
  * bytes of framing) with an explicit 65536-record structural guard.
  */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WarcRecords.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WarcRecords requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WarcRecords.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcRecords.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : WarcRecords = copy(child = newChild)

  override def prettyName: String = "warc_records"
}

object WarcRecords {
  val RecordSchema: StructType = StructType(Seq(
    StructField("rec_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false)))

  val Schema: DataType = ArrayType(RecordSchema, containsNull = false)

  private val MaxRecords = 65536

  /** Static parse kernel shared by eval and generated code. Returns a
    * GenericArrayData of record structs, or null on any malformation.
    */
  def parse(bytes: Array[Byte]): GenericArrayData = {
    if (bytes == null) return null
    val n = bytes.length
    var p = 0
    val recs = scala.collection.mutable.ArrayBuffer.empty[InternalRow]

    // one CRLF-terminated header line as a String; -1 sentinel via null
    def line(from: Int): (String, Int) = {
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= n) return (null, -1)
      (new String(bytes, from, i - from,
        java.nio.charset.StandardCharsets.UTF_8), i + 2)
    }

    while (p < n) {
      if (recs.size >= MaxRecords) return null
      val (ver, p1) = line(p)
      if (ver == null || !ver.startsWith("WARC/")) return null
      p = p1
      var recType: String = null
      var targetUri: String = null
      var contentLength = -1L
      var headerDone = false
      while (!headerDone) {
        val (h, pn) = line(p)
        if (h == null) return null
        p = pn
        if (h.isEmpty) headerDone = true
        else {
          val colon = h.indexOf(':')
          if (colon <= 0) return null
          val name = h.substring(0, colon).trim.toLowerCase
          val value = h.substring(colon + 1).trim
          name match {
            case "warc-type" => recType = value
            case "warc-target-uri" =>
              targetUri =
                if (value.length >= 2 && value.charAt(0) == '<' &&
                  value.charAt(value.length - 1) == '>')
                  value.substring(1, value.length - 1)
                else value
            case "content-length" =>
              if (!value.nonEmpty || !value.forall(_.isDigit) ||
                value.length > 18) return null
              contentLength = value.toLong
            case _ => () // other fields pass through uninspected
          }
        }
      }
      if (contentLength < 0) return null // Content-Length is mandatory
      if (contentLength > n - p) return null // payload past input
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(bytes, p, contentLength.toInt)
      val digest = md.digest().map("%02x".format(_)).mkString
      p += contentLength.toInt
      // record terminator: CRLF CRLF
      if (p + 4 > n || bytes(p) != '\r' || bytes(p + 1) != '\n' ||
        bytes(p + 2) != '\r' || bytes(p + 3) != '\n') return null
      p += 4
      recs += new GenericInternalRow(Array[Any](
        if (recType == null) null else UTF8String.fromString(recType),
        if (targetUri == null) null else UTF8String.fromString(targetUri),
        contentLength,
        UTF8String.fromString(digest)))
    }
    new GenericArrayData(recs.toArray[Any])
  }

  def warc_records(c: Column): Column =
    GraftColumnBridge.column(WarcRecords(GraftColumnBridge.expression(c)))

  /** Payload twin of [[parse]]: the SAME strict grammar walk (any
    * malformation NULLs the whole array), but returning each record's
    * raw payload BYTES instead of its md5 — the hand-off the crawl
    * pipeline needs to feed `html_text` (r12 verdict #3: the family
    * decoded down to digests and stopped). Kept as a separate
    * expression so [[WarcRecords]]' bounded-width metadata schema (and
    * its pinned consumers) stay unchanged; the two share `parse`'s
    * validation by construction — this re-walks with the identical
    * rules, and WarcPayloadsSpec pins that both NULL on exactly the
    * same corrupt inputs.
    */
  def parsePayloads(bytes: Array[Byte]): GenericArrayData = {
    if (bytes == null) return null
    val meta = parse(bytes) // identical strictness gate
    if (meta == null) return null
    val n = bytes.length
    var p = 0
    val outs = scala.collection.mutable.ArrayBuffer.empty[Any]
    def line(from: Int): (String, Int) = {
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= n) return (null, -1)
      (new String(bytes, from, i - from,
        java.nio.charset.StandardCharsets.UTF_8), i + 2)
    }
    while (p < n) {
      val (_, p1) = line(p) // version line (validated by parse above)
      p = p1
      var contentLength = -1L
      var headerDone = false
      while (!headerDone) {
        val (h, pn) = line(p)
        p = pn
        if (h.isEmpty) headerDone = true
        else {
          val colon = h.indexOf(':')
          if (h.substring(0, colon).trim.toLowerCase == "content-length")
            contentLength = h.substring(colon + 1).trim.toLong
        }
      }
      outs += java.util.Arrays.copyOfRange(bytes, p,
        p + contentLength.toInt)
      p += contentLength.toInt + 4 // payload + CRLF CRLF terminator
    }
    new GenericArrayData(outs.toArray)
  }

  def warc_payloads(c: Column): Column =
    GraftColumnBridge.column(WarcPayloads(GraftColumnBridge.expression(c)))
}

/** `warc_payloads(bytes) → ARRAY<BINARY>` — see
  * [[WarcRecords.parsePayloads]]: the same strict WARC walk, returning
  * raw record payloads for downstream decode stages (html_text).
  */
case class WarcPayloads(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WarcPayloads requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WarcRecords.parsePayloads(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WarcRecords.parsePayloads($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : WarcPayloads = copy(child = newChild)

  override def prettyName: String = "warc_payloads"
}
