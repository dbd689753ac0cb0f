package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TAR archive parsing (POSIX.1-1988 ustar — the OTHER container
  * training corpora ship, usually as `.tar.gz`: `tar_entries(
  * gzip_inflate(blob))` opens a tarball entirely inside the scan,
  * map-only, beside the WARC path for crawl segments).
  *
  * Format per the public spec: a sequence of 512-byte headers, each
  * followed by its entry's payload zero-padded to a 512 boundary; the
  * archive ends with two all-zero blocks (anything after must be more
  * zero padding — tar blocking). Header fields are fixed-offset:
  * NUL-terminated name (0,100), octal size (124,12), checksum
  * (148,8), typeflag (156), magic (257,6) + version (263,2), and the
  * POSIX prefix (345,155) which, when non-empty under the `ustar\0`
  * magic, prepends `prefix + "/"` to the name (the GNU `ustar  \0`
  * spelling is accepted but has no prefix field). The header CHECKSUM
  * IS VERIFIED: the unsigned byte sum of the header with the checksum
  * field read as 8 spaces must equal the stored octal value — the
  * integrity discipline of [[GzipInflate]]/[[PngPixels]].
  *
  * Returns one struct per entry: (name, typeflag, size, payload_md5) —
  * the payload digested to md5 hex so content round-trips are
  * oracle-checkable without shipping payload bytes out of the
  * expression (the [[WarcRecords]] discipline). The old-style NUL
  * typeflag normalizes to "0" (regular file) per the spec's
  * compatibility note.
  *
  * STRICT probe: any malformation — a header that is neither valid nor
  * all-zero, a checksum mismatch, a non-octal/oversized size field, a
  * payload or its zero padding running past the input, non-zero
  * padding bytes, a missing end-of-archive marker, or trailing
  * non-zero bytes — NULLs the WHOLE array. An empty archive (only
  * zero blocks) is an empty array, not NULL.
  *
  * Scale shape: map-only, codegen'd, one linear pass; entry count is
  * input-bounded (each costs ≥ 512 header bytes) with an explicit
  * 65536-entry structural guard; payloads are digested in place —
  * nothing is copied, so a lying size cannot buy work past the blob.
  */
case class TarEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TarEntries.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"TarEntries requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TarEntries.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TarEntries.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : TarEntries = copy(child = newChild)

  override def prettyName: String = "tar_entries"
}

object TarEntries {
  val EntrySchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("typeflag", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("payload_md5", StringType, nullable = false)))

  val Schema: DataType = ArrayType(EntrySchema, containsNull = false)

  private val MaxEntries = 65536

  /** Static parse kernel shared by eval and generated code. Returns a
    * GenericArrayData of entry structs, or null on any malformation.
    */
  def parse(bytes: Array[Byte]): GenericArrayData = {
    if (bytes == null) return null
    val n = bytes.length
    var p = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]

    def zeroBlock(at: Int): Boolean = {
      var i = at
      val end = at + 512
      while (i < end) { if (bytes(i) != 0) return false; i += 1 }
      true
    }

    // NUL-terminated (or field-filling) ASCII string at a fixed field
    def str(at: Int, width: Int): String = {
      var len = 0
      while (len < width && bytes(at + len) != 0) len += 1
      new String(bytes, at, len, java.nio.charset.StandardCharsets.UTF_8)
    }

    // octal numeric field: leading spaces tolerated, digits 0-7,
    // terminated by NUL or space; -1 on anything else (incl. the GNU
    // base-256 extension's 0x80 marker — out of scope, strict)
    def octal(at: Int, width: Int): Long = {
      var i = at
      val end = at + width
      while (i < end && bytes(i) == ' ') i += 1
      var v = 0L
      var digits = 0
      while (i < end && bytes(i) >= '0' && bytes(i) <= '7') {
        v = (v << 3) | (bytes(i) - '0')
        digits += 1
        if (digits > 15) return -1 // 45 bits is beyond any sane field
        i += 1
      }
      if (digits == 0) return -1
      while (i < end && (bytes(i) == 0 || bytes(i) == ' ')) i += 1
      if (i != end) return -1
      v
    }

    var ended = false
    while (!ended) {
      if (p + 512 > n) return null // truncated: no end-of-archive marker
      if (zeroBlock(p)) {
        // end marker: a second zero block, then only zero padding
        if (p + 1024 > n || !zeroBlock(p + 512)) return null
        var i = p + 1024
        while (i < n) { if (bytes(i) != 0) return null; i += 1 }
        ended = true
      } else {
        if (out.size >= MaxEntries) return null
        // magic: "ustar\0" (POSIX, has prefix) or "ustar " (GNU old)
        if (bytes(p + 257) != 'u' || bytes(p + 258) != 's' ||
          bytes(p + 259) != 't' || bytes(p + 260) != 'a' ||
          bytes(p + 261) != 'r') return null
        val posix = bytes(p + 262) == 0
        if (!posix && bytes(p + 262) != ' ') return null
        // checksum: unsigned byte sum with the field as 8 spaces
        var sum = 0L
        var i = p
        while (i < p + 512) {
          sum += (if (i - p >= 148 && i - p < 156) ' '
                  else bytes(i) & 0xff)
          i += 1
        }
        if (octal(p + 148, 8) != sum) return null
        val size = octal(p + 124, 12)
        if (size < 0) return null
        val name0 = str(p, 100)
        if (name0.isEmpty) return null
        val prefix = if (posix) str(p + 345, 155) else ""
        val name = if (prefix.isEmpty) name0 else prefix + "/" + name0
        val tfByte = bytes(p + 156)
        val typeflag = if (tfByte == 0) "0" else String.valueOf(tfByte.toChar)
        // payload + zero padding to the 512 boundary
        if (size > n - p - 512) return null
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(bytes, p + 512, size.toInt)
        val digest = md.digest().map("%02x".format(_)).mkString
        val padded = ((size + 511) >> 9) << 9
        if (padded > n - p - 512) return null
        var q = p + 512 + size.toInt
        val padEnd = p + 512 + padded.toInt
        while (q < padEnd) { if (bytes(q) != 0) return null; q += 1 }
        out += new GenericInternalRow(Array[Any](
          UTF8String.fromString(name), UTF8String.fromString(typeflag),
          size, UTF8String.fromString(digest)))
        p += 512 + padded.toInt
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  def tar_entries(c: Column): Column =
    GraftColumnBridge.column(TarEntries(GraftColumnBridge.expression(c)))
}
