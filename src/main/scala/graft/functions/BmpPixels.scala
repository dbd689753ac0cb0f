package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._

/** REAL pixel decode over opaque binary media columns — the rung past
  * the header parsers ([[ImageDims]]/[[AudioMeta]]/[[VideoMeta]] read
  * metadata without touching payloads; this one decodes the payload):
  * per-channel pixel sums over an uncompressed 24-bit BMP, by pure byte
  * arithmetic against the public Windows BITMAPFILEHEADER /
  * BITMAPINFOHEADER layout. BMP is the one mainstream image container
  * whose pixels need no codec — rows of little-endian BGR triples,
  * each row padded to a 4-byte boundary, stored bottom-up (top-down
  * when height is negative) — so honest feature extraction is byte
  * arithmetic, which is exactly why it was the format where the
  * "declared fake codec decode" line was pushed back FIRST; the
  * codec-bound formats followed ([[PngPixels]] via the full DEFLATE
  * decoder, [[GifPixels]] via LZW, [[JpegPixels]] via the baseline
  * T.81 machine), so nothing on the image line is stubbed anymore.
  *
  * Returns struct<width, height, n_px, sum_r, sum_g, sum_b>: channel
  * SUMS as exact BIGINTs (means are a downstream division; sums are
  * fold-order-free and cross-engine exact). Row orientation cannot
  * affect sums, so bottom-up vs top-down needs no branch — height is
  * read as |height|. A stride slip cannot hide: padding bytes read as
  * pixels shift every following triple and the sums diverge.
  *
  * NULL (whole struct) for anything unrecognized: wrong magic, header
  * size < 40, planes ≠ 1, bits-per-pixel ≠ 24, compression ≠ BI_RGB,
  * zero/overflow dimensions, a pixel offset inside the header, or a
  * pixel array extending past the input.
  *
  * Scale shape: map-only and codegen'd like the rest of the family;
  * work is O(pixels present) per row — the decode-what-you-store
  * shape, with the dims·stride bound checked BEFORE any loop so a
  * lying header cannot buy unbounded work.
  */
case class BmpPixels(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BmpPixels.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"BmpPixels requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BmpPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpPixels.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpPixels =
    copy(child = newChild)

  override def prettyName: String = "bmp_pixels"
}

object BmpPixels {
  val Schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_px", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  /** Static parse kernel shared by eval and generated code. Returns null
    * for anything that is not an uncompressed 24-bit BMP whose declared
    * pixel array is fully present.
    */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    if (n < 54 || bytes(0) != 'B' || bytes(1) != 'M') return null
    val pixOff = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    if (hdrSize < 40) return null // BITMAPINFOHEADER or later
    val width = le32s(bytes, 18)
    val heightRaw = le32s(bytes, 22)
    val planes = le16(bytes, 26)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    // top-down BMPs carry negative height; sums are orientation-free
    val height = math.abs(heightRaw)
    if (width < 1 || height < 1 || width > 0x7fffffffL ||
        height > 0x7fffffffL || planes != 1 || bpp != 24 ||
        compression != 0) return null
    val stride = ((width * 3 + 3) / 4) * 4 // rows pad to 4 bytes
    // a lying header cannot buy unbounded work or a Long overflow: both
    // factors must already fit in the input before the product is formed
    if (stride > n || height > n) return null
    if (pixOff < 54 || pixOff + stride * height > n) return null
    var sumR = 0L
    var sumG = 0L
    var sumB = 0L
    var row = 0
    while (row < height) {
      var p = (pixOff + row * stride).toInt
      var x = 0L
      while (x < width) { // BGR triples
        sumB += bytes(p) & 0xff
        sumG += bytes(p + 1) & 0xff
        sumR += bytes(p + 2) & 0xff
        p += 3
        x += 1
      }
      row += 1
    }
    new GenericInternalRow(Array[Any](width.toInt, height.toInt,
      width * height, sumR, sumG, sumB))
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Signed little-endian s32 (BMP dims are signed). */
  private def le32s(b: Array[Byte], i: Int): Long = le32(b, i).toInt.toLong

  /** Column entry point: bmp_pixels(binary) → struct<width:int,
    * height:int, n_px:bigint, sum_r:bigint, sum_g:bigint, sum_b:bigint>
    * (NULL if not an uncompressed 24-bit BMP).
    */
  def bmp_pixels(c: Column): Column =
    GraftColumnBridge.column(BmpPixels(GraftColumnBridge.expression(c)))
}
