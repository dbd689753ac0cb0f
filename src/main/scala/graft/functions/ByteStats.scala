package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass byte statistics of a binary payload: length, mean byte value,
  * and a 16-bucket histogram — the deterministic stand-in feature kernel
  * for the multimodal pipeline (the container has no codecs; a real decode
  * kernel would swap in at the same call site).
  *
  * A native Catalyst expression with `doGenCode`, so the fake path
  * benchmarks honestly: it stays inside whole-stage codegen / Tungsten
  * instead of dropping to the RDD API (no Row boxing, no closure dispatch,
  * fuses into the scan stage).
  */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ByteStats.Schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ByteStats requires BINARY input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b >>> 4) += 1L
      sum += b
      i += 1
    }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    InternalRow(bytes.length, mean, new GenericArrayData(hist))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val hist = ctx.freshName("hist")
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val mean = ctx.freshName("mean")
      s"""
        byte[] $b = $c;
        long[] $hist = new long[16];
        long $sum = 0L;
        for (int $i = 0; $i < $b.length; $i++) {
          int $v = $b[$i] & 0xff;
          $hist[$v >>> 4] += 1L;
          $sum += $v;
        }
        double $mean = $b.length == 0 ? 0.0 : (double) $sum / $b.length;
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[] { $b.length, $mean,
            new org.apache.spark.sql.catalyst.util.GenericArrayData($hist) });
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)

  override def prettyName: String = "byte_stats"
}

object ByteStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("histogram", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** Column entry point: byte_stats(binary) →
    * struct<n_bytes:int, mean_byte:double, histogram:array<long>>.
    */
  def byte_stats(c: Column): Column =
    GraftColumnBridge.column(ByteStats(GraftColumnBridge.expression(c)))
}
