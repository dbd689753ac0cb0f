package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature as a native codegen'd expression: one pass over the
  * hashed-shingle array computing all `numHashes` permutation minima in a
  * tight primitive loop.
  *
  * The composed-expression form (64 × array_min(transform(...))) walks the
  * array 64 times through interpreted, boxing lambda evaluation — measured
  * ~8.8 s for 5000 docs at sf0.1; this expression does the same math in
  * one unboxed loop (~64 multiply-add-mods per element), two orders of
  * magnitude less overhead. Same formula, same output values:
  * sig[j] = min over h of ((2j+1)*h + 40503*(j+1) mod p) mod p.
  *
  * Null/empty semantics: null input → null; empty array → null (no
  * shingles = no signature).
  */
case class MinHashSignature(child: Expression, numHashes: Int,
    prime: Long = 2147483647L) // 2^31 - 1 (Dedup.Prime) by default;
  // pass Dedup.PortablePrime (2^48 + 21) for the cross-engine variant
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSignature requires ARRAY<BIGINT>, got ${other.sql}")
    }

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(j => 2L * j + 1)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(j => 40503L * (j + 1) % prime)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = (h * as(j) + bs(j)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
        int $n = $c.numElements();
        if ($n == 0) {
          ${ev.isNull} = true;
        } else {
          long[] $mins = new long[$numHashes];
          java.util.Arrays.fill($mins, Long.MAX_VALUE);
          for (int $i = 0; $i < $n; $i++) {
            long $h = $c.getLong($i);
            for (int $j = 0; $j < $numHashes; $j++) {
              long $v = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
              if ($v < $mins[$j]) $mins[$j] = $v;
            }
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        }
      """
    })
  }

  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSignature = copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  def minhash_signature(hashes: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(hashes), numHashes))

  def minhash_signature(hashes: Column, numHashes: Int, prime: Long): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(hashes), numHashes, prime))
}
