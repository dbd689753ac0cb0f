package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, UAX #15) as a native codegen'd expression — the text
  * curation rung BEFORE any dedup/fingerprint hash: two byte-distinct
  * spellings of the same text ("é" precomposed U+00E9 vs decomposed
  * e + U+0301, the Å angstrom-sign singleton U+212B, decomposed Hangul
  * jamo) hash to different signatures unless the corpus is normalized
  * first, silently splitting duplicate groups. A 100 TB crawl corpus
  * mixes encoders, so normalize-then-hash is the standard first step
  * (every major tokenizer pipeline NFC/NFKCs for the same reason).
  *
  * Backed by `java.text.Normalizer` (the JDK's implementation of the
  * Unicode standard). Cross-engine note: DuckDB's `nfc_normalize`
  * implements the same UAX #15 algorithm via utf8proc — the Unicode
  * normalization STABILITY policy guarantees NFC output for assigned
  * code points never changes between Unicode versions, which is what
  * makes an exact cross-engine oracle possible for a function backed by
  * two independent implementations.
  *
  * Null → null; the function is idempotent (NFC(NFC(x)) = NFC(x),
  * spec-pinned). Scale shape: map-only, codegen'd, fuses into the scan.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"NfcNormalize requires STRING input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NfcNormalize.nfc($c);
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Static kernel shared by eval and generated code. Fast path: NFC
    * quick-check via isNormalized (pure ASCII and most real text) skips
    * the allocation entirely.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
