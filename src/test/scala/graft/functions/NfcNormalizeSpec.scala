package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins NfcNormalize against HAND-WRITTEN code-point sequences from
  * UAX #15 -- inputs and expected outputs spelled as explicit escape
  * sequences (never raw glyphs: decomposed and precomposed forms
  * render identically, and a source-encoding normalization would
  * silently rewrite raw literals): combining-mark composition, the
  * singleton replacements (angstrom, ohm), Hangul jamo composition
  * (LV and LVT), canonical REORDERING of combining marks, idempotence,
  * the untouched-ASCII fast path, and null.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(ss: String*): Seq[String] =
    ss.toSeq.toDF("s")
      .select(NfcNormalize.nfc_normalize(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("combining marks compose to precomposed forms") {
    // e+acute, a+grave, n+tilde, c+cedilla (decomposed inputs)
    assert(nfc("\u0065\u0301", "\u0061\u0300", "\u006E\u0303", "\u0063\u0327") ==
      Seq("\u00E9", "\u00E0", "\u00F1", "\u00E7"))
  }

  test("singletons: angstrom sign and ohm sign replace") {
    assert(nfc("\u212B", "\u2126") == Seq("\u00C5", "\u03A9"))
  }

  test("hangul jamo compose: LV and LVT syllables") {
    // KIYEOK+A -> GA (U+AC00); KIYEOK+A+final KIYEOK -> GAK (U+AC01)
    assert(nfc("\u1100\u1161", "\u1100\u1161\u11A8") == Seq("\uAC00", "\uAC01"))
  }

  test("canonical reordering + partial composition") {
    // e, COMBINING ACUTE (ccc 230), COMBINING DOT BELOW (ccc 220):
    // canonical order puts the dot below FIRST, after which e + dot
    // below composes to U+1EB9 and the acute remains combining --
    // NFC = U+1EB9 U+0301
    assert(nfc("\u0065\u0301\u0323") == Seq("\u1EB9\u0301"))
  }

  test("already-NFC text passes through unchanged (incl. the fast path)") {
    assert(nfc("plain ascii", "\u00E9tude", "", "\uAC00") ==
      Seq("plain ascii", "\u00E9tude", "", "\uAC00"))
  }

  test("idempotent: NFC(NFC(x)) = NFC(x)") {
    val once = nfc("\u0065\u0301\u0323 \u212B \u1100\u1161")
    assert(once == Seq("\u1EB9\u0301 \u00C5 \uAC00"))
    assert(nfc(once.head) == once)
  }

  test("null yields null; SQL surface registered") {
    val out = Seq((1L, null: String)).toDF("id", "s")
      .select(NfcNormalize.nfc_normalize(col("s")).as("n")).collect()
    assert(out(0).isNullAt(0))
    graft.functions.GraftFunctions.register(spark)
    val r = Seq(Tuple1("\u0065\u0301")).toDF("s")
      .selectExpr("nfc_normalize(s) AS n").collect()
    assert(r(0).getString(0) == "\u00E9")
  }
}
