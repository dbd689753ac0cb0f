package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization statistics as a native codegen'd expression —
  * the inference-side sibling of [[BpeTokenCount]] (BERT's tokenizer
  * family vs GPT's): greedy LONGEST-MATCH-FIRST subword segmentation
  * against a fixed vocabulary, per the public WordPiece algorithm
  * (Schuster & Nakajima 2012; the BERT repo's tokenization.py is the
  * de-facto reference implementation).
  *
  * Semantics (faithful to the reference implementation):
  *  - pre-tokenization mirrors BpeAlgo's word stream restricted to
  *    words: ASCII letter runs and ASCII digit runs (the
  *    `[A-Za-z]+|[0-9]+` classes); everything else separates words and
  *    is not counted;
  *  - a word longer than MaxWordLen characters is a single [UNK] token
  *    (BERT's max_input_chars_per_word rule, bound chosen so the
  *    cross-engine oracle can unroll the greedy loop — min advance is 1
  *    char/step, so MaxWordLen caps the steps);
  *  - otherwise, repeatedly take the LONGEST vocabulary piece matching
  *    at the cursor — word-initial pieces match at position 0,
  *    continuation ("##"-prefixed) pieces after it — and advance; if NO
  *    piece matches at some position the whole word becomes one [UNK]
  *    (not a partial segmentation — the reference's bad=true path);
  *  - returns struct<n_words, n_tokens, n_unk>: words seen, tokens
  *    emitted ([UNK] counts as 1), words that became [UNK].
  *
  * Null/empty semantics: null input → null; empty/wordless text →
  * (0, 0, 0).
  *
  * Scale shape: map-only, one pass, vocabulary attached as a codegen
  * reference object (the BpeTokenCount discipline) so the expression
  * stays inside the whole-stage span; the vocabulary itself is
  * driver-bounded by construction (see llm/WordPiece.scala's threshold
  * argument). Matching is O(len · maxPieceLen) hash probes per word,
  * where maxPieceLen is DERIVED from the supplied vocabulary (longest
  * piece after stripping the "##" display prefix) — a caller-supplied
  * piece of any length is reachable, vs a fixed probe cap that would
  * silently never match pieces longer than it. llm/WordPiece-trained
  * vocabs stay at [[WordPieceAlgo.MaxPieceLen]] = 6, so no trie needed
  * there.
  */
case class WordPieceMeta(child: Expression, wordInitial: Seq[String],
    continuation: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = WordPieceMeta.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"WordPieceMeta requires STRING, got ${other.sql}")
    }

  @transient private lazy val initSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](wordInitial.size * 2)
    wordInitial.foreach(s.add)
    s
  }

  /** Continuation pieces stored in match form — the display "##" prefix
    * stripped once here, not per probe.
    */
  @transient private lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](continuation.size * 2)
    continuation.foreach(p => s.add(p.stripPrefix("##")))
    s
  }

  /** Longest probe the matcher needs for THIS vocabulary — derived, not
    * a fixed cap, so caller-supplied pieces longer than the trained
    * default stay reachable (longest-match over the full vocab, as the
    * reference tokenizer does).
    */
  @transient private lazy val maxPieceLen: Int = {
    var m = 1
    wordInitial.foreach(p => if (p.length > m) m = p.length)
    continuation.foreach { p =>
      val l = p.stripPrefix("##").length
      if (l > m) m = l
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    WordPieceAlgo.meta(input.asInstanceOf[UTF8String], initSet, contSet,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val initRef = ctx.addReferenceObj("wpInit", initSet, "java.util.HashSet")
    val contRef = ctx.addReferenceObj("wpCont", contSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WordPieceAlgo.meta($c, $initRef, $contRef,
        $maxPieceLen);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordPieceMeta = copy(child = newChild)
  override def prettyName: String = "wordpiece_meta"
}

object WordPieceMeta {
  val Schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = true),
    StructField("n_tokens", IntegerType, nullable = true),
    StructField("n_unk", IntegerType, nullable = true)))

  def wordpiece_meta(text: Column, wordInitial: Seq[String],
      continuation: Seq[String]): Column =
    GraftColumnBridge.column(WordPieceMeta(
      GraftColumnBridge.expression(text), wordInitial, continuation))
}

/** The greedy longest-match loop, kept out of the expression class so
  * generated code can reach it as a plain static call.
  */
object WordPieceAlgo {

  /** Words longer than this are [UNK] wholesale (BERT's
    * max_input_chars_per_word, sized to the oracle's unroll depth).
    */
  val MaxWordLen = 16

  /** Longest piece llm/WordPiece's TRAINER emits (pieces of length
    * 2..MaxPieceLen; length-1 probes always run as the final fallback).
    * The matcher itself no longer caps at this — WordPieceMeta derives
    * its probe bound from the supplied vocabulary, so longer
    * caller-supplied pieces are reachable.
    */
  val MaxPieceLen = 6

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def meta(s: UTF8String, init: java.util.HashSet[String],
      cont: java.util.HashSet[String], maxPieceLen: Int): InternalRow = {
    val str = s.toString
    val n = str.length
    var words = 0
    var tokens = 0
    var unk = 0
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (isAsciiLetter(c)) {
        var j = i + 1
        while (j < n && isAsciiLetter(str.charAt(j))) j += 1
        words += 1
        val t = tokenizeWord(str, i, j, init, cont, maxPieceLen)
        if (t < 0) { unk += 1; tokens += 1 } else tokens += t
        i = j
      } else if (isAsciiDigit(c)) {
        var j = i + 1
        while (j < n && isAsciiDigit(str.charAt(j))) j += 1
        words += 1
        val t = tokenizeWord(str, i, j, init, cont, maxPieceLen)
        if (t < 0) { unk += 1; tokens += 1 } else tokens += t
        i = j
      } else {
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](words, tokens, unk))
  }

  /** Greedy longest-match token count of word = str[from, to); -1 means
    * the word is [UNK] (too long, or stuck with no matching piece).
    */
  private def tokenizeWord(str: String, from: Int, to: Int,
      init: java.util.HashSet[String],
      cont: java.util.HashSet[String], maxPieceLen: Int): Int = {
    val len = to - from
    if (len > MaxWordLen) return -1
    var pos = from
    var t = 0
    while (pos < to) {
      val set = if (pos == from) init else cont
      var l = math.min(maxPieceLen, to - pos)
      var matched = 0
      while (matched == 0 && l >= 1) {
        if (set.contains(str.substring(pos, pos + l))) matched = l
        else l -= 1
      }
      if (matched == 0) return -1 // reference bad=true path: whole word UNK
      pos += matched
      t += 1
    }
    t
  }
}
