package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-family) tokenization statistics as a native
  * codegen'd expression — the third tokenizer family beside
  * [[BpeTokenCount]] (BPE/GPT) and [[WordPieceMeta]] (WordPiece/BERT):
  * Viterbi segmentation, per Kudo 2018 — each word is segmented into
  * the vocabulary pieces minimizing the total piece cost (the
  * integer-quantized form of maximizing Σ log p(piece); integer costs
  * are what keep the DP cross-engine EXACT, the same quantization
  * discipline as the surprisal rung's integer bitlengths — true
  * log-probs would die on float log portability).
  *
  * Semantics:
  *  - pre-tokenization: WordPieceAlgo's word stream — ASCII letter runs
  *    and digit runs; everything else separates words and is not
  *    counted;
  *  - per word, dp[i] = min over pieces w[j..i) ∈ vocab of
  *    dp[j] + cost(piece), with the TOKEN COUNT packed into the low 6
  *    bits (value = cost·64 + tokens, tokens ≤ MaxWordLen < 64): one
  *    integer DP realizes the lexicographic (min cost, then min
  *    tokens) objective, so per-word stats are total even when
  *    distinct segmentations tie on cost;
  *  - a word longer than MaxWordLen (16), or with NO feasible
  *    segmentation, is a single [UNK] token at `unkCost` (the
  *    reference's unknown-piece path);
  *  - returns struct<n_words, n_tokens, n_unk, total_cost>.
  *
  * Null → null; empty/wordless text → (0, 0, 0, 0).
  *
  * Scale shape: map-only, one pass, vocabulary as a codegen reference
  * object; the probe bound derives from the supplied vocabulary's
  * longest piece (the WordPieceMeta r10-advice lesson — caller pieces
  * of any length are reachable). Costs are require-bounded to
  * [1, 1000] so the oracle's missing-piece sentinel (99999) provably
  * exceeds every feasible path (16·1000·64+16 < 99999·64).
  */
case class UnigramMeta(child: Expression, vocab: Seq[(String, Int)],
    unkCost: Int) extends UnaryExpression {

  require(unkCost >= 0 && unkCost <= 1000000,
    s"unkCost must be in [0, 1000000], got $unkCost")
  vocab.foreach { case (p, c) =>
    require(p.nonEmpty, "vocab pieces must be non-empty")
    require(c >= 1 && c <= 1000,
      s"piece cost must be in [1, 1000] (oracle sentinel bound), got " +
        s"($p, $c)")
  }

  override def dataType: DataType = UnigramMeta.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"UnigramMeta requires STRING, got ${other.sql}")
    }

  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, c) }
    m
  }

  /** Derived, not capped — the WordPieceMeta lesson. */
  @transient private lazy val maxPieceLen: Int =
    vocab.foldLeft(1) { case (m, (p, _)) => math.max(m, p.length) }

  override def nullSafeEval(input: Any): Any =
    UnigramAlgo.meta(input.asInstanceOf[UTF8String], table, maxPieceLen,
      unkCost)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("unigramVocab", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UnigramAlgo.meta($c, $tRef,
        $maxPieceLen, $unkCost);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramMeta = copy(child = newChild)
  override def prettyName: String = "unigram_meta"
}

object UnigramMeta {
  val Schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = true),
    StructField("n_tokens", IntegerType, nullable = true),
    StructField("n_unk", IntegerType, nullable = true),
    StructField("total_cost", LongType, nullable = true)))

  def unigram_meta(text: Column, vocab: Seq[(String, Int)],
      unkCost: Int): Column =
    GraftColumnBridge.column(UnigramMeta(
      GraftColumnBridge.expression(text), vocab, unkCost))
}

/** The packed-DP Viterbi loop, kept out of the expression class so
  * generated code reaches it as a plain static call.
  */
object UnigramAlgo {

  /** Words longer than this are [UNK] wholesale — also the unroll depth
    * of the cross-engine oracle's 16-step lateral-alias DP.
    */
  val MaxWordLen = 16

  /** Infeasible sentinel: strictly above any packed feasible value
    * (16·1000·64+16) AND any oracle missing-piece path (the oracle's
    * 99999·64 threshold classifies identically — see UnigramMeta doc).
    */
  val Infeasible: Long = Long.MaxValue / 4

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def meta(s: UTF8String, vocab: java.util.HashMap[String, Integer],
      maxPieceLen: Int, unkCost: Int): InternalRow = {
    val str = s.toString
    val n = str.length
    var words = 0
    var tokens = 0
    var unk = 0
    var cost = 0L
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      val isW = isAsciiLetter(c) || isAsciiDigit(c)
      if (isW) {
        val letter = isAsciiLetter(c)
        var j = i + 1
        while (j < n && (if (letter) isAsciiLetter(str.charAt(j))
                         else isAsciiDigit(str.charAt(j)))) j += 1
        words += 1
        val packed = viterbi(str, i, j, vocab, maxPieceLen)
        if (packed < 0) { unk += 1; tokens += 1; cost += unkCost }
        else { tokens += (packed % 64).toInt; cost += packed / 64 }
        i = j
      } else {
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](words, tokens, unk, cost))
  }

  /** Min packed (cost·64 + tokens) segmentation of str[from, to); -1
    * means [UNK] (too long or infeasible).
    */
  private def viterbi(str: String, from: Int, to: Int,
      vocab: java.util.HashMap[String, Integer], maxPieceLen: Int): Long = {
    val len = to - from
    if (len > MaxWordLen) return -1L
    val dp = new Array[Long](len + 1)
    var i = 1
    while (i <= len) {
      var best = Infeasible
      var p = 1
      val pm = math.min(maxPieceLen, i)
      while (p <= pm) {
        if (dp(i - p) < Infeasible) {
          val c = vocab.get(str.substring(from + i - p, from + i))
          if (c != null) {
            val v = dp(i - p) + c.longValue * 64L + 1L
            if (v < best) best = v
          }
        }
        p += 1
      }
      dp(i) = best
      i += 1
    }
    if (dp(len) >= Infeasible) -1L else dp(len)
  }
}
