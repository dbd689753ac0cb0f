package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Vocab-driven BPE token count as a native codegen'd expression: the
  * real tokenizer-budget arithmetic (merge-table BPE over each pre-token),
  * not the regex proxy in TextAnalysis.bpeTokenCount.
  *
  * Semantics:
  *  - pre-tokenization mirrors TextAnalysis.BpePattern exactly: ASCII
  *    letter runs, ASCII digit runs, and single non-alnum-non-space
  *    marks; ASCII whitespace separates and is not counted;
  *  - each pre-token is split into characters and adjacent pairs are
  *    merged greedily by merge-table rank (the standard BPE encode loop:
  *    per round, the best-ranked adjacent pair anywhere in the word is
  *    merged at every occurrence, left to right);
  *  - the count is the number of symbols left when no adjacent pair is
  *    in the table — i.e. exactly the number of BPE tokens a real
  *    tokenizer with this merge table would emit.
  *
  * The merge loop lives in [[BpeAlgo]] (compiled Scala); doGenCode emits
  * a single static call with the rank table attached as a codegen
  * reference object, so the expression sits inside the whole-stage span
  * like any built-in regexp function (which also call onto reference
  * objects).
  *
  * Null/empty semantics: null input → null; empty/whitespace text → 0.
  */
case class BpeTokenCount(child: Expression, ranks: Map[String, Int])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"BpeTokenCount requires STRING, got ${other.sql}")
    }

  @transient private lazy val javaRanks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](ranks.size * 2)
    ranks.foreach { case (k, v) => m.put(k, Integer.valueOf(v)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    BpeAlgo.count(input.asInstanceOf[UTF8String], javaRanks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", javaRanks,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeAlgo.count($c, $ranksRef);")
  }

  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression)
      : BpeTokenCount = copy(child = newChild)
  override def prettyName: String = "bpe_token_count"
}

object BpeTokenCount {
  def bpe_token_count(text: Column, ranks: Map[String, Int]): Column =
    GraftColumnBridge.column(
      BpeTokenCount(GraftColumnBridge.expression(text), ranks))
}

/** The BPE encode loop, kept out of the expression class so generated
  * code can reach it as a plain static call.
  */
object BpeAlgo {

  /** Characters the pre-tokenizer SKIPS: ASCII whitespace plus the two
    * separator control codes U+001E/U+001F. The latter are excluded from
    * the mark alphabet BY CONTRACT (mirrored in every BPE oracle's
    * `[^A-Za-z0-9\s\x0b\x1e\x1f]` class): U+001F is [[BpeAlgo.TokenSep]]
    * (the engine's joined-sequence separator) and U+001E is the DuckDB
    * oracles' chr(30) reduce separator — if either could appear INSIDE a
    * token, the joined sequence would be ambiguous and the oracle replay
    * would diverge (r12 advice). Excluding both makes any separator
    * choice collision-free on any corpus.
    */
  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B.toChar ||
      c == '\f' || c == '\r' || c == 0x1E.toChar || c == 0x1F.toChar
  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Total BPE token count of a text: pre-tokenize (letter runs / digit
    * runs / single marks — the same segmentation as
    * TextAnalysis.BpePattern), BPE-encode each pre-token, sum the counts.
    * Marks advance by CODE POINT, not UTF-16 unit: a supplementary-plane
    * char (emoji) is ONE mark — what a real tokenizer's codepoint
    * alphabet emits, and what codepoint-based regex engines (Java's own
    * `.` and negated classes, DuckDB/RE2) match as one (adversarial-
    * corpus finding: the char-indexed walk double-counted surrogate
    * pairs).
    */
  def count(s: UTF8String, ranks: java.util.HashMap[String, Integer]): Int = {
    val str = s.toString
    val n = str.length
    var total = 0
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (isAsciiSpace(c)) {
        i += 1
      } else if (isAsciiLetter(c)) {
        var j = i + 1
        while (j < n && isAsciiLetter(str.charAt(j))) j += 1
        total += countWord(str.substring(i, j), ranks)
        i = j
      } else if (isAsciiDigit(c)) {
        var j = i + 1
        while (j < n && isAsciiDigit(str.charAt(j))) j += 1
        total += countWord(str.substring(i, j), ranks)
        i = j
      } else {
        total += 1 // single mark = single-CODEPOINT pre-token
        i += Character.charCount(str.codePointAt(i))
      }
    }
    total
  }

  /** Standard BPE encode of one pre-token, returning only the token
    * count: per round, find the best-ranked adjacent pair and merge all
    * its occurrences left-to-right; stop when no adjacent pair is ranked.
    */
  private def countWord(w: String,
      ranks: java.util.HashMap[String, Integer]): Int =
    mergeWord(w, ranks).size

  /** The merge loop itself, returning the symbol list — shared by the
    * count and the token-EMITTING expression ([[BpeTokens]]).
    */
  private def mergeWord(w: String,
      ranks: java.util.HashMap[String, Integer])
      : java.util.ArrayList[String] = {
    val len = w.length
    val parts = new java.util.ArrayList[String](math.max(len, 1))
    var i = 0
    while (i < len) { parts.add(String.valueOf(w.charAt(i))); i += 1 }
    if (len <= 1) return parts
    var done = false
    while (!done && parts.size >= 2) {
      var best = Int.MaxValue
      var bi = -1
      var k = 0
      while (k < parts.size - 1) {
        val r = ranks.get(parts.get(k) + " " + parts.get(k + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = k }
        k += 1
      }
      if (bi < 0) done = true
      else {
        val l = parts.get(bi)
        val rt = parts.get(bi + 1)
        val merged = l + rt
        var j = 0
        while (j < parts.size - 1) {
          if (parts.get(j) == l && parts.get(j + 1) == rt) {
            parts.set(j, merged)
            parts.remove(j + 1)
          } else j += 1
        }
      }
    }
    parts
  }

  /** The SEPARATOR between emitted tokens (U+001F UNIT SEPARATOR).
    * Collision-free by construction: U+001E/U+001F are excluded from the
    * pre-token alphabet (see [[isAsciiSpace]]), so no emitted token can
    * contain or equal either separator — the joined sequence splits back
    * unambiguously on any corpus.
    */
  val TokenSep: Char = 0x1f.toChar

  /** Full tokenization: the actual BPE token SEQUENCE (joined by
    * [[TokenSep]]), not just the count — the training-pipeline step that
    * turns text into model input. Same pre-tokenization and merge loop
    * as [[count]]; marks advance by codepoint.
    */
  def tokens(s: UTF8String,
      ranks: java.util.HashMap[String, Integer]): UTF8String = {
    val str = s.toString
    val n = str.length
    val out = new java.lang.StringBuilder(n + (n >> 2) + 8)
    def emit(tok: String): Unit = {
      if (out.length > 0) out.append(TokenSep)
      out.append(tok)
    }
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (isAsciiSpace(c)) {
        i += 1
      } else if (isAsciiLetter(c)) {
        var j = i + 1
        while (j < n && isAsciiLetter(str.charAt(j))) j += 1
        val parts = mergeWord(str.substring(i, j), ranks)
        var k = 0
        while (k < parts.size) { emit(parts.get(k)); k += 1 }
        i = j
      } else if (isAsciiDigit(c)) {
        var j = i + 1
        while (j < n && isAsciiDigit(str.charAt(j))) j += 1
        val parts = mergeWord(str.substring(i, j), ranks)
        var k = 0
        while (k < parts.size) { emit(parts.get(k)); k += 1 }
        i = j
      } else {
        val w = Character.charCount(str.codePointAt(i))
        emit(str.substring(i, i + w))
        i += w
      }
    }
    UTF8String.fromString(out.toString)
  }
}

/** bpe_tokens(text) → STRING: the vocab-driven BPE token SEQUENCE
  * (tokens joined by U+001F), sharing [[BpeAlgo]]'s pre-tokenization
  * and merge loop with the count expression — counts budget a corpus,
  * the sequence IS the model input. Null text → null; empty → empty.
  */
case class BpeTokens(child: Expression, ranks: Map[String, Int])
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"BpeTokens requires STRING, got ${other.sql}")
    }

  @transient private lazy val javaRanks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](ranks.size * 2)
    ranks.foreach { case (k, v) => m.put(k, Integer.valueOf(v)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    BpeAlgo.tokens(input.asInstanceOf[UTF8String], javaRanks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", javaRanks,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeAlgo.tokens($c, $ranksRef);")
  }

  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression)
      : BpeTokens = copy(child = newChild)
  override def prettyName: String = "bpe_tokens"
}

object BpeTokens {
  def bpe_tokens(text: Column, ranks: Map[String, Int]): Column =
    GraftColumnBridge.column(
      BpeTokens(GraftColumnBridge.expression(text), ranks))
}
