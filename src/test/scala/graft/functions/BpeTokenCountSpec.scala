package graft.functions

import graft.SparkSpec
import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the vocab-driven BPE count, against the
  * shipped merges table (ranks: "t h"=0, "th e"=1, "i n"=2, "a n"=3,
  * "an d"=4, ..., "in g"=20, ...).
  */
class BpeTokenCountSpec extends SparkSpec {
  import spark.implicits._

  private def counts(texts: String*): Seq[Int] = {
    texts.toSeq.toDF("text")
      .select(TextAnalysis.bpeTokenCountReal(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
  }

  test("hand-computed merge sequences") {
    // "the": t,h,e -"t h"-> [th,e] -"th e"-> [the] = 1 token
    // "and": a,n,d -"a n"-> [an,d] -"an d"-> [and] = 1
    // "in":  i,n -"i n"-> [in] = 1
    // "thin": -"t h"-> [th,i,n] -"i n"-> [th,in] = 2 (no "th in" merge)
    // "thing": [th,i,n,g] -"i n"-> [th,in,g] -"in g"-> [th,ing] = 2
    // "data": no "d a"/"t a"; -"a t"-> [d,at,a] = 3
    // "zz": no merges = 2
    assert(counts("the", "and", "in", "thin", "thing", "data", "zz") ==
      Seq(1, 1, 1, 2, 2, 3, 2))
  }

  test("pre-tokenization: words, digits, marks, whitespace") {
    // "the thin and" = 1+2+1 across whitespace = 4
    assert(counts("the thin and") == Seq(4))
    // digit run with no digit merges in the table: 4 single digits
    assert(counts("2024") == Seq(4))
    // marks are single-char pre-tokens; "a-b" = a(1) + -(1) + b(1) = 3
    assert(counts("a-b") == Seq(3))
    // empty and whitespace-only = 0
    assert(counts("", "  \t\n ") == Seq(0, 0))
    // non-ASCII chars fall to the single-mark branch like the regex proxy
    assert(counts("é") == Seq(1))
  }

  test("null text yields null, not a crash") {
    val out = Seq(Some("the"), None).toDF("text")
      .select(TextAnalysis.bpeTokenCountReal(col("text")).as("n"))
      .collect()
    assert(out(0).getInt(0) == 1 && out(1).isNullAt(0))
  }

  test("merge-table count compresses vs the regex proxy and agrees on caps") {
    // on real-ish English text the merge count must be <= char count and
    // >= the regex pre-token count (merges only ever reduce)
    val df = Seq("the thing is that for all intents and purposes",
      "with or without the data on the other hand").toDF("text")
      .select(
        TextAnalysis.bpeTokenCountReal(col("text")).as("real"),
        TextAnalysis.bpeTokenCount(col("text")).as("proxy"),
        length(regexp_replace(col("text"), "\\s", "")).as("chars"))
    df.collect().foreach { r =>
      assert(r.getInt(0) >= r.getInt(1)) // >= pre-token count
      assert(r.getInt(0) <= r.getInt(2)) // <= non-space char count
    }
  }

  test("empty merge table degenerates to per-character counting") {
    val n = Seq("abc 12").toDF("text")
      .select(BpeTokenCount.bpe_token_count(col("text"), Map.empty).as("n"))
      .head().getInt(0)
    assert(n == 5)
  }

  test("bpe_tokens emits the actual merge-table sequence") {
    // fixture merges: t+h->th, th+e->the, i+s->is; '!' is a mark
    val out = Seq(Some("the this! 🙂"), Some(""), None).toDF("text")
      .select(BpeTokens.bpe_tokens(col("text"),
        TextAnalysis.DefaultBpeRanks).as("s"))
      .collect()
    val toks = out(0).getString(0).split(BpeAlgo.TokenSep).toSeq
    assert(toks == Seq("the", "th", "is", "!", "🙂"))
    assert(out(1).getString(0) == "")
    assert(out(2).isNullAt(0))
    // the count expression and the sequence length agree by construction
    val n = Seq("the this! 🙂").toDF("text")
      .select(TextAnalysis.bpeTokenCountReal(col("text"))).head().getInt(0)
    assert(n == toks.size)
  }

  test("marks count per CODEPOINT: a surrogate-pair emoji is ONE token") {
    // "🙂" is U+1F642 (2 UTF-16 units); a char-indexed walk would count 2
    // — the codepoint alphabet (and every codepoint regex engine) says 1
    val n = Seq("🙂 é 中文").toDF("text")
      .select(TextAnalysis.bpeTokenCountReal(col("text")).as("n"))
      .head().getInt(0)
    assert(n == 4) // emoji(1) + é(1) + 中(1) + 文(1)
  }
}
