package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace runs, empty string, surrounding space") {
    val out = Seq("a b  c", "", "  ", " x ")
      .toDF("text")
      .select(TextAnalysis.tokenCount($"text").as("n"))
      .collect().map(_.getInt(0))
    assert(out.toSeq == Seq(3, 0, 0, 1))
  }

  test("stopwordRatio and avgTokenLen from integer counts") {
    val r = Seq("the cat sat on a mat").toDF("text")
      .select(
        TextAnalysis.stopwordRatio($"text").as("sr"),
        TextAnalysis.avgTokenLen($"text").as("al"))
      .head()
    assert(math.abs(r.getDouble(0) - 2.0 / 6.0) < 1e-15)
    assert(math.abs(r.getDouble(1) - 15.0 / 6.0) < 1e-15) // 15 letters, 6 tokens
  }

  test("qualityScore in [0,1] and monotone in length credit") {
    val out = Seq("word " * 5, "word " * 200).toDF("text")
      .select(TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(_.getDouble(0))
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1) > out(0))
  }

  test("langId votes by stopword lists; und when no hits") {
    val out = Seq(
      "the cat and the dog in a house",
      "der hund und die katze ist nicht da",
      "le chat et la maison est une",
      "el perro que es un gato los dos",
      "zzz qqq www")
      .toDF("text")
      .select(TextAnalysis.langId($"text").as("l"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("staged tokenization: quality pipeline splits each document once") {
    // spark.range keeps the plan non-local (a Seq folds to LocalRelation
    // and the projection vanishes before it can be inspected)
    val docs = spark.range(3).select($"id".as("doc_id"),
      concat(lit("the quick brown fox "), $"id").as("text"))
    val staged = docs
      .select($"doc_id", TextAnalysis.tokenArray($"text").as("__toks"))
      .select($"doc_id",
        TextAnalysis.tokenCountFromTokens($"__toks").as("n_tokens"),
        TextAnalysis.avgTokenLenFromTokens($"__toks").as("avg_token_len"),
        TextAnalysis.stopwordRatioFromTokens($"__toks").as("stopword_ratio"),
        TextAnalysis.qualityScoreFromTokens($"__toks").as("quality_score"))
    val plan = staged.queryExecution.optimizedPlan.toString
    val nSplits = "split\\(".r.findAllMatchIn(plan).size
    assert(nSplits == 1, s"expected 1 split in optimized plan, got $nSplits:\n$plan")
  }

  test("FromTokens variants agree with the single-metric text overloads") {
    val docs = Seq("the cat sat on a mat", "", "der hund und die katze")
      .toDF("text")
    val viaText = docs.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.avgTokenLen($"text"),
      TextAnalysis.stopwordRatio($"text"),
      TextAnalysis.qualityScore($"text"),
      TextAnalysis.langId($"text")).collect().toSeq
    val viaToks = docs
      .select(TextAnalysis.tokenArray($"text").as("__toks"))
      .select(
        TextAnalysis.tokenCountFromTokens($"__toks"),
        TextAnalysis.avgTokenLenFromTokens($"__toks"),
        TextAnalysis.stopwordRatioFromTokens($"__toks"),
        TextAnalysis.qualityScoreFromTokens($"__toks"),
        TextAnalysis.langIdFromTokens($"__toks")).collect().toSeq
    assert(viaText == viaToks)
  }

  test("normalize: casing and whitespace variants collapse to one form") {
    val out = Seq("Hello   World", "  hello world ", "hello\tworld\n",
      "hello worlds")
      .toDF("text")
      .select(TextAnalysis.normalize($"text").as("n"))
      .collect().map(_.getString(0))
    assert(out(0) == "hello world")
    assert(out.take(3).distinct.length == 1)
    assert(out(3) == "hello worlds")
  }

  test("profile emits one row per doc with all feature columns") {
    val out = TextAnalysis.profile(
      Seq((1L, "the quick brown fox")).toDF("doc_id", "text"))
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "n_chars",
      "avg_token_len", "stopword_ratio", "quality_score", "lang_pred",
      "fp_md5"))
    assert(out.count() == 1)
  }

  test("repetition metrics: hand-computed fractions incl. empty/1-token") {
    val rows = Seq(
      "a b a b a",   // 5 toks, 2 distinct; bigrams: ab,ba,ab,ba → top 2/4
      "x",           // 1 token, no bigrams
      "",            // empty: all zeros
      "w w w w")     // one token looped: dup 3/4, max 1.0, bigram 3/3
      .toDF("text")
      .select(TextAnalysis.tokenArray($"text").as("__toks"))
      .select($"__toks", TextAnalysis.bigramsFromTokens($"__toks").as("__bg"))
      .select(
        TextAnalysis.dupFracFromArray($"__toks").as("dup"),
        TextAnalysis.topFracFromArray($"__toks").as("maxTok"),
        TextAnalysis.topFracFromArray($"__bg").as("topBg"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(rows(0) == ((1.0 - 2.0 / 5.0, 3.0 / 5.0, 2.0 / 4.0)))
    assert(rows(1) == ((0.0, 1.0, 0.0)))
    assert(rows(2) == ((0.0, 0.0, 0.0)))
    assert(rows(3) == ((1.0 - 1.0 / 4.0, 1.0, 1.0)))
  }

  test("PII detection: counts per class and redaction") {
    val r = Seq("mail a@b.co and c.d@e.org ip 10.0.0.1 tel 555-123-4567 x")
      .toDF("text")
      .select(
        TextAnalysis.piiMatchCount($"text",
          TextAnalysis.PiiEmailPattern).as("e"),
        TextAnalysis.piiMatchCount($"text",
          TextAnalysis.PiiIpv4Pattern).as("i"),
        TextAnalysis.piiMatchCount($"text",
          TextAnalysis.PiiPhonePattern).as("p"),
        TextAnalysis.piiRedact($"text").as("red"))
      .head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 1)))
    assert(r.getString(3) ==
      "mail <PII> and <PII> ip <PII> tel <PII> x")
  }

  test("PII: clean text untouched, zero counts") {
    val r = Seq("just ordinary words here 123")
      .toDF("text")
      .select(
        TextAnalysis.piiMatchCount($"text",
          TextAnalysis.PiiAnyPattern).as("n"),
        TextAnalysis.piiRedact($"text").as("red"))
      .head()
    assert(r.getInt(0) == 0)
    assert(r.getString(1) == "just ordinary words here 123")
  }
}
