package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization stats, quality scoring, language-ID heuristic, document
  * fingerprinting. All are pure column expressions — they fuse into the
  * document scan under whole-stage codegen, so a 100 TB corpus pays one
  * pass with no shuffle.
  *
  * Determinism: every ratio is derived from integer counts and divided in
  * IEEE double, so results are bit-stable and oracle-checkable.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Tokens matching any word in `words`. */
  def tokenCountIn(text: Column, words: Seq[String]): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(filter(tokens(text), t => t.isin(words: _*))))

  /** BPE-ish pre-tokenization count: letter runs, digit runs, and single
    * punctuation marks — the segmentation BPE vocabularies split on before
    * merges. A cheap, deterministic proxy for "how many tokens will the
    * tokenizer emit", good for corpus budgeting without a vocab file.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** English-ish stopwords used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in")

  /** Per-language stopword lists for the language-ID heuristic (public
    * high-frequency function words).
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "los", "las", "que", "es", "un", "una"))

  /** Stopword ratio: stopword tokens / all tokens, in double. */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(tokenCountIn(text, Stopwords).cast(DoubleType) /
        n.cast(DoubleType))
  }

  /** Mean token length (chars excluding separators / token count). */
  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    val letters = length(regexp_replace(trim(text), "\\s+", ""))
    when(n === 0, lit(0.0))
      .otherwise(letters.cast(DoubleType) / n.cast(DoubleType))
  }

  /** Composite quality score in [0,1]: length credit + lexical credit +
    * stopword-balance credit. The exact weights are a policy choice; what
    * matters for the engine is that the formula is a pure, bit-stable
    * column expression.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast(DoubleType)
    val lenCredit = least(lit(1.0), n / lit(100.0))
    val lexCredit = least(lit(1.0), avgTokenLen(text) / lit(8.0))
    val stopCredit = lit(1.0) - stopwordRatio(text)
    lenCredit * 0.4 + lexCredit * 0.3 + stopCredit * 0.3
  }

  /** Language-ID by stopword voting: the language whose stopword list hits
    * the most tokens wins; ties resolve in LangStopwords order; zero hits
    * → 'und' (undetermined). A classic n-gram-free heuristic that runs as
    * one codegen'd CASE chain.
    */
  def langId(text: Column): Column = {
    val scores = LangStopwords.map { case (lang, words) =>
      lang -> tokenCountIn(text, words)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val chain = scores.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (lang, score)) => acc.when(score === best, lit(lang))
    }
    chain.otherwise(lit("und"))
  }

  /** Content fingerprints: MD5 (cross-engine-stable, oracle-checkable) and
    * the custom codegen'd rolling hash (graft.functions.RollingHash).
    */
  def md5Fingerprint(text: Column): Column = md5(text.cast(BinaryType))

  def rollingFingerprint(text: Column): Column =
    graft.functions.RollingHash.rolling_hash(text)

  /** Full per-document profile. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      tokenCount(t).as("n_tokens"),
      length(t).as("n_chars"),
      avgTokenLen(t).as("avg_token_len"),
      stopwordRatio(t).as("stopword_ratio"),
      qualityScore(t).as("quality_score"),
      langId(t).as("lang_pred"),
      md5Fingerprint(t).as("fp_md5"))
  }
}
