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
  * Tokenization discipline: Catalyst inlines a text-based metric's
  * tokenizer per reference, so composing several metrics from `text`
  * re-splits the document once per metric (the same trap Dedup.docSignatures
  * stages around). Pipelines must project [[tokenArray]] ONCE as its own
  * column and feed the `*FromTokens` variants — the plain-text overloads
  * exist for single-metric selects only.
  *
  * Determinism: every ratio is derived from integer counts and divided in
  * IEEE double, so results are bit-stable and oracle-checkable.
  */
object TextAnalysis {

  /** Raw whitespace tokenization (empty text yields [""]). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Empty-safe token array: [] for blank text, whitespace split otherwise.
    * Stage this as its own projection; every metric below reads the staged
    * column, so the document is tokenized exactly once per row.
    */
  def tokenArray(text: Column): Column =
    when(length(trim(text)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(tokens(text))

  // ---- token-array metrics (cheap refs over the staged column) ----

  def tokenCountFromTokens(toks: Column): Column = size(toks)

  /** Tokens matching any word in `words`. */
  def tokenCountInFromTokens(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Non-separator character count == sum of token lengths (equals
    * length(regexp_replace(trim(text), "\\s+", "")) without re-reading text).
    */
  def charCountFromTokens(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t))

  /** Stopword ratio: stopword tokens / all tokens, in double. */
  def stopwordRatioFromTokens(toks: Column): Column = {
    val n = size(toks)
    when(n === 0, lit(0.0))
      .otherwise(tokenCountInFromTokens(toks, Stopwords).cast(DoubleType) /
        n.cast(DoubleType))
  }

  /** Mean token length (chars excluding separators / token count). */
  def avgTokenLenFromTokens(toks: Column): Column = {
    val n = size(toks)
    when(n === 0, lit(0.0))
      .otherwise(charCountFromTokens(toks).cast(DoubleType) /
        n.cast(DoubleType))
  }

  /** Composite quality score in [0,1]: length credit + lexical credit +
    * stopword-balance credit. The exact weights are a policy choice; what
    * matters for the engine is that the formula is a pure, bit-stable
    * column expression.
    */
  def qualityScoreFromTokens(toks: Column): Column = {
    val n = size(toks).cast(DoubleType)
    val lenCredit = least(lit(1.0), n / lit(100.0))
    val lexCredit = least(lit(1.0), avgTokenLenFromTokens(toks) / lit(8.0))
    val stopCredit = lit(1.0) - stopwordRatioFromTokens(toks)
    lenCredit * 0.4 + lexCredit * 0.3 + stopCredit * 0.3
  }

  // ---- repetition metrics (Gopher/C4-style quality signals: natural
  // text rarely repeats itself; templated/spammy/looping text does) ----

  /** Duplicate-element fraction of an array: 1 - distinct/total (0 for
    * empty). Over a token array this is the crude repetition signal.
    */
  def dupFracFromArray(arr: Column): Column = {
    val n = size(arr)
    when(n === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(arr)).cast(DoubleType) / n.cast(DoubleType))
  }

  /** Highest single-element frequency / array size (0 for empty): over
    * tokens it catches one-word loops, over bigrams it catches phrase
    * loops (the Gopher "top n-gram fraction" rule). Computed as the
    * longest equal-run of the SORTED array via one aggregate() scan —
    * O(n log n) per row instead of the naive O(distinct×n) count-per-
    * distinct-element form (which measured 4 s at sf0.1: a quadratic
    * per-row expression is a real cost at 100-token docs × millions of
    * rows). Map-only, no shuffle; string arrays only (the accumulator
    * carries a string `prev`).
    */
  def topFracFromArray(arr: Column): Column = {
    val n = size(arr)
    val init = struct(lit(0).as("run"), lit(0).as("best"),
      lit(null).cast(StringType).as("prev"))
    val best = aggregate(array_sort(arr), init,
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          x.as("prev"))
      },
      acc => acc.getField("best"))
    when(n === 0, lit(0.0))
      .otherwise(best.cast(DoubleType) / n.cast(DoubleType))
  }

  /** Adjacent-token bigram array (NOT distinct — frequencies matter here;
    * [] for docs with fewer than 2 tokens). Stage as its own projection
    * before feeding topFracFromArray.
    */
  def bigramsFromTokens(toks: Column): Column =
    when(size(toks) < 2, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", try_element_at(toks, i),
          try_element_at(toks, i + 1))))

  // ---- PII detection (regex class counts + redaction) ----
  // Patterns are deliberately lookaround-free so they mean the same thing
  // to Java regex (Spark) and RE2 (DuckDB/common scale engines); the
  // oracle SQL is built from these SAME constants.

  val PiiEmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** All PII classes as one alternation (email first: an email can embed
    * digit runs that the narrower patterns might otherwise claim).
    */
  val PiiAnyPattern: String =
    s"$PiiEmailPattern|$PiiIpv4Pattern|$PiiPhonePattern"

  def piiMatchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** The text with every PII match replaced by a fixed tag — the
    * redaction pass a curation pipeline ships; one regex scan per row,
    * fused into the document scan.
    */
  def piiRedact(text: Column, tag: String = "<PII>"): Column =
    regexp_replace(text, lit(PiiAnyPattern), lit(tag))

  /** Language-ID by stopword voting: the language whose stopword list hits
    * the most tokens wins; ties resolve in LangStopwords order; zero hits
    * → 'und' (undetermined). A classic n-gram-free heuristic that runs as
    * one codegen'd CASE chain over the staged token array.
    */
  def langIdFromTokens(toks: Column): Column = {
    val scores = LangStopwords.map { case (lang, words) =>
      lang -> tokenCountInFromTokens(toks, words)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val chain = scores.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (lang, score)) => acc.when(score === best, lit(lang))
    }
    chain.otherwise(lit("und"))
  }

  // ---- single-metric text overloads (each tokenizes once; do NOT compose
  // several of these in one select — stage tokenArray instead) ----

  def tokenCount(text: Column): Column =
    tokenCountFromTokens(tokenArray(text))

  def tokenCountIn(text: Column, words: Seq[String]): Column =
    tokenCountInFromTokens(tokenArray(text), words)

  def stopwordRatio(text: Column): Column =
    stopwordRatioFromTokens(tokenArray(text))

  def avgTokenLen(text: Column): Column =
    avgTokenLenFromTokens(tokenArray(text))

  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(tokenArray(text))

  def langId(text: Column): Column =
    langIdFromTokens(tokenArray(text))

  /** BPE-ish pre-tokenization count: letter runs, digit runs, and single
    * punctuation marks — the segmentation BPE vocabularies split on before
    * merges. A cheap, deterministic proxy for "how many tokens will the
    * tokenizer emit", good for corpus budgeting without a vocab file.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** The vocab-file merge table for the REAL BPE count: `left right`
    * pairs, rank = line order — the standard merges.txt layout (minus the
    * version header). The shipped fixture is a small hand-authored table
    * over common English digraphs; swap the resource for a production
    * vocab's merges to budget against a real tokenizer.
    */
  lazy val DefaultBpeRanks: Map[String, Int] = loadBpeMerges("/graft/bpe_merges.txt")

  def loadBpeMerges(resource: String): Map[String, Int] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing BPE merges resource $resource")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .zipWithIndex.toMap
    finally in.close()
  }

  /** Vocab-driven BPE token count (graft.functions.BpeTokenCount): the
    * exact number of tokens a BPE tokenizer with this merge table emits —
    * the real version of the [[bpeTokenCount]] regex proxy, for when the
    * token budget must match a specific tokenizer.
    */
  def bpeTokenCountReal(text: Column,
      ranks: Map[String, Int] = DefaultBpeRanks): Column =
    graft.functions.BpeTokenCount.bpe_token_count(text, ranks)

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

  /** Canonical text normalization for dedup keys: lowercase, collapse
    * every whitespace run to a single space, trim. Exact dedup over the
    * normalized form catches casing/whitespace near-identicals that byte
    * equality misses — the standard first rung of the dedup ladder, and
    * cheap enough to fuse into the scan.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprints: MD5 (cross-engine-stable, oracle-checkable) and
    * the custom codegen'd rolling hash (graft.functions.RollingHash).
    */
  def md5Fingerprint(text: Column): Column = md5(text.cast(BinaryType))

  def rollingFingerprint(text: Column): Column =
    graft.functions.RollingHash.rolling_hash(text)

  // ---- winnowing (local) fingerprints ----

  /** Winnowing policy knobs (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
    * token-gram width, selection window, and the md5-fold width of the
    * gram hash. The fold is the [[Sampling.PriorityChars]] discipline —
    * portable to any engine with md5/ascii/substr — and its headroom is a
    * hard constraint: hash < 102·(128^5−1)/127 ≈ 2.8e10, so
    * hash·2^20 + pos < 2^56 stays well inside BIGINT.
    */
  val WinnowGram = 4
  val WinnowWindow = 5
  val WinnowFoldChars = 5
  /** Position field width: packs (hash, rightmost-pos) into ONE BIGINT so
    * a plain window `min` performs the winnowing argmin with the paper's
    * rightmost-min tie-break (larger pos ⇒ smaller packed value). Bounds
    * documents at 2^20 grams — beyond that the packing is rejected loudly
    * (raise_error), not silently misordered.
    */
  val WinnowPosField = 1048576L

  /** Winnowing document fingerprints: for every window of
    * [[WinnowWindow]] consecutive [[WinnowGram]]-token gram hashes, select
    * the minimal hash (rightmost on ties); the distinct selected
    * (position, hash) pairs are the document's fingerprints — the
    * guarantee is that any shared substring of length ≥ gram+window−1
    * tokens yields at least one shared fingerprint, at ~1/window the
    * density of the full gram set. Leading partial windows are included
    * (positions 0..w−2 select over the prefix), so every document with ≥
    * gram tokens gets ≥ 1 fingerprint.
    *
    * Plan: gram generate + hash are map-side; the selection is ONE window
    * min partitioned by doc (per-doc sequences, shuffle-parallel — no
    * global order anywhere); distinct is a (doc, packed)-keyed partial
    * agg. At 100 TB this is the standard fingerprint-index build: one
    * corpus pass, output ≈ corpus/window grams.
    */
  def winnowFingerprints(docs: DataFrame, textCol: String = "text")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), tokenArray(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= WinnowGram)
    val grams = toks.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), size(col("__t")) - WinnowGram),
        i => concat_ws(" ", (0 until WinnowGram)
          .map(j => element_at(col("__t"), i + j + 1)): _*)))
        .as(Seq("pos", "gram")))
    val hex = md5(col("gram").cast(BinaryType))
    val h = (1 to WinnowFoldChars)
      .map(i => ascii(substring(hex, i, 1)).cast(LongType) *
        lit(math.pow(128, i - 1).toLong))
      .reduce(_ + _)
    val packed = when(col("pos") >= lit(WinnowPosField),
      raise_error(lit(s"winnowing position field overflow: document has " +
        s">= $WinnowPosField grams")))
      .otherwise(h * lit(WinnowPosField) +
        (lit(WinnowPosField - 1) - col("pos")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(WinnowWindow - 1), 0)
    grams
      .withColumn("__sel", min(packed).over(w))
      .select(col("doc_id"), col("__sel")).distinct()
      .select(col("doc_id"),
        (lit(WinnowPosField - 1) - (col("__sel") % lit(WinnowPosField)))
          .cast(IntegerType).as("pos"),
        call_function("div", col("__sel"), lit(WinnowPosField))
          .cast(LongType).as("fp"))
  }

  /** Character-trigram LM surprisal — the language-model quality-scoring
    * rung of the curation ladder (the CCNet/Gopher pipelines score docs
    * by LM perplexity; this is the engine-portable form): a conditional
    * char-trigram model TRAINED ON THE CORPUS ITSELF (count(c₁c₂c₃) over
    * count(c₁c₂)), each position's surprisal −log₂ P̂ QUANTIZED to whole
    * bits as bitlength(c₂cnt + 16) − bitlength(c₃cnt + 1) (add-1 /
    * add-16 smoothing; c₃ ≤ c₂ makes the difference non-negative), and
    * the doc score the average bits per trigram. The ±1-bit
    * quantization is deliberate, not a limitation dodge: true float
    * log-probs fold through `log`, which is NOT correctly rounded by
    * IEEE (unlike the sqrt the cosine family leans on), so no
    * cross-engine oracle could hold bit-exactly — bitlength keeps every
    * operand an exact integer until the single final DOUBLE division
    * (the repo-wide exactness discipline), and rank correlation with
    * the float score is near-perfect at the corpus level. Outliers read
    * the same either way: repetitive/boilerplate docs score LOW bits,
    * character-noise docs score HIGH.
    *
    * Plan: two corpus passes build the two count frames (partial-agg
    * groupBy; both are MODEL-sized — bounded by |charset|³ distinct
    * keys, the k-centroids discipline — so they BROADCAST into the
    * per-position join), then one map-side join pass re-aggregates
    * per-doc with exact BIGINT sums (no ordered float fold anywhere).
    * Docs with < 3 chars carry NULL scores through a left join-back —
    * curation must see every doc, not just scoreable ones.
    */
  def trigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("__id"), col(textCol).as("__t"))
    // split to a code-point array ONCE (the llm_bigram_lm lesson:
    // substring(text, i, 3) inside the transform re-scans the UTF-8
    // string from the start per position — O(len²) on long docs), and
    // compact to per-doc gram counts before anything joins
    def charArr(d: DataFrame, minLen: Int) =
      d.filter(length(col("__t")) >= minLen)
        .withColumn("__c", split(col("__t"), ""))
    def gram(n: Int) = (i: Column) =>
      concat((0 until n).map(j => try_element_at(col("__c"), i + j)): _*)
    val h3 = charArr(base, 3)
      .select(col("__id"), explode(transform(
        sequence(lit(1), size(col("__c")) - 2), gram(3))).as("tri"))
      .groupBy("__id", "tri").agg(count(lit(1)).as("k"))
      .localCheckpoint(true) // feeds BOTH the c3 model and the score join
    val big = charArr(base, 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__c")) - 1), gram(2))).as("ctx"))
    val c3 = h3.groupBy("tri").agg(sum(col("k")).as("c3"))
    val c2 = big.groupBy("ctx").agg(count(lit(1)).as("c2"))
    val scored = h3
      .withColumn("ctx", substring(col("tri"), 1, 2))
      .join(broadcast(c3), Seq("tri"))
      .join(broadcast(c2), Seq("ctx"))
      .withColumn("bits",
        (length(bin(col("c2") + 16)) - length(bin(col("c3") + 1)))
          .cast(LongType))
      .groupBy(col("__id"))
      .agg(sum(col("k")).as("n_trigrams"),
        sum(col("k") * col("bits")).as("surprisal_bits"))
    base.select(col("__id"))
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        col("n_trigrams"), col("surprisal_bits"),
        (col("surprisal_bits").cast(DoubleType) /
          col("n_trigrams").cast(DoubleType)).as("avg_surprisal_bits"))
  }

  /** Full per-document profile — tokenizes each document exactly once via
    * the staged `__toks` projection.
    */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .select(col("doc_id"), t.as("__text"), tokenArray(t).as("__toks"))
      .select(
        col("doc_id"),
        tokenCountFromTokens(col("__toks")).as("n_tokens"),
        length(col("__text")).as("n_chars"),
        avgTokenLenFromTokens(col("__toks")).as("avg_token_len"),
        stopwordRatioFromTokens(col("__toks")).as("stopword_ratio"),
        qualityScoreFromTokens(col("__toks")).as("quality_score"),
        langIdFromTokens(col("__toks")).as("lang_pred"),
        md5Fingerprint(col("__text")).as("fp_md5"))
  }
}
