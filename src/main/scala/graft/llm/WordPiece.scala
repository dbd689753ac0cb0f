package graft.llm

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** WordPiece vocabulary learning — the train side of
  * [[graft.functions.WordPieceMeta]]'s greedy inference, by the
  * frequency-threshold construction (the likelihood-based trainer of the
  * original paper needs an LM; public practice for subword vocabularies
  * on counts alone is frequency selection, which is what this learns):
  *
  *  - the word stream is the BPE queries' `[A-Za-z]+|[0-9]+` class
  *    (letter runs / digit runs; cross-engine-safe segmentation — no
  *    UTF-16-vs-codepoint divergence can reach the oracle);
  *  - candidate WORD-INITIAL pieces are word prefixes of length
  *    2..MaxPieceLen (a whole short word is its own length-len(word)
  *    prefix, so frequent words become single tokens); candidate
  *    CONTINUATION pieces are word suffixes of the same lengths,
  *    "##"-prefixed, from strictly longer words (a continuation can
  *    never be the whole word);
  *  - a candidate enters the vocabulary iff its occurrence-weighted
  *    count clears 0.5% of the total word count — integer arithmetic
  *    (cnt·200 ≥ N), exact in both engines;
  *  - all 62 ASCII alphanumeric single characters are in both piece
  *    classes unconditionally (the fallback floor — with it, [UNK] can
  *    only arise from the MaxWordLen rule).
  *
  * DRIVER BOUND (the kmeans-centroids/BPE-candidates discipline): for
  * any (class, length) pair the candidates' counts sum to ≤ N, so at
  * most 200 candidates per pair can clear N/200 — the learned
  * vocabulary is ≤ 200 · 2 · |2..6| = 2,000 pieces regardless of corpus
  * size. Learning is two hash aggregations over the word histogram
  * (corpus scanned once); at 100 TB the histogram is the only
  * corpus-sized frame and it shuffles on the word key.
  */
object WordPiece {

  val PieceLens: Range = 2 to graft.functions.WordPieceAlgo.MaxPieceLen

  /** The unconditional single-character floor of both piece classes. */
  val CharPieces: Seq[String] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).map(_.toString)

  /** Word histogram (word, freq) over the `[A-Za-z]+|[0-9]+` stream. */
  def wordHistogram(docs: DataFrame): DataFrame =
    docs.select(explode(
        expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learned multi-character vocabulary: (kind, piece, cnt) rows for
    * pieces clearing the threshold; kind ∈ {word_initial, continuation}.
    * The single-character floor is NOT listed — it is a constant of the
    * algorithm, not a learned artifact.
    */
  def learnedPieces(docs: DataFrame): DataFrame = {
    val hist = wordHistogram(docs)
    val tot = hist.agg(sum(col("freq")).as("n"))
    val pre = PieceLens.map { l =>
        hist.filter(length(col("word")) >= l)
          .select(substring(col("word"), 1, l).as("piece"), col("freq"))
      }.reduce(_ union _)
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .select(lit("word_initial").as("kind"), col("piece"), col("cnt"))
    val con = PieceLens.map { l =>
        hist.filter(length(col("word")) > l)
          .select(concat(lit("##"), substring(col("word"), -l, l)).as("piece"),
            col("freq"))
      }.reduce(_ union _)
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .select(lit("continuation").as("kind"), col("piece"), col("cnt"))
    pre.unionByName(con).crossJoin(F.broadcast(tot))
      .filter(col("cnt") * 200 >= col("n"))
      .select(col("kind"), col("piece"), col("cnt"))
  }

  /** Collect the learned vocabulary (≤ 2,000 rows by the threshold
    * bound) and return the match-ready piece lists, single-char floor
    * included: (wordInitial, continuation — "##"-prefixed).
    */
  def learnVocab(docs: DataFrame): (Seq[String], Seq[String]) = {
    val rows = learnedPieces(docs).collect()
    val init = rows.filter(_.getString(0) == "word_initial").map(_.getString(1))
    val cont = rows.filter(_.getString(0) == "continuation").map(_.getString(1))
    (init.toSeq ++ CharPieces, cont.toSeq ++ CharPieces.map("##" + _))
  }
}
