package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins UnigramMeta's Viterbi semantics against HAND-COMPUTED DPs over
  * tiny vocabularies: min-cost beats greedy longest-match, cost ties
  * resolve to fewer tokens (the packed low-bits rule), both [UNK] paths
  * (infeasible position, over-MaxWordLen), unkCost accounting, the
  * derived piece bound (pieces longer than any trained default remain
  * reachable), letter-run/digit-run pre-tokenization, and null/empty.
  */
class UnigramMetaSpec extends SparkSpec {
  import spark.implicits._

  private def meta(vocab: Seq[(String, Int)], unkCost: Int, texts: String*)
      : Seq[(Int, Int, Int, Long)] =
    texts.toSeq.toDF("t")
      .select(UnigramMeta.unigram_meta(col("t"), vocab, unkCost).as("m"))
      .select(col("m.n_words"), col("m.n_tokens"), col("m.n_unk"),
        col("m.total_cost"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSeq

  test("Viterbi min-cost beats greedy longest-match") {
    // greedy takes abc(9)+d(6)=15; the DP finds ab(7)+cd(7)=14
    val v = Seq("ab" -> 7, "abc" -> 9, "cd" -> 7, "d" -> 6)
    assert(meta(v, 99, "abcd") == Seq((1, 2, 0, 14L)))
  }

  test("cost ties resolve to FEWER tokens (packed low-bits rule)") {
    // aaaa: aa+aa = (12, 2), a*4 = (12, 4), aa+a+a = (12, 3)
    val v = Seq("aa" -> 6, "a" -> 3)
    assert(meta(v, 99, "aaaa") == Seq((1, 2, 0, 12L)))
  }

  test("infeasible words are one [UNK] at unkCost") {
    val v = Seq("a" -> 6, "b" -> 6)
    // "ab" fine (12); "axb" has no piece covering x -> whole word UNK
    assert(meta(v, 99, "ab axb") == Seq((2, 3, 1, 12L + 99L)))
  }

  test("words beyond MaxWordLen are [UNK] even with a full floor") {
    val v = Seq("a" -> 6)
    val w16 = "a" * UnigramAlgo.MaxWordLen
    val w17 = "a" * (UnigramAlgo.MaxWordLen + 1)
    assert(meta(v, 99, w16) == Seq((1, 16, 0, 96L)))
    assert(meta(v, 99, w17) == Seq((1, 1, 1, 99L)))
  }

  test("pieces longer than any trained default are reachable (derived bound)") {
    val v = Seq("abcdefgh" -> 9, "a" -> 6, "b" -> 6, "c" -> 6, "d" -> 6,
      "e" -> 6, "f" -> 6, "g" -> 6, "h" -> 6)
    // the 8-char piece (9) beats eight chars (48)
    assert(meta(v, 99, "abcdefgh") == Seq((1, 1, 0, 9L)))
  }

  test("letter runs and digit runs split into separate words") {
    val v = Seq("ab" -> 7, "12" -> 7)
    assert(meta(v, 99, "ab12 ab-12", "!!!", "") ==
      Seq((4, 4, 0, 28L), (0, 0, 0, 0L), (0, 0, 0, 0L)))
  }

  test("overlapping pieces: the dp explores interior splits") {
    // "ther": t+her = 6+10 = 16 vs th+er = 7+8 = 15 vs the+r = 9+6 = 15
    // min cost 15 twice, both 2 tokens -> (15, 2)
    val v = Seq("t" -> 6, "h" -> 6, "e" -> 6, "r" -> 6,
      "th" -> 7, "he" -> 7, "er" -> 8, "the" -> 9, "her" -> 10)
    assert(meta(v, 99, "ther") == Seq((1, 2, 0, 15L)))
  }

  test("null input yields NULL") {
    val out = Seq((1L, null: String)).toDF("id", "t")
      .select(UnigramMeta
        .unigram_meta(col("t"), Seq("a" -> 1), 9).as("m")).collect()
    assert(out(0).isNullAt(0))
  }

  test("cost bounds are enforced at construction") {
    intercept[IllegalArgumentException] {
      meta(Seq("a" -> 0), 99, "a")
    }
    intercept[IllegalArgumentException] {
      meta(Seq("a" -> 1001), 99, "a")
    }
    intercept[IllegalArgumentException] {
      meta(Seq("" -> 5), 99, "a")
    }
  }
}
