package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins WordPieceMeta's greedy longest-match-first semantics against
  * HAND-WRITTEN vocabularies (floor-less where the case needs the
  * stuck-word path the driver queries' unconditional char floor makes
  * unreachable): the canonical un/##aff/##able example, longest-match
  * priority, the word-initial vs continuation asymmetry, both [UNK]
  * paths (stuck mid-word, stuck at start, over-MaxWordLen), and the
  * letter-run/digit-run pre-tokenization split.
  */
class WordPieceMetaSpec extends SparkSpec {
  import spark.implicits._

  private def meta(init: Seq[String], cont: Seq[String], texts: String*)
      : Seq[(Int, Int, Int)] =
    texts.toSeq.toDF("t")
      .select(WordPieceMeta.wordpiece_meta(col("t"), init, cont).as("m"))
      .select(col("m.n_words"), col("m.n_tokens"), col("m.n_unk"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq

  test("canonical greedy segmentation: unaffable -> un ##aff ##able") {
    assert(meta(Seq("un"), Seq("##aff", "##able"), "unaffable") ==
      Seq((1, 3, 0)))
  }

  test("longest match wins over shorter prefixes") {
    // inter(5) beats in(2); ##ternet can never apply after it
    assert(meta(Seq("in", "inter"), Seq("##net", "##ternet"), "internet") ==
      Seq((1, 2, 0)))
  }

  test("a word-initial piece does not match in continuation position") {
    // 'able' is word-initial only: after 'un' it must fall to chars
    assert(meta(Seq("un", "able"), Seq("##a", "##b", "##l", "##e"),
      "unable able") == Seq((2, 6, 0)))
  }

  test("no matching piece anywhere -> the whole word is one [UNK]") {
    assert(meta(Seq("x"), Seq.empty, "xyz") == Seq((1, 1, 1)))
    assert(meta(Seq.empty, Seq.empty, "qrs") == Seq((1, 1, 1)))
  }

  test("words beyond MaxWordLen are [UNK] even with a full floor") {
    val floor = graft.llm.WordPiece.CharPieces
    val cont = floor.map("##" + _)
    val w17 = "a" * (WordPieceAlgo.MaxWordLen + 1)
    val w16 = "a" * WordPieceAlgo.MaxWordLen
    assert(meta(floor, cont, s"$w17 $w16") == Seq((2, 17, 1)))
  }

  test("letter runs and digit runs are separate words; marks separate") {
    val floor = graft.llm.WordPiece.CharPieces
    val cont = floor.map("##" + _)
    assert(meta(floor, cont, "abc123 abc", "x-9", "!!!", "") ==
      Seq((3, 9, 0), (2, 2, 0), (0, 0, 0), (0, 0, 0)))
  }

  test("a frequent whole word in vocab is a single token") {
    assert(meta(Seq("hello"), Seq.empty, "hello hello") == Seq((2, 2, 0)))
  }

  test("pieces longer than the trained default (6) are reachable") {
    // The probe bound is derived from the vocab, so a 10-char
    // word-initial piece and a 9-char continuation piece both match —
    // under a fixed 6-char cap "unbreakable" would greedily take "un"
    // and then get stuck ([UNK]) instead of the intended 2-token split.
    assert(meta(Seq("un", "unbreakab"), Seq("##le", "##breakable"),
      "unbreakable") == Seq((1, 2, 0)))
    assert(meta(Seq("unbreakabl"), Seq("##e"), "unbreakable") ==
      Seq((1, 2, 0)))
  }

  test("null input yields NULL") {
    val out = Seq((1L, null: String)).toDF("id", "t")
      .select(WordPieceMeta
        .wordpiece_meta(col("t"), Seq("a"), Seq.empty).as("m")).collect()
    assert(out(0).isNullAt(0))
  }
}
