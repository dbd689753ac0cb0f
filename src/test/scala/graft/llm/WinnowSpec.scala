package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins TextAnalysis.winnowFingerprints against the winnowing CONTRACT
  * (Schleimer, Wilkerson & Aiken 2003) rather than a reimplementation:
  *
  *  - correctness of each fingerprint: (pos, fp) must equal the md5-fold
  *    hash of the gram actually at that position (recomputed from
  *    scratch in JVM code, no Spark expressions);
  *  - the coverage guarantee: every window of w consecutive gram
  *    positions contains at least one selected fingerprint position —
  *    this is the property that makes shared passages of >= k+w-1 tokens
  *    detectable;
  *  - the detection guarantee end-to-end: two documents sharing such a
  *    passage share at least one fingerprint HASH;
  *  - the rightmost-min tie-break on a doc of identical tokens (all gram
  *    hashes equal — every window must select its RIGHTMOST position);
  *  - the packing guard: a document at the 2^20-gram position bound
  *    fails loudly instead of silently misordering.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = TextAnalysis.WinnowGram
  private val W = TextAnalysis.WinnowWindow

  /** From-scratch md5-fold gram hash — java.security, no Spark. */
  private def foldHash(gram: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (1 to TextAnalysis.WinnowFoldChars)
      .map(i => hex.charAt(i - 1).toLong * math.pow(128, i - 1).toLong)
      .sum
  }

  private def grams(text: String): Seq[String] = {
    val t = text.trim.split("\\s+").toSeq
    if (t.size < K) Seq.empty
    else (0 to t.size - K).map(i => t.slice(i, i + K).mkString(" "))
  }

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Int, Long)] =
    TextAnalysis.winnowFingerprints(docs.toDF("doc_id", "text"))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  private val Doc1 =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm mat near the door and the bird sings in the tree"
  private val Passage =
    "alpha beta gamma delta epsilon zeta eta theta" // k+w-1 = 8 tokens

  test("every fingerprint is the hash of the gram at its position") {
    val docs = Seq((1L, Doc1), (2L, Passage), (3L, "too few toks"))
    val out = run(docs)
    assert(out.nonEmpty)
    val byDoc = docs.toMap
    out.foreach { case (id, pos, fp) =>
      val g = grams(byDoc(id))
      assert(pos >= 0 && pos < g.size, s"doc $id pos $pos out of range")
      assert(fp === foldHash(g(pos)),
        s"doc $id pos $pos: fp $fp != hash of '${g(pos)}'")
    }
    // a doc with < k tokens yields no fingerprints at all
    assert(!out.exists(_._1 == 3L))
  }

  test("coverage: every w-window of positions holds >= 1 fingerprint") {
    val out = run(Seq((1L, Doc1)))
    val positions = out.map(_._2).toSet
    val nGrams = grams(Doc1).size
    (0 until nGrams).foreach { t =>
      val window = (math.max(0, t - W + 1) to t)
      assert(window.exists(positions.contains),
        s"no fingerprint selected in window ending at $t")
    }
  }

  test("shared >= k+w-1-token passage => shared fingerprint hash") {
    val d1 = s"completely unrelated prefix words here $Passage and a tail"
    val d2 = s"$Passage followed by other totally different content words"
    val out = run(Seq((1L, d1), (2L, d2)))
    val h1 = out.filter(_._1 == 1L).map(_._3).toSet
    val h2 = out.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty,
      "documents sharing an 8-token passage must share a fingerprint")
  }

  test("identical-token doc: rightmost-min tie-break selects every " +
    "window's last position") {
    // all grams identical => all hashes tie => the packed key's inverted
    // position field must make each window pick its rightmost gram, so
    // EVERY position is selected (each window ends at a fresh rightmost)
    val n = 12
    val out = run(Seq((1L, Seq.fill(n)("tok").mkString(" "))))
    val nGrams = n - K + 1
    assert(out.map(_._2) === (0 until nGrams))
    assert(out.map(_._3).distinct.size === 1)
  }

  test("position-field overflow fails loudly") {
    val big = Seq.fill(TextAnalysis.WinnowPosField.toInt + K)("x")
      .mkString(" ")
    val e = intercept[Exception] {
      TextAnalysis.winnowFingerprints(Seq((1L, big)).toDF("doc_id", "text"))
        .count()
    }
    assert(e.getMessage != null)
  }
}
