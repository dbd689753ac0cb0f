package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins CachedRLike as a drop-in for the builtin `rlike` over
  * NON-FOLDABLE patterns: same unanchored-find semantics (checked
  * differentially against the builtin on a battery of string/pattern
  * pairs including anchors, wildcards, escapes, and non-matches), same
  * null behavior, and re-use of one pattern across rows (the cache path
  * must not corrupt matcher state between rows).
  */
class CachedRLikeSpec extends SparkSpec {
  import spark.implicits._

  test("agrees with builtin rlike on a mixed battery, pattern per row") {
    val rows = Seq(
      ("/files/a.pdf", "^/files/.*\\.pdf$"),
      ("/files/a.pdfx", "^/files/.*\\.pdf$"),
      ("abc", "b"),            // unanchored find, mid-string
      ("abc", "^b"),           // anchored miss
      ("abc", "^a.c$"),
      ("a.c", "^a\\.c$"),
      ("axc", "^a\\.c$"),
      ("", "^$"),
      ("x", ""),               // empty pattern matches everywhere
      ("pay$ment", "^pay\\$ment"),
      ("日本語", "本"))
    val out = rows.toDF("s", "p")
      .select(CachedRLike.cached_rlike(col("s"), col("p")).as("c"),
        expr("regexp_like(s, p)").as("b"))
      .collect()
    out.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1),
      s"mismatch on row $r"))
  }

  test("null on either side is null") {
    val out = Seq((null: String, "a"), ("a", null: String),
        (null: String, null: String))
      .toDF("s", "p")
      .select(CachedRLike.cached_rlike(col("s"), col("p")).as("c"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("one pattern reused across many rows matches consistently") {
    // Exercises the cache-hit path: after the first row the compiled
    // Pattern is shared; Matcher instances must be fresh per call.
    val n = 1000
    val out = (0 until n).map(i => (s"item$i", "^item\\d+$"))
      .toDF("s", "p")
      .select(CachedRLike.cached_rlike(col("s"), col("p")).as("c"))
      .collect()
    assert(out.forall(_.getBoolean(0)))
  }
}
