package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins FuzzyJoin.pairsWithin1 against a brute-force all-pairs
  * Levenshtein oracle: the deletion-neighborhood blocking must have
  * PERFECT recall at distance ≤ 1 (substitution shares the common
  * deletion; insert/delete shares the shorter string; identical strings
  * share every key) and the verify step perfect precision (distance-2
  * candidates that share a key — delete+insert pairs — must be
  * filtered). Edge cases: empty strings (pair with 1-char strings at
  * distance 1 and with each other at 0), identical strings under
  * distinct ids, and a distance-2 pair that DOES share a deletion key.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def check(strs: Seq[String]): Unit = {
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val got = FuzzyJoin.pairsWithin1(df, col("id"), col("s"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      i <- strs.indices; j <- strs.indices
      if i < j && lev(strs(i), strs(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got === want)
  }

  test("recall + precision vs brute force on mixed edit shapes") {
    check(Seq(
      "alpha", "alpja",      // substitution
      "beta", "betta",       // insertion
      "gamma", "gamm",       // deletion
      "delta", "delta",      // identical under distinct ids
      "ab", "ba",            // distance 2 sharing deletion keys ("a","b")
      "x", "", "y",          // ""~"x"/""~"y" at 1; "x"~"y" at 1 via key ""
      "unrelatedzzz"))
  }

  test("distance-2 delete+insert candidates are filtered by the verify") {
    // "abcd" vs "bcde": share deletion-derived context? lev = 2 —
    // must NOT pair. "abc"/"acb" transposition is lev 2 — must not pair.
    check(Seq("abcd", "bcde", "abc", "acb"))
  }

  test("empty-string guard: no fabricated keys from sequence(1, 0)") {
    check(Seq("", "", "a"))
  }

  test("duplicate-heavy corpus: full cross-multiplicity pairs, " +
    "orientation follows the ids") {
    // a distance-1 chain with multiplicities: 4 copies of "entity", 3 of
    // "entitx" (1 from entity), 2 of "entixx" (1 from entitx, 2 from
    // entity). Pairs: every same-string pair (C(4,2)+C(3,2)+C(2,2) = 10),
    // full cross-multiplicity for both adjacent string pairs (4·3 + 3·2),
    // nothing across the distance-2 ends — and str_a/str_b must follow
    // id order even where the string pair was discovered in the other
    // orientation
    val strs = Seq.fill(4)("entity") ++ Seq.fill(3)("entitx") ++
      Seq.fill(2)("entixx")
    check(strs)
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val out = FuzzyJoin.pairsWithin1(df, col("id"), col("s"))
      .select("id_a", "str_a", "id_b", "str_b")
      .as[(Long, String, Long, String)].collect()
    assert(out.length === 10 + 12 + 6)
    val byId = strs.zipWithIndex.map { case (s, i) => i.toLong -> s }.toMap
    out.foreach { case (ia, sa, ib, sb) =>
      assert(ia < ib)
      assert(sa === byId(ia), s"str_a of ($ia,$ib)")
      assert(sb === byId(ib), s"str_b of ($ia,$ib)")
    }
  }
}
