package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins RobotsFilter's RFC 9309 group-matching semantics against
  * hand-written rule sets: longest-octets wins, allow beats disallow on
  * ties, `*` any-sequence and trailing-`$` anchor per §2.2.3, interior
  * `$` and regex metacharacters as literal octets, and the §2.2.1
  * default-allow for both rule-less hosts and hosts whose rules all
  * miss.
  */
class RobotsFilterSpec extends SparkSpec {
  import spark.implicits._

  private def decide(urls: Seq[(String, String)],
      rules: Seq[(String, String, String)]): Map[String, (String, String)] =
    RobotsFilter.decide(
      urls.toDF("host", "path"),
      rules.toDF("host", "directive", "pattern"))
      .collect()
      .map(r => (r.getString(0) + r.getString(1),
        (r.getString(2), Option(r.getString(3)).getOrElse("-")))).toMap

  test("longest pattern wins; allow beats disallow on octet ties") {
    val rules = Seq(
      ("h", "disallow", "/a/"),
      ("h", "allow", "/a/b/"),     // longer: /a/b/... is allowed
      ("h", "allow", "/a/c"),      // equal-length pair: allow wins
      ("h", "disallow", "/a/c"))
    assert(decide(Seq(("h", "/a/x"), ("h", "/a/b/y"), ("h", "/a/c")),
      rules) == Map(
      "h/a/x" -> ("disallow", "/a/"),
      "h/a/b/y" -> ("allow", "/a/b/"),
      "h/a/c" -> ("allow", "/a/c")))
  }

  test("* matches any sequence; trailing $ anchors; interior $ is literal") {
    val rules = Seq(
      ("h", "disallow", "/files/*.pdf$"), // anchored wildcard
      ("h", "allow", "/files/"),
      ("h", "disallow", "/pay$ment"))     // interior $: literal octet
    assert(decide(Seq(
      ("h", "/files/a.pdf"),       // *.pdf$ (12) beats /files/ (7)
      ("h", "/files/a.pdfx"),      // $ stops the match -> /files/ allow
      ("h", "/files/deep/b.pdf"),  // * spans segments
      ("h", "/pay$mentX"),         // literal $ in path matches
      ("h", "/payment")), rules) == Map(  // no literal $ -> no rule -> default
      "h/files/a.pdf" -> ("disallow", "/files/*.pdf$"),
      "h/files/a.pdfx" -> ("allow", "/files/"),
      "h/files/deep/b.pdf" -> ("disallow", "/files/*.pdf$"),
      "h/pay$mentX" -> ("disallow", "/pay$ment"),
      "h/payment" -> ("allow", "-")))
  }

  test("regex metacharacters in patterns are literal octets") {
    val rules = Seq(
      ("h", "disallow", "/a.b"),   // '.' must not match X
      ("h", "disallow", "/c+d"),
      ("h", "disallow", "/e(f)g"))
    assert(decide(Seq(("h", "/a.b/x"), ("h", "/aXb/x"), ("h", "/c+d"),
      ("h", "/ccd"), ("h", "/e(f)g")), rules) == Map(
      "h/a.b/x" -> ("disallow", "/a.b"),
      "h/aXb/x" -> ("allow", "-"),
      "h/c+d" -> ("disallow", "/c+d"),
      "h/ccd" -> ("allow", "-"),
      "h/e(f)g" -> ("disallow", "/e(f)g")))
  }

  test("default allow: rule-less host, and host whose rules all miss") {
    val rules = Seq(("h", "disallow", "/private/"))
    assert(decide(Seq(("h", "/public/x"), ("other", "/anything")), rules) ==
      Map("h/public/x" -> ("allow", "-"),
        "other/anything" -> ("allow", "-")))
  }

  test("duplicate input rows each keep their verdict (cardinality preserved)") {
    // The argmax partitions on a pre-join row id, not the url columns —
    // two identical rows must yield two identical output rows.
    val rules = Seq(("h", "disallow", "/a/"))
    val out = RobotsFilter.decide(
      Seq(("h", "/a/x"), ("h", "/a/x"), ("h", "/b")).toDF("host", "path"),
      rules.toDF("host", "directive", "pattern"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._2)
    assert(out.toSeq == Seq(
      ("h", "/a/x", "disallow"), ("h", "/a/x", "disallow"),
      ("h", "/b", "allow")))
  }

  test("rules are per-host: another host's rules never apply") {
    val rules = Seq(("a", "disallow", "/x/"), ("b", "allow", "/x/"))
    assert(decide(Seq(("a", "/x/1"), ("b", "/x/1")), rules) ==
      Map("a/x/1" -> ("disallow", "/x/"), "b/x/1" -> ("allow", "/x/")))
  }
}
