package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins UrlNormalize against HAND-WRITTEN URLs, including RFC 3986's own
  * worked examples (§5.2.4 dot-segments, §6.2.2 equivalence pairs) — not
  * round-tripped through the query's construction, so a matching
  * construct/parse bug cannot hide here. Covers case normalization,
  * default/empty/explicit ports, unreserved-escape decoding vs
  * reserved-escape case-folding, dot-segment removal incl. root
  * escapes and preserved empty segments, fragment stripping, userinfo,
  * IPv6 literals, and the malformed shapes that must yield NULL.
  */
class UrlNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*)
      : Seq[Option[(String, String, Int, String, Option[String], String)]] =
    urls.toSeq.toDF("u")
      .select(UrlNormalize.url_normalize(col("u")).as("m"))
      .select(col("m.scheme"), col("m.host"), col("m.port"), col("m.path"),
        col("m.query"), col("m.url"))
      .collect().map { r =>
        if (r.isNullAt(0)) None
        else Some((r.getString(0), r.getString(1), r.getInt(2),
          r.getString(3),
          if (r.isNullAt(4)) None else Some(r.getString(4)),
          r.getString(5)))
      }.toSeq

  test("scheme/host case, default port and fragment normalize away") {
    assert(norm(
      "HTTP://WWW.Example.COM:80/a/b.html?id=7#sec",
      "https://example.net",
      "http://example.org:/x", // empty port drops (§6.2.3)
      "https://cdn.example.org:8443/asset") == Seq(
      Some(("http", "www.example.com", 80, "/a/b.html", Some("id=7"),
        "http://www.example.com/a/b.html?id=7")),
      Some(("https", "example.net", 443, "/", None,
        "https://example.net/")),
      Some(("http", "example.org", 80, "/x", None, "http://example.org/x")),
      Some(("https", "cdn.example.org", 8443, "/asset", None,
        "https://cdn.example.org:8443/asset"))))
  }

  test("percent-encoding: unreserved decode, reserved uppercase, query kept") {
    assert(norm(
      "http://h.example/%7Euser/%41sset", // ~user / Asset (§6.2.2.2)
      "http://h.example/a%2fb",           // %2f is reserved '/': stays, upcased
      "http://h.example?q=%2c&x=%7e",     // empty path + query normalization
      "http://h.example/p?",              // '?' with empty query is kept
      "http://u%41ser@h.example/") == Seq(
      Some(("http", "h.example", 80, "/~user/Asset", None,
        "http://h.example/~user/Asset")),
      Some(("http", "h.example", 80, "/a%2Fb", None,
        "http://h.example/a%2Fb")),
      Some(("http", "h.example", 80, "/", Some("q=%2C&x=~"),
        "http://h.example/?q=%2C&x=~")),
      Some(("http", "h.example", 80, "/p", Some(""), "http://h.example/p?")),
      Some(("http", "h.example", 80, "/", None, "http://uAser@h.example/"))))
  }

  test("dot-segments remove per §5.2.4; root escapes clamp; empty segments stay") {
    assert(norm(
      "http://h.example/a/b/c/./../../g", // the RFC's own example → /a/g
      "http://h.example/a/../..//x",      // climbs past root, keeps //
      "http://h.example/items/42/.",      // trailing /. → trailing /
      "http://h.example/./a") == Seq(
      Some(("http", "h.example", 80, "/a/g", None, "http://h.example/a/g")),
      Some(("http", "h.example", 80, "//x", None, "http://h.example//x")),
      Some(("http", "h.example", 80, "/items/42/", None,
        "http://h.example/items/42/")),
      Some(("http", "h.example", 80, "/a", None, "http://h.example/a"))))
  }

  test("IPv6 literals lowercase and keep their port handling") {
    assert(norm(
      "http://[2001:DB8::1]/p",
      "https://[2001:db8::2]:8443/") == Seq(
      Some(("http", "[2001:db8::1]", 80, "/p", None,
        "http://[2001:db8::1]/p")),
      Some(("https", "[2001:db8::2]", 8443, "/", None,
        "https://[2001:db8::2]:8443/"))))
  }

  test("malformed and out-of-scope shapes yield NULL") {
    assert(norm(
      "ftp://files.example.com/x",   // non-http scheme
      "1http://bad-scheme.example",  // scheme must start with ALPHA
      "http:/missing-authority",
      "http://",                     // empty host
      "http://h.example:9x/",        // non-digit port
      "http://h.example:70000/",     // port > 65535
      "http://h.example/%zz",        // non-hex escape
      "http://h.example/%a",         // truncated escape
      "http://ex%41mple.com/",       // escaped host out of scope
      "http://bad host.example/",    // space in host
      "http://[2001:db8::1/p",       // unclosed IP-literal
      "just some document text") == Seq.fill(12)(None))
  }

  test("null input yields NULL") {
    val out = Seq((1L, null: String)).toDF("id", "u")
      .select(UrlNormalize.url_normalize(col("u")).as("m")).collect()
    assert(out(0).isNullAt(0))
  }
}
