package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins HtmlText against HAND-WRITTEN page-shaped vectors — nested
  * tags, attributes with quoted `>`/`<`, script/style with markup-like
  * content, comments, CDATA, the entity battery (named, numeric
  * dec/hex, astral, surrogate, unknown, unterminated), and every
  * broken-markup degrade path — not round-tripped through the query's
  * construction, so a matching construct/extract bug cannot hide here
  * (the UrlNormalizeSpec discipline). Also pins WarcPayloads: payload
  * bytes round-trip, and it NULLs on exactly the inputs WarcRecords
  * NULLs on (the two share one strictness gate).
  */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def ext(htmls: String*): Seq[String] =
    htmls.toSeq.toDF("h")
      .select(HtmlText.html_text(col("h")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("full page: doctype/script/style/comment stripped, text kept, " +
    "tags become word boundaries") {
    assert(ext(
      "<!DOCTYPE html><html><head><title>T</title>" +
        "<script type=\"text/javascript\">if (1 < 2) { x = \"</div>\"; }" +
        "</script><style>p > a { color: red; }</style></head>" +
        "<body><h1>Heading</h1><p>one</p><p>two</p></body></html>"
    ) == Seq("T Heading one two"))
  }

  test("nested inline tags do not glue words; bare < is literal text") {
    assert(ext(
      "a<b>b</b>c <span>x<em>y</em>z</span>",
      // <9 is NOT a tag open (digit) — browsers render it as text too
      "3 < 5 and 7 <9> done"
    ) == Seq("a b c x y z", "3 < 5 and 7 <9> done"))
  }

  test("quoted attribute values may contain > and <") {
    assert(ext(
      """<a title="a>b" href='c<d'>link</a>tail"""
    ) == Seq("link tail"))
  }

  test("script close tag must be a real close tag") {
    // </scripty> does NOT close the block; the real </script > does
    assert(ext(
      "<script>var s = '</scripty>';</script >after"
    ) == Seq("after"))
  }

  test("case-insensitive SCRIPT/STYLE/CDATA/comment") {
    assert(ext(
      "<SCRIPT>x</SCRIPT>a<STYLE>y</STYLE>b<!-- c -->d"
    ) == Seq("a b d"))
  }

  test("CDATA content is raw character data: no tag strip, no entity " +
    "decode") {
    assert(ext(
      "pre <![CDATA[ <b>&amp;</b> ]]> post"
    ) == Seq("pre <b>&amp;</b> post"))
  }

  test("entity battery: named, numeric dec/hex, astral; nbsp collapses") {
    assert(ext(
      "&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos;",
      "A&#66;C &#x44;E",
      "emoji &#x1F642; end",
      "x&nbsp;&nbsp;y"
    ) == Seq("<tag> & \"q\" 'a'", "ABC DE", "emoji 🙂 end", "x y"))
  }

  test("invalid entities stay verbatim: unknown name, surrogate ref, " +
    "out-of-range, unterminated, bare ampersand") {
    assert(ext(
      "&unknown; &#xD800; &#1114112; &#x110000;",
      "a &# b &#x; c &amp d & e"
    ) == Seq("&unknown; &#xD800; &#1114112; &#x110000;",
      "a &# b &#x; c &amp d & e"))
  }

  test("broken markup degrades deterministically") {
    assert(ext(
      "kept<script>var broken = \"",       // unterminated script -> EOF
      "kept<!-- never closed",             // unterminated comment -> EOF
      "kept<![CDATA[ rest is raw <b>",     // unterminated CDATA -> raw
      "kept<a href="                        // unterminated tag -> EOF
    ) == Seq("kept", "kept", "kept rest is raw <b>", "kept"))
  }

  test("whitespace canon and null/empty") {
    assert(ext(
      "  a\t\n b  c\r\n ",
      "",
      "<p></p>"
    ) == Seq("a b c", "", ""))
    val nulls = Seq(Option.empty[String]).toDF("h")
      .select(HtmlText.html_text(col("h"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("binary input decodes as UTF-8") {
    val got = Seq("<p>héllo 🙂</p>".getBytes("UTF-8")).toDF("b")
      .select(HtmlText.html_text(col("b"))).collect().head.getString(0)
    assert(got == "héllo 🙂")
  }

  // ---- WarcPayloads ------------------------------------------------

  private val crlf = "\r\n"
  private def rec(payload: String, extra: String = ""): String =
    s"WARC/1.0${crlf}WARC-Type: response$crlf${extra}Content-Length: " +
      s"${payload.getBytes("UTF-8").length}$crlf$crlf$payload$crlf$crlf"

  test("warc_payloads returns raw payload bytes per record, in order") {
    val blob = (rec("<p>one</p>") + rec("two")).getBytes("UTF-8")
    val got = Seq(blob).toDF("b")
      .select(WarcRecords.warc_payloads(col("b")).as("p"))
      .selectExpr("transform(p, x -> cast(x as string)) as s")
      .collect().head.getSeq[String](0)
    assert(got == Seq("<p>one</p>", "two"))
  }

  test("warc_payloads NULLs exactly where warc_records NULLs") {
    val good = rec("ok").getBytes("UTF-8")
    val bads = Seq(
      "NOPE/1.0" + crlf,                              // bad version line
      s"WARC/1.0${crlf}NoColonHere$crlf$crlf",        // header w/o colon
      s"WARC/1.0${crlf}Content-Length: 99$crlf$crlf" + "short", // past end
      rec("ok").dropRight(2)                          // missing terminator
    ).map(_.getBytes("UTF-8"))
    val df = (good +: bads).toDF("b")
      .select(WarcRecords.warc_records(col("b")).isNull.as("r"),
        WarcRecords.warc_payloads(col("b")).isNull.as("p"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq
    assert(df == Seq((false, false), (true, true), (true, true),
      (true, true), (true, true)))
  }

  test("composed chain: html_text over a warc payload") {
    val blob = rec("<html><body><p>deep &amp; clean</p></body></html>")
      .getBytes("UTF-8")
    val got = Seq(blob).toDF("b")
      .select(HtmlText.html_text(element_at(
        WarcRecords.warc_payloads(col("b")), 1)))
      .collect().head.getString(0)
    assert(got == "deep & clean")
  }
}
