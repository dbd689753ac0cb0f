package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins WhatwgDecode/WhatwgEncoding against the WHATWG sniffing rules
  * with the JDK's own charset decoders as the byte-level reference
  * (windows-1252 in particular: the 0x80–0x9F block that distinguishes
  * it from ISO-8859-1 comes straight from Charset.forName, an
  * independent canonical implementation of the same public table).
  * Covers: BOM precedence over labels, every latin-1-family label
  * promoting to windows-1252, unrecognized/absent labels falling
  * through to the prescan, charset attributes vs http-equiv pragmas,
  * comment and quoted-'>' skipping, the 1024-byte prescan cap, the
  * utf-16→utf-8 prescan fixup, replacement on malformed input, and the
  * utf-8 default. An ABSENT header is spelled '' (the expressions
  * null-propagate like the rest of the family; HttpBody surfaces a
  * missing Content-Type as an empty charset, and callers coalesce).
  */
class WhatwgDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Array[Byte], String)*): Seq[(String, String)] =
    rows.toSeq.toDF("b", "l")
      .select(
        WhatwgDecode.whatwg_encoding(col("b"), col("l")).as("e"),
        WhatwgDecode.whatwg_decode(col("b"), col("l")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  private def b(s: String, cs: String = "UTF-8"): Array[Byte] =
    s.getBytes(cs)

  test("latin-1-family labels promote to windows-1252 (0x93/0x94 live)") {
    val curly = "a “q” z"
    val body = curly.getBytes("windows-1252") // 61 20 93 71 94 20 7A
    assert(body(2) == 0x93.toByte && body(4) == 0x94.toByte)
    for (label <- Seq("ISO-8859-1", "latin1", "US-ASCII", " Latin1 ",
        "windows-1252", "cp819")) {
      assert(run((body, label)) == Seq(("windows-1252", curly)), label)
    }
    // the whole 0x80-0x9F block must match the JDK's windows-1252 table
    val block = (0x80 to 0x9f).map(_.toByte).toArray
    val expect = new String(block, "windows-1252")
    assert(run((block, "iso-8859-1")) == Seq(("windows-1252", expect)))
  }

  test("BOM outranks the transport label and is consumed") {
    val utf8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ b("héllo")
    assert(run((utf8, "utf-16le")) == Seq(("utf-8", "héllo")))
    val le = Array(0xFF, 0xFE).map(_.toByte) ++ b("héllo", "UTF-16LE")
    assert(run((le, "iso-8859-1")) == Seq(("utf-16le", "héllo")))
    val be = Array(0xFE, 0xFF).map(_.toByte) ++ b("héllo", "UTF-16BE")
    assert(run((be, "")) == Seq(("utf-16be", "héllo")))
  }

  test("unrecognized or absent labels fall through to the meta prescan") {
    val page = "<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body>“m”</body>"
    val bytes = page.getBytes("windows-1252")
    assert(run((bytes, "klingon"), (bytes, "")).forall(
      _ == ("windows-1252", page)))
  }

  test("http-equiv pragma + content charset; comments skipped") {
    val page = "<!-- charset=utf-16le --><meta a='x>y'>" +
      "<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"><p>“m”</p>"
    assert(run((page.getBytes("windows-1252"), "")) ==
      Seq(("windows-1252", page)))
    // charset attribute beats a conflicting later pragma
    val page2 = "<meta charset=utf-8>" +
      "<meta http-equiv=content-type content=\"charset=iso-8859-1\">x"
    assert(run((b(page2), "")).head._1 == "utf-8")
    // pragma without got-pragma (content alone) does NOT fire
    val page3 = "<meta content=\"text/html; charset=iso-8859-1\">x"
    assert(run((b(page3), "")).head._1 == "utf-8")
  }

  test("prescan caps at 1024 bytes; utf-16 meta label becomes utf-8") {
    val far = (" " * 1030) + "<meta charset=iso-8859-1>x"
    assert(run((b(far), "")).head._1 == "utf-8")
    val near = "<meta charset=utf-16be>x"
    assert(run((b(near), "")).head._1 == "utf-8")
    val xud = "<meta charset=x-user-defined>x"
    assert(run((b(xud), "")).head._1 == "windows-1252")
  }

  test("defaults, replacement, and null handling") {
    assert(run((b("plain ascii"), "")) == Seq(("utf-8", "plain ascii")))
    // malformed utf-8 -> U+FFFD, never an error
    val bad = Array(0x61, 0xC3, 0x28, 0x62).map(_.toByte)
    assert(run((bad, "utf-8")) == Seq(("utf-8", "a�(b")))
    val out = Seq((null: Array[Byte], "utf-8")).toDF("b", "l")
      .select(WhatwgDecode.whatwg_decode(col("b"), col("l"))).collect()
    assert(out(0).isNullAt(0))
    val out2 = Seq((b("x"), null: String)).toDF("b", "l")
      .select(WhatwgDecode.whatwg_decode(col("b"), col("l"))).collect()
    assert(out2(0).isNullAt(0)) // null label propagates; use '' for absent
  }

  test("SQL surface registered") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT whatwg_encoding(CAST('x' AS BINARY), 'latin1') AS e," +
        " whatwg_decode(CAST('x' AS BINARY), 'latin1') AS t").collect()
    assert(r(0).getString(0) == "windows-1252" && r(0).getString(1) == "x")
  }
}
