package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins PdfText against HAND-BUILT spec vectors (no PDF reference
  * implementation exists in this environment — pdftotext/pypdf/mupdf/gs
  * all absent — so the pins are ISO 32000-1 constructions with
  * closed-form expected text, the gzip/WARC pattern): operators (Tj,
  * TJ with the −180 word-gap rule, ', ", Td/TD/T*), string syntax
  * (escapes, octal, line continuation, nested parens, hex incl. the
  * odd-digit pad), encodings (WinAnsi/MacRoman via the JDK tables,
  * StandardEncoding quotes), ToUnicode CMaps (bfchar, bfrange, the
  * array form), FlateDecode content pinned against the JDK Deflater,
  * page-tree shapes (Kids recursion, inherited Resources, Contents
  * arrays, indirect /Length), /Prev-chained incremental updates, and
  * the strict-NULL contract (Encrypt, xref streams, foreign filters,
  * Type0 fonts, inline images, bad offsets, truncation, raw text).
  */
class PdfTextSpec extends SparkSpec {
  import spark.implicits._

  private def run(payloads: Array[Byte]*): Seq[Option[String]] =
    payloads.toSeq.toDF("b")
      .select(PdfText.pdf_text(col("b")).as("t"))
      .collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getString(0))).toSeq

  /** Assemble a classic-xref PDF from object bodies (object i+1). */
  private def pdf(objs: Seq[String], trailerExtra: String = ""): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.4\n")
    val offs = objs.indices.map { i =>
      val o = sb.length
      sb.append(s"${i + 1} 0 obj\n${objs(i)}\nendobj\n")
      o
    }
    val xref = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R" +
      s" $trailerExtra >>\nstartxref\n$xref\n%%EOF")
    sb.toString.getBytes("ISO-8859-1") // byte-transparent
  }

  private def stream(dict: String, data: String): String =
    s"<< $dict /Length ${data.getBytes("ISO-8859-1").length} >>\n" +
      s"stream\n$data\nendstream"

  private def scaffold(content: String,
      font: String = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
        " /Encoding /WinAnsiEncoding >>",
      contentDict: String = ""): Array[Byte] =
    pdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R" +
        " /Resources << /Font << /F1 5 0 R >> >> >>",
      stream(contentDict, content),
      font))

  test("Tj with escapes, parens, octal, continuation; hex strings") {
    val v = scaffold(
      "BT /F1 12 Tf (Hello \\(w\\)) Tj (\\101\\102) Tj" +
        " (a\\\nb) Tj <414243> Tj <484> Tj ET")
    // octal 101/102 = AB; \<LF> joins; odd hex pads: 0x48 0x40 = H@
    assert(run(v) == Seq(Some("Hello (w)ABabABCH@")))
  }

  test("TJ kerning: <= -180 reads as a word gap, smaller does not") {
    val v = scaffold("BT /F1 9 Tf [(A) -50 (B) -300 (C) 120 (D)] TJ ET")
    assert(run(v) == Seq(Some("AB CD")))
  }

  test("line structure: ', T*, Td/TD, Tm; lazy breaks collapse") {
    val v = scaffold(
      "BT /F1 9 Tf (one) Tj 0 -14 TD (two) ' T* (three) Tj" +
        " 10 0 Td (same) Tj 1 0 0 1 50 700 Tm (four) Tj ET")
    // TD(ty!=0) breaks before ', which itself breaks — collapsed to one;
    // Td with ty=0 does NOT break; Tm does
    assert(run(v) == Seq(Some("one\ntwo\nthreesame\nfour")))
  }

  test("WinAnsi vs MacRoman vs Standard: the same bytes differ") {
    def font(enc: String) =
      s"<< /Type /Font /Subtype /Type1 /BaseFont /F /Encoding $enc >>"
    // octal keeps the vectors byte-exact: \223/\224 = 0x93/0x94 (cp1252
    // curly quotes), \322/\323/\216 = MacRoman curly quotes + eacute,
    // \241 = 0xA1 (Standard exclamdown)
    val win = scaffold("BT /F1 9 Tf (\\223q\\224) Tj ET",
      font("/WinAnsiEncoding"))
    val mac0 = scaffold("BT /F1 9 Tf (\\322q\\323 caf\\216) Tj ET",
      font("/MacRomanEncoding"))
    val std = scaffold("BT /F1 9 Tf (`q' \\241) Tj ET",
      font("/StandardEncoding"))
    val default = scaffold("BT /F1 9 Tf (`q') Tj ET",
      "<< /Type /Font /Subtype /Type1 /BaseFont /F >>")
    assert(run(win, mac0, std, default) == Seq(
      Some("“q”"), Some("“q” café"),
      Some("‘q’ ¡"), Some("‘q’")))
  }

  test("ToUnicode CMap: bfchar, bfrange, array form; wins over encoding") {
    val cmap =
      "/CIDInit /ProcSet findresource begin\n" +
        "12 dict begin begincmap\n" +
        "1 begincodespacerange <00> <FF> endcodespacerange\n" +
        "2 beginbfchar <41> <0394> <42> <00660066> endbfchar\n" +
        "1 beginbfrange <61> <63> <03B1> endbfrange\n" +
        "1 beginbfrange <70> <71> [<0050> <0051>] endbfrange\n" +
        "endcmap end end"
    val v = pdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R" +
        " /Resources << /Font << /F1 5 0 R >> >> >>",
      stream("", "BT /F1 9 Tf (ABabcpqz) Tj ET"),
      "<< /Type /Font /Subtype /Type1 /BaseFont /F" +
        " /Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>",
      stream("", cmap)))
    // A -> GREEK DELTA, B -> "ff" (a 2-char target), a..c -> alpha beta
    // gamma, p/q via the array form, z falls back to WinAnsi
    assert(run(v) ==
      Seq(Some("ΔffαβγPQz")))
  }

  test("FlateDecode content (JDK Deflater-pinned) + indirect Length") {
    val content = "BT /F1 11 Tf (compressed text) Tj ET"
    val d = new java.util.zip.Deflater()
    d.setInput(content.getBytes("ISO-8859-1")); d.finish()
    val buf = new Array[Byte](1024)
    val m = d.deflate(buf); d.end()
    val z = new String(buf, 0, m, "ISO-8859-1")
    val v = pdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R" +
        " /Resources << /Font << /F1 5 0 R >> >> >>",
      s"<< /Filter /FlateDecode /Length 6 0 R >>\nstream\n${z}\nendstream",
      "<< /Type /Font /Subtype /Type1 /BaseFont /F" +
        " /Encoding /WinAnsiEncoding >>",
      s"${z.length}"))
    assert(run(v) == Seq(Some("compressed text")))
  }

  test("page tree: Kids recursion, inherited Resources, Contents array") {
    val v = pdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      // Resources inherited from the Pages node by BOTH leaves
      "<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2" +
        " /Resources << /Font << /F1 5 0 R >> >> >>",
      "<< /Type /Page /Parent 2 0 R /Contents [4 0 R 7 0 R] >>",
      stream("", "BT /F1 9 Tf (p1a) Tj"), // split mid-text-object:
      "<< /Type /Font /Subtype /Type1 /BaseFont /F" +
        " /Encoding /WinAnsiEncoding >>",
      "<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>",
      stream("", "(p1b) Tj ET"), // parts form ONE stream
      stream("", "BT /F1 9 Tf (p2) Tj ET")))
    assert(run(v) == Seq(Some("p1ap1b\np2")))
  }

  test("incremental update: /Prev chain, newest xref wins") {
    val base = scaffold("BT /F1 9 Tf (old text) Tj ET")
    val baseStr = new String(base, "ISO-8859-1")
    val baseXref = baseStr.lastIndexOf("xref\n0 ")
    val sb = new StringBuilder(baseStr)
    sb.append("\n")
    val objOff = sb.length
    sb.append(s"4 0 obj\n${stream("", "BT /F1 9 Tf (new text) Tj ET")}" +
      "\nendobj\n")
    val xref2 = sb.length
    sb.append(f"xref\n4 1\n$objOff%010d 00001 n \n")
    sb.append(s"trailer\n<< /Size 6 /Root 1 0 R /Prev $baseXref >>\n")
    sb.append(s"startxref\n$xref2\n%%EOF")
    assert(run(sb.toString.getBytes("ISO-8859-1")) ==
      Seq(Some("new text")))
  }

  test("strict NULL contract") {
    val good = scaffold("BT /F1 9 Tf (x) Tj ET")
    val encrypt = pdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      stream("", "BT (x) Tj ET")), "/Encrypt 4 0 R")
    val lzw = scaffold("BT /F1 9 Tf (x) Tj ET",
      contentDict = "/Filter /LZWDecode")
    val type0 = scaffold("BT /F1 9 Tf (x) Tj ET",
      font = "<< /Type /Font /Subtype /Type0 /BaseFont /F >>")
    val inlineImg = scaffold(
      "BT /F1 9 Tf (x) Tj ET BI /W 1 /H 1 ID   EI")
    // startxref pointing at an OBJECT (the xref-stream shape)
    val xrefStream = {
      val s = new String(good, "ISO-8859-1")
      val at = s.indexOf("1 0 obj")
      s.replaceAll("startxref\n\\d+", s"startxref\n$at")
        .getBytes("ISO-8859-1")
    }
    val badOffset = {
      val s = new String(good, "ISO-8859-1")
      s.replace("startxref\n", "startxref\n9999999")
        .getBytes("ISO-8859-1")
    }
    val noRoot = pdf(Seq("<< /X 1 >>")) // Root -> non-catalog
    val truncated = good.take(good.length / 2)
    val text = "definitely %PDF- not a pdf".getBytes("UTF-8")
    assert(run(good).head.isDefined)
    assert(run(encrypt, lzw, type0, inlineImg, xrefStream, badOffset,
      noRoot, truncated, text, Array.empty[Byte]) == Seq.fill(10)(None))
  }

  test("null input yields NULL; SQL surface registered") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(PdfText.pdf_text(col("b"))).collect()
    assert(out(0).isNullAt(0))
    GraftFunctions.register(spark)
    val v = scaffold("BT /F1 9 Tf (sql) Tj ET")
    val r = Seq(Tuple1(v)).toDF("b")
      .selectExpr("pdf_text(b) AS t").collect()
    assert(r(0).getString(0) == "sql")
  }
}
