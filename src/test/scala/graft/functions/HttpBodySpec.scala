package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HttpBody pinned against an INDEPENDENT reference implementation:
  * every fixture under /http/fixtures.txt was parsed by CPython's
  * `http.client.HTTPResponse` at generation time and the (status,
  * content-encoding, body) triple frozen — Content-Length framing,
  * chunked transfer with extensions + trailers + uppercase hex sizes,
  * the connection-close remainder form, mixed-case headers, a real
  * gzip Content-Encoding body. Corrupt lanes (non-hex chunk size,
  * short Content-Length, trailing garbage, bad status line, chunk
  * running past the input) pin the family NULL contract.
  */
class HttpBodySpec extends SparkSpec {
  import spark.implicits._

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private lazy val fixtures: Vector[(String, Option[(Int, Option[String],
      Array[Byte])], Array[Byte])] = {
    val in = getClass.getResourceAsStream("/http/fixtures.txt")
    assert(in != null)
    val rows = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    rows.map { l =>
      val Array(name, st, enc, body, raw) = l.split(" ", 5)
      val expect =
        if (st == "NULL") None
        else Some((st.toInt,
          if (enc == "-") None else Some(enc),
          if (body == "-") Array.emptyByteArray else unhex(body)))
      (name, expect, unhex(raw))
    }
  }

  private def run(raws: Seq[Array[Byte]]) =
    raws.toDF("b")
      .select(HttpBody.http_body(col("b")).as("r"))
      .select(col("r.status"), col("r.content_encoding"), col("r.body"))
      .collect()

  test("every http.client-validated fixture parses to the frozen triple") {
    val good = fixtures.filter(_._2.isDefined)
    val got = run(good.map(_._3))
    good.zip(got).foreach { case ((name, Some((st, enc, body)), _), row) =>
      assert(!row.isNullAt(0), s"$name: NULL")
      assert(row.getInt(0) == st, s"$name: status ${row.getInt(0)} != $st")
      val gotEnc = if (row.isNullAt(1)) None else Some(row.getString(1))
      assert(gotEnc == enc, s"$name: encoding $gotEnc != $enc")
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]](2), body),
        s"$name: body mismatch")
    }
  }

  test("corrupt lanes NULL (family contract)") {
    val bad = fixtures.filter(_._2.isEmpty)
    val got = run(bad.map(_._3))
    bad.zip(got).foreach { case ((name, _, _), row) =>
      assert(row.isNullAt(0), s"$name: expected NULL")
    }
  }

  test("gzip Content-Encoding body hands off to gzip_inflate") {
    val (_, Some((_, _, body)), raw) =
      fixtures.find(_._1 == "gzbody").get
    val out = Seq(raw).toDF("b")
      .select(GzipInflate.gzip_inflate(
        HttpBody.http_body(col("b")).getField("body")).as("d"))
      .collect().head.getAs[Array[Byte]](0)
    assert(new String(out, "UTF-8") == "gzipped document text " * 10)
    assert(java.util.Arrays.equals(GzipInflate.gunzip(body), out))
  }

  test("content_type surfaces lowercased; absent header yields NULL") {
    val withCt = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: Text/HTML; Charset=ISO-8859-1\r\n" +
      "Content-Length: 2\r\n\r\nhi").getBytes("ISO-8859-1")
    val noCt = ("HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi")
      .getBytes("ISO-8859-1")
    val rows = Seq(withCt, noCt).toDF("b")
      .select(HttpBody.http_body(col("b")).as("h"))
      .select(col("h.content_type"), col("h.status")).collect()
    assert(rows(0).getString(0) == "text/html; charset=iso-8859-1")
    assert(rows(0).getInt(1) == 200)
    assert(rows(1).isNullAt(0))
  }

  test("content_type: case-sensitive parameter values survive") {
    // RFC 9110: media type / param names / charset value fold to
    // lowercase, but a multipart BOUNDARY is case-sensitive — and a
    // quoted value may contain ';' without splitting parameters
    val ct = "Multipart/Form-Data; Boundary=\"AaB;03x\"; Charset=UTF-8"
    val raw = ("HTTP/1.1 200 OK\r\nContent-Type: " + ct +
      "\r\nContent-Length: 2\r\n\r\nhi").getBytes("ISO-8859-1")
    val rows = Seq(raw).toDF("b")
      .select(HttpBody.http_body(col("b")).getField("content_type"))
      .collect()
    assert(rows(0).getString(0) ==
      "multipart/form-data; boundary=\"AaB;03x\"; charset=utf-8")
  }

  test("the dechunk bomb cap is wired") {
    // a chunked stream declaring a size past the 7-hex-digit guard
    val raw = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "FFFFFFFF\r\n").getBytes("ISO-8859-1")
    assert(run(Seq(raw)).head.isNullAt(0))
    assert(HttpBody.MaxBodyBytes == 64 * 1024 * 1024)
  }
}
