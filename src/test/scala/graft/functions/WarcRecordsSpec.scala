package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins WarcRecords against HAND-WRITTEN ISO 28500 record bytes:
  * multi-record blobs, case-insensitive header names, the WARC/1.0
  * angle-bracket URI spelling, payloads containing CRLF and binary-ish
  * bytes (Content-Length framing must win over line scanning), the
  * md5 payload digest, empty input as zero records, and the strict
  * NULL contract: missing version line, header without a colon,
  * missing / non-numeric / overlong Content-Length, payload past the
  * input, missing record terminator.
  */
class WarcRecordsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(payloads: Array[Byte]*)
      : Seq[Option[Seq[(String, String, Long, String)]]] =
    payloads.toSeq.toDF("b")
      .select(WarcRecords.warc_records(col("b")).as("r"))
      .collect().map { row =>
        if (row.isNullAt(0)) None
        else Some(row.getSeq[org.apache.spark.sql.Row](0).map(r =>
          (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))))
      }.toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val CRLF = "\r\n"
  private def rec(headers: Seq[String], payload: String): String =
    (Seq("WARC/1.0") ++ headers ++ Seq("", payload)).mkString(CRLF) + CRLF + CRLF

  test("two records parse with types, uris, lengths and digests") {
    val payload1 = "hello warc world"
    val payload2 = "ok"
    val blob = (rec(Seq("WARC-Type: response",
      "WARC-Target-URI: http://a.example/x",
      s"Content-Length: ${payload1.length}"), payload1) +
      rec(Seq("warc-type: metadata", s"content-length: ${payload2.length}"),
        payload2)).getBytes("UTF-8")
    assert(parse(blob) == Seq(Some(Seq(
      ("response", "http://a.example/x", payload1.length.toLong,
        md5hex(payload1)),
      ("metadata", null, 2L, md5hex(payload2))))))
  }

  test("angle-bracket URIs strip; unknown headers pass; CRLF in payload ok") {
    val payload = "line1\r\nline2\r\n\r\nWARC/9.9 fake"
    val blob = rec(Seq("WARC-Type: resource",
      "WARC-Target-URI: <urn:uuid:1234>",
      "X-Custom: anything: with colons",
      s"Content-Length: ${payload.getBytes("UTF-8").length}"), payload)
      .getBytes("UTF-8")
    assert(parse(blob) == Seq(Some(Seq(
      ("resource", "urn:uuid:1234",
        payload.getBytes("UTF-8").length.toLong, md5hex(payload))))))
  }

  test("empty input is zero records, not NULL") {
    assert(parse(Array.empty[Byte]) == Seq(Some(Seq.empty)))
  }

  test("strict NULL contract on malformation") {
    val ok = "x"
    val noVersion = ("HTTP/1.1 200" + CRLF + "Content-Length: 1" +
      CRLF + CRLF + ok + CRLF + CRLF).getBytes("UTF-8")
    val noColon = rec(Seq("WARC-Type response", "Content-Length: 1"), ok)
      .getBytes("UTF-8")
    val noCl = rec(Seq("WARC-Type: response"), ok).getBytes("UTF-8")
    val badCl = rec(Seq("Content-Length: 1x"), ok).getBytes("UTF-8")
    val hugeCl = rec(Seq("Content-Length: 9999999999999999999"), ok)
      .getBytes("UTF-8")
    val pastEnd = ("WARC/1.0" + CRLF + "Content-Length: 50" + CRLF + CRLF +
      "short").getBytes("UTF-8")
    val noTerm = ("WARC/1.0" + CRLF + "Content-Length: 1" + CRLF + CRLF +
      "x" + CRLF).getBytes("UTF-8") // one CRLF, not two
    val rawText = "just text, no records".getBytes("UTF-8")
    assert(parse(noVersion, noColon, noCl, badCl, hugeCl, pastEnd, noTerm,
      rawText) == Seq.fill(8)(None))
  }

  test("null input yields NULL") {
    val out = Seq((1L, null: Array[Byte])).toDF("id", "b")
      .select(WarcRecords.warc_records(col("b")).as("r")).collect()
    assert(out(0).isNullAt(0))
  }
}
