package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Pins Spark's PERMISSIVE JSONL contract as JsonlSource relies on it:
  * malformed lines quarantine with their raw text, schema drift in both
  * directions (missing field → NULL, extra field → ignored) reads
  * cleanly, and type-mismatched fields count as malformed (the whole
  * line quarantines — Spark does not null just the bad field).
  */
class JsonlSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private val lines = Seq(
    """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
    """{"doc_id": 2, "text": "missing lang field"}""",
    """{"doc_id": 3, "text": "extra field ignored", "lang": "de", "source": "cc"}""",
    """this line is not json at all""",
    """{"doc_id": "not-a-number", "text": "type mismatch", "lang": "en"}""",
    """{"doc_id": 6, "text": null, "lang": "fr"}""")

  private def writeCorpus(): String = {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("part-0.jsonl"),
      lines.mkString("", "\n", "\n"))
    dir.toString
  }

  test("clean/quarantine split: drifted schemas parse, malformed and " +
    "type-mismatched lines quarantine with raw text") {
    val dir = writeCorpus()
    try {
      val (clean, quarantine) = JsonlSource.readSplit(spark, dir, schema)
      val rows = clean.collect()
        .map(r => (r.get(0), Option(r.getString(1)), Option(r.getString(2))))
        .toSet
      assert(rows == Set(
        (1L, Some("hello world"), Some("en")),
        (2L, Some("missing lang field"), None),   // absent field → NULL
        (3L, Some("extra field ignored"), Some("de")), // extra → ignored
        (6L, None, Some("fr"))))                  // explicit null
      assert(clean.columns.toSeq == Seq("doc_id", "text", "lang"),
        "corrupt column must not leak into the clean frame")
      val q = quarantine.collect().map(_.getString(0)).toSet
      assert(q == Set(lines(3), lines(4)),
        "exactly the unparseable and type-mismatched lines quarantine, " +
          "carrying their raw text")
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
    }
  }

  test("declared corrupt column name is reserved") {
    intercept[IllegalArgumentException] {
      JsonlSource.read(spark, "/nonexistent",
        StructType(Seq(StructField(JsonlSource.CorruptCol, StringType))))
    }
  }
}
