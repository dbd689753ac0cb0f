package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The dedup-ladder components memo is keyed by a file-listing snapshot of
  * the documents table: rewriting the corpus under the same dir within one
  * session must yield FRESH survivors, not the first run's clustering (the
  * r4 verdict's stale-read finding — harmless under the immutable-testdata
  * driver contract, a real bug in a long-lived serving session).
  */
class MemoInvalidationSpec extends SparkSpec {
  import spark.implicits._

  private def survivors(dir: String): Seq[Long] =
    SparkEntry.queries("llm_dedup_survivors")(spark, dir)
      .select("doc_id").as[Long].collect().toSeq.sorted

  test("components memo invalidates when the corpus is rewritten in-session") {
    val dir = java.nio.file.Files.createTempDirectory("graft_memo").toString
    def write(docs: Seq[(Long, String, String)]): Unit =
      docs.toDF("doc_id", "text", "lang")
        .withColumn("source", lit("web"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // corpus 1: docs 1 and 2 are exact near-dups → 2 loses to keeper 1
    write(Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma delta", "en"),
      (3L, "totally different words here", "en")))
    assert(survivors(dir) === Seq(1L, 3L))

    // corpus 2 under the SAME dir: all distinct → all must survive; a
    // stale memo would still report doc 2 as a loser
    write(Seq(
      (1L, "one unique sentence here", "en"),
      (2L, "another unique sentence there", "en"),
      (3L, "third distinct words entirely", "en")))
    assert(survivors(dir) === Seq(1L, 2L, 3L))
  }
}
