package graft.streaming

import graft.SparkSpec
import graft.queries.LlmQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream ≡ batch for the curation filter: the SAME stateless
  * filter-report plan (LlmQueries.filterReportOn) applied to a document
  * STREAM must produce exactly the batch result — the LLM-pipeline analog
  * of StreamingFactSpec's HYBRIDJOIN-parity pin. This is what lets one
  * curation codebase serve both the backfill (batch over the corpus) and
  * the ingest path (per-micro-batch over arriving documents) with zero
  * semantic drift.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and keeps going " +
      "with many more words to pass the length rule easily for sure " +
      "plus a few extra tokens of ordinary english text here now"),
    (2L, "short"),                         // too_short
    (3L, "zz " * 95),                      // too_long + unknown lang
    (4L, ""),                              // empty: short + unknown
    (5L, "der hund und die katze ist nicht da aber der text " +
      "hat viele worte und ist ein gutes beispiel mit mehr als " +
      "genug worten um die regel zu bestehen und noch mehr"))

  test("filter report over a stream equals the batch report") {
    implicit val sqlCtx = spark.sqlContext
    val batch = LlmQueries.filterReportOn(docs.toDF("doc_id", "text"))
      .orderBy("doc_id").collect().toSeq

    val mem = MemoryStream[(Long, String)]
    val q = LlmQueries.filterReportOn(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    // two micro-batches: parity must hold regardless of arrival batching
    mem.addData(docs.take(2): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*)
    q.processAllAvailable()
    val streamed = spark.table("curation_stream")
      .orderBy("doc_id").collect().toSeq
    q.stop()

    assert(streamed === batch)
    // sanity: the rules actually fired on this fixture
    val byId = batch.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Boolean]("kept"))
    assert(byId(2L).getAs[Boolean]("too_short"))
    assert(byId(3L).getAs[Boolean]("too_long"))
    assert(!byId(4L).getAs[Boolean]("kept"))
    assert(byId(5L).getAs[Boolean]("kept"))
  }
}
