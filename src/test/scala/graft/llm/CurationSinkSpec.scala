package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Writer-side pin for the curation pipeline: survivors land as
  * lang-partitioned parquet (the 100 TB output layout — downstream
  * training-mix jobs filter by language, so the partition axis IS the
  * filter axis), and a language-filtered read-back must show partition
  * pruning and column pruning in the scan, not just correct rows.
  */
class CurationSinkSpec extends SparkSpec {
  import spark.implicits._

  test("lang-partitioned survivor sink: round-trip + partition/column pruning") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "der hund und die katze ist nicht da heute", "de"),
      (3L, "one more english document with plain words", "en"),
      (4L, "le chat et la maison est une belle chose", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = java.nio.file.Files
      .createTempDirectory("graft_sink").toString + "/survivors"
    docs.write.partitionBy("lang").parquet(out)

    val back = spark.read.parquet(out)
    // content round-trips across the partition split
    assert(back.count() == 4)
    assert(back.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("en" -> 2L, "de" -> 1L, "fr" -> 1L))

    // a language filter + narrow projection must prune at the SCAN:
    // partition filter on lang, read schema limited to doc_id
    val q = back.filter(col("lang") === "en").select("doc_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"no lang partition filter in scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"column pruning failed (text should not be read):\n$plan")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }
}
