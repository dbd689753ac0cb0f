package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the pre-vs-post-filter divergence llm_ann_filtered's docstring
  * claims, on the real sf0.001 corpus: post-filtering an UNFILTERED
  * top-k returns fewer than k for some query (eligible neighbors ranked
  * below the global top-k are lost), while the pre-filtered form always
  * fills k from the eligible set — and the survivors of post-filtering
  * are a subset of the pre-filtered answer (an eligible neighbor in the
  * global top-k is necessarily in the eligible top-k).
  */
class AnnFilteredSpec extends SparkSpec {

  test("post-filter loses results; pre-filter fills k with eligible " +
    "neighbors; post ⊆ pre") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 10)
    val eligible = emb.filter(col("label") % 3 === 0)
    assert(eligible.count() >= 6,
      "corpus too small for the predicate to leave a fillable top-5")

    val pre = Similarity.bruteForceTopK(queries, eligible, 5)
      .localCheckpoint(true)
    val labels = emb.select(col("vec_id").as("neighbor_id"), col("label"))
    val post = Similarity.bruteForceTopK(queries, emb, 5)
      .join(labels, "neighbor_id")
      .filter(col("label") % 3 === 0)
      .localCheckpoint(true)

    val preCounts = pre.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(preCounts.size == 10 && preCounts.values.forall(_ == 5L),
      s"pre-filter must fill k=5 for every query: $preCounts")

    val postCounts = post.groupBy("query_id").count().collect()
      .map(_.getLong(1))
    assert(postCounts.exists(_ < 5L) || postCounts.length < 10,
      "post-filtering lost nothing here — predicate not selective " +
        "enough for the divergence this spec exists to show")

    assert(pre.join(labels, Seq("neighbor_id"))
      .filter(!(col("label") % 3 === 0)).count() == 0,
      "pre-filtered neighbors must all satisfy the predicate")

    assert(post.select("query_id", "neighbor_id")
      .except(pre.select("query_id", "neighbor_id")).count() == 0,
      "post-filter survivors must be a subset of the pre-filtered answer")
  }
}
