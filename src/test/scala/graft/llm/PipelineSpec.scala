package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end composition of the training-data pipeline on real testdata:
  * normalize → exact dedup → near-dup dedup (clusters → survivors) →
  * quality filter → pack. Each stage's output feeds the next as a plain
  * DataFrame — the user story of the library — with conservation
  * invariants asserted at every step.
  */
class PipelineSpec extends SparkSpec {

  test("the curation ladder composes end-to-end on sf0.001") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    val n0 = docs.count()

    // 1. canonical normalization (dedup-key form)
    val normed = docs.withColumn("norm", TextAnalysis.normalize(col("text")))

    // 2. exact dedup on the normalized form
    val keepers = Dedup.exactDuplicates(
      normed.select(col("doc_id"), col("norm").as("text")))
      .select(col("keeper_id").as("doc_id"))
    val exactDeduped = normed.join(keepers, Seq("doc_id"), "left_semi")
    val n1 = exactDeduped.count()
    assert(n1 <= n0 && n1 > 0)

    // 3. near-dup dedup: pairs → components → survivors (min id per
    // cluster survives)
    val pairs = Dedup.jaccardPairsExact(
      exactDeduped.select("doc_id", "text"), 0.8)
    val comps = Dedup.connectedComponentsAdaptive(pairs)
    val losers = comps.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    val nearDeduped = exactDeduped.join(losers, Seq("doc_id"), "left_anti")
    val n2 = nearDeduped.count()
    assert(n2 <= n1 && n2 > 0)
    // every cluster keeps exactly one representative
    val nClusters = comps.select("cluster_id").distinct().count()
    val nLosers = losers.count()
    assert(comps.count() - nLosers == nClusters)

    // 4. quality floor + repetition gate + PII scrub (the full curation
    // rule set: low-quality, loopy/templated, and PII-bearing docs drop;
    // one staged token/bigram projection pair feeds both repetition
    // metrics)
    val filtered = nearDeduped
      .withColumn("__toks", TextAnalysis.tokenArray(col("text")))
      .withColumn("__bg", TextAnalysis.bigramsFromTokens(col("__toks")))
      .withColumn("q", TextAnalysis.qualityScoreFromTokens(col("__toks")))
      .withColumn("rep_tok", TextAnalysis.topFracFromArray(col("__toks")))
      .withColumn("rep_bg", TextAnalysis.topFracFromArray(col("__bg")))
      .withColumn("pii",
        TextAnalysis.piiMatchCount(col("text"), TextAnalysis.PiiAnyPattern))
      .filter(col("q") >= 0.3 && col("rep_tok") <= 0.5 &&
        col("rep_bg") <= 0.5 && col("pii") === 0)
      .drop("__toks", "__bg")
    val n3 = filtered.count()
    assert(n3 <= n2 && n3 > 0)

    // 5. pack the survivors into 256-token training bins
    val packed = Sampling.packingPlan(filtered, seqLen = 256L)
    assert(packed.count() == n3) // packing is a plan, not a filter
    val stats = packed.agg(
      sum(col("n_tokens")).as("toks"),
      max(col("bin_id")).as("maxBin")).head
    val totalTokens = stats.getLong(0)
    val maxBin = stats.getLong(1)
    // every start offset is inside the concatenated token range, the
    // first doc starts at bin 0 offset 0, and offsets stay inside bins
    assert(maxBin >= 0 && maxBin <= (totalTokens - 1) / 256)
    assert(packed.filter(col("bin_id") === 0 && col("bin_offset") === 0)
      .count() == 1)
    assert(packed.filter(col("bin_offset") >= 256 || col("bin_offset") < 0)
      .isEmpty)
  }
}
