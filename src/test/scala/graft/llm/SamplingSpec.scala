package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "aa bb cc", "en"), (2L, "dd ee", "en"), (3L, "ff", "en"),
    (4L, "gg hh ii jj", "de"), (5L, "kk ll", "de"))
    .toDF("doc_id", "text", "lang")

  test("weightedSample biases selection toward heavy docs, " +
      "deterministically, zero-weight rows excluded") {
    // 500 heavy docs (weight 1000) vs 500 light docs (weight 1): the
    // priority (u*1e6) div w shrinks heavy docs' keys ~1000x, so the
    // k=100 smallest priorities should be (almost) all heavy
    val corpus = ((1 to 500).map(i => (i.toLong, 1000L)) ++
      (501 to 1000).map(i => (i.toLong, 1L)) :+ (1001L, 0L))
      .toDF("doc_id", "w")
    val sample = Sampling.weightedSample(corpus, "w", 100, idCol = "doc_id")
      .collect()
    assert(sample.length == 100)
    val heavy = sample.count(_.getAs[Long]("doc_id") <= 500)
    assert(heavy >= 95, s"expected heavy-doc dominance, got $heavy/100")
    assert(!sample.exists(_.getAs[Long]("doc_id") == 1001L),
      "zero-weight row must be excluded, not divide by zero")
    // bit-reproducible: a second run returns the identical sample
    val again = Sampling.weightedSample(corpus, "w", 100, idCol = "doc_id")
      .collect()
    assert(sample.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("temperatureSample flattens stratum shares toward sqrt(n)") {
    // 100 'en' docs vs 9 'de' docs (raw ratio ~11:1)
    val skewed = ((1 to 100).map(i => (i.toLong, s"en doc $i", "en")) ++
      (101 to 109).map(i => (i.toLong, s"de doc $i", "de")))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.temperatureSample(skewed, "lang", scale = 4.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas: floor(4*sqrt(100)) = 40 (en downsampled 100 -> 40);
    // floor(4*sqrt(9)) = 12 exceeds the 9-doc stratum, so 'de' keeps
    // everything — exactly the flattening temperature sampling is for
    assert(out == Map("en" -> 40L, "de" -> 9L))
    // quota above stratum size keeps everything (tiny strata untouched)
    val tiny = Sampling.temperatureSample(docs, "lang", scale = 4.0)
    assert(tiny.count() == 5)
  }

  test("stratifiedSample respects per-stratum quota and is deterministic") {
    val s2a = Sampling.stratifiedSample(docs, "lang", 2)
      .select("doc_id", "lang", "sample_rank").collect().map(_.toSeq).toSet
    val s2b = Sampling.stratifiedSample(docs.repartition(5), "lang", 2)
      .select("doc_id", "lang", "sample_rank").collect().map(_.toSeq).toSet
    assert(s2a == s2b) // partitioning-independent
    val perLang = Sampling.stratifiedSample(docs, "lang", 2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == Map("en" -> 2L, "de" -> 2L))
    // quota above stratum size keeps everything
    assert(Sampling.stratifiedSample(docs, "lang", 10).count() == 5)
  }

  test("mixtureSample: weighted quotas, unlisted strata dropped") {
    val many = spark.range(300).selectExpr(
      "id AS doc_id", "concat('text ', id) AS text",
      "CASE WHEN id % 4 = 0 THEN 'en' WHEN id % 4 = 1 THEN 'de' " +
        "WHEN id % 4 = 2 THEN 'fr' ELSE 'es' END AS lang")
    val out = Sampling.mixtureSample(many, "lang",
      Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2), total = 100L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("en" -> 50L, "de" -> 30L, "fr" -> 20L)) // no 'es'
  }

  test("salted two-phase ranks ≡ single-window on a 90%-one-stratum corpus") {
    import org.apache.spark.sql.expressions.Window
    // 2000 docs, 90% in 'en' — the mega-stratum shape the salting exists
    // for; outputs must be bit-identical to the naive one-window form
    val many = spark.range(2000).selectExpr(
      "id AS doc_id", "concat('doc ', id, ' body ', id % 7) AS text",
      "CASE WHEN id % 10 < 9 THEN 'en' ELSE 'de' END AS lang")
    val ord = Sampling.md5Order(col("text"))
    val w = Window.partitionBy(col("lang")).orderBy(ord, col("doc_id"))

    val naiveRank = many
      .withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= 600)
      .select("doc_id", "lang", "sample_rank")
    val saltedRank = Sampling.stratifiedSample(many, "lang", 600)
      .select("doc_id", "lang", "sample_rank")
    assert(saltedRank.collect().map(_.toSeq).toSet ==
      naiveRank.collect().map(_.toSeq).toSet)

    val naiveCum = many
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= 2000L)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
    val saltedCum = Sampling.tokenBudgetSample(many, "lang", 2000L)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
    assert(saltedCum.collect().map(_.toSeq).toSet ==
      naiveCum.collect().map(_.toSeq).toSet)

    // packing plan: same salted prefix sum, global order — bins and
    // offsets must match the naive single-window form exactly
    val naivePack = many
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.orderBy(ord, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("strt", col("cum") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("strt") / 512).as("bin_id"),
        (col("strt") % 512).as("bin_offset"))
    val saltedPack = Sampling.packingPlan(many, 512L)
      .select("doc_id", "n_tokens", "bin_id", "bin_offset")
    assert(saltedPack.collect().map(_.toSeq).toSet ==
      naivePack.collect().map(_.toSeq).toSet)

    // and the salted plan's big windows really are salted: every window
    // partition spec in the optimized plan includes the bucket column
    val winSpecs = saltedRank.queryExecution.optimizedPlan.collect {
      case wn: org.apache.spark.sql.catalyst.plans.logical.Window =>
        wn.partitionSpec.map(_.sql).mkString(",")
    }
    val (bucketed, tiny) = winSpecs.partition(_.contains("__b"))
    assert(bucketed.nonEmpty,
      s"expected a bucket-salted window, got: $winSpecs")
    // the only non-salted window is the ≤256-row offset table
    assert(tiny.size <= 1)
  }

  test("tokenBudgetSample: inclusive boundary, crossing doc excluded") {
    // en docs have 3, 2, 1 tokens; in md5 order some prefix accumulates
    val out = Sampling.tokenBudgetSample(docs, "lang", budget = 4L)
      .filter($"lang" === "en")
      .orderBy("cum_tokens").collect()
    assert(out.nonEmpty)
    // running total never exceeds the budget and is strictly increasing
    val cums = out.map(_.getAs[Long]("cum_tokens")).toSeq
    assert(cums.last <= 4L && cums == cums.sorted)
    // a huge budget keeps every doc
    assert(Sampling.tokenBudgetSample(docs, "lang", 1000L).count() == 5)
  }
}
