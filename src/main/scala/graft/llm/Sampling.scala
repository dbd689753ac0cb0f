package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic corpus sampling for training-data pipelines: stratified
  * per-group quotas and greedy token-budget selection. The "random" order
  * is the md5 of the content — stable across engines, runs, and
  * partitionings (so results are reproducible and DuckDB-oracle-checkable),
  * uniform over the hash space, and uncorrelated with any business column.
  *
  * Scale shape: both operators are one shuffle on the stratum key + a
  * window (rank or running sum). No sampling state lives on the driver;
  * quotas/budgets apply per-stratum inside partitions. At 100 TB the
  * stratum cardinality supplies parallelism; a single mega-stratum would
  * need the same salting treatment as any skewed window.
  */
object Sampling {

  /** Engine-stable pseudo-random order key (md5 hex of the content). */
  def md5Order(c: Column): Column = md5(c.cast(BinaryType))

  /** Per-stratum deterministic quota: the first `n` docs of each stratum
    * in content-hash order. Equivalent to uniform sampling without
    * replacement, reproducible bit-for-bit.
    */
  def stratifiedSample(docs: DataFrame, stratum: String, n: Int,
      textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(md5Order(col(textCol)), col("doc_id"))
    docs
      .withColumn("sample_rank", row_number().over(w).cast(IntegerType))
      .filter(col("sample_rank") <= n)
  }

  /** Weighted mixture: per-stratum quotas proportional to `weights` summing
    * to ~`total` docs — the data-recipe mixing shape ("50% en, 30% de,
    * 20% fr"). Strata absent from the weights are dropped. Quotas use
    * math.round of the exact share, so the recipe is reproducible from the
    * weights alone.
    */
  def mixtureSample(docs: DataFrame, stratum: String,
      weights: Map[String, Double], total: Long,
      textCol: String = "text"): DataFrame = {
    val wsum = weights.values.sum
    val quotas = weights.map { case (k, w) =>
      k -> math.round(total * w / wsum)
    }
    val quotaCol = quotas.foldLeft(lit(0L)) { case (acc, (k, q)) =>
      when(col(stratum) === k, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratum))
      .orderBy(md5Order(col(textCol)), col("doc_id"))
    docs
      .filter(col(stratum).isin(weights.keys.toSeq: _*))
      .withColumn("sample_rank", row_number().over(w).cast(IntegerType))
      .filter(col("sample_rank") <= quotaCol)
  }

  /** Greedy token-budget selection per stratum: docs accumulate in
    * content-hash order until the running token total exceeds the budget;
    * the doc that crosses the line is excluded. The shape every
    * fixed-token-mix pretraining data recipe needs.
    */
  def tokenBudgetSample(docs: DataFrame, stratum: String, budget: Long,
      textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(md5Order(col(textCol)), col("doc_id"))
    docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("cum_tokens",
        sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= budget)
  }
}
