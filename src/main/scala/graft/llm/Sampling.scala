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
  * Scale shape — the mega-stratum problem, solved: a corpus that is 60%
  * one language would push 60% of all rows through ONE task's sort if the
  * rank/prefix-sum window were partitioned by the stratum alone. Instead,
  * every ranking here is two-phase, salted by the FIRST HEX BYTE of the
  * order key itself: because the salt is a *prefix* of the order key,
  * (salt, key) order IS key order, so a per-(stratum, salt) local pass
  * (256-way parallel inside every stratum) plus a tiny per-stratum offset
  * table (≤256 rows each, computed by partial aggregation) reassembles
  * bit-identical global ranks and running sums — same outputs, no
  * hot-task sort. SaltedEquivalenceSpec pins salted ≡ single-window on a
  * 90%-one-stratum corpus.
  */
object Sampling {

  /** Engine-stable pseudo-random order key (md5 hex of the content). */
  def md5Order(c: Column): Column = md5(c.cast(BinaryType))

  /** Salt granularity: 2 hex chars = 256 buckets per stratum. */
  private val BucketChars = 2

  /** docs + `__ord` (content-hash order key), `__b` (its prefix bucket),
    * staged as real projections so the md5 is computed once per row.
    */
  private def withOrderKey(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("__ord", md5Order(col(textCol)))
      .withColumn("__b", substring(col("__ord"), 1, BucketChars))

  /** Per-stratum offset of each salt bucket under `valueCol` (row counts
    * for rank, token counts for prefix sums): partial-aggregated per
    * (stratum, bucket) — no wide row movement — then a running sum over
    * the ≤256-row per-stratum bucket list. The result is a tiny frame,
    * joined back broadcast.
    */
  private def bucketOffsets(base: DataFrame, stratum: String,
      valueCol: Column): DataFrame = {
    val counts = base.groupBy(col(stratum), col("__b"))
      .agg(sum(valueCol).as("__c"))
    counts
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.partitionBy(col(stratum))
          .orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(stratum), col("__b"), col("__off"))
  }

  /** Global content-hash rank within each stratum, salted: local
    * row_number within (stratum, bucket) + the bucket's row-count offset.
    * Identical to row_number over the whole stratum (the bucket is a
    * prefix of the order key), without ever sorting a stratum in one task.
    */
  private def withSampleRank(docs: DataFrame, stratum: String,
      textCol: String): DataFrame = {
    val base = withOrderKey(docs, textCol)
    val offs = bucketOffsets(base, stratum, lit(1L))
    val w = Window.partitionBy(col(stratum), col("__b"))
      .orderBy(col("__ord"), col("doc_id"))
    base
      .withColumn("__lr", row_number().over(w))
      .join(broadcast(offs), Seq(stratum, "__b"))
      .withColumn("sample_rank",
        (col("__off") + col("__lr")).cast(IntegerType))
      .drop("__ord", "__b", "__lr", "__off")
  }

  /** Per-stratum deterministic quota: the first `n` docs of each stratum
    * in content-hash order. Equivalent to uniform sampling without
    * replacement, reproducible bit-for-bit.
    */
  def stratifiedSample(docs: DataFrame, stratum: String, n: Int,
      textCol: String = "text"): DataFrame =
    withSampleRank(docs, stratum, textCol)
      .filter(col("sample_rank") <= n)

  /** Temperature-flattened stratified sampling (the multilingual-mixing
    * knob, α = 0.5): keep the first floor(scale · sqrt(n_stratum)) docs
    * of each stratum in content-hash order, so stratum shares flatten
    * from ∝ n to ∝ sqrt(n) — big languages downsample, small ones keep
    * proportionally more, the standard skew correction. α = 0.5 is the
    * DELIBERATE choice for cross-engine exactness: sqrt is correctly
    * rounded under IEEE-754 in every engine (pow(n, 0.3) is not — libm
    * last-ulp differences would make quota boundaries engine-dependent),
    * and each stratum's quota depends only on its own integer count —
    * no cross-stratum float normalization whose summation order could
    * diverge. Normalizing to an exact total budget instead divides by
    * Σ sqrt(n_i) — a driver-side recipe constant, same as
    * [[mixtureSample]]'s weights.
    */
  /** Default flattening scale — ONE definition feeds the API default, the
    * driver query, and (s-interpolated) its oracle SQL, so tuning the
    * knob lands on both engines at once (the SpanWidth convention).
    */
  val DefaultTemperatureScale = 4.0

  def temperatureSample(docs: DataFrame, stratum: String,
      scale: Double = DefaultTemperatureScale,
      textCol: String = "text"): DataFrame = {
    val quotas = docs.groupBy(col(stratum))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__quota",
        floor(sqrt(col("__n").cast(DoubleType)) * lit(scale)).cast(LongType))
      .select(col(stratum), col("__quota"))
    withSampleRank(docs, stratum, textCol)
      .join(broadcast(quotas), Seq(stratum))
      .filter(col("sample_rank") <= col("__quota"))
      .drop("__quota")
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
    withSampleRank(
      docs.filter(col(stratum).isin(weights.keys.toSeq: _*)),
      stratum, textCol)
      .filter(col("sample_rank") <= quotaCol)
  }

  /** Sequence-packing plan: documents concatenated in content-hash order
    * are cut into fixed `seqLen`-token training sequences; each doc gets
    * the bin it STARTS in and its token offset within that bin — the
    * standard pretraining packing layout, computed as a pure plan (no
    * packer process). The running sum is GLOBAL (one logical stratum =
    * the definitional mega-stratum), so it uses the same two-phase
    * prefix-bucket salting as everything else here: 256-way local sums +
    * a tiny offset table, bit-identical to a single-window prefix sum.
    */
  def packingPlan(docs: DataFrame, seqLen: Long,
      textCol: String = "text"): DataFrame = {
    val base = withOrderKey(docs, textCol)
      .withColumn("__all", lit(0))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
    val offs = bucketOffsets(base, "__all", col("n_tokens"))
    val w = Window.partitionBy(col("__all"), col("__b"))
      .orderBy(col("__ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__lc", sum(col("n_tokens")).over(w))
      .join(broadcast(offs), Seq("__all", "__b"))
      .withColumn("__start", col("__off") + col("__lc") - col("n_tokens"))
      .withColumn("bin_id", floor(col("__start") / seqLen))
      .withColumn("bin_offset", col("__start") % seqLen)
      .drop("__ord", "__b", "__all", "__lc", "__off", "__start")
  }

  /** Greedy token-budget selection per stratum: docs accumulate in
    * content-hash order until the running token total exceeds the budget;
    * the doc that crosses the line is excluded. The shape every
    * fixed-token-mix pretraining data recipe needs. The running sum is the
    * same two-phase salt: a local prefix sum within (stratum, bucket) +
    * the bucket's token-total offset.
    *
    * `tokenCounter` is the budget's unit of account — default whitespace
    * tokens; pass `TextAnalysis.bpeTokenCountReal(_)` to budget the tokens
    * a real BPE tokenizer would emit (a recipe that budgets the wrong
    * tokenizer's tokens is off by the compression ratio).
    */
  def tokenBudgetSample(docs: DataFrame, stratum: String, budget: Long,
      textCol: String = "text",
      tokenCounter: Column => Column = TextAnalysis.tokenCount): DataFrame = {
    val base = withOrderKey(docs, textCol)
      .withColumn("n_tokens", tokenCounter(col(textCol)))
    val offs = bucketOffsets(base, stratum, col("n_tokens"))
    val w = Window.partitionBy(col(stratum), col("__b"))
      .orderBy(col("__ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__lc", sum(col("n_tokens")).over(w))
      .join(broadcast(offs), Seq(stratum, "__b"))
      .withColumn("cum_tokens", col("__off") + col("__lc"))
      .filter(col("cum_tokens") <= budget)
      .drop("__ord", "__b", "__lc", "__off")
  }

  /** Deterministic per-document WEIGHTED sampling without replacement
    * (priority sampling, Duffield et al.): each doc gets an integer
    * priority (u · 10⁶) div w — a deterministic uniform-ish key u scaled
    * down by the doc's weight — and the sample is the k smallest
    * priorities, so selection probability grows with weight while staying
    * bit-reproducible (no RNG state, no float transcendentals). u folds
    * the first [[PriorityChars]] chars of the id's md5 hex by ascii
    * positional weights — portable to any engine with md5/ascii/substr;
    * the fold's uniformity only affects sample QUALITY, determinism and
    * the weight bias hold regardless. Ties (identical priorities) break
    * on the id. Plan shape: map-only priority computation into a global
    * top-k (TakeOrderedAndProject — bounded by k, never a full sort).
    */
  val PriorityChars = 6
  val PriorityScale = 1000000L
  // Overflow headroom is a hard constraint, not an accident (r8 advice):
  // the largest md5 hex digit is 'f' (ascii 102), so the fold's max is
  // 102·(128^PriorityChars−1)/127 ≈ 3.5e12, and u·PriorityScale must stay
  // under 2^63 or priorities silently wrap and corrupt the sample order.
  // Bumping PriorityChars to 7 or PriorityScale ×10 breaks this — fail at
  // class-init, not at query time.
  require(
    BigInt(102) * (BigInt(128).pow(PriorityChars) - 1) / 127 * PriorityScale
      <= BigInt(Long.MaxValue),
    s"weightedPriority overflows Long: 102*(128^$PriorityChars-1)/127 * $PriorityScale > 2^63-1")

  def weightedPriority(idCol: Column, weightCol: Column): Column = {
    val h = md5(idCol.cast(StringType).cast(BinaryType))
    val u = (1 to PriorityChars)
      .map(i => ascii(substring(h, i, 1)).cast(LongType) *
        lit(math.pow(128, i - 1).toLong))
      .reduce(_ + _)
    call_function("div", u * lit(PriorityScale), weightCol.cast(LongType))
  }

  def weightedSample(docs: DataFrame, weightCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame =
    docs
      .filter(col(weightCol).cast(LongType) > 0)
      .withColumn("priority", weightedPriority(col(idCol), col(weightCol)))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
}
