package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Partition-independent approximate quantiles via a fixed equi-width
  * histogram — the engine-portable sketch rung SURVEY §8f left open:
  * built-in `approx_percentile`'s Greenwald-Khanna summary is
  * merge-order-dependent (the same data under a different partitioning
  * returns different estimates), so no cross-engine oracle can hold.
  * This sketch is a pure function of (data, min, max, B): bucket counts
  * are an ordinary groupBy (any partitioning, same histogram), and the
  * estimate is a fixed arithmetic tree over exact integers — DuckDB
  * rebuilds the whole construction in SQL and must match bit-for-bit.
  *
  * Construction over an exact integer value column v (cents discipline):
  *  - pass 1: scalar (min, max, count) — broadcast 1-row frame;
  *  - pass 2: bucket = ((v − mn)·B) div span, span = mx − mn + 1 —
  *    map-side expression into a ≤ B-row count frame (`__b`/`__c`, the
  *    PlanSweep-bounded bucket-frame discipline; the only
  *    single-partition exchange of the plan carries it);
  *  - estimate for rank target t (1-based): the bucket where the running
  *    count first reaches t, linearly interpolated inside it:
  *    est = lo + (hi − lo) · (t − cumBefore − 1) / __c, every operand an
  *    exact BIGINT and the combination one fixed DOUBLE tree (IEEE-
  *    identical on any engine). Bucket b's true value range is
  *    lo(b) = mn + ceil(b·span / B) .. lo(b+1) − 1 by inversion of the
  *    bucket function, so the estimate is always inside the bucket's
  *    actual range and error is bounded by one bucket width
  *    (≤ span/B + 1).
  *
  * Scale shape at 100 TB: two scans (one if min/max are known from
  * table stats / zone maps), a B-row aggregate, zero data shuffles
  * beyond the partial-agg combine — vs the exact two-phase rank
  * (`OrderedPrefix`), which shuffles the data once to rank it. The
  * sketch is also trivially MERGEABLE (histograms add), so per-partition
  * or per-day histograms roll up without re-scanning — the property GK
  * has only approximately and non-deterministically.
  *
  * Quantile targets are passed as exact rationals (`pNum/pDen`, e.g.
  * 25/100) and resolved to ranks t = ceil(p·n) = (pNum·n + pDen − 1)
  * div pDen in integer arithmetic — no float thresholds anywhere before
  * the single final DOUBLE expression.
  */
object HistogramQuantile {

  /** Per-percentile one row: (pct, n, bucket, lo, hi, cum_before, in_bucket,
    * estimate). `value` must be an exact integral column; `pcts` are
    * percentages in 1..100. Empty input → empty result (no NULL row).
    */
  def percentiles(df: DataFrame, value: Column, buckets: Int,
      pcts: Seq[Int]): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts=$pcts must be percentages in 1..100")
    val spark = df.sparkSession
    import spark.implicits._

    // integral division (Spark's `/` on BIGINTs returns DOUBLE)
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)

    val stats = df.agg(min(value).as("__mn"), max(value).as("__mx"),
      count(value).as("__n"))
    // span = mx - mn + 1; bucket of v = ((v - mn) * B) div span ∈ [0, B)
    val hist = df.filter(value.isNotNull).crossJoin(broadcast(stats))
      .groupBy(idiv((value - col("__mn")) * buckets,
        col("__mx") - col("__mn") + 1).as("__b"))
      .agg(count(lit(1)).as("__c"))
    // running count over the ≤ B-row bucket frame — the plan's only
    // single-partition exchange, bounded by construction (PlanSweep's
    // __b/__c allowance)
    val w = Window.orderBy(col("__b"))
    val cum = hist
      .withColumn("__cb",
        coalesce(sum(col("__c")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

    val targets = pcts.map(p => (p, p.toLong, 100L)).toDF("pct", "__pn", "__pd")
    // t = ceil(p·n): the rank the percentile must cover (nearest-rank)
    // non-equi crossing join: broadcast the |pcts|-row target frame into
    // the ≤ B-row cumulative frame (both sides bounded by construction)
    val withRank = targets.crossJoin(broadcast(stats))
      .withColumn("__t",
        idiv(col("__pn") * col("__n") + col("__pd") - 1, col("__pd")))
    val joined = cum.join(broadcast(withRank),
      col("__cb") < col("__t") && col("__t") <= col("__cb") + col("__c"))
    // lo(b) = mn + ceil(b·span/B); hi(b) = lo(b+1) − 1 (inclusive range)
    def lo(b: Column): Column =
      col("__mn") + idiv(b * (col("__mx") - col("__mn") + 1) + (buckets - 1),
        lit(buckets.toLong))
    joined
      .withColumn("lo", lo(col("__b")))
      .withColumn("hi", lo(col("__b") + 1) - 1)
      .select(col("pct"), col("__n").as("n"), col("__b").as("bucket"),
        col("lo"), col("hi"), col("__cb").as("cum_before"),
        col("__c").as("in_bucket"),
        (col("lo").cast(DoubleType) +
          (col("hi") - col("lo")).cast(DoubleType) *
            (col("__t") - col("__cb") - 1).cast(DoubleType) /
            col("__c").cast(DoubleType)).as("estimate"))
  }
}
