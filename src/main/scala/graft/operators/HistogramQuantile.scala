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
  *  - pass 1: (min, max, count) — global scalar or per-group frame
  *    (broadcast either way; the caller's group domain must be
  *    model-sized, the k-centroids discipline);
  *  - pass 2: bucket = ((v − mn)·B) div span, span = mx − mn + 1 —
  *    map-side expression into a ≤ |groups|·B-row count frame
  *    (`__b`/`__c`, the PlanSweep-bounded bucket-frame discipline);
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
  * table stats / zone maps), a bucket-frame aggregate, zero data
  * shuffles beyond the partial-agg combine — vs the exact two-phase
  * rank (`OrderedPrefix`), which shuffles the data once to rank it.
  * The sketch is also trivially MERGEABLE (histograms add), so
  * per-partition or per-day histograms roll up without re-scanning —
  * the property GK has only approximately and non-deterministically.
  * The GROUPED form ([[percentilesBy]]) inherits OrderedPrefix's
  * grouped improvement: its running-count window is partitioned by the
  * group key, so the plan has NO single-partition exchange at all.
  *
  * Quantile targets are passed as exact rationals (pct/100) and
  * resolved to ranks t = ceil(p·n) = (pct·n + 99) div 100 in integer
  * arithmetic — no float thresholds anywhere before the single final
  * DOUBLE expression.
  */
object HistogramQuantile {

  /** Global percentiles: one row per pct — (pct, n, bucket, lo, hi,
    * cum_before, in_bucket, estimate). `value` must be an exact
    * integral column; `pcts` are percentages in 1..100. Empty input →
    * empty result (no NULL row).
    */
  def percentiles(df: DataFrame, value: Column, buckets: Int,
      pcts: Seq[Int]): DataFrame =
    percentilesBy(df, Nil, value, buckets, pcts)

  /** Per-group percentiles: one row per (group, pct), each group
    * sketched against its OWN min/max range (a shared global range
    * would waste resolution on narrow groups). The group domain must be
    * model-sized — the per-group stats frame is broadcast back into the
    * scan.
    */
  def percentilesBy(df: DataFrame, groupCols: Seq[String], value: Column,
      buckets: Int, pcts: Seq[Int]): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts=$pcts must be percentages in 1..100")
    val spark = df.sparkSession
    import spark.implicits._
    val gCols = groupCols.map(col)

    // integral division (Spark's `/` on BIGINTs returns DOUBLE)
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)

    val aggs = Seq(min(value).as("__mn"), max(value).as("__mx"),
      count(value).as("__n"))
    // stats feeds BOTH the bucket scan and the rank targets; the two
    // references share one canonical aggregate subtree, which AQE's
    // ReuseExchange/ReuseSubquery collapses at runtime (verified in the
    // r9 audit: one stats scan in the executed plan). NOT localCheckpoint'd:
    // the checkpoint's opaque RDD leaf would hide the scalar-agg
    // boundedness proof PlanSweep's NL-join audit relies on.
    val stats =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(gCols: _*).agg(aggs.head, aggs.tail: _*)
    def withStats(d: DataFrame): DataFrame =
      if (groupCols.isEmpty) d.crossJoin(broadcast(stats))
      else d.join(broadcast(stats), groupCols)

    // span = mx - mn + 1; bucket of v = ((v - mn) * B) div span ∈ [0, B)
    //
    // Layout-contract guard (r9 advice): (v − mn)·B silently overflows
    // BIGINT when the span exceeds 2^63/B (with ANSI off it would yield
    // WRONG buckets, not an error). min/max are data-dependent, so a
    // driver-side require would cost an extra stats action; instead the
    // guard is an in-plan assert_true folded into the bucket expression
    // (coalesce keeps it from being pruned: NULL→0 when valid, a named
    // error naming the contract when not).
    // the second conjunct makes the guard wrap-proof: with ANSI off the
    // span expression itself wraps negative when mx - mn >= 2^63, and a
    // wrapped-negative span would otherwise satisfy the <= bound
    val guard = coalesce(
      assert_true(col("__mx") - col("__mn") + 1 >= 1 &&
        col("__mx") - col("__mn") + 1 <= Long.MaxValue / buckets,
        lit(s"HistogramQuantile layout contract violated: value span " +
          s"(mx - mn + 1) must be <= Long.MaxValue/$buckets = " +
          s"${Long.MaxValue / buckets} so the bucket expression " +
          s"(v - mn) * $buckets stays within BIGINT")),
      lit(0L))
    val bucket = idiv((value - col("__mn")) * buckets + guard,
      col("__mx") - col("__mn") + 1).as("__b")
    val hist = withStats(df.filter(value.isNotNull))
      .groupBy(gCols :+ bucket: _*)
      .agg(count(lit(1)).as("__c"))
    // running count over the bucket frame: grouped → partitioned window
    // (shuffle-parallel, zero single-partition exchanges); global → the
    // plan's only single-partition exchange, carrying ≤ B __b/__c rows
    // (the PlanSweep allowance)
    val w = Window.partitionBy(gCols: _*).orderBy(col("__b"))
    val cum = hist
      .withColumn("__cb",
        coalesce(sum(col("__c")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

    estimateFrom(cum, stats, groupCols, buckets, pcts)
  }

  /** The rank-target resolution + estimate tree, shared between the
    * batch forms above and the streaming maintainer
    * ([[graft.streaming.StreamingHistogram]]), which builds `cum` from
    * its HELD bucket-count state instead of a scan. `cum` must carry
    * `groupCols ++ (__b, __c, __cb)`; `stats` must carry
    * `groupCols ++ (__mn, __mx, __n)` with the SAME (mn, mx, buckets)
    * the histogram was bucketed under — the layout contract that makes
    * histograms mergeable.
    */
  private[graft] def estimateFrom(cum: DataFrame, stats: DataFrame,
      groupCols: Seq[String], buckets: Int, pcts: Seq[Int]): DataFrame = {
    val spark = cum.sparkSession
    import spark.implicits._
    val gCols = groupCols.map(col)
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    // per-(group, pct) rank targets: t = ceil(pct·n/100), nearest-rank.
    // Group columns renamed so the crossing join below can mix its equi
    // keys with the range condition unambiguously.
    val targets = pcts.toDF("pct")
    val withRank = stats.crossJoin(targets)
      .withColumn("__t",
        idiv(col("pct").cast("long") * col("__n") + 99, lit(100L)))
      .select(groupCols.map(c => col(c).as(s"__g_$c")) ++
        Seq(col("pct"), col("__t"), col("__n"), col("__mn"),
          col("__mx")): _*)
    val crossing = groupCols.map(c => col(c) === col(s"__g_$c"))
      .foldLeft(col("__cb") < col("__t") &&
        col("__t") <= col("__cb") + col("__c"))(_ && _)
    val joined = cum.join(broadcast(withRank), crossing)

    // lo(b) = mn + ceil(b·span/B); hi(b) = lo(b+1) − 1 (inclusive range)
    def lo(b: Column): Column =
      col("__mn") + idiv(b * (col("__mx") - col("__mn") + 1) + (buckets - 1),
        lit(buckets.toLong))
    joined
      .withColumn("lo", lo(col("__b")))
      .withColumn("hi", lo(col("__b") + 1) - 1)
      .select(gCols ++ Seq(col("pct"), col("__n").as("n"),
        col("__b").as("bucket"), col("lo"), col("hi"),
        col("__cb").as("cum_before"), col("__c").as("in_bucket"),
        (col("lo").cast(DoubleType) +
          (col("hi") - col("lo")).cast(DoubleType) *
            (col("__t") - col("__cb") - 1).cast(DoubleType) /
            col("__c").cast(DoubleType)).as("estimate")): _*)
  }
}
