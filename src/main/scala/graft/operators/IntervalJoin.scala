package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — pairs of rows whose [start, end] intervals
  * intersect (boundaries inclusive). The naive realization is a theta
  * join (O(n·m) nested loop); this one is the bucketed equi-join used by
  * spatial/temporal engines:
  *
  *  1. explode each interval to the fixed-width time buckets it covers;
  *  2. equi-join on the bucket id — shuffle-partitionable, AQE-plannable,
  *     never all-pairs;
  *  3. keep true overlaps (`l.start <= r.end && r.start <= l.end`);
  *  4. REPORT-ONCE rule instead of a wide dropDuplicates: a pair sharing
  *     k buckets appears k times, so each pair is credited only to the
  *     bucket containing the LATER of the two starts — every true pair
  *     survives exactly once, deduped for free at the filter.
  *
  * Bucket width trades replication (intervals spanning many buckets)
  * against bucket occupancy (many intervals per bucket); set it near the
  * typical interval length. Extends the join family past J3's
  * interval-vs-SCALAR range join (SURVEY §2.4) to interval-vs-interval.
  */
object IntervalJoin {

  /** Cap on [[overlapCounts]]' offset frame — one row per OCCUPIED time
    * bucket (≤ span/bucketMillis), globalized through a single-partition
    * window and a broadcast join. 4M rows ≈ 64 MB: comfortably
    * single-window- and broadcast-sized, far above any sane
    * bucketMillis/span pairing (a 30-year span at 1-minute buckets is
    * ~16M — at that point bucketMillis is mis-sized and the in-plan
    * guard says so by name).
    */
  val MaxOffsetBuckets: Long = 4L * 1024 * 1024

  /** @param left/right  frames with DISTINCT column names (caller renames)
    * @param lStart,lEnd,rStart,rEnd  timestamp column names. CONTRACT:
    *        start <= end on every row — rows violating it are DROPPED
    *        (a backwards interval has no defined overlap semantics, and
    *        letting it through would silently skew the bucket explode).
    * @param bucketMillis bucket width in milliseconds
    * @param maxBucketRows hot-bucket guard (the hotgram-blacklist
    *        discipline from llm/Dedup applied to `__bk`): buckets holding
    *        more than this many exploded rows on EITHER side are
    *        blacklisted via a groupBy-count → unhinted anti join before
    *        the equi join, because one bucket with B concurrent intervals
    *        contributes ~B² pairs — a single pathological hour with 10⁶
    *        co-tenant sessions is a 10¹²-row one-bucket explosion no
    *        consumer wants. POLICY SEMANTICS: a pair whose crediting
    *        bucket (the one containing the later start) is blacklisted is
    *        dropped, so with a finite cap the output is exact on every
    *        bucket under the cap and empty on buckets over it — identical
    *        to the uncapped join whenever no bucket is hot (the capped
    *        path is oracled row-equal on the real corpus in
    *        etl_session_overlap; measured: `ScaleProbe hotbucket`).
    *        Default = no cap.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketMillis: Long, maxBucketRows: Long = Long.MaxValue): DataFrame = {
    def buckets(s: String, e: String) = sequence(
      floor(unix_millis(col(s)) / bucketMillis),
      floor(unix_millis(col(e)) / bucketMillis))
    val l = left.filter(col(lStart) <= col(lEnd))
      .withColumn("__bk", explode(buckets(lStart, lEnd)))
    val r = right.filter(col(rStart) <= col(rEnd))
      .withColumn("__bk", explode(buckets(rStart, rEnd)))
    // hot-bucket blacklist: only over-cap buckets survive the HAVING,
    // but that set is <= (|l|+|r|)/maxBucketRows — corpus-scaling — so
    // the anti joins carry no forced hint (AQE broadcasts while it fits)
    val (lc, rc) =
      if (maxBucketRows == Long.MaxValue) (l, r)
      else {
        val hot = l.groupBy("__bk").agg(count(lit(1)).as("__n"))
          .unionByName(r.groupBy("__bk").agg(count(lit(1)).as("__n")))
          .groupBy("__bk").agg(max(col("__n")).as("__n"))
          .filter(col("__n") > maxBucketRows)
          .select("__bk")
        // hot is <= (|l|+|r|)/maxBucketRows — corpus-scaling, so the
        // anti joins are unhinted: AQE broadcasts while the set fits
        (l.join(hot, Seq("__bk"), "left_anti"),
          r.join(hot, Seq("__bk"), "left_anti"))
      }
    lc.join(rc, Seq("__bk"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bk") === floor(
        greatest(unix_millis(col(lStart)), unix_millis(col(rStart)))
          / bucketMillis))
      .drop("__bk")
  }

  /** Overlap COUNTS without the pair stream: when the deliverable is "how
    * many intervals overlap mine" (not the pairs themselves), the answer
    * is pure rank arithmetic over interval endpoints —
    *
    *   #overlaps(i) = #{starts <= end_i} − #{ends < start_i} − 1 (self)
    *
    * — because an interval j fails to overlap [s_i, e_i] exactly when it
    * starts after e_i or ends before s_i. [[overlapJoin]]'s intermediate
    * is quadratic in per-bucket concurrency (inherent when the PAIRS are
    * the output); this form touches each interval twice, O(n log n) — at
    * 100 TB of co-tenant intervals this is the difference between a scan
    * and an explosion. Measured (`ScaleProbe overlap`, 10-min sessions
    * over 30 days): 24× sessions → 576× pairs; pair-join time ×13.6,
    * this plan ×1.7, crossing over near ~10⁸ pairs (4.0 s vs 2.2 s at
    * 1.2M sessions / 721M pairs, totals asserted equal). Both ranks come
    * from [[countLE]]'s two-phase bucketed running count: no global
    * window anywhere.
    *
    * Returns the input plus `n_overlap` (count EXCLUDING self; intervals
    * of the same group that merely touch are counted — boundaries
    * inclusive, same semantics as overlapJoin).
    *
    * CONTRACT: `startCol <= endCol` on every row. The rank identity
    * assumes it — a backwards interval contributes its endpoints to the
    * wrong side of both counts and silently skews n_overlap for every
    * row it brackets (it cannot be dropped here because the output
    * carries one row per input row). Validate upstream; the session
    * frames feeding this operator satisfy it by construction
    * (session_start = MIN(ts), session_end = MAX(ts)).
    *
    * CONTRACT: the offset frame is bounded by OCCUPIED buckets ≤
    * time-span / bucketMillis, and that frame rides one single-partition
    * window (it is the globalizing step) — so `bucketMillis` must be
    * sized to the data: choose it ≥ span / [[IntervalJoin.MaxOffsetBuckets]].
    * The bound is enforced IN-PLAN (assert_true folded into the offset
    * expression, riding the window's existing sort — no extra action, the
    * HistogramQuantile span-guard discipline): a pathological
    * bucketMillis fails with a named error instead of silently funneling
    * an unbounded frame through one task. Override `maxOffsetBuckets` to
    * tighten (tests) — the default is ~64 MB of offset rows, broadcast-
    * and single-window-safe.
    */
  def overlapCounts(intervals: DataFrame, startCol: String, endCol: String,
      bucketMillis: Long,
      maxOffsetBuckets: Long = MaxOffsetBuckets): DataFrame = {
    require(bucketMillis >= 1, s"bucketMillis must be >= 1, got $bucketMillis")
    val starts = intervals.select(col(startCol).as("__p"))
    val ends = intervals.select(col(endCol).as("__p"))
    val withA = countLE(starts, intervals, endCol, "__a",
      strict = false, bucketMillis, maxOffsetBuckets) // #{starts <= end_i}
    val withB = countLE(ends, withA, startCol, "__bcnt",
      strict = true, bucketMillis, maxOffsetBuckets) // #{ends < start_i}
    withB
      .withColumn("n_overlap", col("__a") - col("__bcnt") - 1)
      .drop("__a", "__bcnt")
  }

  /** For every probe row: the number of `points` at or before (or
    * strictly before) the probe's `probeCol` value — a distributed rank,
    * computed WITHOUT a global sort: points and probes union into
    * fixed-width time buckets; a per-bucket window produces local running
    * counts; a tiny per-bucket offset frame (`__b`/`__c`, one row per
    * bucket — partially aggregated, broadcast back) globalizes them. The
    * same two-phase discipline as the salted sampling ranks
    * (llm/Sampling.scala), with event time as the natural salt.
    *
    * Inclusive ties: points at the probe's exact value count when
    * `strict` is false (points order before equal probes) and don't when
    * strict (probes order first). Probe-vs-probe order at equal value
    * cannot affect any count (probes contribute 0 to the running sum).
    */
  private def countLE(points: DataFrame, probes: DataFrame,
      probeCol: String, outCol: String, strict: Boolean,
      bucketMillis: Long, maxOffsetBuckets: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probeCols = probes.columns
    val pts = points
      .select(col("__p").as("__v"))
      .withColumn("__isPt", lit(1))
    val ptsAligned = probeCols.foldLeft(pts)((df, c) =>
      df.withColumn(c, lit(null).cast(probes.schema(c).dataType)))
    val prb = probes
      .withColumn("__v", col(probeCol))
      .withColumn("__isPt", lit(0))
    val unioned = ptsAligned.unionByName(prb)
      .withColumn("__vb", floor(unix_millis(col("__v")) / bucketMillis))
    // bounded offset frame: one row per OCCUPIED bucket — including
    // probe-only buckets (with __c = 0), whose probes still need the
    // cumulative count of every earlier bucket's points
    // Occupied-bucket guard (the HistogramQuantile span-guard
    // discipline): the offset frame rides ONE single-partition window,
    // so its row count — occupied buckets, <= span/bucketMillis — must
    // stay bounded. row_number over the SAME window order costs nothing
    // extra (same sort, same pass); assert_true names the contract when
    // a pathological bucketMillis would funnel an unbounded frame
    // through one task, instead of silently degrading.
    val offWin = Window.orderBy(col("__b"))
    val guard = coalesce(
      assert_true(row_number().over(offWin) <= maxOffsetBuckets,
        lit(s"IntervalJoin offset-frame contract violated: occupied " +
          s"buckets exceed $maxOffsetBuckets — bucketMillis=$bucketMillis " +
          s"is too fine for the data's time span; choose bucketMillis >= " +
          s"span/$maxOffsetBuckets")).cast("long"),
      lit(0L))
    val offs = unioned
      .groupBy(col("__vb").as("__b")).agg(sum(col("__isPt")).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(offWin
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + guard)
      .select(col("__b"), col("__off"))
    // points first at equal value for <=, probes first for <
    val tie = if (strict) col("__isPt") else -col("__isPt")
    val w = Window.partitionBy(col("__vb")).orderBy(col("__v"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__run", sum(col("__isPt")).over(w))
      .filter(col("__isPt") === 0)
      .join(broadcast(offs), col("__vb") === col("__b"), "left")
      .withColumn(outCol,
        coalesce(col("__off"), lit(0L)) + col("__run"))
      .select(probeCols.map(col) :+ col(outCol): _*)
  }
}
