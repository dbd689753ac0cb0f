package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Exact GLOBAL order statistics — row_number, inclusive running sum,
  * NTILE — without ever moving the data frame through a single-partition
  * window: the q29 two-phase discipline (Workload.spendDeciles) factored
  * for reuse.
  *
  * Phase 1 salts each row with a value bucket that is MONOTONE in the
  * global order (a coarsening of the leading order key, e.g. `-spend/100`
  * for a spend-descending order), aggregates per-bucket row counts (and
  * optionally sums), and runs the only unpartitioned windows of the plan
  * over that tiny bucket frame (≈ value-range/width rows) to get each
  * bucket's running offset. Phase 2 ranks rows WITHIN their bucket (a
  * partitioned window — shuffle-parallel) and adds the broadcast offsets:
  * global rank = bucket offset + local rank, global running sum = bucket
  * sum-offset + local running sum. `DecilePlanSpec` pins bit-equality
  * with the single-window forms on tie/edge frames, and the repo-wide
  * `PlanSweep` proves the only single-partition exchanges carry the
  * `__b`/`__c`/`__s` bucket frame.
  *
  * At 100 TB this is the difference between a one-task sort of ~1.5 B
  * customer rows and a normal shuffle: the global-order work is done on
  * the bucket HISTOGRAM, which scales with the value range, not the data.
  *
  * CONTRACT (caller):
  *  - `bucket` must be monotone NON-DECREASING along the global order
  *    (rows earlier in `orderCols` order get a <= bucket value), and rows
  *    tying on the FULL `orderCols` key must share a bucket — both hold
  *    automatically when bucket is a monotone function of the leading
  *    order expression, e.g. a negated fixed-width floor for DESC orders.
  *  - `orderCols` must be a total order (carry tie-breakers) for the rank
  *    to be deterministic.
  *  - the bucket frame must be small (bounded value range / width);
  *    that is what keeps the unpartitioned offset windows scale-safe.
  */
object OrderedPrefix {

  /** Appends `__rank` (global 1-based row_number, BIGINT) and `__n`
    * (total row count) to `df`; with `sumExpr`, also `__prefix` (the
    * inclusive running sum of `sumExpr` in global order) and `__total`
    * (its grand total). Internal columns (`__b` etc.) are dropped.
    */
  def rankAndPrefix(df: DataFrame, bucket: Column, orderCols: Seq[Column],
      sumExpr: Option[Column] = None): DataFrame =
    rankAndPrefixBy(df, Nil, bucket, orderCols, sumExpr)

  /** The grouped form: `__rank`/`__n` (and `__prefix`/`__total`) are
    * computed WITHIN each group of `groupCols` — exact per-group order
    * statistics. Same two-phase discipline, with one improvement at
    * scale: the offset windows are partitioned by the group key, so
    * even the bucket-histogram pass is shuffle-parallel — a grouped
    * rank/percentile plan has NO single-partition exchange at all
    * (the global form's histogram window is its only one). The bucket
    * contract is per group: monotone non-decreasing along each group's
    * `orderCols` order. `groupCols = Nil` degenerates to the global
    * form bit-for-bit (Window.partitionBy() == Window.orderBy's empty
    * partition spec).
    */
  def rankAndPrefixBy(df: DataFrame, groupCols: Seq[String], bucket: Column,
      orderCols: Seq[Column], sumExpr: Option[Column] = None): DataFrame = {
    val gCols = groupCols.map(col)
    val gKeys = gCols :+ col("__b")
    // feeds BOTH the bucket-count frame and the rank join — without
    // staging, everything upstream of `df` executes twice (the
    // q05b/spendDeciles ReuseExchange lesson). r16 note: pre-keying this
    // checkpoint on the window key (fanoutBy(gKeys)) was measured and
    // REVERTED — the checkpointed RDD's partitioning is not credited by
    // the planner here, so the window re-exchanged anyway and every
    // consumer paid an extra shuffle (q35 0.75→1.75 s).
    val base = df.withColumn("__b", bucket).localCheckpoint(false)
    val counts = sumExpr match {
      case Some(s) =>
        base.groupBy(gKeys: _*).agg(count(lit(1)).as("__c"), sum(s).as("__s"))
      case None =>
        base.groupBy(gKeys: _*).agg(count(lit(1)).as("__c"))
    }
    val wOff = Window.partitionBy(gCols: _*).orderBy(col("__b"))
    val prevRows = wOff.rowsBetween(Window.unboundedPreceding, -1)
    val allRows =
      wOff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs0 = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(prevRows), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(allRows))
    val offs = sumExpr match {
      case Some(_) => offs0
        .withColumn("__soff", coalesce(sum(col("__s")).over(prevRows), lit(0)))
        .withColumn("__total", sum(col("__s")).over(allRows))
        .select(gKeys ++ Seq(col("__off"), col("__n"),
          col("__soff"), col("__total")): _*)
      case None => offs0.select(gKeys ++ Seq(col("__off"), col("__n")): _*)
    }
    val wLocal = Window.partitionBy(gKeys: _*).orderBy(orderCols: _*)
    val ranked = sumExpr match {
      case Some(s) => base
        .withColumn("__lr", row_number().over(wLocal))
        .withColumn("__ls",
          sum(s).over(wLocal.rowsBetween(Window.unboundedPreceding, 0)))
      case None => base.withColumn("__lr", row_number().over(wLocal))
    }
    val joined = ranked.join(broadcast(offs), groupCols :+ "__b")
      .withColumn("__rank", col("__off") + col("__lr"))
    val out = sumExpr match {
      case Some(_) => joined.withColumn("__prefix", col("__soff") + col("__ls"))
      case None => joined
    }
    out.drop("__b", "__lr", "__off", "__ls", "__soff")
  }

  /** Exact NTILE(k) over the `__rank`/`__n` columns rankAndPrefix emits.
    * Closed form on global rank r in 1..N: with q = N div k, rem = N % k,
    * the first rem tiles hold q+1 rows; ceil-div is (x + d - 1) div d —
    * integer arithmetic throughout, exact at any N, and the when-branch
    * covers every row when q = 0 (N < k), so the otherwise-branch's
    * div-by-q is never evaluated there (CaseWhen evaluates lazily).
    */
  def ntileCol(k: Int): Column = {
    require(k >= 1)
    val q = expr(s"__n div $k")
    val rem = col("__n") % k
    when(col("__rank") <= rem * (q + lit(1)),
      expr(s"(__rank + (__n div $k)) div ((__n div $k) + 1)"))
      .otherwise(rem + expr(
        s"(__rank - (__n % $k) * ((__n div $k) + 1) + (__n div $k) - 1)" +
          s" div (__n div $k)"))
      .cast(IntegerType)
  }
}
