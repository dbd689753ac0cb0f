package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Named contract for within-group PAIR ENUMERATION (q16 basket pairs,
  * q43 item-item cosine, q69 k-core edge build): a group with B items
  * contributes B·(B−1)/2 pairs, so the pair stage is QUADRATIC in the
  * largest group. TPC-H bounds lineitems-per-order structurally at 7,
  * and real basket data rarely exceeds a few hundred — but a single
  * pathological mega-order (an upstream data-quality bug: a default key,
  * a dedup miss) silently turns one task into a B² explosion. This is
  * the `IntervalJoin.MaxOffsetBuckets` / hot-bucket-blacklist discipline
  * applied to self-join fanout: NAME the bound, and offer an in-plan
  * tripwire instead of an unexplained 10-hour straggler.
  *
  * [[guard]] is OPT-IN (conf `graft.pairFanout.assert`, default off)
  * because the assertion itself costs a window count; when enabled it
  * RIDES the key the pair join shuffles on anyway — the window's
  * hash-partitioning on `groupCol` is exactly the exchange the
  * subsequent self-join reuses, so the added cost is one partial count,
  * not an extra shuffle.
  */
object PairFanout {

  /** Default ceiling on items per group before the guard trips. 10k items
    * in one group is ~50M pairs from a single key — a one-task straggler
    * ~7000× the TPC-H structural bound of 7, unambiguously upstream
    * corruption rather than a big basket.
    */
  val MaxItemsPerGroup: Int = 10000

  val ConfKey = "graft.pairFanout.assert"

  /** Pass-through unless `graft.pairFanout.assert=true`; then every group
    * key in `df` is asserted to hold at most `max` rows via an in-plan
    * `assert_true` (SparkException names the key and count on trip). The
    * window partitions on `groupCol` — the same hash exchange the caller's
    * self-join needs, so enabling the guard adds no extra shuffle ahead
    * of a pair join keyed on `groupCol`.
    */
  def guard(spark: SparkSession, df: DataFrame, groupCol: String,
      max: Int = MaxItemsPerGroup): DataFrame = {
    val on = spark.conf.getOption(ConfKey).exists(_.toBoolean)
    if (!on) df
    else {
      val w = Window.partitionBy(col(groupCol))
      df.withColumn("__fan", count(lit(1)).over(w))
        .withColumn("__fan_ok", assert_true(col("__fan") <= lit(max.toLong),
          concat(lit(s"PairFanout: group key "), col(groupCol).cast("string"),
            lit(s" has "), col("__fan").cast("string"),
            lit(s" items > max $max — quadratic pair explosion upstream"))))
        .filter(col("__fan_ok").isNull)
        .drop("__fan", "__fan_ok")
    }
  }
}
