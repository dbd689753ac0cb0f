package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exact median (q24) needs a full sort per group — correct, but at
  * 100 TB the scale path is approx_percentile (GK sketch: one pass,
  * mergeable partials, no per-group sort). This spec pins the substitution
  * contract: the sketch median lands within the accuracy bound of the
  * exact composed median on real data, so swapping it in at scale is a
  * measured trade, not a hope.
  */
class MedianScalePathSpec extends SparkSpec {

  test("approx_percentile median tracks the exact q24 median at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val exact = Workload.q24.run(spark, dir)
      .select("c_mktsegment", "median_order_value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val approx = graft.Tables.orders(spark, dir)
      .join(graft.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      // accuracy 10000 -> rank error <= n/10000; one pass, no sort
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
        .as("approx_median"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(exact.keySet == approx.keySet)
    exact.foreach { case (seg, m) =>
      val a = approx(seg)
      // rank-based bound, value-checked loosely: within 2% of the exact
      // median's value on this distribution
      assert(math.abs(a - m) / m < 0.02,
        s"$seg: approx $a vs exact $m drifts >2%")
    }
  }
}
