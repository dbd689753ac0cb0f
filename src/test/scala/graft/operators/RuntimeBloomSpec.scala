package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the knob that matters for the
  * 100 TB fact⋈filtered-dim join: Catalyst builds a bloom filter over the
  * (selectively filtered) creation side's join keys and injects
  * `bloom_filter_might_contain` as a row-level filter on the application
  * side's scan, so fact rows that cannot match die at the scan instead of
  * crossing the shuffle. Local thresholds are sized for warehouses
  * (creation ≤ 10 MB, application ≥ 10 GB scan), so the test clone drops
  * them to zero to prove the plan shape the production config would
  * produce; broadcast is disabled because a broadcast join prunes by
  * hashing already and Catalyst rightly skips bloom there.
  */
class RuntimeBloomSpec extends SparkSpec {

  test("selective shuffle join gets a bloom filter on the fact side") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(s, dir)
    val ord = graft.Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("l_quantity")).as("q"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    // rendered as: Filter might_contain(scalar-subquery [bloom_filter_agg
    // over the filtered creation side], xxhash64(l_orderkey)) on the FACT
    // relation — row-level pruning at the scan, before the shuffle
    assert(optimized.contains("might_contain") &&
      optimized.contains("bloom_filter_agg"),
      s"no runtime bloom filter injected:\n$optimized")

    // and the pruned plan still computes the same answer
    val plain = spark.newSession()
    plain.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val expect = graft.Tables.lineitem(plain, dir)
      .join(graft.Tables.orders(plain, dir)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("l_quantity")).as("q"))
      .collect().map(_.toSeq).toSet
    assert(joined.collect().map(_.toSeq).toSet == expect)
  }
}
