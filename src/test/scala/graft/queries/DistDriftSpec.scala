package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** The generated testdata's two order years are distribution-identical
  * (every contrib ≈ 0, nothing flagged), so the detector's POSITIVE path
  * is pinned here on planted drift: the observed year concentrated in a
  * value range the reference year never reached — exercising both the
  * flag threshold and the add-one smoothing that keeps a ref_n = 0
  * bucket (drift INTO new territory) defined.
  */
class DistDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("planted drift into a never-seen bucket is flagged; matched " +
    "mass is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dd").toString
    try {
      val ref = (1 to 20).map(i => (i.toDouble, ts("2023-06-01")))
      val obs = (1 to 20).map(_ => (100.0, ts("2024-06-01")))
      (ref ++ obs).toDF("o_totalprice", "o_orderdate")
        .coalesce(1).write.parquet(s"$dir/orders.parquet")

      val out = EtlQueries.distDrift.run(spark, dir).collect()
      val byBucket = out.map(r => r.getInt(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(6))).toMap
      // all observed mass lands in the top bucket of the COMBINED range
      // (cents 100..10000, B = 20 → bucket 19), which the reference year
      // never occupied: ref_n = 0, smoothing keeps contrib finite, and
      // d ≈ 0.975 → contrib ≈ 38 ≫ 3.84
      assert(byBucket(19) == (0L, 20L, true))
      // reference-only buckets lose mass but under-threshold
      val flagged = out.filter(_.getBoolean(6)).map(_.getInt(0)).toSet
      assert(flagged == Set(19), s"flagged buckets: $flagged")
      assert(out.map(_.getLong(3)).sum == 20L)
      assert(out.map(_.getLong(4)).sum == 20L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("duplicated scalar subtrees are reused at runtime, not " +
    "recomputed") {
    // base feeds stats AND the bucket scan, stats feeds the bucket key
    // AND the final calc — the static plan shows the subtrees expanded.
    // AQE's ReuseExchange must collapse them (the q47 discipline): pin
    // it so a Spark upgrade cannot silently multiply the orders passes.
    val out = EtlQueries.distDrift.run(spark, "/root/testdata/sf0.001")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(plan).nonEmpty,
      "no ReusedExchange in the executed plan — duplicated subtrees " +
        "are running multiple times")
  }
}
