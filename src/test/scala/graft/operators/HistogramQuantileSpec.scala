package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the histogram-quantile sketch's contract: estimates land inside
  * the crossing bucket's true value range (error ≤ one bucket width),
  * the exact value is recovered when buckets are fine enough to isolate
  * values, the result is a pure function of the data — IDENTICAL under
  * repartitioning (the property approx_percentile's GK summary lacks,
  * and the whole reason this operator exists), nearest-rank semantics
  * at the edges, empty-input degeneration, and the parameter guards.
  */
class HistogramQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def pctRows(values: Seq[Long], buckets: Int, pcts: Seq[Int],
      parts: Int = 2): Map[Int, (Long, Long, Long, Double)] =
    HistogramQuantile.percentiles(
      spark.createDataset(values).repartition(parts).toDF("v"),
      col("v"), buckets, pcts)
      .select(col("pct"), col("lo"), col("hi"), col("n"), col("estimate"))
      .as[(Int, Long, Long, Long, Double)].collect()
      .map { case (p, lo, hi, n, e) => p -> (lo, hi, n, e) }.toMap

  test("estimate lands inside the crossing bucket; exact when isolated") {
    val vs = (1L to 1000L)
    val got = pctRows(vs, 1000, Seq(1, 25, 50, 75, 90, 99))
    // 1000 buckets over 1..1000: every value isolated → estimate exact
    // (nearest-rank: ceil(p·n/100)-th value)
    for ((p, (lo, hi, n, e)) <- got) {
      assert(n == 1000)
      val exact = math.ceil(p * 1000.0 / 100).toLong
      assert(lo == exact && hi == exact && e == exact.toDouble,
        s"pct $p: got ($lo,$hi,$e), want exact $exact")
    }
    // coarse buckets: estimate within the bucket's true range, and the
    // true nearest-rank value lives in the same bucket
    val coarse = pctRows(vs, 7, Seq(1, 25, 50, 75, 90, 99))
    for ((p, (lo, hi, _, e)) <- coarse) {
      assert(e >= lo && e <= hi, s"pct $p: estimate $e outside [$lo,$hi]")
      val exact = math.ceil(p * 1000.0 / 100).toLong
      assert(exact >= lo && exact <= hi,
        s"pct $p: true value $exact outside crossing bucket [$lo,$hi]")
    }
  }

  test("pure function of the data: identical under any partitioning") {
    val vs = Seq.tabulate(5000)(i => (i.toLong * 7919) % 100003)
    val a = pctRows(vs, 64, Seq(10, 50, 95), parts = 1)
    val b = pctRows(vs, 64, Seq(10, 50, 95), parts = 13)
    val c = pctRows(vs.reverse, 64, Seq(10, 50, 95), parts = 5)
    assert(a == b && b == c,
      "sketch changed under repartitioning — partition independence broken")
  }

  test("skew, duplicates and edge ranks") {
    // heavy duplicate mass: one value holds ranks 1..900
    val vs = Seq.fill(900)(5L) ++ (1L to 100L).map(_ + 1000L)
    val got = pctRows(vs, 32, Seq(1, 50, 90, 99))
    assert(got(1)._4 >= got(1)._1 && got(1)._4 <= got(1)._2)
    // p50 and p90 fall in the duplicate mass's bucket: 5 ∈ [lo, hi]
    for (p <- Seq(1, 50, 90)) {
      val (lo, hi, _, _) = got(p)
      assert(5L >= lo && 5L <= hi, s"pct $p: bucket [$lo,$hi] misses 5")
    }
    // p99 → rank 990 → value 1090 region
    val (lo99, hi99, _, _) = got(99)
    assert(1090L >= lo99 && 1090L <= hi99)
    // negative values work (pmod-free construction)
    val neg = pctRows(Seq(-500L, -100L, 0L, 100L, 500L), 16, Seq(50))
    val (lo, hi, _, _) = neg(50)
    assert(0L >= lo && 0L <= hi)
  }

  test("empty input and null values degenerate cleanly") {
    val empty = HistogramQuantile.percentiles(
      spark.createDataset(Seq.empty[Long]).toDF("v"), col("v"), 16, Seq(50))
    assert(empty.count() == 0)
    val withNulls = HistogramQuantile.percentiles(
      Seq(Some(1L), None, Some(3L), None, Some(5L))
        .toDF("v"), col("v"), 16, Seq(50))
      .select(col("n"), col("estimate")).as[(Long, Double)].collect()
    assert(withNulls.length == 1 && withNulls.head._1 == 3,
      "null values must be excluded from n and ranks")
  }

  test("grouped form: each group equals its own global sketch") {
    val g1 = (1L to 500L)
    val g2 = Seq.tabulate(300)(i => (i.toLong * 31) % 7001 - 3000)
    val df = (g1.map(("a", _)) ++ g2.map(("b", _))).toDF("g", "v")
      .repartition(5)
    val grouped = HistogramQuantile
      .percentilesBy(df, Seq("g"), col("v"), 32, Seq(10, 50, 95))
      .select(col("g"), col("pct"), col("lo"), col("hi"), col("n"),
        col("estimate"))
      .as[(String, Int, Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3, r._4, r._5, r._6)).toSet
      }
    def global(vs: Seq[Long]) = HistogramQuantile
      .percentiles(vs.toDF("v"), col("v"), 32, Seq(10, 50, 95))
      .select(col("pct"), col("lo"), col("hi"), col("n"), col("estimate"))
      .as[(Int, Long, Long, Long, Double)].collect().toSet
    assert(grouped("a") == global(g1),
      "group a diverges from its standalone sketch")
    assert(grouped("b") == global(g2),
      "group b diverges from its standalone sketch — per-group ranges leak")
  }

  test("stats subtree is reused at runtime, not recomputed") {
    // stats feeds both the bucket scan and the rank targets; the
    // operator deliberately does NOT localCheckpoint it (that would
    // hide the scalar-agg boundedness proof from PlanSweep's NL-join
    // audit) and relies on AQE's ReuseExchange collapsing the two
    // identical aggregate subtrees — pin that this actually happens,
    // or a Spark upgrade could silently double the stats scan
    val df = (1L to 10000L).toDF("v").repartition(4)
    val out = HistogramQuantile.percentiles(df, col("v"), 64, Seq(50, 90))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(plan).nonEmpty,
      "no ReusedExchange in the executed plan — the stats scan runs twice")
  }

  test("parameter guards") {
    val df = Seq(1L).toDF("v")
    intercept[IllegalArgumentException] {
      HistogramQuantile.percentiles(df, col("v"), 0, Seq(50))
    }
    intercept[IllegalArgumentException] {
      HistogramQuantile.percentiles(df, col("v"), 16, Seq())
    }
    intercept[IllegalArgumentException] {
      HistogramQuantile.percentiles(df, col("v"), 16, Seq(0))
    }
    intercept[IllegalArgumentException] {
      HistogramQuantile.percentiles(df, col("v"), 16, Seq(101))
    }
  }
}
