package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins q29's two-phase decile plan (Workload.spendDeciles) two ways:
  *
  *  1. BIT-EQUALITY with the single-window `ntile(10).over(orderBy(spend
  *     DESC, custkey))` form it replaced — on frames that exercise every
  *     NTILE edge: N % 10 != 0 (uneven tiles), N < 10 (q = 0, the
  *     div-by-zero branch must stay un-evaluated), spend ties resolved by
  *     custkey, and an adversarial all-one-bucket frame (every spend in
  *     the same $100 bucket, so correctness cannot lean on the salt
  *     spreading rows).
  *  2. PLAN SHAPE: no `ntile` anywhere, and any window WITHOUT a
  *     partitionSpec (single-partition by definition) reads only the
  *     per-bucket count frame (__b/__c) — never the per-customer frame.
  *     This is the regression the verdict flagged: a global window over
  *     |customers| rows is a one-task sort of ~1.5 B rows at 100 TB.
  */
class DecilePlanSpec extends SparkSpec {
  import spark.implicits._

  private def perFrame(spends: Seq[(Long, String)]): DataFrame =
    spends.toDF("o_custkey", "s")
      .select(col("o_custkey"), col("s").cast(DecimalType(18, 2)).as("spend"))

  /** The replaced form, kept here as the spec's oracle. */
  private def singleWindowDeciles(per: DataFrame): DataFrame = {
    val w = Window.orderBy(col("spend").desc, col("o_custkey"))
    per.withColumn("decile", ntile(10).over(w))
  }

  private def assertSame(per: DataFrame): Unit = {
    val got = Workload.spendDeciles(per)
      .select("o_custkey", "decile").as[(Long, Int)].collect().sortBy(_._1)
    val want = singleWindowDeciles(per)
      .select("o_custkey", "decile").as[(Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("bucketed deciles == single-window ntile, N % 10 != 0, ties") {
    // 23 rows (base 2, rem 3 -> tiles of 3,3,3,2,2,...), spend ties at
    // 500.00 and 0.00 broken by custkey, values straddling $100 buckets.
    val rows = (1L to 23L).map { k =>
      val spend = k match {
        case 1 | 2 | 3 => "500.00"   // three-way tie, distinct buckets from:
        case 4         => "499.99"   // same bucket as the ties (400-499? no: 4xx) — adjacent
        case 5         => "100.00"
        case 6         => "99.99"    // bucket boundary pair
        case 22 | 23   => "0.00"     // tie at zero
        case n         => s"${n * 37}.25"
      }
      (k, spend)
    }
    assertSame(perFrame(rows))
  }

  test("bucketed deciles == single-window ntile, N < 10 (q = 0 branch)") {
    assertSame(perFrame(Seq(1L -> "10.00", 2L -> "20.00", 3L -> "5.50")))
  }

  test("bucketed deciles == single-window ntile, all rows in ONE bucket") {
    // Every spend in [100, 199.99]: one salt bucket holds the whole frame,
    // so the local window must still produce the exact global order.
    val rows = (1L to 41L).map(k => (k, s"1${"%02d".format(k % 100)}.${"%02d".format((k * 7) % 100)}"))
    assertSame(perFrame(rows))
  }

  test("plan: no ntile; unpartitioned windows read only the bucket-count frame") {
    val per = perFrame((1L to 50L).map(k => (k, s"${k * 13}.00")))
    val df = Workload.spendDeciles(per)
    val plan = df.queryExecution.sparkPlan // pre-AQE: collect() sees the tree
    val rendered = plan.toString
    assert(!rendered.toLowerCase.contains("ntile"),
      s"ntile found in decile plan:\n$rendered")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected window operators in the decile plan")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val childCols = w.child.output.map(_.name).toSet
      assert(childCols.subsetOf(Set("__b", "__c")),
        s"single-partition window reads the per-customer frame ($childCols):\n$rendered")
    }
    // The per-customer rank window is partitioned (by the salt bucket).
    assert(windows.exists(_.partitionSpec.nonEmpty),
      s"expected a bucket-partitioned rank window:\n$rendered")
  }
}
