package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pair-fanout tripwire (q16/q43's quadratic-explosion contract):
  * off by default (pass-through, zero plan change), and when opted in via
  * `graft.pairFanout.assert` a pathological mega-order — one key holding
  * more items than the named bound — trips an in-plan assert_true naming
  * the key, while bounded data passes through row-identically.
  */
class PairFanoutSpec extends SparkSpec {
  import spark.implicits._

  private def withAssert[A](on: Boolean)(f: => A): A = {
    spark.conf.set(PairFanout.ConfKey, on.toString)
    try f finally spark.conf.unset(PairFanout.ConfKey)
  }

  private val bounded =
    Seq.tabulate(30)(i => (i.toLong % 10, i.toLong)).toDF("ord", "item")

  test("off by default: pass-through, rows and plan unchanged") {
    val out = PairFanout.guard(spark, bounded, "ord", max = 2)
    // max=2 is violated (3 items per order) but the guard is not enabled
    assert(out.count() === 30)
    assert(out.queryExecution.logical === bounded.queryExecution.logical)
  }

  test("enabled + bounded data: row-identical pass-through") {
    withAssert(on = true) {
      val out = PairFanout.guard(spark, bounded, "ord", max = 3)
      assert(out.collect().toSet === bounded.collect().toSet)
      assert(out.columns.toSeq === Seq("ord", "item"))
    }
  }

  test("enabled + mega-order: trips and names the key") {
    withAssert(on = true) {
      // order 7 holds 50 items; every other order holds 1
      val mega = (Seq.tabulate(50)(i => (7L, 100L + i)) ++
        Seq((1L, 1L), (2L, 2L))).toDF("ord", "item")
      val ex = intercept[Exception] {
        PairFanout.guard(spark, mega, "ord", max = 10).count()
      }
      def walk(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + walk(t.getCause)
      val msg = walk(ex)
      assert(msg.contains("PairFanout"))
      assert(msg.contains("7"))
      assert(msg.contains("50"))
    }
  }

  test("q16 itself trips on a synthetic mega-order via the conf") {
    withAssert(on = true) {
      val dir = java.nio.file.Files.createTempDirectory("pairfanout").toString
      // lineitem with one order holding MaxItemsPerGroup+1 distinct parts
      val n = PairFanout.MaxItemsPerGroup + 1
      Seq.tabulate(n)(i => (1L, i.toLong))
        .toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val ex = intercept[Exception] {
        graft.queries.Workload.q16.run(spark, dir).count()
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
      assert(msgs(ex).contains("PairFanout"))
    }
  }
}
