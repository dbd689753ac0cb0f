package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins OrderedPrefix (the factored q29 two-phase discipline) against the
  * single-window forms it replaces — row_number, inclusive running sum,
  * and NTILE(k) — on frames that exercise the edges: ties resolved only
  * by the tie-breaker, every row in ONE bucket (correctness cannot lean
  * on the salt spreading rows), every row in its OWN bucket, N < k, and
  * N % k != 0. DecilePlanSpec pins the q29 consumer and the plan shape;
  * this spec pins the operator's contract directly, sum path included.
  */
class OrderedPrefixSpec extends SparkSpec {
  import spark.implicits._

  private def frame(vals: Seq[(Long, String)]): DataFrame =
    vals.toDF("id", "v")
      .select(col("id"), col("v").cast(DecimalType(18, 2)).as("v"))

  /** Single-window oracle: global rank + inclusive running cents sum. */
  private def oracle(df: DataFrame): Seq[(Long, Long, Long)] = {
    val w = Window.orderBy(col("v").desc, col("id"))
    df.withColumn("rc", (col("v") * 100).cast(LongType))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .withColumn("cum",
        sum(col("rc")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "rnk", "cum").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
  }

  private def got(df: DataFrame): Seq[(Long, Long, Long)] =
    OrderedPrefix.rankAndPrefix(
        df.withColumn("rc", (col("v") * 100).cast(LongType)),
        lit(0L) - (col("v") / lit(100)).cast(LongType),
        Seq(col("v").desc, col("id")), sumExpr = Some(col("rc")))
      .select(col("id"), col("__rank"), col("__prefix").cast(LongType))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("rank and running sum == single-window forms, ties + mixed buckets") {
    val rows = (1L to 23L).map { k =>
      val v = k match {
        case 1 | 2 | 3 => "500.00" // three-way tie -> id tie-break
        case 4         => "499.99" // adjacent bucket boundary
        case 22 | 23   => "0.00"   // tie at zero
        case n         => s"${n * 37}.25"
      }
      (k, v)
    }
    assert(got(frame(rows)) === oracle(frame(rows)))
  }

  test("rank and running sum, all rows in ONE bucket") {
    // every v in [100, 199.99]: the local window must produce the exact
    // global order on its own
    val rows = (1L to 41L).map(k =>
      (k, f"1${k % 100}%02d.${(k * 7) % 100}%02d"))
    assert(got(frame(rows)) === oracle(frame(rows)))
  }

  test("rank and running sum, every row its OWN bucket") {
    val rows = (1L to 17L).map(k => (k, s"${k * 250}.00"))
    assert(got(frame(rows)) === oracle(frame(rows)))
  }

  test("__total equals the grand sum on every row; __n the row count") {
    val df = frame((1L to 9L).map(k => (k, s"${k * 11}.50")))
      .withColumn("rc", (col("v") * 100).cast(LongType))
    val out = OrderedPrefix.rankAndPrefix(df,
      lit(0L) - (col("v") / lit(100)).cast(LongType),
      Seq(col("v").desc, col("id")), sumExpr = Some(col("rc")))
    val tot = (1L to 9L).map(k => k * 1100L + 50L).sum
    assert(out.select(col("__total").cast(LongType)).distinct()
      .as[Long].collect().toSeq === Seq(tot))
    assert(out.select(col("__n")).distinct().as[Long].collect().toSeq
      === Seq(9L))
  }

  test("grouped form == per-group application of the global form") {
    // groups of very different sizes (1, 3, 20) with in-group ties; the
    // grouped call must reproduce, per group, exactly what the global
    // form computes on that group's rows alone — rank, prefix, n, total
    val rows = Seq(("a", 1L, "500.00"), ("b", 2L, "120.00"),
      ("b", 3L, "120.00"), ("b", 4L, "990.10")) ++
      (5L to 24L).map(k => ("c", k, s"${(k % 5) * 100}.25"))
    val df = rows.toDF("g", "id", "v")
      .select(col("g"), col("id"), col("v").cast(DecimalType(18, 2)).as("v"))
      .withColumn("rc", (col("v") * 100).cast(LongType))
    val bucket = lit(0L) - (col("v") / lit(100)).cast(LongType)
    val order = Seq(col("v").desc, col("id"))
    val grouped = OrderedPrefix
      .rankAndPrefixBy(df, Seq("g"), bucket, order, Some(col("rc")))
      .select(col("g"), col("id"), col("__rank"), col("__n"),
        col("__prefix").cast(LongType), col("__total").cast(LongType))
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val want = Seq("a", "b", "c").flatMap { g =>
      OrderedPrefix.rankAndPrefix(df.filter(col("g") === g),
          bucket, order, Some(col("rc")))
        .select(col("g"), col("id"), col("__rank"), col("__n"),
          col("__prefix").cast(LongType), col("__total").cast(LongType))
        .as[(String, Long, Long, Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    }
    assert(grouped === want)
  }

  test("grouped plan has NO single-partition exchange at all") {
    // the global form's one bounded single-partition exchange (the bucket
    // histogram window) becomes group-partitioned in the grouped form —
    // the whole plan is shuffle-parallel
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    import noAqe.implicits._
    val df = (1L to 100L).map(k => (s"g${k % 4}", k, k * 3 % 17))
      .toDF("g", "id", "v")
    val out = OrderedPrefix.rankAndPrefixBy(df, Seq("g"),
      col("v"), Seq(col("v"), col("id")))
    val hits = out.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning == SinglePartition => e
    }
    assert(hits.isEmpty,
      s"grouped OrderedPrefix grew a single-partition exchange: $hits")
  }

  test("ntileCol == single-window ntile across k, incl. N < k and N % k != 0") {
    val df = frame((1L to 23L).map(k => (k, s"${(k % 7) * 100}.00"))) // heavy ties
    for (k <- Seq(1, 4, 5, 10, 23, 40)) {
      val want = df.withColumn("t",
          ntile(k).over(Window.orderBy(col("v").desc, col("id"))))
        .select("id", "t").as[(Long, Int)].collect().sortBy(_._1).toSeq
      val gotK = OrderedPrefix.rankAndPrefix(df,
          lit(0L) - (col("v") / lit(100)).cast(LongType),
          Seq(col("v").desc, col("id")))
        .withColumn("t", OrderedPrefix.ntileCol(k))
        .select("id", "t").as[(Long, Int)].collect().sortBy(_._1).toSeq
      assert(gotK === want, s"k=$k")
    }
  }
}
