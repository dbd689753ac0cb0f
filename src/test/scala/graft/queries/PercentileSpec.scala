package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q41's two-phase exact-percentile plan against a from-scratch
  * percentile_disc: sort the values, pick index ceil(p·N/100) (1-based)
  * — the smallest element whose cumulative distribution ≥ p. Frames
  * exercise the edges the rank arithmetic must survive: N smaller than
  * the percentile grid (several p map to the SAME rank — the join must
  * emit one row per p, duplicating the element), N=1 (every p picks the
  * only row), value ties across bucket boundaries, and all values in
  * one bucket (correctness cannot lean on the salt spreading rows).
  */
class PercentileSpec extends SparkSpec {
  import spark.implicits._

  private val Ps = Seq(25, 50, 75, 90, 99)

  private def naive(values: Seq[Double]): Seq[(Int, Double)] = {
    val sorted = values.sorted
    Ps.map(p => p -> sorted((p * values.size + 99) / 100 - 1))
  }

  private def viaQuery(values: Seq[Double]): Seq[(Int, Double)] = {
    val df = values.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("o_orderkey", "o_totalprice")
    val ranked = graft.operators.OrderedPrefix.rankAndPrefix(df,
      (col("o_totalprice") / lit(1000)).cast("long"),
      Seq(col("o_totalprice"), col("o_orderkey")))
    val n = df.agg(count(lit(1)).as("n"))
    val targets = Ps.toDF("p").crossJoin(broadcast(n))
      .withColumn("target", expr("(p * n + 99) div 100"))
    ranked.join(broadcast(targets), col("__rank") === col("target"))
      .select(col("p"), col("o_totalprice").as("value"))
      .orderBy("p")
      .as[(Int, Double)].collect().toSeq
  }

  test("matches from-scratch percentile_disc on a mixed frame") {
    val vs = Seq(4500.0, 120.5, 120.5, 99999.0, 0.0, 1000.0, 1000.0,
      2500.25, 310.0, 7800.0, 64000.0, 15.0, 15.0, 880.0, 880.0,
      53000.5, 41000.0, 2.0, 999.99, 1000.01)
    assert(viaQuery(vs) === naive(vs))
  }

  test("N < percentile grid: several p share one rank, one row per p") {
    val vs = Seq(10.0, 20.0, 30.0)
    val got = viaQuery(vs)
    assert(got === naive(vs))
    assert(got.size === Ps.size) // p=75,90,99 all duplicate the max
  }

  test("N = 1: every percentile picks the only element") {
    assert(viaQuery(Seq(42.0)) === Ps.map(_ -> 42.0))
  }

  test("all values in one salt bucket") {
    val vs = (1 to 37).map(i => 100.0 + i * 0.25)
    assert(viaQuery(vs) === naive(vs))
  }
}
