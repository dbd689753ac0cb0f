package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HllDistinct unit properties beyond the q27 oracle/differential rows:
  * MERGEABILITY (registers from disjoint partitions merged by MAX give
  * the same estimate as one pass — the property per-day/per-partition
  * rollups rest on), duplicate-insensitivity, the linear-counting
  * small-range branch, NULL-key semantics, and accuracy across
  * cardinality decades.
  */
class HllDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def est(df: org.apache.spark.sql.DataFrame): Double =
    HllDistinct.estimate(df, Seq("g"), col("k"))
      .collect().head.getAs[Double]("approx_distinct")

  test("mergeability: max-merged register halves == one-pass registers") {
    val all = (1L to 20000L).map(i => ("a", i)).toDF("g", "k")
    val half1 = (1L to 12000L).map(i => ("a", i)).toDF("g", "k")
    val half2 = (8000L to 20000L).map(i => ("a", i)).toDF("g", "k")
    val one = HllDistinct.registers(all, Seq("g"), col("k"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toMap
    val merged = HllDistinct.registers(half1, Seq("g"), col("k"))
      .unionByName(HllDistinct.registers(half2, Seq("g"), col("k")))
      .groupBy("g", "__idx").agg(max("__rank").as("__rank"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toMap
    assert(one == merged)
  }

  test("duplicate-insensitive: 10x duplicated keys, identical estimate") {
    val base = (1L to 5000L).map(i => ("a", i)).toDF("g", "k")
    val dup = (1L to 5000L).flatMap(i => Seq.fill(10)(("a", i)))
      .toDF("g", "k")
    assert(est(base) == est(dup))
  }

  test("NULL keys are ignored (countDistinct semantics)") {
    val withNulls = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)),
      ("a", None)).toDF("g", "k")
    val clean = Seq(("a", 1L), ("a", 2L)).toDF("g", "k")
    assert(est(withNulls) == est(clean))
  }

  test("accuracy across decades: within 4 sigma (13%) at p=10") {
    for (n <- Seq(100L, 1000L, 10000L, 100000L)) {
      val df = (1L to n).map(i => ("a", i * 7919L)).toDF("g", "k")
      val e = est(df)
      val err = math.abs(e - n) / n
      assert(err < 0.13, s"n=$n est=$e err=$err")
    }
  }

  test("small range takes the linear-counting table branch exactly") {
    // tiny cardinality: V > 0 and E_raw <= 2.5m, so the estimate must
    // BE a value from the literal table (no float drift possible)
    val df = (1L to 50L).map(i => ("a", i)).toDF("g", "k")
    val e = est(df)
    assert(HllDistinct.LinearCount.contains(e),
      s"estimate $e is not a LinearCount table value")
  }
}
