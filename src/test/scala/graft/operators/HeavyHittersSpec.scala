package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The CMS rung of the heavy-hitter ladder against the exact rung, on
  * real testdata: Count-Min NEVER undercounts (hard guarantee, not
  * probabilistic), so (1) every key's estimate ≥ its true count and
  * (2) thresholding the sketch yields a SUPERSET of the exact heavy
  * hitters — no false negatives; and with the chosen ε the over-report
  * must stay bounded on this data (ε·N slack per key).
  */
class HeavyHittersSpec extends SparkSpec {

  test("CMS estimates dominate true counts; sketch HH set ⊇ exact HH set") {
    val dir = "/root/testdata/sf0.01"
    val ev = graft.Tables.events(spark, dir)
      .select(concat_ws("\u0001", col("event_type"), col("user_id"))
        .as("key"))
    val n = ev.count()
    val eps = 0.0005 // w = 4000 counters/row: tight enough to bound slack
    val cms = HeavyHitters.sketch(ev, col("key"), eps, 0.99, seed = 42)
    assert(cms.totalCount() == n)

    val exact = graft.Tables.events(spark, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (s"${r.getString(0)}\u0001${r.getLong(1)}", r.getLong(2)))
    val slack = (eps * n).toLong // CMS error bound per key
    for ((key, true_n) <- exact) {
      val est = cms.estimateCount(key)
      assert(est >= true_n, s"CMS undercounted $key: $est < $true_n")
      assert(est <= true_n + slack,
        s"CMS over bound for $key: $est > $true_n + $slack")
    }
    val threshold = 15L
    val exactHH = exact.filter(_._2 >= threshold).map(_._1).toSet
    val sketchHH = exact.map(_._1)
      .filter(k => cms.estimateCount(k) >= threshold).toSet
    assert(exactHH.subsetOf(sketchHH),
      s"sketch missed exact heavy hitters: ${exactHH -- sketchHH}")
    assert(exactHH.nonEmpty) // the threshold actually bites on this data
  }
}
