package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape pin for the IVF corpus→list assignment stage
  * (Similarity.ivfAssign): it must stay a MAP-ONLY argmin expression —
  * no Window (the r3 shape partitioned a corpus-wide window by row id),
  * no shuffle (assignment reads each row once against broadcast-able
  * driver-side centroids). The pin works the way DedupSpec pins the
  * blacklist caps: a regression to a window or an exchange fails here,
  * not in a 100×-scale incident.
  */
class IvfPlanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f)),
    (3L, Array(0.5f, 0.5f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f)) // zero vector: filtered, stays map-side
  ).toDF("vec_id", "embedding")

  private lazy val cents: Array[(Long, Array[Double])] = Array(
    0L -> Array(1.0, 0.0, 0.0),
    1L -> Array(0.0, 1.0, 0.0),
    2L -> Array(0.0, 0.0, 1.0))

  test("ivfAssign is map-only: no Window, no shuffle Exchange") {
    val assigned = Similarity.ivfAssign(corpus, cents)
    val plan = assigned.queryExecution.executedPlan
    // typed collect AND string audit: if the assignment ever regresses to
    // a shape with a required distribution, AQE wraps the plan in an
    // AdaptiveSparkPlanExec LEAF and collect() sees nothing inside it —
    // the string rendering still shows the inner plan, so the pin cannot
    // go vacuous under AQE
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"window found in IVF assignment plan:\n$plan")
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"shuffle found in IVF assignment plan:\n$plan")
    val rendered = plan.toString
    assert(!rendered.contains("Window"),
      s"window found in rendered IVF assignment plan:\n$rendered")
    assert(!rendered.contains("Exchange"),
      s"exchange found in rendered IVF assignment plan:\n$rendered")
  }

  test("ivfAssign argmin matches the window-rank oracle order") {
    // max affinity, ties to the LOWEST centroid id — the order rank-1 of
    // (aff DESC, centroid_id ASC) would produce. Doc 3 ties centroids
    // 0 and 1 at aff 0.5 → must land on centroid 0.
    val got = Similarity.ivfAssign(corpus, cents)
      .select("neighbor_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L))
  }
}
