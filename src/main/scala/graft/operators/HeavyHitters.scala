package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Heavy-hitter detection, both rungs of the standard ladder:
  *
  *  - [[exact]]: hash-groupBy count + threshold. One shuffle of
  *    (key, partial count) rows — at 100 TB the partial aggregation means
  *    each executor ships one row per distinct key it saw, and the
  *    threshold filter runs before any further movement.
  *  - [[sketch]]: a Count-Min sketch built by Spark's `count_min_sketch`
  *    aggregate — FIXED-size mergeable state (d×w counters) regardless of
  *    input size or cardinality, the structure to reach for when even one
  *    row per distinct key is too much (e.g. heavy hitters over raw terms
  *    of a 100 TB corpus). CMS guarantees estimate ≥ true count, and
  *    estimate ≤ true + ε·N with probability ≥ confidence — so
  *    thresholding the sketch can only over-report (no false negatives),
  *    which HeavyHittersSpec pins against [[exact]].
  *
  * The reference has no sketch layer; this extends the same family as
  * q27's HLL distinct-count (SURVEY §2 A-family breadth).
  */
object HeavyHitters {

  /** Exact per-key counts at or above `minCount`. */
  def exact(df: DataFrame, keys: Seq[String], minCount: Long): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= minCount)

  /** One-pass distributed CMS over `key`, deserialized driver-side for
    * point queries. eps/confidence size the sketch: w = ceil(2/eps)
    * columns, d = ceil(ln(1/(1-confidence))) rows.
    */
  def sketch(df: DataFrame, key: Column, eps: Double, confidence: Double,
      seed: Int): CountMinSketch = {
    val bytes = df
      .select(count_min_sketch(key, lit(eps), lit(confidence), lit(seed))
        .as("cms"))
      .head().getAs[Array[Byte]]("cms")
    CountMinSketch.readFrom(bytes)
  }
}
