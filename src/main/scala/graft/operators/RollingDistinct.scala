package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Trailing-window rolling DISTINCT counts per day — the sliding-window
  * cardinality op (rolling 7-day active users) that has NO window-function
  * form: COUNT(DISTINCT) does not decompose over sliding frames, so the
  * textbook self-join recomputes every window from scratch.
  *
  * Realized by the DAY-EXPAND trick: each distinct (day, key) row explodes
  * map-side to the `windowDays` target days it contributes to, then one
  * (day, key)-keyed distinct + per-day count. Cost is windowDays × the
  * DEDUPED day-key stream — never the raw events — and the whole plan is
  * keyed partial aggs + one map-side explode: shuffle-parallel at any
  * scale.
  *
  * Two rungs (the q54/q56 linear-counting family):
  *  - `exact`: expands (day, key) — windowDays × the distinct-pairs
  *    volume, the term that explodes when per-day cardinality is huge;
  *  - `sketchOccupancy`: expands (day, bucket) with the md5-fold bucket
  *    (a pure function of the key, so distinct-then-hash ≡
  *    hash-then-distinct), capping the expanded stream at days·m rows
  *    regardless of cardinality. The per-window occupied-bucket union IS
  *    the window's sketch state — bucket sets merge losslessly
  *    (LinearCountSpec), which is exactly why the sliding union is sound.
  *
  * `withSketch` computes both from ONE staged dedup of the input (one
  * source scan), the form a recon/report query wants.
  *
  * Only days PRESENT in the data appear in the output (business
  * convention: no rows for silent days; gap-fill downstream if a dense
  * calendar is needed — the etl_gap_fill machinery).
  */
object RollingDistinct {

  /** The engine-portable m-bucket fold (the q54/q56 md5-ascii family) —
    * public so the streaming maintainer hashes batches with the
    * IDENTICAL fold the batch forms use.
    */
  def bucket(key: org.apache.spark.sql.Column, m: Int): org.apache.spark.sql.Column =
    conv(substring(md5(key.cast(StringType).cast(BinaryType)), 1, 5),
      16, 10).cast(LongType) % m

  private def fold(key: org.apache.spark.sql.Column, m: Int) = bucket(key, m)

  /** Expand each (day, key) to its windowDays target days, keep days
    * present in the data, dedup, count per day.
    */
  private def rolled(du: DataFrame, present: DataFrame, windowDays: Int,
      outName: String): DataFrame =
    du.select(explode(sequence(col("__day"),
        date_add(col("__day"), windowDays - 1))).as("day"), col("__k"))
      .join(present, Seq("day"), "left_semi")
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as(outName))

  private def dedup(df: DataFrame, dayCol: String,
      key: org.apache.spark.sql.Column): DataFrame =
    df.select(col(dayCol).as("__day"), key.as("__k"))
      .distinct().localCheckpoint(false)

  /** (day, n_distinct): distinct keys with an event in
    * [day − windowDays + 1, day], for each day present in `df`.
    */
  def exact(df: DataFrame, dayCol: String, keyCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val du = dedup(df, dayCol, col(keyCol))
    rolled(du, du.select(col("__day").as("day")).distinct(), windowDays,
      "n_distinct")
  }

  /** (day, z_occupied): the window's linear-counting occupancy — the
    * occupied-bucket count of the m-bucket sketch over the same trailing
    * window. Estimate = −m·ln(1 − z/m) downstream (deliberately not
    * computed here: occupancy is exact-integer and cross-engine, the ln
    * is not — the q54 discipline).
    */
  def sketchOccupancy(df: DataFrame, dayCol: String, keyCol: String,
      windowDays: Int, m: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(m >= 1, s"m must be >= 1, got $m")
    val du = dedup(df, dayCol, fold(col(keyCol), m))
    rolled(du, du.select(col("__day").as("day")).distinct(), windowDays,
      "z_occupied")
  }

  /** Roll an ALREADY-DEDUPED (day, key-or-bucket) pair frame — the
    * streaming maintainer's entry (its held state IS the deduped pair
    * set). (day, count-of-distinct-pairs-in-window) for each day
    * present.
    */
  def rolledFromDeduped(pairs: DataFrame, dayCol: String, keyCol: String,
      windowDays: Int, outName: String): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val du = pairs.select(col(dayCol).as("__day"), col(keyCol).as("__k"))
    rolled(du, du.select(col("__day").as("day")).distinct(), windowDays,
      outName)
  }

  /** Both rungs from ONE staged dedup of the input (one source scan):
    * (day, z_occupied, n_distinct).
    */
  def withSketch(df: DataFrame, dayCol: String, keyCol: String,
      windowDays: Int, m: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(m >= 1, s"m must be >= 1, got $m")
    val du = dedup(df, dayCol, col(keyCol))
    val present = du.select(col("__day").as("day")).distinct()
    val db = du.select(col("__day"), fold(col("__k"), m).as("__k")).distinct()
    val z = rolled(db, present, windowDays, "z_occupied")
    val e = rolled(du, present, windowDays, "n_distinct")
    // both sides are |days|-sized; the agg-over-checkpoint stats are
    // opaque, so hint the broadcast explicitly (the q56 lesson)
    z.join(broadcast(e), Seq("day"))
  }
}
