package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks up the MOST RECENT right row with the
  * same key and right.time <= left.time — the canonical event-to-
  * slowly-changing-dimension enrichment (price as of trade time, dim
  * snapshot as of event time).
  *
  * Composed from built-ins (preference order (a) — no custom SparkPlan):
  * tag and union both sides, then a per-key time-ordered window carries
  * the latest right payload forward onto left rows via
  * last(_, ignoreNulls). One shuffle on (key), no join at all — and the
  * union shape means a right side of ANY size works (no broadcast
  * assumption), which is what makes it viable when both sides are huge.
  */
object AsOfJoin {

  /** @param left       event side
    * @param right      versioned side (key, time, payload...)
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column on left
    * @param rightTime  version-time column on right
    * @param payload    right columns to carry onto left rows
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, payload, None)

  /** Tolerance variant — the common production ask: a version older than
    * `maxGapSeconds` does not count (payload goes null, the left row stays).
    * Boundary is INCLUSIVE: left.time - right.time == maxGap matches, the
    * same semantics as DuckDB's
    * `ASOF LEFT JOIN ... ON l.t >= r.t` + `l.t - r.t <= INTERVAL` nullify.
    * Caveat (shared with the base operator): payload columns are carried
    * independently via last(_, ignoreNulls), so the gap is measured against
    * the latest right ROW; a null payload value inside an in-gap right row
    * is not back-filled from an older row's gap perspective.
    */
  def asofJoinWithin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], maxGapSeconds: Long): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, payload,
      Some(maxGapSeconds))

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], maxGapSeconds: Option[Long]): DataFrame = {
    val leftCols = left.columns
    // align schemas: left rows carry null payload; right rows carry only
    // key/time/payload
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
    val lAligned = payload.foldLeft(l)((df, c) =>
      df.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right
      .select((Seq(col(key), col(rightTime).as("__t")) ++
        payload.map(c => col(c).as(s"__p_$c"))): _*)
      .withColumn("__src", lit(0))
    val rAligned = leftCols.filterNot(_ == key).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lAligned.unionByName(rAligned)
    // right rows sort before left rows at equal time (__src 0 < 1), so a
    // version stamped exactly at the event time IS visible to the event
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(s"__v_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w)))
    // for the tolerance variant, also carry the matched version's time so
    // the gap test compares against the right row actually picked
    val carried = if (maxGapSeconds.isEmpty) carried0
      else carried0.withColumn("__vt",
        last(when(col("__src") === 0, col("__t")), ignoreNulls = true).over(w))
    val payloadOut = payload.map { c =>
      maxGapSeconds match {
        case None => col(s"__v_$c").as(c)
        case Some(g) =>
          // null when no match or the match is older than the gap; the
          // `when` without `otherwise` yields null on a null __vt too
          when(col("__t").cast("long") - col("__vt").cast("long") <= g,
            col(s"__v_$c")).as(c)
      }
    }
    carried
      .filter(col("__src") === 1)
      .select((leftCols.map(col) ++ payloadOut): _*)
  }
}
