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
    * `ASOF LEFT JOIN ... ON l.t >= r.t` + `l.t - r.t <= INTERVAL` nullify,
    * and the gap is measured at MICROSECOND precision (a cast-to-long gap
    * would truncate to whole seconds and accept a boundary pair DuckDB's
    * full-precision interval compare rejects).
    */
  def asofJoinWithin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], maxGapSeconds: Long): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, payload,
      Some(maxGapSeconds))

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], maxGapSeconds: Option[Long]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
    val leftCols = left.columns
    // The matched right row travels as ONE struct (version time +
    // payload): ASOF returns the matched row WHOLESALE, so a NULL payload
    // value inside the matched row must come through as NULL. Per-column
    // last(_, ignoreNulls) carries would stitch that NULL field from an
    // OLDER version — a different row than the one matched.
    val pvType = StructType(
      StructField("__vt", right.schema(rightTime).dataType) +:
        payload.map(c => StructField(c, right.schema(c).dataType)))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
      .withColumn("__pv", lit(null).cast(pvType))
    val r = right
      .select(col(key), col(rightTime).as("__t"),
        struct(col(rightTime).as("__vt") +: payload.map(col): _*).as("__pv"))
      .withColumn("__src", lit(0))
    val rAligned = leftCols.filterNot(_ == key).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = l.unionByName(rAligned)
    // right rows sort before left rows at equal time (__src 0 < 1), so a
    // version stamped exactly at the event time IS visible to the event;
    // left rows carry a null struct, so last(ignoreNulls) lands the latest
    // right ROW — one window expression regardless of payload width
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__m", last(col("__pv"), ignoreNulls = true).over(w))
    val payloadOut = payload.map { c =>
      maxGapSeconds match {
        case None => col("__m").getField(c).as(c)
        case Some(g) =>
          // microsecond-precision gap (advice r3: cast-to-long truncates
          // to whole seconds); null when no match or the match is out of
          // gap — the `when` without `otherwise` nulls on a null __m too
          when(unix_micros(col("__t").cast(TimestampType)) -
            unix_micros(col("__m").getField("__vt").cast(TimestampType))
            <= g * 1000000L,
            col("__m").getField(c)).as(c)
      }
    }
    carried
      .filter(col("__src") === 1)
      .select((leftCols.map(col) ++ payloadOut): _*)
  }
}
