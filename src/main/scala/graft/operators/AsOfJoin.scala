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
      payload: Seq[String]): DataFrame = {
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
    val carried = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(s"__v_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w)))
    carried
      .filter(col("__src") === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col(s"__v_$c").as(c))): _*)
  }
}
