package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — pairs of rows whose [start, end] intervals
  * intersect (boundaries inclusive). The naive realization is a theta
  * join (O(n·m) nested loop); this one is the bucketed equi-join used by
  * spatial/temporal engines:
  *
  *  1. explode each interval to the fixed-width time buckets it covers;
  *  2. equi-join on the bucket id — shuffle-partitionable, AQE-plannable,
  *     never all-pairs;
  *  3. keep true overlaps (`l.start <= r.end && r.start <= l.end`);
  *  4. REPORT-ONCE rule instead of a wide dropDuplicates: a pair sharing
  *     k buckets appears k times, so each pair is credited only to the
  *     bucket containing the LATER of the two starts — every true pair
  *     survives exactly once, deduped for free at the filter.
  *
  * Bucket width trades replication (intervals spanning many buckets)
  * against bucket occupancy (many intervals per bucket); set it near the
  * typical interval length. Extends the join family past J3's
  * interval-vs-SCALAR range join (SURVEY §2.4) to interval-vs-interval.
  */
object IntervalJoin {

  /** @param left/right  frames with DISTINCT column names (caller renames)
    * @param lStart,lEnd,rStart,rEnd  timestamp column names
    * @param bucketMillis bucket width in milliseconds
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketMillis: Long): DataFrame = {
    def buckets(s: String, e: String) = sequence(
      floor(unix_millis(col(s)) / bucketMillis),
      floor(unix_millis(col(e)) / bucketMillis))
    val l = left.withColumn("__bk", explode(buckets(lStart, lEnd)))
    val r = right.withColumn("__bk", explode(buckets(rStart, rEnd)))
    l.join(r, Seq("__bk"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bk") === floor(
        greatest(unix_millis(col(lStart)), unix_millis(col(rStart)))
          / bucketMillis))
      .drop("__bk")
  }
}
