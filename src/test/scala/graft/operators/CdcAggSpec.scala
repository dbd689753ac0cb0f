package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pins CdcMerge.maintainAgg (incremental materialized-view maintenance)
  * against a from-scratch PLAIN-SCALA recompute of the full concatenated
  * changelog, on hand-built frames that force every delta shape at once:
  * key moves group, key tombstoned by the batch, tombstone resurrected by
  * the batch, LATE batch row losing to the base row (retract+insert the
  * same row — net zero), brand-new key, brand-new group, and a group
  * emptied to zero (must drop from the output). The driver-contract
  * query (`etl_cdc_agg_incremental`) proves the same operator against
  * DuckDB on the events table; this spec proves the delta mechanics on
  * shapes the generated data may not contain.
  */
class CdcAggSpec extends SparkSpec {
  import spark.implicits._

  // (key, group, cents, ts, seq) — ts/seq is the writer order
  private type Row = (Long, String, Long, Long, Long)

  private def df(rows: Seq[Row]) =
    rows.toDF("k", "g", "cents", "ts", "seq")
      .select(col("k"), col("g"),
        (col("cents").cast(DecimalType(18, 2)) / 100).as("v"),
        col("ts"), col("seq"))

  /** From-scratch: last row per key by (ts, seq); serving excludes the
    * tombstone group 'X'; aggregate = (count, cents sum) per group.
    */
  private def recompute(all: Seq[Row]): Map[String, (Long, Long)] =
    all.groupBy(_._1).values
      .map(_.maxBy(r => (r._4, r._5)))
      .filter(_._2 != "X")
      .toSeq.groupBy(_._2)
      .map { case (g, rs) => g -> (rs.size.toLong, rs.map(_._3).sum) }

  private def maintained(base: Seq[Row], batch: Seq[Row])
      : Map[String, (Long, Long)] = {
    val baseSnap = CdcMerge.compact(df(base), Seq("k"), Seq("ts", "seq"))
    CdcMerge.maintainAgg(baseSnap, df(batch), Seq("k"), Seq("ts", "seq"),
      "g", col("v"), col("g") =!= "X")
      .select(col("g"), col("n_keys"),
        (col("total") * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
      .map { case (g, n, c) => g -> (n, c) }.toMap
  }

  test("maintained == from-scratch recompute across every delta shape") {
    val base: Seq[Row] = Seq(
      (1L, "a", 100L, 10L, 1L), // will move to group b
      (2L, "a", 200L, 10L, 2L), // will be tombstoned
      (3L, "b", 300L, 10L, 3L), // untouched
      (4L, "X", 400L, 10L, 4L), // tombstone in base, resurrected by batch
      (5L, "c", 500L, 10L, 5L), // sole member of c, tombstoned => c drops
      (6L, "a", 600L, 20L, 6L)) // touched by a LATE (older) batch row
    val batch: Seq[Row] = Seq(
      (1L, "b", 110L, 30L, 7L),  // move a -> b
      (2L, "X", 0L, 30L, 8L),    // tombstone key 2
      (4L, "a", 440L, 30L, 9L),  // resurrect key 4 into a
      (5L, "X", 0L, 30L, 10L),   // empty group c
      (6L, "d", 660L, 15L, 11L), // LATE: loses to base (ts 20 > 15)
      (7L, "e", 700L, 30L, 12L)) // brand-new key and group
    assert(maintained(base, batch) === recompute(base ++ batch))
  }

  test("empty batch leaves the aggregate exactly at yesterday's MV") {
    val base: Seq[Row] = Seq(
      (1L, "a", 100L, 10L, 1L), (2L, "b", 200L, 10L, 2L),
      (3L, "X", 300L, 10L, 3L))
    assert(maintained(base, Seq.empty) === recompute(base))
  }

  test("batch touching every key degenerates to a full recompute") {
    val base: Seq[Row] = Seq(
      (1L, "a", 100L, 10L, 1L), (2L, "b", 200L, 10L, 2L))
    val batch: Seq[Row] = Seq(
      (1L, "b", 150L, 30L, 3L), (2L, "a", 250L, 30L, 4L))
    assert(maintained(base, batch) === recompute(base ++ batch))
  }
}
