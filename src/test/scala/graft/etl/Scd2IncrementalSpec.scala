package graft.etl

import java.sql.Timestamp
import graft.SparkSpec

/** Pins etl_scd2_incremental ≡ etl_scd2_dim (full-history rebuild) on a
  * crafted corpus that forces every frontier shape at once — the oracle
  * proves the equivalence on generated data, this spec proves the
  * boundary semantics on shapes the generator may not produce:
  *
  *  - a type that CONTINUES across the frontier (the current version
  *    must extend — same valid_from and opening event_id, still
  *    current, no phantom version);
  *  - a type that changes in the batch (the current version closes at
  *    exactly the first batch change);
  *  - a user born entirely in the batch;
  *  - an untouched user (rows pass through bit-identically);
  *  - same-timestamp batch changes (event_id tie-break);
  *  - a user whose batch rows are ALL collapses (no change at all).
  */
class Scd2IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int, sec: Int = 0): Timestamp =
    new Timestamp(Timestamp.valueOf(f"2024-01-$day%02d 00:00:00").getTime
      + sec * 1000L)

  test("incremental close-and-append equals the full-history rebuild " +
    "across every frontier shape") {
    // frontier = max(ts) − 3 days; max = Jan 30 ⇒ batch = Jan 27+
    val rows = Seq(
      // u1: A continues across the frontier — version must extend
      (1L, t(2), 10L, "view"), (1L, t(28), 11L, "view"),
      // u2: changes in the batch — current closes at Jan 28
      (2L, t(3), 20L, "view"), (2L, t(28), 21L, "click"),
      // u3: born in the batch, with an internal change
      (3L, t(28), 30L, "view"), (3L, t(29), 31L, "purchase"),
      // u4: untouched — closed + current rows pass through
      (4L, t(2), 40L, "view"), (4L, t(3), 41L, "click"),
      // u5: same-timestamp batch changes — event_id breaks the tie
      (5L, t(4), 50L, "view"),
      (5L, t(29), 51L, "click"), (5L, t(29), 52L, "purchase"),
      // u6: batch rows all collapse (type never changes)
      (6L, t(5), 60L, "view"), (6L, t(28), 61L, "view"),
      (6L, t(30), 62L, "view"))
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2i").toString
    rows.toDF("user_id", "ts", "event_id", "event_type")
      .selectExpr("event_id", "ts", "user_id", "event_type",
        "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val full = graft.SparkEntry.queries("etl_scd2_dim")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val inc = graft.SparkEntry.queries("etl_scd2_incremental")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(inc === full)

    // and the u1 extension kept the ORIGINAL version identity
    val u1 = inc.filter(_.head == 1L)
    assert(u1.size === 1 && u1.head(3) == 10L,
      s"u1's continuing version must keep its opening event_id: $u1")
  }
}
