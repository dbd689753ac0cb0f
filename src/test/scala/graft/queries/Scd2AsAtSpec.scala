package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** Hand-checkable semantics of the SCD2 point-in-time lookup
  * (etl_scd2_asat): the DuckDB ASOF oracle proves cross-engine agreement
  * on the generated data; this proves the INTENDED semantics on the edge
  * shapes the generator never emits — same-timestamp double changes
  * (empty versions), events exactly at a version boundary, and events
  * between changes.
  */
class Scd2AsAtSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDir(
      rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2").toString
    // ts is stored as int64 NANOS, the testdata's physical type —
    // Tables.events converts it back to a microsecond timestamp
    rows.map { case (id, t, u, et, v, p) =>
      (id, t.getTime * 1000000L, u, et, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("each event sees the version current at its timestamp") {
    // user 1: click@00 -> purchase@02 -> click@04; user 2: view@01 only
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0, "{}"),    // no change
      (3L, ts("2024-01-01 02:00:00"), 1L, "purchase", 1.0, "{}"), // change
      (4L, ts("2024-01-01 03:00:00"), 1L, "purchase", 1.0, "{}"),
      (5L, ts("2024-01-01 04:00:00"), 1L, "click", 1.0, "{}"),    // change
      (6L, ts("2024-01-01 01:00:00"), 2L, "view", 1.0, "{}")))
    val out = EtlQueries.scd2AsAt.run(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("asat_type"), r.getAs[Long]("version_event_id")))
      .toMap
    assert(out(1L) == (("click", 1L)))    // opens its own version
    assert(out(2L) == (("click", 1L)))    // still in version 1
    assert(out(3L) == (("purchase", 3L))) // boundary: new version visible
    assert(out(4L) == (("purchase", 3L)))
    assert(out(5L) == (("click", 5L)))
    assert(out(6L) == (("view", 6L)))     // other user's own history
  }

  test("same-timestamp double change: the empty version is never matched") {
    // Two changes at the same instant for user 1 (event 2 then 3 by id):
    // version [t1,t1) opened by event 2 is EMPTY and must be dropped —
    // every event at or after t1 sees event 3's version.
    val t0 = ts("2024-01-01 00:00:00"); val t1 = ts("2024-01-01 01:00:00")
    val dir = eventsDir(Seq(
      (1L, t0, 1L, "a", 1.0, "{}"),
      (2L, t1, 1L, "b", 1.0, "{}"),
      (3L, t1, 1L, "c", 1.0, "{}"),
      (4L, ts("2024-01-01 02:00:00"), 1L, "c", 1.0, "{}")))
    val out = EtlQueries.scd2AsAt.run(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("asat_type"), r.getAs[Long]("version_event_id")))
      .toMap
    assert(out(1L) == (("a", 1L)))
    assert(out(2L) == (("c", 3L))) // the b-version [t1,t1) is empty
    assert(out(3L) == (("c", 3L)))
    assert(out(4L) == (("c", 3L)))
    // every event row survives the lookup, none duplicated
    assert(out.size == 4)
  }
}
