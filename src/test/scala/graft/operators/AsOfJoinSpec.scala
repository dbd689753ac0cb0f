package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val prices = Seq(
    ("P1", ts("2024-01-01 00:00:00"), 10.0),
    ("P1", ts("2024-01-02 00:00:00"), 12.0),
    ("P1", ts("2024-01-05 00:00:00"), 11.0),
    ("P2", ts("2024-01-03 00:00:00"), 5.0))
    .toDF("product", "valid_from", "price")

  private val events = Seq(
    (1L, "P1", ts("2024-01-01 12:00:00")),  // -> 10.0
    (2L, "P1", ts("2024-01-02 00:00:00")),  // boundary: version at event time -> 12.0
    (3L, "P1", ts("2024-01-09 00:00:00")),  // -> 11.0 (latest)
    (4L, "P2", ts("2024-01-01 00:00:00")),  // before any version -> null
    (5L, "P2", ts("2024-01-04 00:00:00")))  // -> 5.0
    .toDF("event_id", "product", "event_ts")

  test("each event picks the latest version at or before its time") {
    val out = AsOfJoin.asofJoin(events, prices, "product",
      "event_ts", "valid_from", Seq("price"))
      .orderBy("event_id").collect()
    assert(out.map(r =>
      if (r.isNullAt(r.fieldIndex("price"))) None
      else Some(r.getAs[Double]("price"))).toSeq ==
      Seq(Some(10.0), Some(12.0), Some(11.0), None, Some(5.0)))
    // left schema preserved, payload appended
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("event_id", "product", "event_ts", "price"))
  }

  test("asofJoinWithin: inclusive gap boundary, older versions null out") {
    // event 1 is 12h after its version; event 3 is 4d after its version
    val within12h = AsOfJoin.asofJoinWithin(events, prices, "product",
      "event_ts", "valid_from", Seq("price"), maxGapSeconds = 12 * 3600L)
      .orderBy("event_id").collect()
    assert(within12h.map(r =>
      if (r.isNullAt(r.fieldIndex("price"))) None
      else Some(r.getAs[Double]("price"))).toSeq ==
      Seq(Some(10.0), // exactly 12h old: inclusive boundary keeps it
        Some(12.0),   // version stamped at event time (gap 0)
        None,         // latest version is 4 days old -> nulled
        None,         // no version at all
        None))        // version is 1 day old > 12h
    // the gap filter must not drop left rows — same cardinality as base
    assert(within12h.length == 5)
  }

  test("asofJoinWithin with a huge gap equals the base asof join") {
    val base = AsOfJoin.asofJoin(events, prices, "product",
      "event_ts", "valid_from", Seq("price"))
      .orderBy("event_id").collect().toSeq
    val loose = AsOfJoin.asofJoinWithin(events, prices, "product",
      "event_ts", "valid_from", Seq("price"), maxGapSeconds = 365L * 86400L)
      .orderBy("event_id").collect().toSeq
    assert(base.map(_.toSeq) == loose.map(_.toSeq))
  }

  test("matched row carries WHOLESALE: its NULL payload stays NULL") {
    // DuckDB ASOF semantics: the matched row is returned as-is. The
    // latest version has price = NULL, qty = 7 — output must be
    // (NULL, 7), not price back-filled from the older version.
    val versioned = Seq(
      ("P1", ts("2024-01-01 00:00:00"), Some(10.0), Some(3L)),
      ("P1", ts("2024-01-03 00:00:00"), None, Some(7L)))
      .toDF("product", "valid_from", "price", "qty")
    val out = AsOfJoin.asofJoin(
      events.filter($"event_id" === 3L), versioned, "product",
      "event_ts", "valid_from", Seq("price", "qty")).head()
    assert(out.isNullAt(out.fieldIndex("price")))
    assert(out.getAs[Long]("qty") == 7L)
    // same via the tolerance variant (gap generous enough to match)
    val outW = AsOfJoin.asofJoinWithin(
      events.filter($"event_id" === 3L), versioned, "product",
      "event_ts", "valid_from", Seq("price", "qty"),
      maxGapSeconds = 30L * 86400L).head()
    assert(outW.isNullAt(outW.fieldIndex("price")))
    assert(outW.getAs[Long]("qty") == 7L)
  }

  test("asofJoinWithin compares the gap at sub-second precision") {
    // gap = 86400.4s vs maxGap 86400: whole-second truncation would
    // accept it (86400 <= 86400); DuckDB's interval compare rejects it
    val right = Seq(("P1", ts("2024-01-01 00:00:00"), 10.0))
      .toDF("product", "valid_from", "price")
    val lefts = Seq(
      (1L, "P1", ts("2024-01-02 00:00:00.4")),  // 86400.4s -> null
      (2L, "P1", ts("2024-01-02 00:00:00")))    // exactly 86400s -> 10.0
      .toDF("event_id", "product", "event_ts")
    val out = AsOfJoin.asofJoinWithin(lefts, right, "product",
      "event_ts", "valid_from", Seq("price"), maxGapSeconds = 86400L)
      .orderBy("event_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("price")))
    assert(out(1).getAs[Double]("price") == 10.0)
  }

  test("multiple payload columns carry together") {
    val versioned = Seq(("P1", ts("2024-01-01 00:00:00"), 10.0, "v1"),
      ("P1", ts("2024-01-03 00:00:00"), 20.0, "v2"))
      .toDF("product", "valid_from", "price", "tag")
    val out = AsOfJoin.asofJoin(
      events.filter($"event_id" === 3L), versioned, "product",
      "event_ts", "valid_from", Seq("price", "tag")).head()
    assert(out.getAs[Double]("price") == 20.0)
    assert(out.getAs[String]("tag") == "v2")
  }
}
