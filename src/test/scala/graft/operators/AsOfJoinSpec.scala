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
