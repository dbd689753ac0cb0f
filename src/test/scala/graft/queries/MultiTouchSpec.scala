package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** Pins the credit arithmetic the oracled corpora only partially reach:
  * the generated data exercises k = 1..4 (24 h window at sf0.1) but a
  * remainder split with ties-to-earliest is only structurally forced at
  * k = 3 — this crafts it directly, plus the window boundary semantics
  * (click AT the purchase instant counts; click exactly 24 h before
  * does not) and the malformed-props drop.
  */
class MultiTouchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("remainder ppm goes to the earliest click; window boundaries; " +
    "malformed props dropped; clickless purchases contribute nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt").toString
    try {
      Seq(
        (1L, ts("2024-01-02 12:00:00"), 1L, "purchase", 10.0,
          null.asInstanceOf[String]),
        (2L, ts("2024-01-02 11:00:00"), 1L, "click", 0.0, """{"k": 1}"""),
        (3L, ts("2024-01-02 11:30:00"), 1L, "click", 0.0, """{"k": 2}"""),
        // k = 12 → campaign 2; at the purchase instant → included
        (4L, ts("2024-01-02 12:00:00"), 1L, "click", 0.0, """{"k": 12}"""),
        // exactly 24 h before → excluded (buy_ts < click_ts + 24h fails)
        (5L, ts("2024-01-01 12:00:00"), 1L, "click", 0.0, """{"k": 3}"""),
        (6L, ts("2024-01-02 11:40:00"), 1L, "click", 0.0, "not json"),
        // purchase with no clicks in window → no credit rows at all
        (7L, ts("2024-01-02 09:00:00"), 2L, "purchase", 5.0,
          null.asInstanceOf[String]))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")

      val out = EtlQueries.multitouch.run(spark, dir)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      // k = 3 survivors: 10⁶ div 3 = 333333, remainder 1 → the EARLIEST
      // click (11:00, campaign 1) gets 333334; cents = 1000 ride along
      assert(out == Seq(
        (1, 1L, 333334L, 333334000L),
        (2, 2L, 666666L, 666666000L)))
      assert(out.map(_._3).sum == 1000000L, "credit must sum to 10⁶")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
