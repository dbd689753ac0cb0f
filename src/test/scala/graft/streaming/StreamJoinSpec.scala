package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Remaining Structured Streaming operator surface: built-in event-time
  * session windows (the declarative twin of StreamOps.sessionize) and
  * watermarked stream-stream joins — neither needed for reference parity
  * (SURVEY.md §2.5) but both part of a complete streaming engine.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("built-in session_window matches the custom sessionizer's sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = mem.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "1 minute"))
      .agg(count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))
      .writeStream.format("memory").queryName("builtin_sessions")
      .outputMode("append").start()

    mem.addData(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:30"), 2.0),
      (1L, ts("2024-01-01 00:05:00"), 3.0))
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 01:00:00"), 0.0)) // advance watermark
    q.processAllAvailable()
    val rows = spark.table("builtin_sessions").collect()
    q.stop()

    // same session boundaries the custom sessionizer produced in
    // StreamOpsSpec: [00:00:00, 00:00:30+gap) with 2 events / 3.0 value,
    // then a single-event session at 00:05
    val first = rows.find(_.getAs[Timestamp]("session_start") ==
      ts("2024-01-01 00:00:00")).get
    assert(first.getAs[Int]("n_events") == 2)
    assert(first.getAs[Double]("total_value") == 3.0)
    assert(rows.exists(_.getAs[Timestamp]("session_start") ==
      ts("2024-01-01 00:05:00")))
  }

  test("watermarked stream-stream join: purchases attributed to clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val c = clicks.toDF().toDF("click_user", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val b = buys.toDF().toDF("buy_user", "buy_ts", "amount")
      .withWatermark("buy_ts", "10 minutes")
    // attribute a purchase to a click within the preceding 5 minutes —
    // the time bound is what lets Spark expire join state
    val q = c.join(b,
      col("click_user") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 5 MINUTES"),
      "inner")
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()

    clicks.addData((1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:00:00")))
    buys.addData(
      (1L, ts("2024-01-01 00:03:00"), 9.99),   // within 5 min -> attributed
      (2L, ts("2024-01-01 00:30:00"), 5.00))   // too late -> not attributed
    q.processAllAvailable()
    val rows = spark.table("attributed").collect()
    q.stop()

    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("click_user") == 1L)
    assert(rows(0).getAs[Double]("amount") == 9.99)
  }
}
