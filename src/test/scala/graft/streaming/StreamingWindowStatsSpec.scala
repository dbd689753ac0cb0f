package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream ≡ batch for the tumbling-window event stats: the SAME
  * StreamOps.windowedEventStats plan over a MemoryStream across two
  * micro-batches must produce exactly the batch result on the same rows —
  * the windowed-aggregation analog of StreamingCurationSpec's parity pin
  * (and the streaming twin of the DuckDB-oracled
  * `stream_window_stats_batch`). Complete output mode so every window is
  * observable regardless of where the watermark stands when the fixture
  * ends; late-row DROPPING under append mode is StreamOpsSpec's job.
  */
class StreamingWindowStatsSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  // three hours of events, two types, out-of-order arrival within batches
  private val rows = Seq(
    (1L, t(5), "click", 1.0),
    (2L, t(59), "click", 2.0),
    (3L, t(10), "purchase", 10.0),
    (4L, t(65), "click", 3.0),
    (5L, t(61), "purchase", 20.0),
    (6L, t(130), "click", 4.0),
    (7L, t(125), "purchase", 30.0),
    (8L, t(1), "click", 5.0)) // arrives LAST in batch 2, belongs to hour 0

  test("windowed stats over a stream equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val batch = StreamOps.windowedEventStats(
      rows.toDF("event_id", "ts", "event_type", "value"), "1 hour", "1 hour")
      .orderBy("window_start", "event_type").collect().toSeq

    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val q = StreamOps.windowedEventStats(
      mem.toDF().toDF("event_id", "ts", "event_type", "value"),
      "1 hour", "1 hour")
      .writeStream.format("memory").queryName("window_stats_stream")
      .outputMode("complete").start()
    // two micro-batches: parity must hold regardless of arrival batching,
    // including a row for an old window arriving in the later batch
    mem.addData(rows.take(5): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(5): _*)
    q.processAllAvailable()
    val streamed = spark.table("window_stats_stream")
      .orderBy("window_start", "event_type").collect().toSeq
    q.stop()

    assert(streamed === batch)
    // sanity: the fixture spans 3 hourly windows x up to 2 types
    assert(batch.size == 6)
    assert(batch.map(_.getAs[Long]("n_events")).sum == rows.size)
  }

  test("sliding-window stats over a stream equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val batch = StreamOps.slidingEventStats(
      rows.toDF("event_id", "ts", "event_type", "value"),
      "20 minutes", "10 minutes", "1 hour")
      .orderBy("window_start", "event_type").collect().toSeq

    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val q = StreamOps.slidingEventStats(
      mem.toDF().toDF("event_id", "ts", "event_type", "value"),
      "20 minutes", "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("sliding_stats_stream")
      .outputMode("complete").start()
    mem.addData(rows.take(5): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(5): _*)
    q.processAllAvailable()
    val streamed = spark.table("sliding_stats_stream")
      .orderBy("window_start", "event_type").collect().toSeq
    q.stop()

    assert(streamed === batch)
    // every event lands in exactly len/slide = 2 windows
    assert(batch.map(_.getAs[Long]("n_events")).sum == 2L * rows.size)
  }
}
