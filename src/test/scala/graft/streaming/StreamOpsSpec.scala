package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.streaming.StreamOps.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedEventStats: tumbling windows with watermark drop late rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedEventStats(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode("append").start()

    mem.addData(
      (ts("2024-01-01 00:01:00"), "click", 1.0),
      (ts("2024-01-01 00:04:00"), "click", 2.0),
      (ts("2024-01-01 00:11:00"), "view", 5.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first two windows
    mem.addData((ts("2024-01-01 01:00:00"), "click", 1.0))
    q.processAllAvailable()
    // a row far behind the watermark must be dropped
    mem.addData((ts("2024-01-01 00:02:00"), "click", 100.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 02:00:00"), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("win_stats").collect()
    q.stop()

    val firstWin = rows.find(r =>
      r.getAs[Timestamp]("window_start") == ts("2024-01-01 00:00:00")).get
    assert(firstWin.getAs[Long]("n_events") == 2) // late row NOT counted
    assert(firstWin.getAs[Double]("total_value") == 3.0)
  }

  test("sessionize (stream) matches sessionizeBatch on the same input") {
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 60_000L
    val data = Seq(
      Event(1L, ts("2024-01-01 00:00:00"), 1.0),
      Event(1L, ts("2024-01-01 00:00:30"), 2.0),
      Event(1L, ts("2024-01-01 00:05:00"), 3.0), // new session (gap > 1m)
      Event(2L, ts("2024-01-01 00:00:10"), 4.0))

    val batch = StreamOps.sessionizeBatch(
      data.toDF(), gapMs)
      .orderBy("user_id", "session_start").collect()
    assert(batch.length == 3)
    val s1 = batch(0)
    assert(s1.getAs[Int]("n_events") == 2 &&
      s1.getAs[Double]("total_value") == 3.0)

    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS(), gapMs,
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    // far-future events close every open session by gap detection
    mem.addData(Event(1L, ts("2024-01-01 01:00:00"), 9.0),
      Event(2L, ts("2024-01-01 01:00:00"), 9.0))
    q.processAllAvailable()
    val streamed = spark.table("sessions").as[Session]
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    q.stop()
    // every batch-computed session was eventually emitted by the stream
    assert(streamed.map(s =>
      (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value))
      .toSeq ==
      batch.map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start"), r.getAs[Timestamp]("session_end"),
        r.getAs[Int]("n_events"), r.getAs[Double]("total_value"))).toSeq)
  }

  test("dedupStream drops re-deliveries within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long)]
    val docs = mem.toDF().toDF("ts", "fp", "doc_id")
    val q = StreamOps.dedupStream(docs, "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()

    mem.addData(
      (ts("2024-01-01 00:00:00"), "fpA", 1L),
      (ts("2024-01-01 00:01:00"), "fpA", 2L), // same content re-delivered
      (ts("2024-01-01 00:02:00"), "fpB", 3L))
    q.processAllAvailable()
    // another fpA re-delivery inside the horizon: still dropped
    mem.addData((ts("2024-01-01 00:03:00"), "fpA", 4L))
    q.processAllAvailable()
    val within = spark.table("dedup_stream").collect()
    assert(within.map(_.getAs[String]("fp")).sorted.toSeq == Seq("fpA", "fpB"))

    // advance the watermark far past the horizon, then send fpA again:
    // its state was evicted, so the new arrival is a fresh document
    mem.addData((ts("2024-01-01 01:00:00"), "fpC", 5L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 01:05:00"), "fpA", 6L))
    q.processAllAvailable()
    val after = spark.table("dedup_stream").collect()
    q.stop()
    assert(after.count(_.getAs[String]("fp") == "fpA") == 2)
  }

  test("saltedJoin and saltedSum match their unsalted equivalents") {
    val fact = (1 to 100).map(i => (if (i <= 90) 1 else i, i.toDouble))
      .toDF("k", "v") // key 1 is hot: 90% of rows
    val dim = Seq((1, "hot"), (95, "cold")).toDF("k", "name")

    val salted = graft.operators.SkewJoin.saltedJoin(fact, dim, "k", 8)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).head().getDouble(0)
      == plain.agg(sum("v")).head().getDouble(0))

    val aggS = graft.operators.SkewJoin.saltedSum(fact, "k", "v", 8)
      .orderBy("k").collect()
    val aggP = fact.groupBy("k").agg(sum("v").as("sum_v"))
      .orderBy("k").collect()
    assert(aggS.map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      aggP.map(r => (r.getInt(0), r.getDouble(1))).toSeq)
  }
}
