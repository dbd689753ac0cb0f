package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for ingest dedup: dropDuplicatesWithinWatermark over a
  * MemoryStream (first ARRIVAL survives, state bounded by the horizon)
  * must keep exactly the rows the DuckDB-oracled batch twin
  * (StreamOps.dedupBatchTwin — earliest (ts, event_id) survives) keeps,
  * when rows arrive in event-time order and every redelivery lands inside
  * the horizon. This pins the equivalence claim `stream_dedup_batch`
  * makes in its Scaladoc; cross-horizon redelivery (where the two
  * legitimately differ, state having been evicted) is out of parity scope
  * by design — the batch exact-dedup pass is the cross-horizon authority.
  */
class StreamingDedupParitySpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  // (event_id, ts, user_id, event_type, value, props); rows 3 and 5
  // duplicate row 1's content, row 6 duplicates row 2's — one dup inside
  // the same micro-batch, one redelivered in the NEXT batch
  private val rows = Seq(
    (1L, t(1), 7L, "click", 1.0, """{"k": 1}"""),
    (2L, t(2), 8L, "view", 2.0, """{"k": 2}"""),
    (3L, t(3), 7L, "click", 9.0, """{"k": 1}"""),
    (4L, t(4), 9L, "click", 3.0, """{"k": 3}"""),
    (5L, t(6), 7L, "click", 4.0, """{"k": 1}"""),
    (6L, t(7), 8L, "view", 5.0, """{"k": 2}"""),
    (7L, t(8), 9L, "error", 6.0, """{"k": 4}"""),
    // NULL-slot ambiguity guard: without the fingerprint's NULL sentinel
    // these two render the same concat ("10|x") and one is wrongly
    // dropped — both must survive
    (8L, t(9), 10L, null, 7.0, "x"),
    (9L, t(10), 10L, "x", 8.0, null))

  private val cols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("streaming dedup keeps exactly the batch twin's survivors") {
    implicit val sqlCtx = spark.sqlContext
    val batchKept = StreamOps.dedupBatchTwin(rows.toDF(cols: _*))
      .select("event_id").as[Long].collect().toSet

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val withFp = StreamOps.dedupStream(
      mem.toDF().toDF(cols: _*)
        .withColumn("fp", StreamOps.contentFingerprint(
          col("user_id"), col("event_type"), col("props"))),
      "1 hour")
    val q = withFp.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    mem.addData(rows.take(4): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(4): _*)
    q.processAllAvailable()
    val streamKept = spark.table("dedup_stream")
      .select("event_id").as[Long].collect().toSet
    q.stop()

    assert(streamKept === batchKept)
    assert(batchKept === Set(1L, 2L, 4L, 7L, 8L, 9L))

    // the twin's delivery counts: content of row 1 delivered 3x, row 2's 2x
    val dupes = StreamOps.dedupBatchTwin(rows.toDF(cols: _*))
      .select("event_id", "n_dupes").as[(Long, Long)].collect().toMap
    assert(dupes(1L) == 3L && dupes(2L) == 2L && dupes(4L) == 1L)
  }
}
