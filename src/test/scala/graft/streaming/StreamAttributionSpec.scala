package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch pins for StreamOps.attributeJoin — the watermarked
  * stream-stream interval join behind `stream_attrib_batch` (which the
  * DuckDB oracle checks in batch). Two things only a streaming run can
  * prove are pinned here:
  *  - cross-micro-batch matching: a purchase arriving batches after its
  *    click still joins (the buffered-state path);
  *  - outer-side null emission is WATERMARK-GATED: a never-converting
  *    click emits its null row only once BOTH sides' watermarks pass
  *    click_ts + horizon, because the global watermark is the minimum
  *    across inputs — an advancer on one stream alone must not flush.
  */
class StreamAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def toClicks(df: DataFrame): DataFrame =
    df.toDF("click_user", "click_id", "click_ts")

  private def toBuys(df: DataFrame): DataFrame =
    df.toDF("buy_user", "buy_id", "buy_ts", "amount")

  test("inner stream-stream join matches the batch twin on real events " +
      "across interleaved micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    // Sorted by ts before halving (r8 advice): collect() order is
    // arbitrary, and if the second half ever contained rows OLDER than the
    // first half's max, the 1-hour watermark advanced after batch 2 could
    // legitimately drop them — making streamed a strict subset of batch on
    // some regenerated-events orderings. Ascending halves guarantee later
    // batches never arrive behind the watermark.
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, Timestamp)].collect().toSeq.sortBy(_._3.getTime)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, Timestamp, Double)].collect().toSeq.sortBy(_._3.getTime)

    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val bMem = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = StreamOps.attributeJoin(
      toClicks(cMem.toDF()), toBuys(bMem.toDF()), "30 MINUTES", "1 hour")
      .select(col("click_id"), col("buy_id"))
      .writeStream.format("memory").queryName("attrib_inner")
      .outputMode("append").start()
    // interleave halves so matches must form across micro-batch
    // boundaries, not within one batch's arrivals
    val (c3, b3) = (clicks.grouped(clicks.size / 2 + 1).toSeq,
      buys.grouped(buys.size / 2 + 1).toSeq)
    cMem.addData(c3.head)
    q.processAllAvailable()
    bMem.addData(b3.head)
    q.processAllAvailable()
    cMem.addData(c3.last)
    bMem.addData(b3.last)
    q.processAllAvailable()
    val streamed = spark.table("attrib_inner")
      .as[(Long, Long)].collect().toSet
    q.stop()

    val batch = StreamOps.attributeJoin(
      toClicks(clicks.toDF()), toBuys(buys.toDF()), "30 MINUTES", "1 hour")
      .select(col("click_id"), col("buy_id"))
      .as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture must produce at least one attribution")
    assert(streamed == batch)
  }

  test("left-outer null emission is gated on BOTH watermarks and matches " +
      "the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val bMem = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = StreamOps.attributeJoin(
      toClicks(cMem.toDF()), toBuys(bMem.toDF()),
      "5 MINUTES", "10 minutes", "left_outer")
      .select(col("click_user"), col("click_id"), col("buy_id"),
        col("amount"))
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()

    cMem.addData((1L, 100L, ts("2024-01-01 00:00:00")),
      (2L, 101L, ts("2024-01-01 00:00:00")))
    bMem.addData((1L, 500L, ts("2024-01-01 00:03:00"), 9.99))
    q.processAllAvailable()
    // advance ONLY the buy-side watermark: user 2's null row must NOT
    // flush — the global watermark is min(click wm, buy wm) and the
    // click side still sits at 00:00
    bMem.addData((99L, 501L, ts("2024-01-01 02:00:00"), 0.0))
    q.processAllAvailable()
    val early = spark.table("attrib_outer").collect()
    assert(!early.exists(r => r.getAs[Long]("click_id") == 101L),
      s"null row flushed before the click-side watermark advanced: " +
        early.mkString(", "))
    // now advance the click side too — the unmatched click flushes
    cMem.addData((98L, 900L, ts("2024-01-01 02:00:00")))
    q.processAllAvailable()
    val rows = spark.table("attrib_outer").collect()
    q.stop()

    val got = rows.filter(_.getAs[Long]("click_user") < 90L)
      .map(r => (r.getAs[Long]("click_id"),
        Option(r.getAs[java.lang.Long]("buy_id")).map(_.toLong))).toSet
    // batch twin on the same rows (advancers excluded — user 99's
    // clickless purchase never appears in a left join from clicks, and
    // user 98's advancer click is filtered like above)
    val batch = StreamOps.attributeJoin(
      toClicks(Seq((1L, 100L, ts("2024-01-01 00:00:00")),
        (2L, 101L, ts("2024-01-01 00:00:00"))).toDF()),
      toBuys(Seq((1L, 500L, ts("2024-01-01 00:03:00"), 9.99),
        (99L, 501L, ts("2024-01-01 02:00:00"), 0.0)).toDF()),
      "5 MINUTES", "10 minutes", "left_outer")
      .select(col("click_id"), col("buy_id"))
      .collect()
      .map(r => (r.getAs[Long]("click_id"),
        Option(r.getAs[java.lang.Long]("buy_id")).map(_.toLong))).toSet
    assert(got == batch)
    assert(got == Set((100L, Some(500L)), (101L, None)))
  }
}
