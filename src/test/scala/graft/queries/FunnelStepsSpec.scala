package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** The generated corpus's users are event-dense enough that everyone
  * completes all three funnel steps (1500/1500/1500 at sf0.1) — so the
  * properties that make this an ORDERED funnel are pinned on crafted
  * users: a step only counts when it happens at-or-after the previous
  * step (a purchase BEFORE the click is not a conversion), and drop-off
  * at each stage actually shows.
  */
class FunnelStepsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("steps require order; out-of-order events don't count; " +
    "drop-off shows at each stage") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fun").toString
    try {
      Seq(
        // user 1: full ordered funnel — counts at every step
        (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
        (2L, ts("2024-01-01 10:05:00"), 1L, "click"),
        (3L, ts("2024-01-01 10:10:00"), 1L, "purchase"),
        // user 2: view only — step 1 only
        (4L, ts("2024-01-01 10:00:00"), 2L, "view"),
        // user 3: click BEFORE the view — the click must not count,
        // so steps 2 and 3 are not reached even though a later
        // purchase exists
        (5L, ts("2024-01-01 09:00:00"), 3L, "click"),
        (6L, ts("2024-01-01 10:00:00"), 3L, "view"),
        (7L, ts("2024-01-01 11:00:00"), 3L, "purchase"),
        // user 4: purchase BEFORE the click — steps 1+2 only
        (8L, ts("2024-01-01 10:00:00"), 4L, "view"),
        (9L, ts("2024-01-01 10:30:00"), 4L, "purchase"),
        (10L, ts("2024-01-01 11:00:00"), 4L, "click"),
        // user 5: click AT the view instant, purchase AT the click
        // instant — >= boundary, counts all the way through
        (11L, ts("2024-01-01 12:00:00"), 5L, "view"),
        (12L, ts("2024-01-01 12:00:00"), 5L, "click"),
        (13L, ts("2024-01-01 12:00:00"), 5L, "purchase"),
        // user 6: no view at all — appears at no step
        (14L, ts("2024-01-01 10:00:00"), 6L, "click"),
        (15L, ts("2024-01-01 10:05:00"), 6L, "purchase"))
        .toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.parquet(s"$dir/events.parquet")

      val out = Workload.q65.run(spark, dir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      // step 1: users 1,2,3,4,5 viewed → 5
      // step 2: users 1,4,5 clicked at-or-after their view → 3
      //   (user 3's click was before the view)
      // step 3: users 1,5 purchased at-or-after that click → 2
      //   (user 4's purchase was before the click)
      assert(out == Seq((1, 5L, 1.0), (2, 3L, 3.0 / 5.0), (3, 2L, 2.0 / 5.0)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
