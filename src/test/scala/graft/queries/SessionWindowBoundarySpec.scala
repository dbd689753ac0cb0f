package graft.queries

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the boundary semantics of the two sessionization twins
  * (stream_sessions_batch's LAG construction vs stream_sessions_window's
  * native `session_window`) — including the edge a doc reader would
  * expect to diverge: an event gap of EXACTLY the session gap. Both
  * forms MERGE it — the LAG form because `diff > gap` opens a session
  * (diff == gap stays), and `session_window` because its merge test is
  * INCLUSIVE at the previous window end (empirically pinned here: the
  * "[start, start+gap)" half-open notation in the docs does NOT mean an
  * exact-boundary event splits). So the twins are equivalent at every
  * gap value, which is what lets them share one oracle verbatim.
  */
class SessionWindowBoundarySpec extends SparkSpec {
  import spark.implicits._

  private val GapMs = 600000L

  private def sessionsLag(df: org.apache.spark.sql.DataFrame): Long = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    df.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts")) > GapMs))
          .cast("int"))
      .withColumn("sid", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select("user_id", "sid").distinct().count()
  }

  private def sessionsNative(df: org.apache.spark.sql.DataFrame): Long =
    df.groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .count().count()

  private def ev(ms: Long*): org.apache.spark.sql.DataFrame =
    ms.map(m => (1L, new Timestamp(m))).toDF("user_id", "ts")

  test("sub-gap events merge in BOTH forms") {
    val df = ev(0L, GapMs - 1, 2 * GapMs - 2)
    assert(sessionsLag(df) == 1L)
    assert(sessionsNative(df) == 1L)
  }

  test("super-gap events split in BOTH forms") {
    val df = ev(0L, GapMs + 1)
    assert(sessionsLag(df) == 2L)
    assert(sessionsNative(df) == 2L)
  }

  test("an EXACT-gap pair merges in BOTH forms — the boundary is " +
    "inclusive on both sides, so the twins are equivalent everywhere") {
    val df = ev(0L, GapMs)
    assert(sessionsLag(df) == 1L,
      "LAG form: diff > gap opens a session, so diff == gap merges")
    assert(sessionsNative(df) == 1L,
      "session_window: the merge test is inclusive at the previous end")
  }
}
