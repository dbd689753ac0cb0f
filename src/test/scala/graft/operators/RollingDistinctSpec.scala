package graft.operators

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[RollingDistinct]]'s window semantics against brute-force
  * per-day recomputes on crafted data — the boundary day (exactly
  * windowDays−1 back counts, windowDays back does not), absent days,
  * duplicate collapse, the windowDays=1 degeneration, and the sketch
  * rung replayed bucket-for-bucket with a from-scratch JVM md5 fold.
  */
class RollingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def d(day: Int): Date = Date.valueOf(f"2024-01-$day%02d")

  private def df(rows: (Int, Long)*) =
    rows.map { case (day, k) => (d(day), k) }.toDF("day", "k")

  private def exactMap(frame: org.apache.spark.sql.DataFrame) =
    frame.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap

  /** Brute force: for each present day, count distinct keys in the
    * trailing window.
    */
  private def brute(rows: Seq[(Int, Long)], w: Int): Map[String, Long] = {
    val present = rows.map(_._1).distinct
    present.map { day =>
      d(day).toString ->
        rows.filter(r => r._1 <= day && r._1 > day - w).map(_._2)
          .distinct.size.toLong
    }.toMap
  }

  test("boundary: exactly windowDays-1 back counts, windowDays back " +
    "does not") {
    // key 1 on day 1; window 3 ⇒ contributes to days 1,2,3, not day 4
    val rows = Seq((1, 1L), (2, 2L), (3, 3L), (4, 4L))
    val got = exactMap(RollingDistinct.exact(df(rows: _*), "day", "k", 3))
    assert(got == Map("2024-01-01" -> 1L, "2024-01-02" -> 2L,
      "2024-01-03" -> 3L, "2024-01-04" -> 3L))
  }

  test("absent days produce no rows even when inside a window") {
    val rows = Seq((1, 1L), (5, 2L))
    val got = exactMap(RollingDistinct.exact(df(rows: _*), "day", "k", 7))
    // days 2..4 absent from the data ⇒ absent from the output; day 5's
    // window still reaches back to day 1
    assert(got == Map("2024-01-01" -> 1L, "2024-01-05" -> 2L))
  }

  test("duplicates collapse; windowDays=1 degenerates to per-day distinct") {
    val rows = Seq((1, 1L), (1, 1L), (1, 2L), (2, 1L), (2, 1L))
    val got = exactMap(RollingDistinct.exact(df(rows: _*), "day", "k", 1))
    assert(got == Map("2024-01-01" -> 2L, "2024-01-02" -> 1L))
  }

  test("exact equals brute force on a deterministic pseudo-random corpus") {
    val rows = (0 until 400).map(i =>
      (1 + (i * 7919 % 28), (i * 104729 % 37).toLong))
    for (w <- Seq(1, 3, 7)) {
      val got = exactMap(RollingDistinct.exact(df(rows: _*), "day", "k", w))
      assert(got == brute(rows, w), s"windowDays=$w")
    }
  }

  test("sketch occupancy replays a from-scratch JVM md5 fold") {
    val m = 64
    val rows = (0 until 200).map(i => (1 + i % 9, (i % 45).toLong))
    val got = RollingDistinct
      .sketchOccupancy(df(rows: _*), "day", "k", 7, m)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    def bucket(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 5), 16) % m
    }
    val expected = rows.map(_._1).distinct.map { day =>
      d(day).toString ->
        rows.filter(r => r._1 <= day && r._1 > day - 7)
          .map(r => bucket(r._2)).distinct.size.toLong
    }.toMap
    assert(got == expected)
  }

  test("withSketch carries both rungs and matches the standalone forms") {
    val rows = (0 until 300).map(i => (1 + i % 12, (i % 80).toLong))
    val both = RollingDistinct.withSketch(df(rows: _*), "day", "k", 7, 64)
      .collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
    val e = exactMap(RollingDistinct.exact(df(rows: _*), "day", "k", 7))
    val z = RollingDistinct.sketchOccupancy(df(rows: _*), "day", "k", 7, 64)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(both.view.mapValues(_._2).toMap == e)
    assert(both.view.mapValues(_._1).toMap == z)
  }

  test("guards: windowDays and m must be positive") {
    val a = df((1, 1L))
    intercept[IllegalArgumentException](
      RollingDistinct.exact(a, "day", "k", 0))
    intercept[IllegalArgumentException](
      RollingDistinct.sketchOccupancy(a, "day", "k", 7, 0))
  }
}
