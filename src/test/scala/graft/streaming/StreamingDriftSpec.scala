package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The drift monitor's claims: the report is invariant to how the stream
  * was batched (inherited from the histogram fold), planted drift into a
  * reference-empty bucket flags while matched traffic does not, and the
  * layout contract (reference built under the same bucketing) is
  * enforced rather than silently producing a wrong comparison.
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private val Mn = 0L; private val Mx = 99L; private val B = 10

  private def refHist(values: Seq[Long]): DataFrame =
    StreamingHistogram.bucketCounts(values.toDF("v"), "v", Mn, Mx, B)

  private def reportOf(df: DataFrame): Map[Int, (Long, Long, Boolean)] =
    df.collect().map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap

  // reference: 40 rows spread uniformly over buckets 0..7
  private val refRows: Seq[Long] = (0 until 40).map(i => (i % 8) * 10L + 5L)
  // observed: same shape on buckets 0..7 but ALL mass concentrated
  // moving — 30 rows in bucket 9, which the reference never occupied
  private val obsRows: Seq[Long] =
    (0 until 10).map(i => (i % 8) * 10L + 5L) ++ Seq.fill(30)(95L)

  test("planted drift into a reference-empty bucket flags; matched " +
    "traffic does not; report is batching-invariant") {
    val expected = {
      val m = new StreamingDrift.Monitor("v", Mn, Mx, B, refHist(refRows))
      m.absorb(obsRows.toDF("v"))
      reportOf(m.driftReport().get)
    }
    // bucket 9: ref_n = 0, obs_n = 30 → d = 0.75 − 1/50 = 0.73,
    // contrib = 0.73²·50/1 ≈ 26.6 ≫ 3.84
    assert(expected(9) == (0L, 30L, true), s"got ${expected(9)}")
    assert(expected.filter(_._2._3).keySet == Set(9),
      s"only the drifted bucket flags: $expected")
    // matched buckets appear unflagged with both counts
    assert(expected(0)._1 == 5L && expected(0)._2 == 2L)

    for (batching <- Seq(Seq(10, 30), Seq(40), Seq(13, 13, 14))) {
      val m = new StreamingDrift.Monitor("v", Mn, Mx, B, refHist(refRows))
      var rest = obsRows
      for (n <- batching) {
        val (b, r) = rest.splitAt(n); m.absorb(b.toDF("v")); rest = r
      }
      assert(reportOf(m.driftReport().get) == expected,
        s"batching $batching changed the drift report")
    }
  }

  test("layout contract: a reference built under a different bucketing " +
    "is rejected") {
    // bucket ids under B=40 reach 39 — invalid for a B=10 monitor
    val wrong = StreamingHistogram.bucketCounts(
      refRows.toDF("v"), "v", Mn, Mx, 40)
    intercept[IllegalArgumentException] {
      new StreamingDrift.Monitor("v", Mn, Mx, B, wrong)
    }
  }

  test("no report before the first batch") {
    val m = new StreamingDrift.Monitor("v", Mn, Mx, B, refHist(refRows))
    assert(m.driftReport().isEmpty)
  }
}
