package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Edge semantics of the bucketed interval-overlap join on hand-built
  * intervals (the sf0.01 oracle proves equivalence to the theta join on
  * generated data; these are the shapes that make report-once dedup and
  * boundary inclusivity easy to get wrong).
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("overlaps report exactly once, boundaries inclusive, disjoint out") {
    val left = Seq(
      // spans 3 buckets (10-min width) — pairs must not triplicate
      ("L1", ts("2024-01-01 00:05:00"), ts("2024-01-01 00:25:00")),
      ("L2", ts("2024-01-01 01:00:00"), ts("2024-01-01 01:01:00")),
      ("L3", ts("2024-01-01 02:00:00"), ts("2024-01-01 02:01:00")))
      .toDF("l_id", "l_start", "l_end")
    val right = Seq(
      ("R1", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")), // ⊇ L1
      ("R2", ts("2024-01-01 00:20:00"), ts("2024-01-01 00:21:00")), // ∩ L1
      // touches L2 at exactly one instant — inclusive bounds keep it
      ("R3", ts("2024-01-01 01:01:00"), ts("2024-01-01 01:30:00")),
      ("R4", ts("2024-01-01 03:00:00"), ts("2024-01-01 03:10:00"))) // disjoint
      .toDF("r_id", "r_start", "r_end")
    val pairs = IntervalJoin.overlapJoin(left, right,
      "l_start", "l_end", "r_start", "r_end", bucketMillis = 600000L)
      .select("l_id", "r_id").as[(String, String)].collect().sorted.toSeq
    assert(pairs == Seq("L1" -> "R1", "L1" -> "R2", "L2" -> "R3"))
  }

  test("bucketed join equals the quadratic definition on random intervals") {
    val rng = new scala.util.Random(7)
    def frame(prefix: String) = (1 to 120).map { i =>
      val s = rng.nextInt(86400)
      val len = rng.nextInt(3600)
      (s"$prefix$i", new Timestamp(1704067200000L + s * 1000L),
        new Timestamp(1704067200000L + (s + len) * 1000L))
    }
    val l = frame("a").toDF("l_id", "l_start", "l_end")
    val r = frame("b").toDF("r_id", "r_start", "r_end")
    val got = IntervalJoin.overlapJoin(l, r,
      "l_start", "l_end", "r_start", "r_end", bucketMillis = 1800000L)
      .select("l_id", "r_id").as[(String, String)].collect().toSet
    val want = l.crossJoin(r)
      .filter($"l_start" <= $"r_end" && $"r_start" <= $"l_end")
      .select("l_id", "r_id").as[(String, String)].collect().toSet
    assert(got == want)
  }

  test("hot-bucket cap is inert under the cap and drops exactly the " +
    "over-cap bucket's pairs") {
    val rng = new scala.util.Random(13)
    // background: day-one intervals, a few per 30-min bucket
    val bg = (1 to 100).map { i =>
      val s = rng.nextInt(86400); val len = rng.nextInt(3600)
      (s"bg$i", new Timestamp(1704067200000L + s * 1000L),
        new Timestamp(1704067200000L + (s + len) * 1000L))
    }
    // plant: 40 intervals inside ONE far-away 30-min bucket (day 30)
    val plant = (1 to 40).map { i =>
      val s = rng.nextInt(900)
      (s"hot$i", new Timestamp(1706659200000L + s * 1000L),
        new Timestamp(1706659200000L + (s + 600) * 1000L))
    }
    def pairsOf(rows: Seq[(String, Timestamp, Timestamp)], cap: Long) = {
      val l = rows.toDF("l_id", "l_start", "l_end")
      val r = rows.map { case (id, s, e) => (id, s, e) }
        .toDF("r_id", "r_start", "r_end")
      IntervalJoin.overlapJoin(l, r, "l_start", "l_end", "r_start", "r_end",
        bucketMillis = 1800000L, maxBucketRows = cap)
        .filter($"l_id" =!= $"r_id")
        .select("l_id", "r_id").as[(String, String)].collect().toSet
    }
    val all = bg ++ plant
    // generous cap: identical to uncapped on the same corpus
    assert(pairsOf(all, 1000L) == pairsOf(all, Long.MaxValue))
    // tight cap (> any bg bucket, < the plant): exactly the planted
    // bucket's pairs disappear — the rest of the output is untouched
    val capped = pairsOf(all, 30L)
    assert(capped == pairsOf(bg, Long.MaxValue))
  }

  test("rows violating start <= end are dropped, not exploded") {
    val l = Seq(
      ("ok", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")),
      ("bad", ts("2024-01-01 00:30:00"), ts("2024-01-01 00:00:00")))
      .toDF("l_id", "l_start", "l_end")
    val r = Seq(("r", ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00")))
      .toDF("r_id", "r_start", "r_end")
    val got = IntervalJoin.overlapJoin(l, r,
      "l_start", "l_end", "r_start", "r_end", bucketMillis = 600000L)
      .select("l_id", "r_id").as[(String, String)].collect().toSeq
    assert(got == Seq("ok" -> "r"))
  }

  test("overlapCounts equals the quadratic definition on random intervals") {
    val rng = new scala.util.Random(11)
    val iv = (1 to 150).map { i =>
      val s = rng.nextInt(86400); val len = rng.nextInt(5400)
      (i.toLong, new Timestamp(1704067200000L + s * 1000L),
        new Timestamp(1704067200000L + (s + len) * 1000L))
    }.toDF("iv_id", "st", "en")
    val got = IntervalJoin.overlapCounts(iv, "st", "en", 1800000L)
      .select("iv_id", "n_overlap").as[(Long, Long)].collect().toMap
    val a = iv.select($"iv_id".as("a_id"), $"st".as("a_st"), $"en".as("a_en"))
    val b = iv.select($"iv_id".as("b_id"), $"st".as("b_st"), $"en".as("b_en"))
    val want = a.crossJoin(b)
      .filter($"a_id" =!= $"b_id" && $"a_st" <= $"b_en" && $"b_st" <= $"a_en")
      .groupBy("a_id").count().as[(Long, Long)].collect().toMap
    assert(got.keySet.size == 150)
    for ((id, n) <- got) assert(n == want.getOrElse(id, 0L),
      s"interval $id: rank count $n != quadratic ${want.getOrElse(id, 0L)}")
  }

  test("pathological bucketMillis trips the occupied-bucket guard by name") {
    // 50 intervals spread over a day at 1 ms buckets: far more occupied
    // buckets than the (test-tightened) cap — the in-plan assert must
    // fail with the named contract, not silently funnel the offset frame
    // through one task. The same data under the default cap still works.
    val iv = (1 to 50).map { i =>
      (i.toLong, new Timestamp(1704067200000L + i * 1000000L),
        new Timestamp(1704067200000L + i * 1000000L + 500000L))
    }.toDF("iv_id", "st", "en")
    // the action must CONSUME n_overlap — count() would let ColumnPruning
    // drop the guarded offset column and never evaluate the assert
    val e = intercept[Exception] {
      IntervalJoin.overlapCounts(iv, "st", "en", bucketMillis = 1L,
        maxOffsetBuckets = 16L)
        .agg(org.apache.spark.sql.functions.sum("n_overlap")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("offset-frame contract violated")),
      s"wrong error: $e")
    // sane width, same data: green (again consuming n_overlap)
    val n = IntervalJoin.overlapCounts(iv, "st", "en",
      bucketMillis = 3600000L)
      .select("iv_id", "n_overlap").collect()
    assert(n.length == 50)
    // bucketMillis = 0 rejected eagerly
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapCounts(iv, "st", "en", bucketMillis = 0L)
    }
  }
}
