package graft.operators

import java.sql.Timestamp
import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of the as-of join against an in-memory reference:
  * random event/version tables (including NULL payloads inside matched
  * rows, keys with no versions at all, and boundary-equal timestamps)
  * must reproduce the row-by-row reference semantics of DuckDB's
  * `ASOF LEFT JOIN` — the latest version at-or-before the event, taken
  * WHOLESALE. Raw ScalaCheck generators with fixed seeds (deterministic,
  * same style as FactPropertiesSpec).
  */
class AsOfJoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // (key, rt-seconds, payload or null)
  private val rightGen: Gen[List[(Long, Long, Option[Int])]] =
    Gen.listOf(for {
      key <- Gen.choose(1L, 5L)
      rt <- Gen.choose(0L, 50L)
      pay <- Gen.option(Gen.choose(1, 99))
    } yield (key, rt, pay))

  // (key, lt-seconds) — keys range wider than right's so some events have
  // no versions at all
  private val leftGen: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      key <- Gen.choose(1L, 6L)
      lt <- Gen.choose(0L, 60L)
    } yield (key, lt))

  private def sample[A](g: Gen[List[A]], seed: Long): List[A] =
    g.apply(Gen.Parameters.default.withSize(40), Seed(seed)).getOrElse(Nil)

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  /** The reference: for each event, the single latest version row
    * at-or-before it (right rows deduped on (key, rt) so "latest" is
    * unambiguous); gap-filtered payload goes null but the event stays.
    */
  private def reference(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Option[Int])],
      gap: Option[Long]): Map[Long, Option[Int]] =
    left.map { case (id, key, lt) =>
      val m = right.filter(r => r._1 == key && r._2 <= lt)
        .sortBy(_._2).lastOption
      id -> m.flatMap { case (_, rt, pay) =>
        if (gap.exists(g => lt - rt > g)) None else pay
      }
    }.toMap

  test("random tables reproduce reference ASOF semantics (5 seeds)") {
    (0 until 5).foreach { i =>
      val right = sample(rightGen, 1234L + i)
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList // unique (key, rt)
      val left = sample(leftGen, 5678L + i)
        .zipWithIndex.map { case ((k, t), id) => (id.toLong, k, t) }
      val rightDf = right.map { case (k, rt, p) => (k, ts(rt), p) }
        .toDF("key", "vt", "payload")
      val leftDf = left.map { case (id, k, lt) => (id, k, ts(lt)) }
        .toDF("event_id", "key", "et")

      val base = AsOfJoin.asofJoin(leftDf, rightDf, "key", "et", "vt",
        Seq("payload")).collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Integer]("payload")).map(_.intValue)).toMap
      assert(base == reference(left, right, None), s"base mismatch seed $i")

      val gapped = AsOfJoin.asofJoinWithin(leftDf, rightDf, "key", "et",
        "vt", Seq("payload"), maxGapSeconds = 10L).collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Integer]("payload")).map(_.intValue)).toMap
      assert(gapped == reference(left, right, Some(10L)),
        s"gap mismatch seed $i")

      // left rows are never dropped or duplicated
      assert(base.size == left.size && gapped.size == left.size)
    }
  }
}
