package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Pins the incremental join-view maintenance contract: maintained ≡
  * from-scratch rebuild under every delta class — upsert, insert,
  * tombstone, LATE data, resurrect, and the case the naive ΔA⋈B rule
  * misses entirely: a touched row whose JOIN COLUMN changed (the view
  * rows of BOTH its old and new join groups must refresh). Also pins
  * that untouched join groups genuinely pass through (their rows
  * survive even when the recompute side would disagree — proven by
  * feeding maintain a deliberately corrupted view row in an untouched
  * group and seeing it preserved verbatim).
  */
class JoinMvSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  // A: (aid, j, av, ts) keyed by aid, ordered by ts — j is the JOIN
  // column and NOT the key, so updates can move rows across join groups
  private def aDf(rows: Seq[(Long, Long, String, Long)]): DataFrame =
    rows.map { case (aid, j, av, t) => (aid, j, av, ts(t)) }
      .toDF("aid", "j", "av", "ts")

  // B: (j, bv, ver, del) keyed by j (dim side), ordered by ver
  private def bDf(rows: Seq[(Long, String, Long, Boolean)]): DataFrame =
    rows.toDF("j", "bv", "ver", "del")

  private val aServ = col("av") =!= "DEL"
  private val bServ = !col("del")

  private def scratch(a: DataFrame, b: DataFrame): DataFrame =
    JoinMv.fromScratch(a, Seq("aid"), Seq("ts"), aServ,
      b, Seq("j"), Seq("ver"), bServ, Seq("j"))

  private def maintained(aBase: DataFrame, aBatch: DataFrame,
      bBase: DataFrame, bBatch: DataFrame): DataFrame =
    JoinMv.maintain(scratch(aBase, bBase),
      aBase, aBatch, Seq("aid"), Seq("ts"), aServ,
      bBase, bBatch, Seq("j"), Seq("ver"), bServ, Seq("j"))

  private def rows(df: DataFrame): Set[(Long, Long, String, Long, String)] =
    df.select(col("j"), col("aid"), col("av"), col("ts").cast("long"),
      col("bv"))
      .as[(Long, Long, String, Long, String)].collect().toSet

  test("maintained equals from-scratch under move/delete/late/insert") {
    val aBase = aDf(Seq(
      (1L, 10L, "a1", 100L), // will MOVE to join group 20
      (2L, 10L, "a2", 100L), // untouched
      (3L, 20L, "a3", 100L), // will be tombstoned
      (4L, 30L, "a4", 200L), // its whole join group gets dim-tombstoned
      (6L, 10L, "a6", 400L)  // late batch row arrives BEHIND this one
    ))
    val aBatch = aDf(Seq(
      (1L, 20L, "a1v2", 300L), // join-col move 10 → 20
      (3L, 20L, "DEL", 300L),  // tombstone
      (6L, 10L, "stale", 350L), // LATE: older than base — must lose
      (5L, 40L, "a5", 300L)    // brand-new key, brand-new join group
    ))
    val bBase = bDf(Seq(
      (10L, "b10", 1L, false),
      (20L, "b20", 1L, false),
      (30L, "b30", 1L, false)
    ))
    val bBatch = bDf(Seq(
      (20L, "b20v2", 2L, false), // dim upsert in a touched group
      (30L, "b30", 2L, true),    // dim tombstone — group 30 leaves view
      (40L, "b40", 1L, false)    // new dim row — joins the new a5
    ))
    val got = rows(maintained(aBase, aBatch, bBase, bBatch))
    val want = rows(scratch(
      aBase.unionByName(aBatch),
      bDf(Seq((10L, "b10", 1L, false), (20L, "b20", 1L, false),
        (30L, "b30", 1L, false), (20L, "b20v2", 2L, false),
        (30L, "b30", 2L, true), (40L, "b40", 1L, false)))))
    assert(got == want)
    // spot-check the move: a1's view row is now in group 20 with the
    // UPSERTED dim value, and group 10 keeps the untouched a2 plus the
    // late-loser a6 at its BASE version
    assert(got.contains((20L, 1L, "a1v2", 300L, "b20v2")))
    assert(got.filter(_._1 == 10L).map(_._2) == Set(2L, 6L))
    assert(got.filter(_._2 == 6L).map(_._3) == Set("a6"))
    // the tombstoned aid is gone; dim-tombstoned group 30 took a4 with it
    assert(!got.exists(_._2 == 3L))
    assert(!got.exists(_._1 == 30L) && !got.exists(_._2 == 4L))
    assert(got.contains((40L, 5L, "a5", 300L, "b40")))
  }

  test("maintainMerged(precomputed merges) equals maintain (r16 path)") {
    val aBase = aDf(Seq((1L, 10L, "a1", 100L), (2L, 20L, "a2", 100L),
      (3L, 30L, "a3", 100L)))
    val aBatch = aDf(Seq((1L, 20L, "a1v2", 300L), (4L, 40L, "a4", 300L)))
    val bBase = bDf(Seq((10L, "b10", 1L, false), (20L, "b20", 1L, false),
      (30L, "b30", 1L, false), (40L, "b40", 1L, false)))
    val bBatch = bDf(Seq((20L, "b20v2", 2L, false)))
    val view = scratch(aBase, bBase)
    val direct = JoinMv.maintain(view,
      aBase, aBatch, Seq("aid"), Seq("ts"), aServ,
      bBase, bBatch, Seq("j"), Seq("ver"), bServ, Seq("j"))
    val merged = JoinMv.maintainMerged(view,
      aBase, CdcMerge.merge(aBase, aBatch, Seq("aid"), Seq("ts")), aBatch,
      Seq("aid"), aServ,
      bBase, CdcMerge.merge(bBase, bBatch, Seq("j"), Seq("ver")), bBatch,
      Seq("j"), bServ, Seq("j"))
    assert(rows(direct) == rows(merged))
  }

  test("untouched join groups pass through without recompute") {
    val aBase = aDf(Seq((1L, 10L, "a1", 100L), (2L, 20L, "a2", 100L)))
    val aBatch = aDf(Seq((2L, 20L, "a2v2", 200L))) // touches group 20 only
    val bBase = bDf(Seq((10L, "b10", 1L, false), (20L, "b20", 1L, false)))
    val bBatch = bDf(Nil.asInstanceOf[Seq[(Long, String, Long, Boolean)]])
    // corrupt group 10's view row: if maintain recomputed it, the
    // corruption would be repaired — pass-through must preserve it
    val view = scratch(aBase, bBase)
    val corrupted = view.withColumn("bv",
      when(col("j") === 10L, lit("CORRUPT")).otherwise(col("bv")))
    val out = JoinMv.maintain(corrupted,
      aBase, aBatch, Seq("aid"), Seq("ts"), aServ,
      bBase, bBatch, Seq("j"), Seq("ver"), bServ, Seq("j"))
    assert(rows(out).contains((10L, 1L, "a1", 100L, "CORRUPT")),
      "untouched group was recomputed — the pass-through anti join is broken")
    assert(rows(out).contains((20L, 2L, "a2v2", 200L, "b20")))
  }

  test("resurrect after tombstone and empty batches are no-ops") {
    // compacted base: the key's surviving row IS the tombstone
    val aBase = aDf(Seq((1L, 10L, "DEL", 200L)))
    val bBase = bDf(Seq((10L, "b10", 1L, false)))
    // empty batches: view unchanged
    val empty = aDf(Seq.empty)
    val bEmpty = bDf(Seq.empty)
    assert(rows(maintained(aBase, empty, bBase, bEmpty)) ==
      rows(scratch(aBase, bBase)))
    // resurrect: a newer non-delete brings the key back
    val aBatch = aDf(Seq((1L, 10L, "back", 300L)))
    assert(rows(maintained(aBase, aBatch, bBase, bEmpty)) ==
      Set((10L, 1L, "back", 300L, "b10")))
  }

  test("output feeds back in as next step's view (two-step chain)") {
    val aBase = aDf(Seq((1L, 10L, "a1", 100L), (2L, 20L, "a2", 100L)))
    val bBase = bDf(Seq((10L, "b10", 1L, false), (20L, "b20", 1L, false)))
    val batch1 = aDf(Seq((1L, 20L, "a1v2", 200L)))
    val batch2 = aDf(Seq((2L, 20L, "DEL", 300L), (3L, 10L, "a3", 300L)))
    val bEmpty = bDf(Seq.empty)
    val step1 = JoinMv.maintain(scratch(aBase, bBase),
      aBase, batch1, Seq("aid"), Seq("ts"), aServ,
      bBase, bEmpty, Seq("j"), Seq("ver"), bServ, Seq("j"))
    // the base tables advance by CdcMerge.merge alongside the view —
    // the compacted-base contract (a raw aBase ∪ batch1 changelog here
    // is exactly the leak the contract forbids)
    val aBase2 = CdcMerge.merge(aBase, batch1, Seq("aid"), Seq("ts"))
    val step2 = JoinMv.maintain(step1,
      aBase2, batch2, Seq("aid"), Seq("ts"), aServ,
      bBase, bEmpty, Seq("j"), Seq("ver"), bServ, Seq("j"))
    val want = rows(scratch(
      aBase.unionByName(batch1).unionByName(batch2), bBase))
    assert(rows(step2) == want)
  }
}
