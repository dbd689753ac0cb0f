package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{CdcMerge, JoinMv}

/** Streaming steady-state of incremental JOIN-view maintenance
  * (operators/JoinMv): TWO changelog streams continuously folded into
  * compacted side tables and their materialized equi-join view — the
  * "enriched serving table stays fresh" contract (user state ⋈ dim)
  * beside StreamingMv's aggregate MV. Per micro-batch the view absorbs
  * only the affected join keys J (old + new version of every touched
  * row, both sides — batch-sized broadcast); untouched view rows pass
  * through a map-side anti join, and the side tables advance via
  * CdcMerge.merge — so per-batch cost scales with the batch and the
  * touched join groups' fanout, never the tables. State is driver-held
  * and localCheckpoint'ed one batch deep (the StreamingCdc discipline);
  * `StreamingJoinMvSpec` pins the fold equal to a one-shot from-scratch
  * join of both full changelogs regardless of how batches interleave
  * across the two sides.
  *
  * Batches for the two sides arrive independently (two streams, or one
  * stream demultiplexed); [[Maintainer.absorbA]]/[[Maintainer.absorbB]]
  * serialize on the maintainer, which is the same single-writer
  * assumption every foreachBatch sink makes.
  */
object StreamingJoinMv {

  final class Maintainer(aKey: Seq[String], aOrd: Seq[String],
      aServing: Column, bKey: Seq[String], bOrd: Seq[String],
      bServing: Column, joinCols: Seq[String]) {
    @volatile private var aSnap: Option[DataFrame] = None
    @volatile private var bSnap: Option[DataFrame] = None
    @volatile private var view: Option[DataFrame] = None

    /** The maintained join view (A's columns ++ B's non-join columns);
      * None until both sides have seen at least one batch.
      */
    def currentView: Option[DataFrame] = view

    def currentA: Option[DataFrame] = aSnap
    def currentB: Option[DataFrame] = bSnap

    /** View fold against explicit side SNAPSHOT ARGUMENTS (the pre-merge
      * base for the side that just advanced — JoinMv's contract). The
      * bases are parameters, not reads of aSnap/bSnap: the earlier form
      * temporarily swapped the @volatile field back to the pre-merge
      * base around this call, so an exception mid-maintain left the
      * field stale and a concurrent dashboard reader could observe an A
      * snapshot inconsistent with the just-advanced view (r9 advice).
      */
    private def rebuildOrMaintain(aBase: Option[DataFrame],
        bBase: Option[DataFrame], aBatch: Option[DataFrame],
        bBatch: Option[DataFrame]): Unit = {
      val empty: DataFrame => DataFrame = b => b.limit(0)
      (aBase, bBase) match {
        case (Some(a), Some(b)) =>
          val v = view match {
            case Some(v0) =>
              // r16: pass the just-checkpointed merged snapshots as the
              // current side tables — maintain() would otherwise rerun
              // the table-sized CdcMerge a second time per batch. The
              // untouched side's snapshot IS its merge with an empty
              // batch (anti join of nothing, recompact of nothing).
              JoinMv.maintainMerged(v0,
                a, aSnap.get, aBatch.getOrElse(empty(a)), aKey, aServing,
                b, bSnap.get, bBatch.getOrElse(empty(b)), bKey, bServing,
                joinCols)
            case None =>
              // first moment both sides exist: from-scratch join of the
              // compacted snapshots (MV creation) — batches already
              // merged into them below
              a.filter(aServing).join(b.filter(bServing), joinCols)
          }
          view = Some(v.localCheckpoint(true))
        case _ => () // one side still empty: no view to maintain yet
      }
    }

    /** Fold one micro-batch of the A-side changelog. The view fold
      * reads the PRE-merge base (passed as an argument, never written
      * back into the field), so aSnap always points at the merged
      * snapshot from the moment it advances.
      */
    def absorbA(batch: DataFrame): Unit = synchronized {
      val prior = aSnap
      aSnap = Some((prior match {
        case None => CdcMerge.compact(batch, aKey, aOrd)
        case Some(base) => CdcMerge.merge(base, batch, aKey, aOrd)
      }).localCheckpoint(true))
      prior match {
        case Some(base0) =>
          rebuildOrMaintain(Some(base0), bSnap, Some(batch), None)
        case None => rebuildOrMaintain(aSnap, bSnap, None, None)
      }
    }

    /** Fold one micro-batch of the B-side changelog. */
    def absorbB(batch: DataFrame): Unit = synchronized {
      val prior = bSnap
      bSnap = Some((prior match {
        case None => CdcMerge.compact(batch, bKey, bOrd)
        case Some(base) => CdcMerge.merge(base, batch, bKey, bOrd)
      }).localCheckpoint(true))
      prior match {
        case Some(base0) =>
          rebuildOrMaintain(aSnap, Some(base0), None, Some(batch))
        case None => rebuildOrMaintain(aSnap, bSnap, None, None)
      }
    }

    def runA(changeStream: DataFrame, checkpoint: String,
        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
      changeStream.writeStream
        .trigger(trigger)
        .option("checkpointLocation", checkpoint)
        .foreachBatch((b: Dataset[Row], _: Long) => absorbA(b.toDF()))
        .start()

    def runB(changeStream: DataFrame, checkpoint: String,
        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
      changeStream.writeStream
        .trigger(trigger)
        .option("checkpointLocation", checkpoint)
        .foreachBatch((b: Dataset[Row], _: Long) => absorbB(b.toDF()))
        .start()
  }
}
