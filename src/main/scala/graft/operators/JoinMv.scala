package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental JOIN-view maintenance — the delta rule for a materialized
  * equi-join view, completing the MV family beside [[CdcMerge]]'s
  * aggregate maintenance (`maintainAggFrom`) and the reference's
  * continuously-refreshed star views (star_schema.sql's fact-dim joins,
  * dashboard.py's per-refresh rebuilds): V = serving(A) ⋈ serving(B)
  * kept current under CDC batches to BOTH sides without re-joining the
  * world.
  *
  * The classic ΔV = ΔA⋈B ∪ A⋈ΔB rule assumes insert-only deltas; under
  * keyed UPSERTS a changed row can also MOVE across join groups (its
  * join column changed) or leave (tombstone), so the correct affected
  * set is keyed by the JOIN key: J = the join-key values of every
  * touched row, OLD version and NEW version, on either side. Then
  *
  *   V' = V ⋉̄ J  ∪  (A' ⋉ J) ⋈ (B' ⋉ J)
  *
  * — view rows whose join key is unaffected pass through untouched (one
  * anti join, AQE-broadcast while it fits); only the J-slices of the merged
  * tables re-join. Late data, deletes, inserts and moves all reduce to
  * this because [[CdcMerge.merge]]'s max_by fold makes A'/B' correct
  * under all of them and J covers both endpoints of every move.
  *
  * Cost shape at 100 TB: J is bounded by 2×|batch rows| per side
  * (batch-sized in steady state, unbounded on a backfill — unhinted); the
  * pass-through and the J-slice semis are membership tests over
  * scans of V/A'/B'; the only shuffle is the recompute join over the
  * J-slices, sized by the touched join groups' fanout, not the tables.
  * Skewed touched groups are the caller's interval-join-style cap
  * decision; the operator keeps the recompute an ordinary equi join so
  * AQE's skew split applies.
  *
  * Contract: `aBase`/`bBase` must be COMPACTED tables (one row per
  * key — [[CdcMerge.compact]] output, the same precondition as
  * [[CdcMerge.merge]]; a raw changelog base leaks every old version of
  * a b-side-touched key into the recompute — `JoinMvSpec`'s chain test
  * caught exactly this), and `view` must equal
  * `serving(aBase) ⋈ serving(bBase)` on `joinCols` (both sides must
  * expose the join columns under the SAME names; the joined frame
  * carries A's columns then B's non-join columns — the exact frame this
  * function returns, so the output feeds back in as next batch's
  * `view`, with [[CdcMerge.merge]] advancing the base tables beside
  * it). `aOrd`/`bOrd` must be total writer orders (the CdcMerge
  * determinism contract). Proven maintained ≡ from-scratch by the
  * `etl_join_mv_incremental` oracle and `JoinMvSpec`'s crafted
  * move/delete/late/resurrect/chain frames.
  */
object JoinMv {

  /** One maintenance step: fold `aBatch`/`bBatch` into the view.
    *
    * @param view     prior view frame (= what this function returned
    *                 last step, or the from-scratch join at MV creation)
    * @param aServing serving predicate over A's compacted rows
    *                 (tombstones and other non-serving versions excluded
    *                 from the view on this side)
    */
  def maintain(view: DataFrame,
      aBase: DataFrame, aBatch: DataFrame, aKey: Seq[String],
      aOrd: Seq[String], aServing: Column,
      bBase: DataFrame, bBatch: DataFrame, bKey: Seq[String],
      bOrd: Seq[String], bServing: Column,
      joinCols: Seq[String]): DataFrame =
    maintainMerged(view,
      aBase, CdcMerge.merge(aBase, aBatch, aKey, aOrd), aBatch, aKey,
      aServing,
      bBase, CdcMerge.merge(bBase, bBatch, bKey, bOrd), bBatch, bKey,
      bServing, joinCols)

  /** [[maintain]] with the MERGED side tables passed in instead of
    * recomputed (r16): a caller that advances its side tables with
    * [[CdcMerge.merge]] anyway (the streaming Maintainer, which also
    * checkpoints them) was paying the table-sized merge a second time
    * inside every maintain step. `aCur`/`bCur` MUST equal
    * `CdcMerge.merge(aBase, aBatch, ...)` / `(bBase, bBatch, ...)` —
    * the delta rule reads both the pre-merge base (old versions) and
    * the merged current rows (new versions).
    */
  def maintainMerged(view: DataFrame,
      aBase: DataFrame, aCur: DataFrame, aBatch: DataFrame,
      aKey: Seq[String], aServing: Column,
      bBase: DataFrame, bCur: DataFrame, bBatch: DataFrame,
      bKey: Seq[String], bServing: Column,
      joinCols: Seq[String]): DataFrame = {
    val jCols = joinCols.map(col)

    // Affected join keys of one side: old-version j of every touched
    // upsert key (from the base's candidate row) ∪ new-version j (from
    // the merged current row). Batch rows for brand-new keys have no
    // base row — their j comes from the merged side; tombstoned keys'
    // old j comes from the base side. Union of both endpoints covers
    // moves. All frames here are batch-keyed: touched is the batch's
    // distinct keys — micro-batch-sized in steady state, unbounded on a
    // backfill, so the membership semis are unhinted (AQE decides).
    def affectedJ(base: DataFrame, merged: DataFrame, batch: DataFrame,
        key: Seq[String]): DataFrame = {
      val touched = batch.select(key.map(col): _*).distinct()
      base.join(touched, key, "left_semi")
        .select(jCols: _*)
        .unionByName(merged.join(touched, key, "left_semi")
          .select(jCols: _*))
    }

    // staged: j feeds THREE consumers (the pass-through anti and both
    // recompute semis), and each unstaged reference re-expands the whole
    // affectedJ tree — merges included — blowing the plan up to ~70
    // joins (read in the r9 Explain audit). The frame is batch-sized by
    // construction, so the checkpoint is free at any table size.
    val j = affectedJ(aBase, aCur, aBatch, aKey)
      .unionByName(affectedJ(bBase, bCur, bBatch, bKey))
      .distinct().localCheckpoint(false)

    val pass = view.join(j, joinCols, "left_anti")
    val recompute = aCur.filter(aServing)
      .join(j, joinCols, "left_semi")
      .join(bCur.filter(bServing)
        .join(j, joinCols, "left_semi"), joinCols)
    pass.unionByName(recompute)
  }

  /** The from-scratch view (MV creation): what [[maintain]] maintains. */
  def fromScratch(aBase: DataFrame, aKey: Seq[String], aOrd: Seq[String],
      aServing: Column,
      bBase: DataFrame, bKey: Seq[String], bOrd: Seq[String],
      bServing: Column, joinCols: Seq[String]): DataFrame =
    CdcMerge.compact(aBase, aKey, aOrd).filter(aServing)
      .join(CdcMerge.compact(bBase, bKey, bOrd).filter(bServing), joinCols)
}
