package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC changelog compaction + incremental merge, generalized from the
  * `etl_cdc_apply` / `etl_cdc_apply_incremental` queries (the lakehouse
  * MERGE primitive; the steady-state form of the reference's batched
  * upsert contract, hybridjoin.py:449-486):
  *
  *  - [[compact]]: one surviving change row per key via a
  *    partial-aggregating `max_by(struct)` — each executor ships ONE
  *    candidate row per key it saw, not the changelog (the window-rank
  *    realization moves every change through the shuffle). Tombstones
  *    are RETAINED: a compacted table must keep them mergeable until a
  *    fold horizon, else a late non-delete could resurrect behind one.
  *  - [[merge]]: a NEW batch into an EXISTING compacted table — touched
  *    keys (the batch's distinct ids: batch-sized in steady state, so
  *    table-sized) are recompacted over (base candidate ∪ new rows);
  *    AQE broadcasts the membership set; untouched rows pass an anti join with NO
  *    recompute. Cost scales with the batch, not the table. Correct for
  *    LATE data too: the base row is already the ordering-max of the old
  *    changes, so max_by over (base row ∪ batch) equals max_by over the
  *    full concatenated changelog (proven row-equal by the
  *    `etl_cdc_apply_incremental` oracle).
  *
  * Determinism: ties break by the caller's `orderCols` struct — make it
  * total (e.g. (ts, event_id)) or last-writer-wins is partition-luck.
  */
object CdcMerge {

  /** @param keyCols   grouping key of the changelog
    * @param orderCols writer-order columns, later wins; must be total
    */
  def compact(changes: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val payload = changes.columns.filterNot(keyCols.contains)
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(orderCols.map(col): _*)).as("__last"))
      .select(keyCols.map(col) ++
        payload.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Merge a new changelog batch into an existing [[compact]] output.
    * `base` and `batch` must share the full column set.
    */
  def merge(base: DataFrame, batch: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val touched = batch.select(keyCols.map(col): _*).distinct()
    // touched = the delta's distinct keys: micro-batch-sized in steady
    // state but UNBOUNDED on a backfill, so no forced hint — AQE
    // broadcasts the membership set while it fits and shuffles beyond
    val untouched = base.join(touched, keyCols, "left_anti")
    val recompacted = compact(
      base.join(touched, keyCols, "left_semi")
        .unionByName(batch),
      keyCols, orderCols)
    untouched.unionByName(recompacted)
  }

  /** Incremental AGGREGATE maintenance (materialized-view delta apply):
    * given yesterday's [[compact]] snapshot (tombstones retained) and
    * today's changelog batch, returns the per-`groupCol` serving
    * aggregate (key count + exact sum of `valueCol`) of the MERGED state
    * — computed as yesterday's aggregate MINUS the touched keys' old
    * serving contributions PLUS their new ones, never by re-aggregating
    * the table. A key that moved groups decrements its old group and
    * increments the new; a tombstoned key only decrements; a new key
    * only increments; a batch row older than the base row retracts and
    * re-inserts the SAME row (net zero — late data is safe). Rows where
    * `isServing` is false (tombstones) contribute on NEITHER side: they
    * were never in the serving aggregate, so they must not be retracted.
    *
    * Cost shape: one pass over the base snapshot for yesterday's
    * aggregate (stands in for reading back the persisted MV — at steady
    * state a |groups|-row table) — every other frame is keyed by the
    * batch's touched-ids (AQE-sized join), so delta cost scales with the batch.
    * `valueCol` must be an exact type (DECIMAL/BIGINT): the fold
    * introduces negative contributions, which exact addition handles
    * order-independently where a float fold would not. Groups folded to
    * zero keys drop (matching a from-scratch recompute).
    */
  def maintainAgg(base: DataFrame, batch: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], groupCol: String, valueCol: Column,
      isServing: Column): DataFrame =
    maintainAggFrom(servingAgg(base, groupCol, valueCol, isServing),
      base, batch, keyCols, orderCols, groupCol, valueCol, isServing)

  /** The serving aggregate of a [[compact]] snapshot from scratch:
    * (groupCol, n_keys, total). What [[maintainAgg]] maintains; a
    * deployment computes it once at MV creation, then only folds deltas.
    */
  def servingAgg(snapshot: DataFrame, groupCol: String, valueCol: Column,
      isServing: Column): DataFrame =
    snapshot.filter(isServing).groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"), sum(valueCol).as("total"))

  /** [[maintainAgg]] with the previous aggregate PASSED IN instead of
    * recomputed — the true steady-state fold (the streaming form holds
    * the |groups|-row MV across batches, so per-batch work is ONLY the
    * touched-key deltas plus the key-pruned base-snapshot
    * semi join). `baseAgg` must be the (groupCol, n_keys, total) frame
    * this function (or [[servingAgg]]) produced over `base`.
    */
  def maintainAggFrom(baseAgg: DataFrame, base: DataFrame, batch: DataFrame,
      keyCols: Seq[String], orderCols: Seq[String], groupCol: String,
      valueCol: Column, isServing: Column): DataFrame = {
    val touched = batch.select(keyCols.map(col): _*).distinct()
    def serving(df: DataFrame) = df.filter(isServing)
    val touchedBase = base.join(touched, keyCols, "left_semi")
    val retract = serving(touchedBase)
      .select(col(groupCol), lit(-1L).as("dn"), (-valueCol).as("dv"))
    val insert = serving(
      compact(touchedBase.unionByName(batch), keyCols, orderCols))
      .select(col(groupCol), lit(1L).as("dn"), valueCol.as("dv"))
    baseAgg
      .select(col(groupCol), col("n_keys").as("dn"), col("total").as("dv"))
      .unionByName(retract).unionByName(insert)
      .groupBy(col(groupCol))
      .agg(sum(col("dn")).as("n_keys"), sum(col("dv")).as("total"))
      .filter(col("n_keys") > 0)
  }
}
