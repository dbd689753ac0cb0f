package graft.operators

import org.apache.spark.sql.DataFrame
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
  *    keys (the batch's distinct ids, broadcast: batch-sized, never
  *    table-sized) are recompacted over (base candidate ∪ new rows);
  *    untouched rows pass through a single broadcast anti join with NO
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
    val untouched = base.join(broadcast(touched), keyCols, "left_anti")
    val recompacted = compact(
      base.join(broadcast(touched), keyCols, "left_semi")
        .unionByName(batch),
      keyCols, orderCols)
    untouched.unionByName(recompacted)
  }
}
