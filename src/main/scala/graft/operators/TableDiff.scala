package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot reconciliation (table diff) — the data-recon operator a
  * warehouse runs to validate a migration/backfill or audit what a load
  * changed: two same-schema keyed snapshots, full-outer joined on the
  * primary key, every key classified `added` / `removed` / `changed` /
  * `unchanged`.
  *
  * Design decisions that matter at scale and for correctness:
  *  - presence is a `lit(true)` MARKER column, not a value-null test — a
  *    snapshot row whose every value column is legitimately NULL must
  *    still count as present (a null-test would misread it as absent);
  *  - the value compare is null-safe equality (`<=>`) folded across every
  *    non-key column, so NULL = NULL reads as unchanged and NULL vs value
  *    as changed — plain `===` would return NULL and silently drop the
  *    row from whichever branch the optimizer rewrote it into;
  *  - the diff is ONE pk-keyed join (full outer is not broadcastable
  *    semantics) and the classification is a map-side projection on the
  *    joined row; at 100 TB snapshot tables bucketed by pk make the join
  *    shuffle-free, and nothing here is ever all-pairs or driver-side.
  */
object TableDiff {

  /** Per-key classified diff: key columns, every value column as
    * `<col>_a` / `<col>_b`, and `diff_class`. Both inputs must share the
    * exact schema (same columns, same order).
    *
    * PRECONDITION (r9 advice — mirrors JoinMv's compacted-base
    * contract): each snapshot must carry at most ONE row per key.
    * Duplicate keys fan out through the full-outer join (every a-row ×
    * every b-row of the key gets its own diff_class) and silently
    * inflate [[summary]] counts. The check is a full extra aggregation
    * per snapshot, so it is opt-in: pass `assertUniqueKeys = true` in
    * debug/validation runs; production pipelines that diff
    * CdcMerge-compacted snapshots hold the invariant by construction.
    */
  def diff(a: DataFrame, b: DataFrame, key: Seq[String],
      assertUniqueKeys: Boolean = false): DataFrame = {
    require(key.nonEmpty,
      "diff key must be non-empty (and each snapshot must have at most " +
        "one row per key — duplicate keys fan out through the full-outer " +
        "join; run with assertUniqueKeys = true to validate)")
    if (assertUniqueKeys) {
      def check(df: DataFrame, side: String): Unit = {
        val n = df.count()
        val d = df.select(key.map(col): _*).distinct().count()
        require(n == d,
          s"TableDiff precondition violated: snapshot $side has $n rows " +
            s"but only $d distinct keys on (${key.mkString(",")}) — " +
            "compact to one row per key (CdcMerge.compact) before diffing")
      }
      check(a, "a"); check(b, "b")
    }
    require(a.columns.sameElements(b.columns),
      s"snapshot schemas differ: ${a.columns.mkString(",")} vs " +
        b.columns.mkString(","))
    require(key.forall(a.columns.contains),
      s"key ${key.mkString(",")} not in ${a.columns.mkString(",")}")
    val vals = a.columns.filterNot(key.contains).toSeq
    def mark(df: DataFrame, side: String) =
      vals.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"${c}_$side"))
        .withColumn(s"__in_$side", lit(true))
    val j = mark(a, "a").join(mark(b, "b"), key, "full_outer")
    val same =
      if (vals.isEmpty) lit(true)
      else vals.map(c => col(s"${c}_a") <=> col(s"${c}_b")).reduce(_ && _)
    j.withColumn("diff_class",
        when(col("__in_a").isNull, "added")
          .when(col("__in_b").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
      .drop("__in_a", "__in_b")
  }

  /** Per-class key counts — the one-look recon report. */
  def summary(a: DataFrame, b: DataFrame, key: Seq[String]): DataFrame =
    diff(a, b, key)
      .groupBy(col("diff_class"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("diff_class"))
}
