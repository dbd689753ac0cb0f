package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, StringType}

/** KMV (k-minimum-values) distinct-count sketch — the ENGINE-PORTABLE
  * approximate-distinct rung beside q27's HLL twin: Spark's
  * approx_count_distinct rides a Spark-internal HLL++ whose register
  * layout no other engine reproduces, so that row is differential-only.
  * KMV (Bar-Yossef et al., RANDOM'02) is a pure function of (values,
  * hash, k): hash every distinct value to a uniform domain, keep the k
  * smallest distinct hashes, estimate |D| ≈ (k−1)·M/H_k from the k-th
  * smallest H_k over domain M. The hash is the first 12 hex chars of
  * md5 parsed base-16 — UNIFORM over M = 2^48, which the estimator
  * requires (the repo's md5-ASCII fold is fine for priority ORDERING
  * but its raw value is not uniform: hex-char ascii codes occupy only
  * {48–57, 97–102} of each 7-bit slot, and a first build on it read
  * −97 % error). Parsing is `conv(hex, 16, 10)` on Spark and the
  * strpos-digit base-16 fold in DuckDB (the llm_text_rollhash
  * discipline), so the k-min set, the threshold hash, and the one fixed
  * DOUBLE tree of the estimate are all bit-identical cross-engine: a
  * TRUE green row, not a pin. Fewer than k distinct hashes ⇒ the
  * sketch is EXACT (estimate = population) — the classic small-set
  * property.
  *
  * Scale shape at 100 TB: the distinct() is a map-side partial dedup
  * (shuffle carries local-distinct 8-byte hashes, the same class as an
  * exact distinct count but with fixed-width keys), and the k smallest
  * ride TakeOrderedAndProject — per-partition bounded heaps, a k·P-row
  * driver merge, never a global sort. The sketch is MERGEABLE (the
  * union of two k-min sets re-trimmed to k is the sketch of the union),
  * so per-partition / per-day sketches roll up without re-scanning —
  * the property that makes it a warehouse op rather than a one-shot:
  * error is ~1/√(k−2) (≈6 % at k = 256) regardless of |D|.
  *
  * Hash-collision honesty: the 2^48 hash domain (twelve md5 hex digits
  * base-16, see [[HashDomain]]) makes collisions (~|D|²/2^49) a
  * sub-percent bias at millions of distincts — and
  * because the hash is deterministic, both engines see the SAME
  * collisions, so cross-engine equality is unaffected.
  */
object KmvDistinct {

  /** 16^12 = 2^48 — the domain of twelve md5 hex digits base-16. */
  val HashDomain: Double = 281474976710656.0

  /** Portable UNIFORM hash: the first 12 hex chars of
    * md5(value-as-string) parsed base-16 — every value equally likely
    * over [0, 2^48), unlike the ascii fold (see class doc).
    */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast(StringType).cast(BinaryType)), 1, 12),
      16, 10).cast(LongType)

  /** One-row sketch frame: (k, n_kept, kth_hash, est_distinct).
    * `n_kept < k` means the sketch saw fewer than k distinct hashes and
    * `est_distinct` is exact.
    */
  def sketch(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2 (the estimator divides by H_k)")
    df.filter(value.isNotNull)
      .select(portableHash(value).as("__h"))
      .distinct()
      .orderBy(col("__h"))
      .limit(k)
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("kth_hash"))
      .select(lit(k).as("k"), col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble) * lit(HashDomain) /
            col("kth_hash").cast(DoubleType))
          .as("est_distinct"))
  }
}
