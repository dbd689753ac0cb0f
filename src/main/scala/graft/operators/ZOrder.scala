package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) clustering keys for multi-dimensional data layout —
  * the write-side half of file skipping at scale. A table laid out by a
  * single sort key gives tight min/max file bounds on that key only; a
  * 100 TB scan filtered on a SECOND dimension then prunes nothing. Writing
  * files in z-value order gives every file a bounding box that is tight in
  * ALL interleaved dimensions at once, so parquet row-group min/max stats
  * prune multi-dimensional box predicates (`ScaleProbe zorder` measures
  * the effect; `etl_zorder_layout` oracle-checks the arithmetic).
  *
  * Everything is exact BIGINT arithmetic — range-scale then bit-interleave
  * — so the key is deterministic, engine-portable (DuckDB replays it with
  * `//`, `>>`, `&`), and stays inside whole-stage codegen as a plain
  * column expression (no UDF, no custom Expression needed).
  */
object ZOrder {

  /** Scale `v` into [0, 2^bits) given inclusive bounds: ((v - lo) ·
    * 2^bits) div (hi - lo + 1). Pure integral ops — exact while
    * (hi - lo) · 2^bits < 2^63. Bounds are columns so callers pass them
    * as a broadcast 1-row aggregate (never a driver collect). Contract:
    * lo ≤ v ≤ hi (a value outside the bounds lands outside [0, 2^bits)
    * and corrupts the interleave — clamp upstream if bounds are stale).
    */
  def bucket(v: Column, lo: Column, hi: Column, bits: Int): Column =
    call_function("div",
      (v.cast(LongType) - lo.cast(LongType)) * lit(1L << bits),
      hi.cast(LongType) - lo.cast(LongType) + lit(1L))

  /** Bit-interleave `dims` bucket ids (each in [0, 2^bits)) into one
    * Morton key: dim j's bit i lands at position i·|dims| + j, so
    * adjacent z-values differ in low-order bits of every dimension —
    * the locality that makes per-file bounding boxes tight in all dims.
    * Unrolled to bits·|dims| codegen-friendly shift/mask/add terms;
    * total key width bits·|dims| must stay < 63.
    */
  def interleave(bits: Int, dims: Column*): Column = {
    require(dims.nonEmpty && bits * dims.size < 63,
      s"z-key width ${bits * dims.size} must fit a signed 64-bit long")
    val d = dims.size
    val terms = for {
      (c, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftright(c.cast(LongType), i).bitwiseAND(lit(1L)) *
      lit(1L << (i * d + j))
    terms.reduce(_ + _)
  }

  /** The same interleave as DuckDB SQL over pre-scaled bucket
    * expressions — keeps the oracle string and the Spark plan provably
    * the same arithmetic (both are generated from this one shape).
    */
  def interleaveSql(bits: Int, dims: String*): String = {
    val d = dims.size
    (for {
      (e, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield s"((($e) >> $i) & 1) * ${1L << (i * d + j)}")
      .mkString(" + ")
  }

  /** Range-scale bucket as DuckDB SQL (the oracle twin of [[bucket]]). */
  def bucketSql(v: String, lo: String, hi: String, bits: Int): String =
    s"((($v) - ($lo)) * ${1L << bits}) // (($hi) - ($lo) + 1)"
}
