package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** ENGINE-PORTABLE HyperLogLog (Flajolet et al. 2007, with the
  * linear-counting small-range correction of HLL++/Heule et al. 2013) —
  * the register-replayable twin of Spark's `approx_count_distinct`,
  * closing the last `no_oracle` row: Spark's built-in rides a
  * Spark-internal HLL++ register layout no other engine reproduces, so
  * q27 was differential-only. This sketch is a pure function of
  * (values, md5, p), so DuckDB replays every register maximum — and the
  * estimate — value-for-value (the [[KmvDistinct]] portable-hash
  * discipline).
  *
  * Layout: h = first 12 md5 hex chars base-16 (uniform over 2^48,
  * [[KmvDistinct.portableHash]]); register index = h mod m (m = 2^p),
  * rank ρ = leading zeros of the remaining (48−p)-bit word + 1,
  * computed via integer BITLENGTH (`length(bin(w))` — both engines'
  * bin() is minimal-width) because `log`/`pow` library rounding is not
  * cross-engine stable (the q54/trigram-surprisal finding). Register
  * value = max rank.
  *
  * Exactness of the DOUBLE estimate: every 2^−ρ term comes from a
  * 40-entry table of exact power-of-two literals, so the indicator sum
  * S is a dyadic rational with denominator ≤ 2^(49−p) and magnitude
  * ≤ m — EXACTLY representable in a double (< 2^53 ulps), making
  * float SUM order-independent and bit-identical cross-engine. The raw
  * estimate α·m²/S is one literal-over-exact-double division (IEEE
  * correctly rounded identically everywhere); the small-range branch
  * m·ln(m/V) has a FINITE argument domain (V ∈ 1..m), so it ships as a
  * precomputed m-entry literal table instead of calling `ln` — both
  * engines index the same list, zero library-rounding exposure.
  *
  * Scale shape at 100 TB: one map-side-combined shuffle keyed
  * (group, register) — ≤ m rows per group survive, the classic
  * mergeable-sketch property (registers merge by MAX, so per-partition
  * / per-day register frames roll up without re-scanning) — then a
  * ≤ m-row-per-group final aggregate. Error ≈ 1.04/√m (3.25 % at
  * p = 10) once past the linear-counting regime, which the correction
  * covers below 2.5·m.
  */
object HllDistinct {

  /** Register-index bits; m = 2^p registers. p = 10 → σ ≈ 3.25 %. */
  val P: Int = 10
  val M: Int = 1 << P

  /** Bits left for the rank word after the index split. */
  private val W: Int = 48 - P

  /** Standard HLL bias constant α_m for m ≥ 128 — evaluated ONCE here;
    * the oracle embeds the resulting double via round-trip toString.
    */
  val Alpha: Double = 0.7213 / (1 + 1.079 / M)

  /** α·m² — the raw-estimate numerator as one literal. */
  val AlphaM2: Double = Alpha * M * M

  /** Linear-counting threshold: use m·ln(m/V) while E_raw ≤ 2.5·m. */
  val LcThreshold: Double = 2.5 * M

  /** 2^−r for r = 1..W+1 — exact power-of-two doubles, shared by both
    * engines as literals (index r, 1-based).
    */
  val Pow2Inv: Seq[Double] = (1 to (W + 1)).map(r => math.pow(0.5, r))

  /** m·ln(m/V) for V = 1..m — the WHOLE linear-counting domain as
    * literals (index V, 1-based), so no engine ever calls `ln`.
    */
  val LinearCount: Seq[Double] =
    (1 to M).map(v => M * math.log(M.toDouble / v))

  /** SCIENTIFIC-notation double literal: a plain decimal repr inside a
    * large SQL list is lexed as DECIMAL, and DuckDB's common-type
    * unification across 1024 entries picks one scale — off-by-one-ulp
    * on entries whose shortest repr needs a different scale (measured:
    * entry 896 read back 0x...e479 instead of ...e47a). E-notation
    * literals are typed DOUBLE at lex time, so every entry parses
    * correctly rounded, independent of its neighbors.
    */
  private def sci(d: Double): String = "%.17e".format(d)

  /** [[AlphaM2]] as a lex-time-DOUBLE literal. */
  def alphaM2Sql: String = sci(AlphaM2)

  /** DuckDB DOUBLE-list literal of [[Pow2Inv]]. */
  def pow2InvSql: String = Pow2Inv.map(sci).mkString("[", ", ", "]")

  /** DuckDB DOUBLE-list literal of [[LinearCount]]. */
  def linearCountSql: String = LinearCount.map(sci).mkString("[", ", ", "]")

  /** Occupied registers of `key` per group: (groupCols*, __idx, __rank)
    * with __rank = max rank seen. NULL keys are ignored (countDistinct
    * semantics).
    */
  def registers(df: DataFrame, groupCols: Seq[String],
      key: Column): DataFrame = {
    val h = KmvDistinct.portableHash(key)
    // h < 2^48: the / is an exact power-of-two double division, so
    // floor() recovers the integer quotient exactly (no `div` in the
    // Column API)
    val w = floor(h / lit(M)).cast(LongType)
    val rank = when(w === 0, lit(W + 1))
      .otherwise(lit(W + 1) - length(bin(w))).cast(IntegerType)
    df.filter(key.isNotNull)
      .select(groupCols.map(col) :+ pmod(h, lit(M)).cast(IntegerType)
        .as("__idx") :+ rank.as("__rank"): _*)
      .groupBy(groupCols.map(col) :+ col("__idx"): _*)
      .agg(max(col("__rank")).as("__rank"))
  }

  /** Per-group portable-HLL estimate: (groupCols*, approx_distinct
    * DOUBLE). Empty groups are absent (no rows → no registers), matching
    * a GROUP BY's semantics.
    */
  def estimate(df: DataFrame, groupCols: Seq[String],
      key: Column): DataFrame = {
    val regs = registers(df, groupCols, key)
    val grouped = regs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("__occ"),
      sum(element_at(typedlit(Pow2Inv), col("__rank"))).as("__socc"))
    val sInd = col("__socc") + (lit(M) - col("__occ")).cast(DoubleType)
    val v = (lit(M) - col("__occ")).cast(IntegerType)
    val eRaw = lit(AlphaM2) / sInd
    grouped
      .withColumn("__v", v)
      .withColumn("__eraw", eRaw)
      .withColumn("approx_distinct",
        when(col("__v") > 0 && col("__eraw") <= LcThreshold,
          element_at(typedlit(LinearCount), greatest(col("__v"), lit(1))))
          .otherwise(col("__eraw")))
      .drop("__occ", "__socc", "__v", "__eraw")
  }
}
