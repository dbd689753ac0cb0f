package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/** Engine-portable Bloom-filter semi-join reduction — the PERSISTABLE
  * complement to Catalyst's runtime bloom injection (RuntimeBloomSpec pins
  * that knob): build a fixed-size bitmap over a filtered dimension's join
  * keys ONCE, then apply it map-side to any number of fact scans — across
  * stages, jobs, or days — before their shuffle joins. Catalyst's injected
  * filter (murmur/xxhash `bloom_filter_agg`) lives and dies inside one
  * query and cannot be checked cross-engine; both hash families here are
  * bit-reproducible on any SQL engine, so the bitmap, the pass set, and
  * the false-positive count are full DuckDB oracle rows, not pins.
  *
  * Layout: `mBits` bit positions stored as `mBits/32` BIGINT words (bits
  * 0..31 per word — shifts stay far from the sign bit on every engine).
  * mBits must be a power of two ≤ 2²⁰.
  *
  * Two hash families, same layout:
  *  - **Integer keys** (`buildBitmapLong`/`prefilterLong`): Knuth
  *    multiplicative hashing per hash j — `pos_j = ((key mod 2³¹) · A_j
  *    mod 2³¹) div 2³¹⁻ᵇ` with distinct odd 31-bit multipliers, taking
  *    the HIGH b bits of the product (the low-bit scheme degrades to a
  *    stride on sequential keys). Pure BIGINT arithmetic — products stay
  *    under 2⁶², ANSI-safe — and ~6× cheaper per row than md5, which is
  *    what lets the prefilter beat even a RAM-speed local shuffle
  *    (ScaleProbe bloom measures both).
  *  - **Arbitrary keys** (`buildBitmap`/`prefilter`): hash j is the VALUE
  *    of md5-hex chars [5j+1 .. 5j+5] read as a base-16 number
  *    (most-significant first — `conv(substr, 16, 10)`), a uniform
  *    20-bit integer, mod mBits; k ≤ 6 fits one md5. (The first cut
  *    folded raw ASCII codes base 128; hex ASCII codes skip 58..96, so
  *    mod 2¹⁵ the reachable positions collapsed to ~512 and the bitmap
  *    saturated — every probe key passed. The scale probe caught it; a
  *    base-16 digit fold cannot alias because its digits cover their
  *    radix.)
  *
  * The probe side stays in ONE whole-stage-codegen'd map stage: the
  * bitmap collapses to a dense `mBits/32`-word array literal (driver-side
  * model state bounded by the layout — ≤ 32768 longs = 256 KB at the
  * 2²⁰ cap, the k-centroids discipline) and membership is k
  * `element_at` + bitwise-AND tests per row. No shuffle, no join: fact
  * rows that cannot match die at the scan, which at 100 TB is the
  * difference between shuffling the full fact and shuffling
  * `selectivity + fp` of it. (The first cut picked words up via k
  * broadcast LEFT joins — semantically identical, but the join-keyed
  * hash expressions re-expanded through projection inlining and the
  * stage fell out of whole-stage codegen: 18× slower than the plain join
  * it was supposed to beat. Measured, in ScaleProbe bloom.)
  *
  * No false negatives (a present key's bits are all set by construction);
  * false positives are expected and the caller's exact join remains the
  * verify step — `BloomPrefilterSpec` pins superset-of-semi-join,
  * filtered-join ≡ plain-join, and both hash families against JVM
  * replays.
  */
object BloomPrefilter {
  /** Hex chars per md5 hash slice; fold < 16^5 = 2^20. */
  val HashChars = 5

  private val M31 = 1L << 31

  /** Distinct odd 31-bit multipliers (golden-ratio / LCG / xxhash-prime
    * lineage), one per hash; k ≤ 6 for parity with the md5 family.
    */
  val Multipliers: Seq[Long] = Seq(1640531527L, 1013904223L, 668265261L,
    374761393L, 1597334677L, 1291735331L)

  /** Base-16 value of md5-hex chars [off+1 .. off+HashChars], MSB first. */
  private def md5Pos(h: Column, j: Int, mBits: Int): Column =
    conv(substring(h, j * HashChars + 1, HashChars), 16, 10)
      .cast(LongType) % mBits

  /** Knuth multiplicative position: high b bits of (key·A_j mod 2^31). */
  private def longPos(key: Column, j: Int, mBits: Int): Column = {
    val b = Integer.numberOfTrailingZeros(mBits)
    call_function("div",
      (pmod(key.cast(LongType), lit(M31)) * lit(Multipliers(j))) % lit(M31),
      lit(1L << (31 - b)))
  }

  private def md5Str(key: Column): Column =
    md5(key.cast(StringType).cast(BinaryType))

  private def checkParams(mBits: Int, k: Int): Unit = {
    require(mBits > 0 && mBits % 32 == 0, s"mBits=$mBits not a multiple of 32")
    require((mBits & (mBits - 1)) == 0 && mBits <= (1 << 20),
      s"mBits=$mBits must be a power of two ≤ 2^20 (fold uniformity)")
    require(k >= 1 && k * HashChars <= 32, s"k=$k exceeds one md5 (k ≤ 6)")
  }

  private def bitmapOf(build: DataFrame, mBits: Int, k: Int,
      pos: Int => Column): DataFrame = {
    val perHash = (0 until k).map { j =>
      val p = pos(j)
      build.select(call_function("div", p, lit(32L)).as("word"),
        call_function("shiftleft", lit(1L), (p % 32).cast(IntegerType))
          .as("mask"))
    }.reduce(_ unionAll _)
    perHash.groupBy("word").agg(expr("bit_or(mask)").as("bits"))
  }

  private def passOf(bitmap: DataFrame, mBits: Int, k: Int,
      pos: Int => Column): Column = {
    val words = new Array[Long](mBits / 32)
    bitmap.select(col("word").cast(LongType), col("bits").cast(LongType))
      .collect().foreach { r =>
        val w = r.getLong(0)
        require(w >= 0 && w < words.length,
          s"bitmap word $w out of range for mBits=$mBits")
        words(w.toInt) = r.getLong(1)
      }
    val wl = typedlit(words.toSeq)
    (0 until k).map { j =>
      val p = pos(j)
      element_at(wl,
        call_function("div", p, lit(32L)).cast(IntegerType) + lit(1))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 32).cast(IntegerType))) =!= 0L
    }.reduce(_ && _)
  }

  /** Bitmap frame (`word` BIGINT, `bits` BIGINT) over the build side's
    * keys under the md5 family (any key type; key is hashed as its
    * string form). At most mBits/32 rows regardless of build cardinality
    * — the persistable representation.
    */
  def buildBitmap(build: DataFrame, key: Column, mBits: Int,
      k: Int): DataFrame = {
    checkParams(mBits, k)
    val h = build.select(md5Str(key).as("__h"))
    bitmapOf(h, mBits, k, j => md5Pos(col("__h"), j, mBits))
  }

  /** Probe rows whose key MIGHT be in the md5-family bloom set. The
    * bitmap frame is collected into a dense word array (bounded at
    * mBits/32 ≤ 32768 longs) and applied as a single map-side codegen'd
    * filter — k `element_at` bit tests per row. Probe columns pass
    * through unchanged; the probe frame is never shuffled.
    */
  def prefilter(probe: DataFrame, key: Column, bitmap: DataFrame, mBits: Int,
      k: Int): DataFrame = {
    checkParams(mBits, k)
    probe.filter(passOf(bitmap, mBits, k, j => md5Pos(md5Str(key), j, mBits)))
  }

  /** Integer-key bitmap under the multiplicative family (key must be an
    * integral column; negatives fold via pmod). ~6× cheaper per probe row
    * than the md5 family — use it whenever the join key is a number.
    */
  def buildBitmapLong(build: DataFrame, key: Column, mBits: Int,
      k: Int): DataFrame = {
    checkParams(mBits, k)
    bitmapOf(build, mBits, k, j => longPos(key, j, mBits))
  }

  /** Probe-side filter for the multiplicative family. */
  def prefilterLong(probe: DataFrame, key: Column, bitmap: DataFrame,
      mBits: Int, k: Int): DataFrame = {
    checkParams(mBits, k)
    probe.filter(passOf(bitmap, mBits, k, j => longPos(key, j, mBits)))
  }
}
