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
  * query and cannot be checked cross-engine; this one's hash is the repo's
  * md5-ascii-fold (llm/Sampling.scala discipline), so the bitmap, the pass
  * set, and the false-positive count are bit-reproducible on any engine
  * with md5/ascii/substr — a full DuckDB oracle row, not a pin.
  *
  * Layout: `mBits` bit positions stored as `mBits/32` BIGINT words (bits
  * 0..31 per word — shifts stay far from the sign bit on every engine).
  * Hash j of a key folds md5 hex chars [5j+1 .. 5j+5] by ascii positional
  * weights (fold < 128⁵ = 2³⁵, uniform enough for bucket spread) and takes
  * it mod `mBits`; k ≤ 6 fits one md5. The probe side computes its k
  * (word, mask) pairs map-side and picks the words up via k BROADCAST hash
  * joins against the bitmap frame (≤ mBits/32 rows — model-sized at any
  * corpus size), so the prefilter adds NO shuffle: fact rows that cannot
  * match die before the join exchange, which at 100 TB is the difference
  * between shuffling the full fact and shuffling `selectivity + fp` of it.
  *
  * No false negatives (a present key's bits are all set by construction);
  * false positives are expected and the caller's exact join remains the
  * verify step — `BloomPrefilterSpec` pins superset-of-semi-join,
  * filtered-join ≡ plain-join, and the fold against a JVM md5 replay.
  */
object BloomPrefilter {
  /** Hex chars folded per hash slice; fold < 128^5 = 2^35. */
  val HashChars = 5

  /** Ascii positional fold of md5-hex chars [off+1 .. off+HashChars]. */
  private def foldSlice(h: Column, j: Int): Column =
    (1 to HashChars)
      .map(i => ascii(substring(h, j * HashChars + i, 1)).cast(LongType) *
        lit(math.pow(128, i - 1).toLong))
      .reduce(_ + _)

  private def md5Str(key: Column): Column =
    md5(key.cast(StringType).cast(BinaryType))

  /** The (word, mask) pair of hash j for an md5 column, at mBits bits. */
  private def wordMask(h: Column, j: Int, mBits: Int): (Column, Column) = {
    val pos = foldSlice(h, j) % mBits
    (call_function("div", pos, lit(32L)), // integral div: pos ≥ 0
      call_function("shiftleft", lit(1L), (pos % 32).cast(IntegerType)))
  }

  /** Bitmap frame (`word` BIGINT, `bits` BIGINT) over the build side's
    * keys: k hash positions per key, OR-folded per 32-bit word. At most
    * mBits/32 rows regardless of build cardinality — broadcastable by
    * construction. mBits must be a positive multiple of 32; k ≤ 6 slices
    * of one md5.
    */
  def buildBitmap(build: DataFrame, key: Column, mBits: Int,
      k: Int): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0, s"mBits=$mBits not a multiple of 32")
    require(k >= 1 && k * HashChars <= 32, s"k=$k exceeds one md5 (k ≤ 6)")
    val h = build.select(md5Str(key).as("__h"))
    val perHash = (0 until k).map { j =>
      val (w, m) = wordMask(col("__h"), j, mBits)
      h.select(w.as("word"), m.as("mask"))
    }.reduce(_ unionAll _)
    perHash.groupBy("word").agg(expr("bit_or(mask)").as("bits"))
  }

  /** Probe rows whose key MIGHT be in the bloom set: k broadcast joins
    * on the word index, pass = every hash's bit set. Map-side only — the
    * probe frame is never shuffled, its columns pass through unchanged.
    */
  def prefilter(probe: DataFrame, key: Column, bitmap: DataFrame, mBits: Int,
      k: Int): DataFrame = {
    require(k >= 1 && k * HashChars <= 32, s"k=$k exceeds one md5 (k ≤ 6)")
    val withH = probe.withColumn("__h", md5Str(key))
    val joined = (0 until k).foldLeft(withH) { (df, j) =>
      val (w, m) = wordMask(col("__h"), j, mBits)
      df.withColumn(s"__w$j", w).withColumn(s"__m$j", m)
        .join(broadcast(bitmap
          .select(col("word").as(s"__bw$j"), col("bits").as(s"__bv$j"))),
          col(s"__w$j") === col(s"__bw$j"), "left")
    }
    val pass = (0 until k)
      .map(j => coalesce(col(s"__bv$j"), lit(0L))
        .bitwiseAND(col(s"__m$j")) =!= 0L)
      .reduce(_ && _)
    val drop = Seq("__h") ++
      (0 until k).flatMap(j => Seq(s"__w$j", s"__m$j", s"__bw$j", s"__bv$j"))
    joined.filter(pass).drop(drop: _*)
  }
}
