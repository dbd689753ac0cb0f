package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the portable Bloom prefilter's contract for BOTH hash families
  * (md5 for arbitrary keys, Knuth multiplicative for integer keys): NO
  * false negatives (pass set ⊇ exact semi-join, at any m/k),
  * filtered-join ≡ plain-join (the verify step erases false positives),
  * the bitmap bit layout against from-scratch JVM replays (the
  * cross-engine portability claim), no bitmap saturation (the aliasing
  * regression the scale probe caught), empty-build and pass-through
  * degenerations, and the parameter guards.
  */
class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  /** From-scratch replay of the md5-family hash: md5-hex chars
    * [5j+1 .. 5j+5] read as a base-16 number, most-significant first,
    * mod mBits.
    */
  private def jvmMd5Pos(key: Long, j: Int, mBits: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val fold = java.lang.Long.parseLong(hex.substring(j * 5, j * 5 + 5), 16)
    (fold % mBits).toInt
  }

  /** From-scratch replay of the multiplicative-family hash: high b bits
    * of (key mod 2^31) · A_j mod 2^31.
    */
  private def jvmLongPos(key: Long, j: Int, mBits: Int): Int = {
    val b = Integer.numberOfTrailingZeros(mBits)
    val m31 = 1L << 31
    val x = ((key % m31) + m31) % m31
    (((x * BloomPrefilter.Multipliers(j)) % m31) >> (31 - b)).toInt
  }

  private def bloomPass(keys: Seq[Long], probe: Seq[Long], mBits: Int,
      k: Int, longFamily: Boolean): Set[Long] = {
    val build = keys.toDF("key")
    if (longFamily) {
      val bitmap = BloomPrefilter.buildBitmapLong(build, col("key"), mBits, k)
      BloomPrefilter
        .prefilterLong(probe.toDF("pk"), col("pk"), bitmap, mBits, k)
        .as[Long].collect().toSet
    } else {
      val bitmap = BloomPrefilter.buildBitmap(build, col("key"), mBits, k)
      BloomPrefilter
        .prefilter(probe.toDF("pk"), col("pk"), bitmap, mBits, k)
        .as[Long].collect().toSet
    }
  }

  test("no false negatives at any size, both families") {
    val keys = (0L until 50L).map(_ * 7 + 3) ++ Seq(-5L, -1000L)
    val probe = (-20L until 400L)
    for (mBits <- Seq(64, 1 << 10, 1 << 15); k <- Seq(1, 3, 6);
         fam <- Seq(false, true)) {
      val pass = bloomPass(keys, probe, mBits, k, fam)
      val want = probe.filter(keys.contains).toSet
      assert(want.subsetOf(pass),
        s"false negative at mBits=$mBits k=$k long=$fam: ${want -- pass}")
    }
  }

  test("filtered join equals plain join (both families)") {
    val build = (0L until 30L).map(i => (i * 11, s"d$i")).toDF("key", "attr")
    val probe = (0L until 500L).map(i => (i, i * 2 + 1)).toDF("pk", "v")
    val plain = probe.join(build, col("pk") === col("key"))
      .select("pk", "v", "attr").collect().map(_.toSeq).toSet
    val bm = BloomPrefilter.buildBitmap(build, col("key"), 1 << 10, 3)
    val md5F = BloomPrefilter.prefilter(probe, col("pk"), bm, 1 << 10, 3)
      .join(build, col("pk") === col("key"))
      .select("pk", "v", "attr").collect().map(_.toSeq).toSet
    assert(md5F === plain)
    val bmL = BloomPrefilter.buildBitmapLong(build, col("key"), 1 << 10, 3)
    val longF = BloomPrefilter.prefilterLong(probe, col("pk"), bmL, 1 << 10, 3)
      .join(build, col("pk") === col("key"))
      .select("pk", "v", "attr").collect().map(_.toSeq).toSet
    assert(longF === plain)
  }

  test("bitmap bits match from-scratch JVM replays (both families)") {
    val mBits = 1 << 10
    val keys = Seq(5L, 123L, 99999L)
    def wantWords(pos: (Long, Int) => Int): Map[Long, Long] =
      keys.flatMap { key =>
        (0 until 3).map { j =>
          val p = pos(key, j)
          (p / 32).toLong -> (1L << (p % 32))
        }
      }.groupBy(_._1).map { case (w, ms) => w -> ms.map(_._2).reduce(_ | _) }
    val md5Bm = BloomPrefilter.buildBitmap(keys.toDF("key"), col("key"),
      mBits, 3).as[(Long, Long)].collect().toMap
    assert(md5Bm === wantWords((key, j) => jvmMd5Pos(key, j, mBits)))
    val longBm = BloomPrefilter.buildBitmapLong(keys.toDF("key"), col("key"),
      mBits, 3).as[(Long, Long)].collect().toMap
    assert(longBm === wantWords((key, j) => jvmLongPos(key, j, mBits)))
  }

  test("fold is uniform enough — no bitmap saturation (aliasing regression)") {
    // the first-cut base-128 ascii fold aliased under mod 2^15 to ~512
    // reachable positions: 2000 keys saturated them all and EVERY
    // non-member passed. With uniform hashes, 2000 keys × k=3 set
    // ≤ 6000 of 32768 bits (≤ 18%), so non-member pass rate must be far
    // below 1 (expected ~(0.18)^3 ≈ 0.6%; assert < 10%). Sequential
    // probe keys additionally pin the multiplicative family's high-bit
    // scheme (low bits would stride).
    val keys = (0L until 2000L).map(_ * 3 + 1)
    val nonMembers = (1000000L until 1004000L)
    for (fam <- Seq(false, true)) {
      val pass = bloomPass(keys, nonMembers, 1 << 15, 3, fam)
      val rate = pass.size.toDouble / nonMembers.size
      assert(rate < 0.10,
        f"non-member pass rate $rate%.3f (long=$fam) — bitmap saturated")
    }
  }

  test("empty build side filters everything out") {
    for (fam <- Seq(false, true))
      assert(bloomPass(Seq.empty, (0L until 20L), 1 << 10, 3, fam).isEmpty)
  }

  test("probe columns pass through unchanged") {
    val probe = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("pk", "s", "d")
    val bitmap = BloomPrefilter.buildBitmap(Seq(1L, 2L).toDF("key"),
      col("key"), 1 << 10, 3)
    val out = BloomPrefilter.prefilter(probe, col("pk"), bitmap, 1 << 10, 3)
    assert(out.columns.toSeq === Seq("pk", "s", "d"))
    assert(out.collect().map(_.toSeq).toSet ===
      probe.collect().map(_.toSeq).toSet)
  }

  test("parameter guards") {
    val df = Seq(1L).toDF("key")
    intercept[IllegalArgumentException] {
      BloomPrefilter.buildBitmap(df, col("key"), 96, 3) // not a power of 2
    }
    intercept[IllegalArgumentException] {
      BloomPrefilter.buildBitmap(df, col("key"), 1 << 21, 3) // > 2^20
    }
    intercept[IllegalArgumentException] {
      BloomPrefilter.buildBitmapLong(df, col("key"), 1 << 10, 7) // k > 6
    }
    intercept[IllegalArgumentException] {
      BloomPrefilter.prefilter(df, col("key"), df, 1 << 10, 0)
    }
  }
}
