package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the portable Bloom prefilter's contract: NO false negatives
  * (pass set ⊇ exact semi-join, at any m/k), filtered-join ≡ plain-join
  * (the verify step erases false positives), the bitmap bit layout
  * against a from-scratch JVM md5 replay (the cross-engine portability
  * claim), empty-build and all-pass degenerations, and the parameter
  * guards.
  */
class BloomPrefilterSpec extends SparkSpec {
  import spark.implicits._

  /** From-scratch replay of the operator's hash: ascii positional fold
    * of md5-hex chars [5j+1 .. 5j+5], mod mBits.
    */
  private def jvmPos(key: Long, j: Int, mBits: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val fold = (0 until 5)
      .map(i => hex(j * 5 + i).toLong * math.pow(128, i).toLong).sum
    (fold % mBits).toInt
  }

  private def bloomPass(keys: Seq[Long], probe: Seq[Long], mBits: Int,
      k: Int): Set[Long] = {
    val build = keys.toDF("key")
    val bitmap = BloomPrefilter.buildBitmap(build, col("key"), mBits, k)
    BloomPrefilter
      .prefilter(probe.toDF("pk"), col("pk"), bitmap, mBits, k)
      .as[Long].collect().toSet
  }

  test("no false negatives at any size, and tiny filters still verify") {
    val keys = (0L until 50L).map(_ * 7 + 3)
    val probe = (0L until 400L)
    for (mBits <- Seq(64, 1 << 10, 1 << 15); k <- Seq(1, 3, 6)) {
      val pass = bloomPass(keys, probe, mBits, k)
      val want = probe.filter(keys.contains).toSet
      assert(want.subsetOf(pass),
        s"false negative at mBits=$mBits k=$k: ${want -- pass}")
    }
  }

  test("filtered join equals plain join") {
    val build = (0L until 30L).map(i => (i * 11, s"d$i")).toDF("key", "attr")
    val probe = (0L until 500L).map(i => (i, i * 2 + 1)).toDF("pk", "v")
    val bitmap = BloomPrefilter.buildBitmap(build, col("key"), 1 << 10, 3)
    val filtered = BloomPrefilter.prefilter(probe, col("pk"), bitmap, 1 << 10, 3)
      .join(build, col("pk") === col("key"))
      .select("pk", "v", "attr").collect().map(_.toSeq).toSet
    val plain = probe.join(build, col("pk") === col("key"))
      .select("pk", "v", "attr").collect().map(_.toSeq).toSet
    assert(filtered === plain)
  }

  test("bitmap bits match a from-scratch JVM md5 replay") {
    val mBits = 1 << 10
    val keys = Seq(5L, 123L, 99999L)
    val bitmap = BloomPrefilter.buildBitmap(keys.toDF("key"), col("key"),
      mBits, 3).as[(Long, Long)].collect().toMap
    val wantWords = keys.flatMap { key =>
      (0 until 3).map { j =>
        val pos = jvmPos(key, j, mBits)
        (pos / 32).toLong -> (1L << (pos % 32))
      }
    }.groupBy(_._1).map { case (w, ms) =>
      w -> ms.map(_._2).reduce(_ | _)
    }
    assert(bitmap === wantWords)
  }

  test("empty build side filters everything out") {
    val pass = bloomPass(Seq.empty, (0L until 20L), 1 << 10, 3)
    assert(pass.isEmpty)
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
      BloomPrefilter.buildBitmap(df, col("key"), 100, 3) // not mult of 32
    }
    intercept[IllegalArgumentException] {
      BloomPrefilter.buildBitmap(df, col("key"), 1 << 10, 7) // k > 6
    }
    intercept[IllegalArgumentException] {
      BloomPrefilter.prefilter(df, col("key"), df, 1 << 10, 0)
    }
  }
}
