package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Pins what q54's oracle deliberately leaves out: the linear-counting
  * ESTIMATE −m·ln(1 − z/m), whose ln the two engines need not round
  * identically (which is why only the exact occupancy z is oracled).
  * Claims pinned here: the estimate lands within the published linear-
  * counting error envelope against the exact distinct count across
  * load factors (sparse → ~70% full), duplicate-invariance (the sketch
  * state is a pure function of the value SET), and lossless
  * mergeability (bucket sets from disjoint partitions UNION to exactly
  * the full sketch — the property HLL has only through opaque
  * registers).
  */
class LinearCountSpec extends SparkSpec {
  import spark.implicits._

  private val m = 4096

  private def bucketCol = conv(substring(
    md5(col("v").cast(StringType).cast(BinaryType)), 1, 5), 16, 10)
    .cast(LongType) % m

  private def occupancy(vs: Seq[Long]): Long =
    vs.toDF("v").select(bucketCol.as("b")).distinct().count()

  private def estimate(z: Long): Double =
    -m.toDouble * math.log(1.0 - z.toDouble / m)

  test("estimate within the linear-counting envelope across load factors") {
    for (n <- Seq(50L, 500L, 2000L, 5000L)) {
      val z = occupancy(1L to n)
      val est = estimate(z)
      val relErr = math.abs(est - n) / n
      // standard error of linear counting is √m·(e^t − t − 1)/(t·m) with
      // t = n/m — below 5% for every load factor here; allow 3 sigmas
      // plus a small absolute floor for the tiny-n rungs
      assert(relErr < 0.10,
        s"n=$n: estimate $est off by ${relErr * 100}%")
    }
  }

  test("sketch state is duplicate-invariant and order-invariant") {
    val base = (1L to 1000L)
    val z = occupancy(base)
    assert(occupancy(base ++ base ++ base) == z)
    assert(occupancy(base.reverse) == z)
  }

  test("grouped occupancy (q56) equals each group's standalone sketch") {
    // the bucket hash is independent of the group key, so the grouped
    // (group, bucket)-distinct must equal running the global sketch on
    // each group's values alone — the property that makes per-group
    // sketches mergeable into coarser groupings without re-scanning
    val rows = (1L to 2000L).map(v => (s"g${v % 3}", v))
    val grouped = rows.toDF("g", "v")
      .select(col("g"), bucketCol.as("b")).distinct()
      .groupBy("g").count()
      .as[(String, Long)].collect().toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val standalone = occupancy(rows.filter(_._1 == g).map(_._2))
      assert(grouped(g) == standalone,
        s"$g: grouped ${grouped(g)} != standalone $standalone")
    }
  }

  test("bucket sets merge losslessly across disjoint partitions") {
    val all = (1L to 3000L)
    val (p1, p2) = all.partition(_ % 3 == 0)
    val bs1 = p1.toDF("v").select(bucketCol.as("b"))
      .distinct().as[Long].collect().toSet
    val bs2 = p2.toDF("v").select(bucketCol.as("b"))
      .distinct().as[Long].collect().toSet
    val whole = all.toDF("v").select(bucketCol.as("b"))
      .distinct().as[Long].collect().toSet
    assert((bs1 union bs2) == whole,
      "per-partition bucket sets must union to the full sketch")
  }
}
