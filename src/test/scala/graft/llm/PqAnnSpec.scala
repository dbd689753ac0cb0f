package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the product-quantization contract (Similarity.pqCodes/pqSearch)
  * against from-scratch JVM arithmetic and against construction:
  *
  *  - seed vectors (vec_id < K) must encode to their own centroid in
  *    every subspace (their subspace distance to themselves is 0);
  *  - every vector's code must equal a plain-Scala replay of
  *    grid-quantize + argmin-with-smaller-k-ties — no Spark expressions
  *    in the oracle side;
  *  - on a planted clustered corpus (members = seed + small noise), ADC
  *    top-k retrieval must return only same-cluster members — the
  *    recall property PQ serving rests on.
  */
class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val SubDim = Dim / Similarity.PqSubspaces

  private def toDF(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))

  /** Well-separated deterministic seed vectors: seed k lives at offset
    * 10·k on every dim with a per-dim ripple so subspaces differ.
    */
  private def seed(k: Int): Seq[Float] =
    (0 until Dim).map(d => (10f * k + 0.1f * ((k * 7 + d) % 5)))

  private def replayCodes(rows: Seq[(Long, Seq[Float])])
      : Map[(Long, Int), Int] = {
    def grid(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * Similarity.PqGrid + 0.5).toLong)
    val cb = rows.filter(_._1 < Similarity.PqCentroids)
      .map { case (id, v) => id.toInt -> grid(v) }.toMap
    (for {
      (id, v) <- rows
      q = grid(v)
      m <- 0 until Similarity.PqSubspaces
    } yield {
      val sub = q.slice(m * SubDim, (m + 1) * SubDim)
      val best = cb.toSeq.map { case (k, c) =>
        val cs = c.slice(m * SubDim, (m + 1) * SubDim)
        val d = sub.zip(cs).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, k)
      }.minBy(identity) // (dist, k) lexicographic: ties to smaller k
      (id, m) -> best._2
    }).toMap
  }

  test("seed vectors encode to their own centroid in every subspace") {
    val rows = (0 until 20).map(k => (k.toLong, seed(k)))
    val codes = Similarity.pqEncode(toDF(rows), SubDim)
      .select("vec_id", "m", "code", "dist")
      .as[(Long, Int, Int, Long)].collect()
    val seeds = codes.filter(_._1 < Similarity.PqCentroids)
    assert(seeds.nonEmpty)
    seeds.foreach { case (id, m, code, dist) =>
      assert(code === id.toInt, s"seed $id subspace $m coded $code")
      assert(dist === 0L, s"seed $id subspace $m nonzero self-distance")
    }
  }

  test("codes == from-scratch replay (incl. duplicate-seed ties)") {
    // duplicate seeds 3 and 4 force dist ties — argmin must break to the
    // smaller k in both implementations
    val rows = (0 until 24).map { k =>
      val base = if (k == 4) seed(3) else seed(k % 16)
      (k.toLong, if (k < 16) base else base.map(_ + 0.3f))
    }
    val want = replayCodes(rows)
    val got = Similarity.pqEncode(toDF(rows), SubDim)
      .select("vec_id", "m", "code")
      .as[(Long, Int, Int)].collect()
      .map { case (id, m, c) => (id, m) -> c }.toMap
    assert(got === want)
    // and the packed form decodes to the same per-subspace codes
    val packed = Similarity.pqCodes(toDF(rows), SubDim)
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, _) =>
      val p = packed(id)
      (0 until Similarity.PqSubspaces).foreach { m =>
        assert(((p >> (4 * m)) & 15L).toInt === want((id, m)),
          s"packed code of vec $id subspace $m")
      }
    }
  }

  test("ADC top-k on a planted clustered corpus returns only " +
    "same-cluster members") {
    // queries 0..9 are the first 10 seeds; members 100k+i are seed k plus
    // small noise — every query's 5 nearest by ADC must carry its own
    // cluster's ids (inter-seed distance 10 per dim dwarfs noise 0.2)
    val members = for {
      k <- 0 until 16; i <- 0 until 6
    } yield ((100L * (k + 1) + i),
      seed(k).zipWithIndex.map { case (x, d) => x + 0.02f * ((i + d) % 3) })
    val rows = (0 until 16).map(k => (k.toLong, seed(k))) ++ members
    val out = Similarity.pqSearch(toDF(rows), 5, SubDim)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect()
    assert(out.map(_._1).distinct.length === 10)
    out.foreach { case (q, n) =>
      val cluster = 100L * (q + 1)
      assert(n >= cluster && n < cluster + 100L,
        s"query $q retrieved out-of-cluster neighbor $n")
    }
  }

  test("IVF-PQ agrees with flat PQ where lists were probed, and stays " +
    "in-cluster on the planted corpus") {
    val members = for {
      k <- 0 until 16; i <- 0 until 6
    } yield ((100L * (k + 1) + i),
      seed(k).zipWithIndex.map { case (x, d) => x + 0.02f * ((i + d) % 3) })
    val rows = (0 until 16).map(k => (k.toLong, seed(k))) ++ members
    val ivfpq = Similarity.ivfPqSearch(toDF(rows), 5, SubDim)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Long)].collect()
    // same-cluster recall survives the coarse routing: a member's nearest
    // coarse centroid is its own cluster's seed, and the query probes its
    // own list first
    ivfpq.foreach { case (q, n, _) =>
      val cluster = 100L * (q + 1)
      assert(n >= cluster && n < cluster + 100L,
        s"ivfpq query $q retrieved out-of-cluster neighbor $n")
    }
    // ADC arithmetic is identical to the flat PQ scan — every pair both
    // indexes scored must carry the same approximate distance
    val flat = Similarity.pqSearch(toDF(rows), 5, SubDim)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Long)].collect()
      .map { case (q, n, a) => (q, n) -> a }.toMap
    ivfpq.foreach { case (q, n, a) =>
      flat.get((q, n)).foreach(fa =>
        assert(fa === a, s"adist mismatch for ($q, $n)"))
    }
  }
}
