package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pins for the k-means operator beyond the cross-engine oracle:
  * Lloyd's objective is non-increasing (each assignment picks the nearest
  * centroid; each update is the L2-minimizing mean), and the assignment
  * is total — every vector gets exactly one cluster in [0, k).
  */
class KMeansSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"

  private def inertia(assignments: Map[Long, Int],
      vecs: Map[Long, Array[Double]],
      cents: Map[Int, Array[Double]]): Double =
    assignments.map { case (vid, cid) =>
      val x = vecs(vid); val c = cents(cid)
      x.indices.map(i => (x(i) - c(i)) * (x(i) - c(i))).sum
    }.sum

  test("two-round fit is total, labels in [0,k), and Lloyd's objective " +
    "does not increase across the centroid update") {
    val emb = graft.Tables.embeddings(spark, Dir)
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("x")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    val round1 = KMeans.fit(emb, k = 8, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val round2 = KMeans.fit(emb, k = 8, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(round1.keySet == vecs.keySet && round2.keySet == vecs.keySet)
    assert(round2.values.forall(c => c >= 0 && c < 8))

    // recompute the two centroid sets the fit used — FIRST k by vec_id,
    // mirroring fit's orderBy/limit init (a `vec_id < k` filter would
    // silently test the wrong init on a non-0-based id space)
    val init = vecs.toSeq.sortBy(_._1).take(8).zipWithIndex.map {
      case ((_, x), i) => i -> x
    }.toMap
    val updated = round1.groupBy(_._2).map { case (cid, members) =>
      val xs = members.keys.map(vecs).toSeq
      cid -> xs.head.indices.map(i => xs.map(_(i)).sum / xs.size).toArray
    }
    val before = inertia(round1, vecs, init)
    val mid = inertia(round1, vecs, updated) // same labels, better centers
    val after = inertia(round2, vecs, updated) // better labels too
    assert(mid <= before + 1e-9, s"update increased inertia: $before -> $mid")
    assert(after <= mid + 1e-9, s"reassignment increased inertia: $mid -> $after")
  }

  test("convergence stop is exact at the fixed point: more rounds cannot " +
    "change any assignment") {
    val emb = graft.Tables.embeddings(spark, Dir)
    val (asn, rounds) = KMeans.fitConverged(emb, k = 8, maxIters = 60,
      eps = 1e-9)
    assert(rounds < 60, "did not converge within the safety bound")
    val converged = asn.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // fitConverged ran `rounds` centroid updates; fit(iters = rounds + 1)
    // runs the same updates, fit(rounds + 2) runs one MORE — at the
    // fixed point both must reproduce the converged assignment exactly
    val same = KMeans.fit(emb, k = 8, iters = rounds + 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val onePast = KMeans.fit(emb, k = 8, iters = rounds + 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(converged == same)
    assert(converged == onePast,
      "an extra round past the eps stop changed assignments")
  }
}
