package graft.llm

import graft.SparkSpec

/** Pins Dedup.semanticDedup's documented keeper policy on hand-built
  * vectors, where the expected drop set can be reasoned out exactly:
  *  - an exact duplicate of an earlier vector is dropped;
  *  - the greedy chain drops by EARLIER ID, not by "earlier KEPT id": a
  *    vector near an already-dropped earlier vector still drops, even
  *    when it is far from every kept one;
  *  - zero-norm vectors never pair (cosine undefined) and are kept;
  *  - opposite-direction vectors (cosine -1) are kept.
  * The cross-engine oracle (llm_semantic_dedup) checks the full
  * kmeans-composed pipeline; this spec isolates the policy semantics.
  */
class SemanticDedupSpec extends SparkSpec {

  private def run(vecs: Seq[(Long, Seq[Float])], tau: Double,
      k: Int = 1): Map[Long, Boolean] = {
    import spark.implicits._
    val emb = vecs.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
    Dedup.semanticDedup(emb, k = k, iters = 2, tau = tau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
  }

  test("exact duplicate of an earlier vector is dropped; zero and " +
    "opposite vectors are kept") {
    val kept = run(Seq(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(1f, 0f, 0f),   // duplicate of 0 -> dropped
      2L -> Seq(0f, 0f, 0f),   // zero norm -> kept
      3L -> Seq(-1f, 0f, 0f)), // cosine -1 vs 0 -> kept
      tau = 0.9)
    assert(kept === Map(0L -> true, 1L -> false, 2L -> true, 3L -> true))
  }

  test("greedy chain: near an already-dropped EARLIER vector still drops") {
    // b is 30deg from a (cos ~0.866 >= 0.8 -> dropped by a);
    // c is 30deg from b (dropped by b) but 60deg from a (cos 0.5 < 0.8).
    // Earliest-id greedy does NOT rehabilitate c just because its only
    // tau-neighbor b was itself dropped.
    def rot(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0f)
    }
    val kept = run(Seq(0L -> rot(0), 1L -> rot(30), 2L -> rot(60)),
      tau = 0.8)
    assert(kept === Map(0L -> true, 1L -> false, 2L -> false))
  }

  test("vectors in different clusters never pair even at cosine 1") {
    // k=2 on two tight groups: the duplicate-direction pair (0,2) lands
    // in one cluster, (1,3) in the other; cross-cluster near-dups are by
    // design not candidates (the SemDeDup trade: recall bounded by the
    // partition quality).
    val kept = run(Seq(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f),
      2L -> Seq(0.99f, 0.01f, 0f),
      3L -> Seq(0.01f, 0.99f, 0f)),
      tau = 0.9, k = 2)
    assert(kept === Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
  }
}
