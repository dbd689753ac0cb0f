package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // Two tight clusters around orthogonal axes + noise vectors.
  private def vecs = {
    def v(axis: Int, wiggle: Double, dim: Int = 64): Array[Float] =
      Array.tabulate(dim)(i =>
        (if (i == axis) 1.0 else 0.0) + wiggle * ((i * 7 % 5) - 2) * 0.01)
        .map(_.toFloat)
    Seq(
      (0L, v(0, 0.0)), (1L, v(0, 1.0)), (2L, v(0, 2.0)),   // cluster A
      (10L, v(32, 0.0)), (11L, v(32, 1.0)), (12L, v(32, 2.0)), // cluster B
      (20L, Array.tabulate(64)(i => ((i * 13 % 7) - 3) * 0.1f)))
      .toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks same-cluster vectors first") {
    val out = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0L), vecs, 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 20L)
      || out.map(_.getAs[Long]("neighbor_id")).take(2).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Double]("cosine") > 0.99)
  }

  test("cosine of identical vectors is 1.0 (within fp)") {
    val two = vecs.filter($"vec_id" === 0L)
    val out = Similarity.bruteForceTopK(two,
      vecs.filter($"vec_id" <= 1L)
        .withColumn("vec_id", $"vec_id" + 100L), 1).collect()
    assert(out.nonEmpty)
  }

  test("LSH buckets put near-identical vectors together; recall vs brute") {
    val brute = Similarity.bruteForceTopK(
      vecs.filter($"vec_id".isin(0L, 10L)), vecs, 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(
      vecs.filter($"vec_id".isin(0L, 10L)), vecs, 2, nPlanes = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // with 2 planes (4 buckets), same-cluster vectors collide with high
    // probability; require at least half the brute-force pairs recovered
    assert(lsh.intersect(brute).size * 2 >= brute.size)
  }

  test("ivfTopK recovers brute-force neighbors when probing enough lists") {
    val brute = Similarity.bruteForceTopK(
      vecs.filter($"vec_id".isin(0L, 10L)), vecs, 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(
      vecs.filter($"vec_id".isin(0L, 10L)), vecs, 2, nlist = 3, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // probing all lists = exhaustive search: must equal brute force
    assert(ivf == brute)
    val ivfPartial = Similarity.ivfTopK(
      vecs.filter($"vec_id".isin(0L, 10L)), vecs, 2, nlist = 3, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivfPartial.intersect(brute).size * 2 >= brute.size)
    // corpus→list assignment is a pure argmin expression: the only
    // windows in the whole plan are the tiny per-query probe ranking and
    // the final top-k — the old third window (corpus-wide assignment
    // shuffle) must be gone
    val nWindows = Similarity.ivfTopK(
      vecs.filter($"vec_id".isin(0L, 10L)), vecs, 2, nlist = 3, nprobe = 3)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.size
    assert(nWindows == 2, s"expected 2 windows (probe + rank), got $nWindows")
  }

  test("non-64-dim corpora: dim is probed, buckets stay correct (32-dim)") {
    def v32(axis: Int, wiggle: Double): Array[Float] =
      Array.tabulate(32)(i =>
        (if (i == axis) 1.0 else 0.0) + wiggle * ((i * 7 % 5) - 2) * 0.01)
        .map(_.toFloat)
    val small = Seq(
      (0L, v32(0, 0.0)), (1L, v32(0, 1.0)), (2L, v32(0, 2.0)),
      (10L, v32(16, 0.0)), (11L, v32(16, 1.0)), (12L, v32(16, 2.0)))
      .toDF("vec_id", "embedding")
    assert(Similarity.embeddingDim(small) == 32)
    val brute = Similarity.bruteForceTopK(
      small.filter($"vec_id".isin(0L, 10L)), small, 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(
      small.filter($"vec_id".isin(0L, 10L)), small, 2, nPlanes = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(lsh.intersect(brute).size * 2 >= brute.size)
    val dups = Similarity.nearDupPairs(small, 0.9, nPlanes = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(dups.exists { case (a, b) => a < 10 && b < 10 })
    assert(!dups.exists { case (a, b) => a < 10 && b >= 10 })
  }

  test("l2Normalized: unit vectors, zero vectors pass through, one norm per row") {
    val withZero = vecs.union(
      Seq((99L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val out = Similarity.l2Normalized(withZero)
    val norms = out.select($"vec_id",
      Similarity.norm($"unit").as("n")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    norms.foreach { case (id, n) =>
      if (id == 99L) assert(n == 0.0) else assert(math.abs(n - 1.0) < 1e-12)
    }
    // the norm is staged, not captured: exactly one sqrt per row in plan
    // (range-based input — a local Seq folds to LocalRelation and hides
    // the projection)
    val ranged = spark.range(4).selectExpr("id AS vec_id",
      "array(cast(id AS float), cast(id + 1 AS float)) AS embedding")
    val plan = Similarity.l2Normalized(ranged)
      .queryExecution.optimizedPlan.toString
    val nSqrt = "SQRT".r.findAllMatchIn(plan.toUpperCase).size
    assert(nSqrt == 1, s"expected 1 sqrt in optimized plan, got $nSqrt:\n$plan")
  }

  test("EmbeddingDim matches the real testdata corpus and the adversarial twin") {
    // The ANN oracles inline hyperplane literals of length EmbeddingDim;
    // if the testdata generator's dim ever drifts, this is the loud
    // failure instead of silently wrong-length probe dot products.
    val probed = Similarity.embeddingDim(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    assert(probed == graft.queries.LlmQueries.EmbeddingDim,
      s"testdata embedding dim $probed != EmbeddingDim constant")
    assert(graft.AdversarialCorpus.Dim == graft.queries.LlmQueries.EmbeddingDim)
  }

  test("nearDupPairs finds within-cluster pairs above threshold") {
    val out = Similarity.nearDupPairs(vecs, 0.9, nPlanes = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)) || out.contains((1L, 2L))
      || out.contains((0L, 2L)))
    assert(!out.exists { case (a, b) => a < 10 && b >= 10 })
  }
}
