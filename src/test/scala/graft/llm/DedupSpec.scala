package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 8

  private def docs = Seq(
    (0L, base),
    (1L, base),                                   // exact dup of 0
    (2L, base.replace("lazy", "sleepy")),          // near dup of 0
    (3L, "completely different content about spark sql engines and joins"),
    (4L, "another unrelated document mentioning parquet and shuffles"))
    .toDF("doc_id", "text")

  test("exactDuplicates groups identical texts, deterministic keeper") {
    val out = Dedup.exactDuplicates(docs).orderBy("keeper_id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[Long]("keeper_id") == 0L)
    assert(out(0).getAs[Long]("n_copies") == 2L)
  }

  test("minhash LSH finds exact and near duplicates, skips unrelated") {
    val cands = Dedup.minhashCandidates(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 1L))) // exact dup always collides
    assert(cands.contains((0L, 2L)) || cands.contains((1L, 2L))) // near dup
    assert(!cands.contains((3L, 4L))) // unrelated
  }

  test("verifyJaccard: exact dup = 1.0; near dup high; candidates only") {
    val cands = Dedup.minhashCandidates(docs)
    val verified = Dedup.verifyJaccard(cands, docs, threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect()
    val exact = verified.find(r => r.getLong(1) == 0L && r.getLong(0) == 1L)
      .orElse(verified.find(r => r.getAs[Long]("doc_a") == 0L
        && r.getAs[Long]("doc_b") == 1L))
    assert(exact.isDefined && exact.get.getAs[Double]("jaccard") == 1.0)
  }

  test("simhash: identical texts equal; near dup within small hamming") {
    val sigs = docs.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
    val hammingNear = java.lang.Long.bitCount(sigs(0L) ^ sigs(2L))
    val hammingFar = java.lang.Long.bitCount(sigs(0L) ^ sigs(3L))
    assert(hammingNear < hammingFar)
  }

  test("simhashCandidates pairs exact dups with hamming 0") {
    val out = Dedup.simhashCandidates(docs)
      .filter($"doc_a" === 0L && $"doc_b" === 1L).collect()
    assert(out.length == 1 && out(0).getAs[Int]("hamming") == 0)
  }

  test("connectedComponents: min-label clusters over triangle + chain") {
    // triangle {1,2,3}, chain 10-11-12-13, isolated pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponentsStar: agrees with label propagation, handles deep chains") {
    // a 50-node chain has diameter 49: label propagation needs ~50 rounds,
    // star contraction O(log) — both must yield cluster 0 for every node
    val chain = (0L until 49L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val star = Dedup.connectedComponentsStar(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size == 50 && star.values.forall(_ == 0L))

    val mixed = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val viaStar = Dedup.connectedComponentsStar(mixed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = Dedup.connectedComponents(mixed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == viaProp)
  }

  test("candidate-generation plans carry no Window (skew caps are broadcast blacklists)") {
    // the r3-flagged shape — count().over(Window.partitionBy(hotkey)) —
    // ships every row of a hot key to one task BEFORE the cap filter can
    // drop it; this pin fails if any cap regresses to a window
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    def audit(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case w: LWindow => w }.isEmpty,
        s"$name: window found in candidate plan")
      assert(plan.collect {
        case j: Join if j.joinType == LeftAnti => j }.nonEmpty,
        s"$name: expected a left-anti blacklist join")
    }
    audit(Dedup.minhashCandidates(docs), "minhash")
    audit(Dedup.simhashCandidates(docs), "simhash")
    audit(Dedup.jaccardPairsExact(docs, 0.8), "jaccard")
  }

  test("connectedComponentsAdaptive: shallow fast path and deep fallback agree") {
    // shallow graph: propagation converges inside the round budget
    val mixed = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponentsAdaptive(mixed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Dedup.connectedComponents(mixed)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // 30-node chain with a 12-round budget: propagation throws, the star
    // fallback must still label every node with the chain minimum
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponentsAdaptive(chain, propRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 30 && out.values.forall(_ == 0L))
  }

  test("jaccardPairsExact is ground truth: LSH-verified pairs are a subset") {
    val lshVerified = Dedup.verifyJaccard(
      Dedup.minhashCandidates(docs).select("doc_a", "doc_b"), docs, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairsExact(docs, 0.8)
      .as[(Long, Long)].collect().toSet
    assert(lshVerified.subsetOf(exact))
    assert(exact.contains((0L, 1L))) // the planted exact duplicate
  }

  test("shingles: distinct word 3-grams; short docs do not error") {
    val sh = Seq((0L, "a b c d"), (1L, "x y"))
      .toDF("doc_id", "text")
      .select(Dedup.shingles($"text").as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq("x y")) // whole doc as single shingle
  }
}
