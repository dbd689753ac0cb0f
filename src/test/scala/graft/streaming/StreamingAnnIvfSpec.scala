package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming ≡ one-shot for the IVF cell maintainer: folding an
  * embedding corpus through StreamingAnnIvf.Maintainer in micro-batches
  * must land on EXACTLY the per-cell profile a single
  * ivfAssign + groupBy over the whole corpus produces — under different
  * batchings, with duplicate-vector rows split across batches, with an
  * empty batch in the middle, and with zero-norm vectors (excluded by
  * assignment on both paths).
  */
class StreamingAnnIvfSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),          // the 2 centroids
    (2L, Seq(0.9, 0.1)), (3L, Seq(0.1, 0.9)),
    (4L, Seq(0.7, 0.3)), (5L, Seq(0.3, 0.7)),
    (6L, Seq(0.5, 0.5)),                                // tie -> lower cid
    (7L, Seq(0.0, 0.0)),                                // zero-norm: dropped
    (8L, Seq(0.9, 0.1)),                                // duplicate of 2
    (9L, Seq(-1.0, -0.5)))
    .toDF("vec_id", "embedding")

  private def oneShot() = {
    val cents = graft.llm.Similarity.centroidTable(corpus, 2)
    graft.llm.Similarity.ivfAssign(corpus, cents)
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_vectors"), min(col("neighbor_id")).as("first_vec"))
      .orderBy("centroid_id")
      .collect().map(_.toSeq).toSeq
  }

  private def folded(batches: Seq[Seq[Long]]) = {
    val cents = graft.llm.Similarity.centroidTable(corpus, 2)
    val m = new StreamingAnnIvf.Maintainer(cents)
    batches.foreach { ids =>
      m.absorb(corpus.filter(col("vec_id").isin(ids: _*)))
    }
    m.currentCells.get.orderBy("centroid_id").collect().map(_.toSeq).toSeq
  }

  test("fold equals one-shot under different batchings") {
    val want = oneShot()
    assert(want.nonEmpty)
    assert(folded(Seq(Seq(0L, 1L, 2L), Seq(3L, 4L, 5L), Seq(6L, 7L, 8L, 9L)))
      == want)
    assert(folded(Seq(Seq(9L, 8L), Seq(7L), Seq(6L, 5L, 4L, 3L),
      Seq(2L, 1L, 0L))) == want)
    assert(folded(Seq((0L to 9L))) == want)
  }

  test("empty and zero-norm-only batches are no-ops") {
    val want = oneShot()
    assert(folded(Seq(Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L),
      Seq.empty, Seq(7L))) == want)
  }

  test("state is one row per occupied cell") {
    val out = folded(Seq((0L to 9L)))
    assert(out.length <= 2)
    // 9 non-zero-norm vectors accounted for
    assert(out.map(_(1).asInstanceOf[Long]).sum == 9L)
  }

  test("recall over accumulated lists: fold equals one-shot search") {
    val cents = graft.llm.Similarity.centroidTable(corpus, 2)
    val q = corpus.filter(col("vec_id") < 3)
    def searchRows(lists: org.apache.spark.sql.DataFrame) =
      graft.llm.Similarity.ivfSearchLists(lists, q, cents, k = 3, nprobe = 1)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val oneShot = searchRows(
      graft.llm.Similarity.ivfAssign(corpus, cents))
    assert(oneShot.nonEmpty)
    for (batching <- Seq(
        Seq(Seq(0L, 1L, 2L), Seq(3L, 4L, 5L), Seq(6L, 7L, 8L, 9L)),
        Seq(Seq(9L, 8L, 7L), Seq.empty[Long], Seq(6L, 5L, 4L, 3L, 2L, 1L, 0L)))) {
      val m = new StreamingAnnIvf.Maintainer(cents)
      batching.foreach(ids =>
        m.absorb(corpus.filter(col("vec_id").isin(ids: _*))))
      assert(searchRows(m.currentLists.get) == oneShot,
        s"fold drifted under batching $batching")
    }
  }
}
