package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for int8 scalar quantization (Similarity.scalarQuantize): the
  * per-element reconstruction bound, the zero-vector guard, and the
  * retrieval cost actually paid on the real corpus — the numbers a user
  * trades 4× storage for.
  */
class EmbedQuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("reconstruction error is bounded by scale/254 per element") {
    val viol = Similarity.scalarQuantize(graft.Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("scale"),
        zip_with(col("embedding").cast("array<double>"), col("qvec"),
          (v, q) => abs(v - q.cast("double") * col("scale") / lit(127.0)))
          .as("err"))
      // strict floor(x+0.5) rounding puts the true bound at s/254; the
      // 1e-12 slack covers the dequantization divide's own rounding
      .filter(exists(col("err"),
        e => e > col("scale") / lit(254.0) + lit(1e-12)))
      .count()
    assert(viol == 0L)
  }

  test("zero and constant vectors quantize without dividing by zero") {
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(0.5f, 0.5f, 0.5f)),
      (3L, Array(-1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.scalarQuantize(vecs)
      .select(col("vec_id"), col("scale"), col("qvec"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Int](2).toList)).toList.sortBy(_._1)
    assert(got == List(
      (1L, 0.0, List(0, 0, 0)),
      (2L, 0.5, List(127, 127, 127)),
      (3L, 1.0, List(-127, 127, 0))))
  }

  test("recall@5 of dequantized brute-force vs exact stays high on the " +
      "real corpus") {
    val emb = graft.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val deq = Similarity.scalarQuantize(emb)
      .select(col("vec_id"),
        transform(col("qvec"),
          q => q.cast("double") * col("scale") / lit(127.0))
          .cast("array<float>").as("embedding"))
    val approx = Similarity.bruteForceTopK(
      deq.filter(col("vec_id") < 10), deq, 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, nbrs) =>
      approx.getOrElse(q, Set.empty).intersect(nbrs).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@5 after int8 quantization = $mean")
  }
}
