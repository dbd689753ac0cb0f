package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy pin for q40_graph_triangles_approx (DOULION edge-sampled
  * estimate): the DuckDB oracle proves both engines compute the SAME
  * number, but only a comparison against the exact count proves the
  * number is a useful estimate. The exact all-time triangle count is
  * affordable at sf0.001, so it is computed here with the same
  * degree-ordered orientation on the UNSAMPLED graph.
  */
class GraphTrianglesApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Exact all-time triangle total via the q39 orientation, unscoped. */
  private def exactTriangles: Long = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val a = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val half = a.join(b, Seq("l_orderkey"))
      .filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb")).distinct()
    val deg = half.select(col("pa").as("n"))
      .union(half.select(col("pb").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val lower = struct(col("da"), col("pa")) < struct(col("db"), col("pb"))
    val oriented = half
      .join(deg.select(col("n").as("pa"), col("d").as("da")), Seq("pa"))
      .join(deg.select(col("n").as("pb"), col("d").as("db")), Seq("pb"))
      .select(when(lower, col("pa")).otherwise(col("pb")).as("u"),
        when(lower, col("pb")).otherwise(col("pa")).as("v"))
    val wedges = oriented.select(col("u").as("ta"), col("v").as("tb"))
      .join(oriented.select(col("u").as("tb"), col("v").as("tc")), Seq("tb"))
    wedges.join(
      oriented.select(col("u").as("ta"), col("v").as("tc")),
      Seq("ta", "tc")).count()
  }

  test("sampled edge fraction is near p=1/4 and the estimate brackets " +
      "the exact count") {
    val row = Workload.q40.run(spark, dir).collect().head
    val est = row.getAs[Long]("est_triangles")
    val sampledTri = row.getAs[Long]("sampled_triangles")
    val sampledEdges = row.getAs[Long]("sampled_edges")
    assert(est == sampledTri * 64)

    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val a = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val totalEdges = a.join(b, Seq("l_orderkey"))
      .filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb")).distinct().count()
    val frac = sampledEdges.toDouble / totalEdges
    // the md5-fold coin is uniform-ish, not perfect — a loose band
    // still catches a broken threshold (all/none kept) or a biased fold
    assert(frac > 0.18 && frac < 0.32,
      s"sampled edge fraction $frac not near 1/4 ($sampledEdges/$totalEdges)")

    val exact = exactTriangles
    assert(exact > 0, "fixture graph must contain triangles")
    // DOULION is unbiased with variance ~ t/p^3 at this scale; ×3 both
    // ways is loose enough to be stable across generator vintages and
    // tight enough that a p^2- or p^4-scaled (mis-derived) estimator
    // (×4 off) or a broken sampler cannot pass.
    assert(est > exact / 3 && est < exact * 3,
      s"estimate $est vs exact $exact outside ×3 band " +
        s"(sampled_triangles=$sampledTri)")
  }
}
