package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lloyd's k-means over an embedding column — the clustering rung above
  * the CC ladder (semantic grouping, IVF list training, corpus
  * stratification). Deterministic and CROSS-ENGINE EXACT, which is what
  * lets the DuckDB oracle replay it:
  *
  *  - init: the first k vectors by vec_id (seeded init is a policy knob;
  *    determinism is what matters for the gate);
  *  - assignment is map-only: centroids are driver-side constants inlined
  *    as literals (k·dim doubles — the IVF/hyperplane discipline), each
  *    row takes argmin over k inlined squared-L2 expressions with the
  *    (dist, cid) struct-min tie-break;
  *  - update sums coordinates as DECIMAL (exact, order-independent —
  *    a double sum would make the centroid depend on partitioning and
  *    break both determinism and the oracle), then divides in IEEE
  *    double: bit-identical in any engine;
  *  - distances are d² = x·x − 2·x·c + c·c with left-to-right double
  *    dot products — the same fold DuckDB's list_dot_product runs, the
  *    bit-parity the ANN oracles already pin.
  *
  * 100 TB shape: per round, one scan for assignment (no shuffle), one
  * (cluster, pos)-keyed partial aggregation of n·dim slim rows for the
  * update, and a k·dim collect (the centroid table is driver-sized by
  * definition). Rounds are driver-coordinated like every Lloyd's
  * implementation, including Spark MLlib's.
  */
object KMeans {

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))
  private val SumDec = DecimalType(27, 12)

  private def prep(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("x"))
      .localCheckpoint(false)

  private def assign(v: DataFrame,
      cents: Seq[(Int, Array[Double])]): DataFrame = {
    val xx = Similarity.dot(col("x"), col("x"))
    val cands = cents.map { case (cid, c) =>
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i) * c(i); i += 1 }
      val cLit = array(c.map(lit).toIndexedSeq: _*)
      struct(
        (xx - lit(2.0) * Similarity.dot(col("x"), cLit) + lit(cc))
          .as("d"),
        lit(cid).as("cid"))
    }
    v.withColumn("cluster",
      array_min(array(cands: _*)).getField("cid"))
  }

  // FIRST k by vec_id — not `vec_id < k`, which silently under-seeds
  // (or zero-seeds, nulling every assignment) on non-0-based id spaces
  // (review finding)
  private def initCents(v: DataFrame, k: Int): Seq[(Int, Array[Double])] =
    v.orderBy("vec_id").limit(k).collect()
      .zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Double](r.fieldIndex("x")).toArray
      }.toSeq

  /** One centroid update from the current assignment. Empty clusters drop
    * out (no members → no centroid) — the oracle mirrors this by
    * construction (its avg CTE has no row either).
    */
  private def updateCents(v: DataFrame,
      cents: Seq[(Int, Array[Double])]): Seq[(Int, Array[Double])] = {
    val means = assign(v, cents)
      .select(col("cluster"), posexplode(col("x")).as(Seq("pos", "val")))
      .groupBy("cluster", "pos")
      .agg((sum(col("val").cast(SumDec)).cast(DoubleType) /
        count(lit(1))).as("mu"))
      .collect()
    means.groupBy(_.getAs[Int]("cluster")).toSeq.sortBy(_._1)
      .map { case (cid, rows) =>
        val arr = new Array[Double](rows.length)
        rows.foreach(r => arr(r.getAs[Int]("pos")) = r.getAs[Double]("mu"))
        cid -> arr
      }
  }

  /** @param iters number of ASSIGNMENT rounds (iters − 1 centroid
    *              updates between them); returns (vec_id, cluster).
    */
  def fit(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 1)
    val v = prep(emb)
    var cents = initCents(v, k)
    for (_ <- 1 until iters) cents = updateCents(v, cents)
    assign(v, cents).select(col("vec_id"), col("cluster"))
  }

  /** Lloyd's with a CONVERGENCE stop (r7 verdict #6): rounds run until
    * the largest centroid L2 displacement in one update falls below
    * `eps` — the fixed-point test every production k-means uses instead
    * of a blind iteration count — or `maxIters` as the safety bound. A
    * cluster appearing or vanishing between rounds counts as
    * not-converged by definition. Returns (assignments, roundsRun) where
    * roundsRun counts centroid updates; at the fixed point one MORE
    * update cannot change any assignment (pinned by KMeansSpec), so
    * stopping early is exact, not approximate. Measured on the sf0.1
    * corpus (`ScaleProbe kmeans`: 2,000 vecs, k=8, eps=1e-9): converges
    * in 31 rounds at 0.54 s/round — the fixed-iteration default (2
    * rounds, the oracle's unrollable depth) underfits by design, and the
    * spec pins that the eps stop lands on the exact fixed point.
    */
  def fitConverged(emb: DataFrame, k: Int, maxIters: Int = 40,
      eps: Double = 1e-9): (DataFrame, Int) = {
    val v = prep(emb)
    var cents = initCents(v, k)
    var rounds = 0
    var moved = Double.MaxValue
    while (rounds < maxIters && moved >= eps) {
      val next = updateCents(v, cents)
      val prev = cents.toMap
      moved =
        if (next.map(_._1).toSet != prev.keySet) Double.MaxValue
        else next.map { case (cid, c) =>
          val p = prev(cid)
          math.sqrt(c.indices.map(i => (c(i) - p(i)) * (c(i) - p(i))).sum)
        }.max
      cents = next
      rounds += 1
    }
    (assign(v, cents).select(col("vec_id"), col("cluster")), rounds)
  }
}
