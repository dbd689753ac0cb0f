package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Similarity.pcaPowerIteration two ways:
  *
  *  1. EXACT TRAJECTORY vs a from-scratch dense reimplementation of the
  *     same integer rules (quantize → d = q·v → y_j = Σ q_j·d →
  *     sign-split truncating rescale) — every (dim, y, v) value must be
  *     identical, so the distributed plan provably runs the same integer
  *     arithmetic as the spec's sequential fold.
  *  2. DIRECTION RECOVERY: on a frame planted along a known dominant
  *     axis plus small noise, the returned v must align with that axis
  *     (|cosine| > 0.99) — the iteration does what PCA is for, not just
  *     what the formula says.
  *
  * Edge case: the all-zero corpus short-circuits at m = 0 into the zero
  * vector instead of dividing (ANSI Spark would throw).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[Seq[Float]], iters: Int = 3) = {
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")
    Similarity.pcaPowerIteration(df, vecs.head.size, iters)
      .select("dim", "y", "v").as[(Int, Long, Long)].collect().sortBy(_._1)
  }

  /** From-scratch sequential replay of the identical integer rules. */
  private def naive(vecs: Seq[Seq[Float]], iters: Int): Seq[(Int, Long, Long)] = {
    val dim = vecs.head.size
    val q = vecs.map { v =>
      val d = v.map(_.toDouble)
      val s = d.map(math.abs).max
      if (s == 0) Array.fill(dim)(0L)
      else d.map(x => math.floor(x * 127.0 / s + 0.5).toLong).toArray
    }
    var v = Array.fill(dim)(1L)
    var y = Array.fill(dim)(0L)
    for (_ <- 1 to iters) {
      val d = q.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      y = Array.tabulate(dim)(j => q.zip(d).map { case (row, di) => row(j) * di }.sum)
      val m = y.map(math.abs).max
      v = y.map(yj =>
        if (m == 0) 0L else math.signum(yj) * (math.abs(yj) * 1024 / m))
    }
    (0 until dim).map(j => (j, y(j), v(j)))
  }

  test("distributed trajectory == sequential integer replay") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(40)(Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    assert(run(vecs).toSeq === naive(vecs, 3))
  }

  test("recovers a planted dominant direction") {
    val rnd = new scala.util.Random(11)
    val axis = Seq(0.9f, -0.3f, 0.2f, 0.1f, -0.2f, 0.05f, 0.0f, 0.15f)
    val vecs = Seq.fill(60) {
      val scale = (rnd.nextDouble() * 2 - 1).toFloat * 5
      axis.map(a => a * scale + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
    }
    val v = run(vecs).map(_._3.toDouble)
    val a = axis.map(_.toDouble)
    val cos = v.zip(a).map { case (x, b) => x * b }.sum /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(a.map(x => x * x).sum))
    assert(math.abs(cos) > 0.99, s"|cos|=${math.abs(cos)}")
  }

  test("all-zero corpus short-circuits to the zero vector") {
    val got = run(Seq.fill(5)(Seq.fill(4)(0.0f)))
    assert(got.forall { case (_, y, v) => y == 0L && v == 0L })
  }
}
