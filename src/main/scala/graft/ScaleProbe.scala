package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-behavior probes (run ad hoc, not part of the driver contract):
  *
  *  - `minhash` (default): replicates the documents corpus N× (distinct
  *    ids) and times the MinHash-LSH candidate stage at 1× and N×.
  *    Candidate generation is band-bucket equi-join with a bucket cap, so
  *    time should grow ~linearly in corpus size.
  *  - `topk`: times per-group top-5 as the window realization (full sort
  *    of every group) vs graft.functions.TopKAggregate (bounded heap,
  *    map-side combine, shuffles ≤ k×groups rows) on a synthetic tall
  *    input — the measurement behind the aggregate's scale claim.
  *
  * Usage: runMain graft.ScaleProbe [minhash [mult] | topk [rows] [groups]]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mode = if (args.nonEmpty) args(0) else "minhash"
    val mult =
      if (args.length > 1) args(1).toInt
      else if (args.nonEmpty && args(0).forall(_.isDigit)) args(0).toInt
      else 10
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "8") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (mode == "topk") {
      topkProbe(spark,
        if (args.length > 1) args(1).toLong else 20000000L,
        if (args.length > 2) args(2).toInt else 200)
      spark.stop()
      return
    }

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

    def run(m: Int): (Long, Long, Double) = {
      val d = (0 until m)
        .map(i => docs.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_ union _)
        .cache()
      val n = d.count()
      val t0 = System.nanoTime()
      val c = llm.Dedup.minhashCandidates(d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      d.unpersist()
      (n, c, dt)
    }

    run(1) // warm-up (codegen + cache machinery)
    val (n1, c1, t1) = run(1)
    val (nm, cm, tm) = run(mult)
    println(f"PROBE base: docs=$n1 candidates=$c1 time=$t1%.1fs")
    println(f"PROBE ${mult}x: docs=$nm candidates=$cm time=$tm%.1fs")
    println(f"PROBE ratio: size x$mult -> time x${tm / t1}%.1f " +
      f"(linear would be ~x$mult, quadratic ~x${mult * mult})")
    spark.stop()
  }

  /** Window-vs-TopKAggregate crossover measurement. Both plans read the
    * same cached input and produce identical top-5 sets (asserted); the
    * printed times are second-lap (post-JIT).
    */
  private def topkProbe(spark: SparkSession, rows: Long, groups: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(rows).select(
      (col("id") % groups).cast("string").as("g"),
      (pmod(hash(col("id")), lit(1000000)).cast("double")).as("score"),
      concat(lit("t"), pmod(col("id"), lit(99991))).as("tag"))
      .cache()
    val n = df.count()

    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("tag"))
    def windowPlan() = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("g"), col("tag"), col("score"))
    def aggPlan() = df.groupBy("g")
      .agg(functions.TopKAggregate.top_k(col("score"), col("tag"), 5).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.tag").as("tag"), col("t.score").as("score"))

    // same answer from both plans (modulo ties broken identically)
    val wSet = windowPlan().collect().map(_.toSeq).toSet
    val aSet = aggPlan().collect().map(_.toSeq).toSet
    require(wSet == aSet, s"plans disagree: ${wSet.size} vs ${aSet.size}")

    def time(f: () => Unit): Double = {
      f(); val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val tw = time(() => windowPlan().count())
    val ta = time(() => aggPlan().count())
    println(f"PROBE topk: rows=$n groups=$groups window=$tw%.2fs " +
      f"topk_agg=$ta%.2fs speedup=x${tw / ta}%.2f")
    df.unpersist()
  }
}
