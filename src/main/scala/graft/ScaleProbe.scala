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
  *  - `cc`: times min-label propagation vs large-star/small-star
  *    contraction on deep-chain graphs — the measurement behind the
  *    O(d)-vs-O(log d) rounds claim in Dedup.connectedComponentsStar.
  *
  * Usage: runMain graft.ScaleProbe
  *   [minhash [mult] | topk [rows] [groups] | cc [chainLen] [nChains]]
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
    if (mode == "cc") {
      ccProbe(spark,
        if (args.length > 1) args(1).toInt else 120,
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

  /** Label-propagation vs star-contraction on deep graphs: nChains
    * disjoint chains of length chainLen (diameter = chainLen - 1). Both
    * must produce identical components; propagation needs ~chainLen
    * rounds, star contraction ~log2(chainLen).
    */
  private def ccProbe(spark: SparkSession, chainLen: Int, nChains: Int): Unit = {
    val pairs = spark.range(nChains.toLong * chainLen)
      .filter(col("id") % chainLen =!= (chainLen - 1))
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (prop, tp) = time(
      llm.Dedup.connectedComponents(pairs, maxIter = chainLen + 2)
        .orderBy("id").collect().toSeq)
    val (star, ts) = time(
      llm.Dedup.connectedComponentsStar(pairs)
        .orderBy("id").collect().toSeq)
    require(prop.map(_.toSeq) == star.map(_.toSeq), "components disagree")
    println(f"PROBE cc: chains=$nChains len=$chainLen " +
      f"propagation=$tp%.1fs star=$ts%.1fs speedup=x${tp / ts}%.2f")
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
