package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-behavior probe: replicates the documents corpus N× (distinct ids)
  * and times the MinHash-LSH candidate stage at 1× and N×, printing the
  * scaling ratio. Candidate generation is band-bucket equi-join with a
  * bucket cap, so time should grow ~linearly in corpus size — this main
  * provides the measurement backing that claim (run ad hoc, not part of
  * the driver contract).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "8") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
}
