package graft

import org.apache.spark.sql.SparkSession

/** Micro-probe for driver-side plan cost of one query: times DataFrame
  * construction (fn — includes any eager work the builder does),
  * analysis, optimization, and physical planning separately, twice.
  * Usage: runMain graft.PlanTime <query> [query...]
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.All.foreach { t =>
      try {
        val df = if (t == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, t)
        df.cache().count()
      } catch { case _: Throwable => () }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm lap
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.analyzed
        val t2 = System.nanoTime()
        df.queryExecution.optimizedPlan
        val t3 = System.nanoTime()
        df.queryExecution.executedPlan
        val t4 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t5 = System.nanoTime()
        def d(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
        println(s"PLANTIME $name lap$i fn=${d(t0, t1)} analyze=${d(t1, t2)}" +
          s" optimize=${d(t2, t3)} physical=${d(t3, t4)} exec=${d(t4, t5)}")
      }
    }
    spark.stop()
  }
}
