package graft

import org.apache.spark.sql.SparkSession

/** Perf-triage main (r16 optimization round): splits a warm lap of each
  * named query into DRIVER PLANNING (DataFrame construction + analysis +
  * optimization + physical planning, forced via executedPlan) and
  * EXECUTION (the noop-sink write), and counts the scheduler jobs the
  * execution submits. Separates "Catalyst/AQE overhead" from "cluster
  * work" — the split graft.Bench's single wall number cannot see.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.PhaseProbe <query> [...]
  *        (no args = every query, compact one-line-per-query output)
  */
object PhaseProbe {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      try {
        // warm lap: JIT + codegen + shuffle files
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        def one(): (Double, Double, Int) = {
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.queryExecution.executedPlan // force analysis+optimization+planning
          val t1 = System.nanoTime()
          val j0 = jobs.get()
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9, jobs.get() - j0)
        }
        val laps = Seq(one(), one())
        val best = laps.minBy(l => l._1 + l._2)
        println(f"PHASE $name plan=${best._1}%.3f exec=${best._2}%.3f jobs=${best._3}")
      } catch {
        case e: Throwable =>
          println(s"PHASE $name FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
