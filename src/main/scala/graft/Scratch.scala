package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway experiment harness for the r16 optimization round —
  * A/B timings of candidate rewrites before they touch a query.
  * Not part of the driver contract; deleted or inert when idle.
  */
object Scratch {
  def time(label: String)(df: => DataFrame): Unit = {
    def lap(): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    lap() // warm
    val laps = Seq(lap(), lap(), lap())
    println(f"SCRATCH $label min=${laps.min}%.3f laps=${laps.map(l => f"$l%.3f").mkString(",")}")
  }

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
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val m = i.taskMetrics
          val wall = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(-1L)
          System.err.println(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"wall=${wall}ms exec=${if (m != null) m.executorRunTime else -1}ms " +
            f"recordsIn=${if (m != null) m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead else -1} " +
            i.name.take(60))
        }
      })
    Tables.All.foreach { t =>
      try {
        val df = if (t == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, t)
        df.cache().count()
      } catch { case _: Throwable => () }
    }
    val name = args.headOption.getOrElse("etl_entity_fuzzy_pairs")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    System.err.println("==== WARM DONE ====")
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime()-t0)/1e9}%.2f")
    spark.stop()
  }
}
