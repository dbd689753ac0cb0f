package graft
import org.apache.spark.sql.SparkSession
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
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
    val name = args(0)
    val fn = SparkEntry.queries(name)
    // warm
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        System.err.println(s"JOB ${j.jobId} start ${System.nanoTime()/1000000}")
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        System.err.println(s"JOB ${j.jobId} end ${System.nanoTime()/1000000}")
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
