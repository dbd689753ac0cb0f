package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for targeted perf work: same session shape
  * and noop-sink action as graft.Bench, but for the named queries only —
  * iterating on one operator must not cost a full-suite lap.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.TimeOne <query> [query...]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeOne <query> [query ...]")
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
        val df =
          if (t == "events") Tables.events(spark, sfDir)
          else Tables.load(spark, sfDir, t)
        df.cache().count()
      } catch { case _: Throwable => () }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      def lap(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      lap() // warm-up
      val laps = Seq(lap(), lap(), lap())
      println(f"TIME $name min=${laps.min}%.3f laps=${laps.map(l => f"$l%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
