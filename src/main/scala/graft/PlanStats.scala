package graft

import org.apache.spark.sql.SparkSession

/** Dev probe behind the PlanSweep plan-size tripwire (r13 verdict #2):
  * prints every registered query's optimized-plan expression-node count,
  * descending — the metric the tripwire bounds. The r13 bench timeout
  * was a PLAN-size explosion (llm_source_tarxz re-inlined the tar
  * builder ~150-200×, broadcasting 78-107 MiB task binaries) that no
  * row-oriented gate could see; this is the ruler for that axis.
  * Usage: runMain graft.PlanStats [sfDir]
  */
object PlanStats {
  def exprNodes(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(e => e.collect { case _ => 1L }.sum).sum
    }.sum

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = SparkEntry.queries.toSeq.map { case (n, f) =>
      n -> (try exprNodes(f(spark, dir)) catch { case e: Throwable => -1L })
    }.sortBy(-_._2)
    counts.foreach { case (n, c) => println(f"PLAN $c%8d $n") }
    spark.stop()
  }
}
