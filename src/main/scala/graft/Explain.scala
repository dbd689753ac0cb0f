package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected queries
  * (args) or a compact join/scan summary of every query. Used to keep the
  * plans honest — broadcasts where expected, filters pushed to scans, no
  * nested-loop joins anywhere.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = args.toSet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.isEmpty || wanted(name)) {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (wanted(name)) {
          println(s"===== $name =====")
          println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } else {
          val joins = plan.linesIterator
            .filter(l => l.contains("Join") || l.contains("Exchange")
              || l.contains("PushedFilters"))
            .map(_.trim.take(120)).toSeq
          println(s"===== $name =====")
          joins.foreach(l => println("  " + l))
        }
      }
    }
    spark.stop()
  }
}
