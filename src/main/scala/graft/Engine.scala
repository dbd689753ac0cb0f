package graft

import org.apache.spark.sql.SparkSession
import graft.functions.GraftFunctions

/** One-call entry point for SQL-first users: registers every testdata
  * table as a temp view plus the engine's custom SQL functions, so
  * `spark.sql("SELECT rolling_hash(text) FROM documents ...")` works
  * immediately. The DataFrame-first surface stays `Tables` + the query
  * objects.
  */
object Engine {
  def init(spark: SparkSession, dir: String): Unit = {
    Tables.All.foreach { t =>
      val df =
        if (t == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
    GraftFunctions.register(spark)
  }
}
