package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's custom Catalyst functions, so
  * `spark.sql("SELECT rolling_hash(text) ...")` works alongside the Column
  * API. Registered per-session (temp functions) — call once after session
  * creation.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "top_k",
      exprs => {
        require(exprs.length == 3, "top_k(score, tag, k)")
        val k = exprs(2).eval(null).asInstanceOf[Number].intValue()
        TopKAggregate(exprs(0), exprs(1), k)
      },
      "scala_udf")
  }
}
