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

/** Builder-time registration for library users:
  * SparkSession.builder().withExtensions(new GraftExtensions)… or
  * --conf spark.sql.extensions=graft.functions.GraftExtensions.
  * Injects the same functions as GraftFunctions.register, but into every
  * session derived from the builder.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAggregate].getName, "top_k"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "top_k(score, tag, k)")
        val k = exprs(2).eval(null).asInstanceOf[Number].intValue()
        TopKAggregate(exprs(0), exprs(1), k)
      }))
  }
}
