package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins.
  *
  * AQE's skew-join split handles most hot keys automatically; salting is
  * the explicit tool for the cases AQE can't reach — a skewed GROUP BY, or
  * a hot key known in advance (e.g. the null-ish default customer every
  * malformed event maps to). Mechanics:
  *
  *  - fact side: key -> (key, salt) with salt = pmod(hash(entire row), n)
  *    spreading one hot key over n shuffle partitions;
  *  - dim side: replicated n times via explode(sequence(0, n-1)) so every
  *    salted fact key finds its dimension row.
  *
  * Replication multiplies the dim side by n, so n stays small (8–32) and
  * the dim side must be the small one — which is exactly the skewed-join
  * shape (many fact rows per hot dim key).
  */
object SkewJoin {

  /** Salted inner equi-join of a skewed fact against a small dimension. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. Turns one shuffle with a hot key into
    * two balanced shuffles; correct for any commutative re-aggregable
    * pair (sum/sum, count/sum, min/min, max/max).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
