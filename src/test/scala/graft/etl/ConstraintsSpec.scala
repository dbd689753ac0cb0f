package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1, 5, "M"), (2, -1, "F"), (3, 0, "X"), (4, 2, null))
    .toDF("id", "qty", "gender")

  test("checkReport counts violations per constraint, nulls violate") {
    val out = Constraints.checkReport(df, Seq(
      Constraints.Check("qty_nonneg", col("qty") >= 0),
      Constraints.inDomain("gender", Seq("M", "F"))))
      .orderBy("constraint_name").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("gender_domain", 2L), // X and null
      ("qty_nonneg", 1L)))   // -1
  }

  test("fkViolations returns exactly the orphan rows") {
    val dim = Seq(1, 2).toDF("k")
    val fact = Seq((10, 1), (11, 3), (12, 2), (13, 9)).toDF("rid", "fk")
    val orphans = Constraints.fkViolations(fact, dim, "fk", "k")
      .select("rid").collect().map(_.getInt(0)).sorted
    assert(orphans.toSeq == Seq(11, 13))
  }

  test("clean data yields an all-zero but complete report") {
    val out = Constraints.checkReport(df.filter($"id" === 1),
      Seq(Constraints.Check("qty_nonneg", col("qty") >= 0),
        Constraints.inDomain("gender", Seq("M", "F"))))
      .collect()
    assert(out.length == 2 && out.forall(_.getLong(1) == 0L))
  }
}
