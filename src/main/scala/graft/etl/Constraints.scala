package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks replacing the reference's database
  * constraints (star_schema.sql:16-67: CHECK quantity >= 0,
  * sales_amount >= 0, price > 0, five foreign keys) — in the reference,
  * PostgreSQL enforced these at INSERT time; on a lakehouse the engine
  * validates them as set-oriented scans that fuse with other work.
  */
object Constraints {

  final case class Check(name: String, predicate: Column)

  /** Count violations per CHECK — one aggregating pass, no row explosion:
    * returns (constraint, n_violations) with a row per check even when
    * clean (n=0), so reports are stable and diffable.
    */
  def checkReport(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val agg = checks.map(c =>
      sum(when(!coalesce(c.predicate, lit(false)), 1L).otherwise(0L))
        .as(c.name))
    val wide = df.agg(agg.head, agg.tail: _*)
    // unpivot to (constraint, n_violations)
    wide.selectExpr(
      s"stack(${checks.size}, " +
        checks.map(c => s"'${c.name}', ${c.name}").mkString(", ") +
        ") AS (constraint_name, n_violations)")
  }

  /** Referential-integrity violations: fact keys absent from the
    * dimension (left-anti). Returns violating fact rows; count it for a
    * report, keep it for quarantine.
    */
  def fkViolations(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String): DataFrame =
    fact.join(dim, fact(factKey) === dim(dimKey), "left_anti")

  /** Enum-domain check (the reference's gender/marital/age enums become
    * string-domain validations, SURVEY.md §1.3).
    */
  def inDomain(colName: String, allowed: Seq[String]): Check =
    Check(s"${colName}_domain", col(colName).isin(allowed: _*))
}
