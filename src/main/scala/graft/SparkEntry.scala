package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CurationQueries, Dashboard, EtlQueries, LlmQueries, QueryDef, Workload}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries come from the re-targeted reference workload
  * (queries/Workload.scala, Q1–Q20 of /root/reference/queries.sql) plus the
  * ETL family (queries/EtlQueries.scala) and the LLM-pipeline operators.
  */
object SparkEntry {
  private def defs: Seq[QueryDef] =
    Workload.all ++ EtlQueries.all ++ LlmQueries.all ++ CurationQueries.all ++ Dashboard.oracled

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Workload.q01.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
