package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract integrity — catches silent losses before the harness
  * does: duplicate query names would collapse Map entries; an oracle
  * without a query would never be checked.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("query names are unique (no Map collapse)") {
    val names = queries.Workload.all.map(_.name) ++
      queries.EtlQueries.all.map(_.name) ++
      queries.LlmQueries.all.map(_.name) ++
      queries.CurationQueries.all.map(_.name) ++
      queries.Dashboard.oracled.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct)}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle key has a query; plain-SQL oracles only") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    // single-statement SELECT/WITH only — the driver runs one statement
    SparkEntry.oracleSql.values.foreach { sql =>
      val head = sql.trim.split("\\s+").head.toUpperCase
      assert(head == "SELECT" || head == "WITH", s"unexpected head: $head")
      // semicolons INSIDE string literals are data (the crawl_text
      // entity vectors), not statement separators — blank out quoted
      // strings before checking
      val noStrings = sql.replaceAll("'[^']*'", "''")
      assert(!noStrings.trim.stripSuffix(";").contains(";"),
        "multi-statement oracle")
    }
  }

  test("coverage floor: at least 40 queries, at least 80% oracle-checked") {
    assert(SparkEntry.queries.size >= 40)
    assert(SparkEntry.oracleSql.size * 5 >= SparkEntry.queries.size * 4)
  }
}
