package graft

class EngineSpec extends SparkSpec {

  test("Engine.init registers views + functions; SQL workload runs") {
    Engine.init(spark, "/root/testdata/sf0.001")
    val out = spark.sql("""
      SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
             AS DECIMAL(18,2)) AS sum_qty,
             top_k(CAST(l_extendedprice AS DOUBLE),
                   CAST(l_orderkey AS STRING), 3) AS top_items
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getSeq[Any](2).size <= 3))
    val fp = spark.sql(
      "SELECT rolling_hash(text) FROM documents LIMIT 1").head()
    assert(!fp.isNullAt(0))
  }
}
