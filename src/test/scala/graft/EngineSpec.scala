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

  test("every custom expression is reachable from SQL") {
    Engine.init(spark, "/root/testdata/sf0.001")
    val r = spark.sql("""
      SELECT simhash64(transform(split(trim(text), '\\s+'), t -> xxhash64(t)))
               AS sh,
             minhash_signature(transform(split(trim(text), '\\s+'),
               t -> pmod(xxhash64(t), 2147483647)), 16) AS mh,
             bpe_token_count(text) AS bpe,
             dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
      FROM documents LIMIT 1""").head()
    assert(!r.isNullAt(0) && r.getSeq[Long](1).size == 16)
    assert(r.getInt(2) > 0 && r.getDouble(3) == 11.0)
    val bs = spark.sql(
      "SELECT byte_stats(CAST(text AS BINARY)) FROM documents LIMIT 1").head()
    assert(!bs.isNullAt(0))
  }
}
