package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FactBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def dims = {
    val customers = Seq(1001, 1002).toDF("customer_id")
    val products = Seq(
      ("P1", BigDecimal("2.50"), 9, 3),
      ("P2", BigDecimal("10.00"), 13, 5))
      .toDF("product_id", "price", "supplier_id", "store_id")
      .withColumn("price", col("price").cast("decimal(12,2)"))
    (customers, products)
  }

  private def tx = Seq(
    (1L, 1001, "P1", 4, java.sql.Date.valueOf("2020-01-02")),
    (2L, 1002, "P2", 1, java.sql.Date.valueOf("2020-02-03")),
    (3L, 9999, "P1", 2, java.sql.Date.valueOf("2020-01-02")), // unknown cust
    (4L, 1001, "PX", 3, java.sql.Date.valueOf("2020-03-04"))) // unknown prod
    .toDF("order_id", "customer_id", "product_id", "quantity", "tx_date")

  test("inner join drops stream tuples with unknown customer (hybridjoin drop)") {
    val (c, p) = dims
    val out = FactBuilder.buildFact(tx, c, p)
    assert(out.select("order_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 4L))
  }

  test("left product join fills defaults: price 0.00, supplier 1, store 1") {
    val (c, p) = dims
    val r = FactBuilder.buildFact(tx, c, p)
      .filter($"order_id" === 4L).head()
    assert(r.getAs[Int]("supplier_id") == FactBuilder.DefaultSupplierId)
    assert(r.getAs[Int]("store_id") == FactBuilder.DefaultStoreId)
    assert(r.getAs[java.math.BigDecimal]("sales_amount")
      .compareTo(java.math.BigDecimal.ZERO) == 0)
  }

  test("sales_amount = round(qty * price, 2) exactly; date_id deterministic") {
    val (c, p) = dims
    val r = FactBuilder.buildFact(tx, c, p)
      .filter($"order_id" === 1L).head()
    assert(r.getAs[java.math.BigDecimal]("sales_amount")
      .compareTo(new java.math.BigDecimal("10.00")) == 0)
    assert(r.getAs[Int]("date_id") == 20200102)
  }

  test("invariants: output rows <= input; all customers referenced exist") {
    val (c, p) = dims
    val out = FactBuilder.buildFact(tx, c, p)
    assert(out.count() <= tx.count())
    val known = c.collect().map(_.getInt(0)).toSet
    assert(out.select("customer_id").collect().forall(r => known(r.getInt(0))))
  }

  test("broadcastDims=false produces identical results via shuffled joins") {
    val (c, p) = dims
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = FactBuilder.buildFact(tx, c, p, broadcastDims = false)
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(shuffled.orderBy("order_id").collect().toSeq ==
        FactBuilder.buildFact(tx, c, p).orderBy("order_id").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("withSalesId assigns dense 1..n ids") {
    val (c, p) = dims
    val out = FactBuilder.withSalesId(FactBuilder.buildFact(tx, c, p))
    assert(out.select("sales_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }
}
