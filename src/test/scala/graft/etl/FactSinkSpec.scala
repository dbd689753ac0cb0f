package graft.etl

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class FactSinkSpec extends SparkSpec {
  import spark.implicits._

  private def fact = {
    val customers = Seq(1001).toDF("customer_id")
    val products = Seq(("P1", BigDecimal("2.00"), 9, 3))
      .toDF("product_id", "price", "supplier_id", "store_id")
      .withColumn("price", col("price").cast("decimal(12,2)"))
    val tx = Seq(
      (1L, 1001, "P1", 1, java.sql.Date.valueOf("2020-01-02")),
      (2L, 1001, "P1", 2, java.sql.Date.valueOf("2020-02-03")),
      (3L, 1001, "P1", 3, java.sql.Date.valueOf("2020-02-20")))
      .toDF("order_id", "customer_id", "product_id", "quantity", "tx_date")
    FactBuilder.buildFact(tx, customers, products)
  }

  test("writeFact partitions by month and prunes on read") {
    val out = Files.createTempDirectory("graft_fact_sink").toString + "/fact"
    FactBuilder.writeFact(fact, out, mode = "overwrite")
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("month_id=202001", "month_id=202002"))
    val pruned = spark.read.parquet(out).filter(col("month_id") === 202002)
    assert(pruned.count() == 2)
    // partition pruning visible in the plan: only one partition read
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"))
  }

  test("fact round-trips through ORC and schema'd JSON unchanged") {
    val base = fact.orderBy("order_id")
    val expected = base.collect().toSeq
    val dir = Files.createTempDirectory("graft_formats").toString

    base.write.mode("overwrite").orc(s"$dir/fact_orc")
    val fromOrc = spark.read.orc(s"$dir/fact_orc").orderBy("order_id")
    assert(fromOrc.collect().toSeq == expected)
    // ORC preserves names and types (nullability is always relaxed on read)
    assert(fromOrc.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      base.schema.fields.map(f => (f.name, f.dataType)).toSeq)

    base.write.mode("overwrite").json(s"$dir/fact_json")
    val fromJson = spark.read.schema(base.schema).json(s"$dir/fact_json")
      .orderBy("order_id")
    assert(fromJson.collect().toSeq == expected)
  }

  test("buildFactTyped returns a Dataset[Sale] with exact decimal amounts") {
    val ds = {
      val customers = Seq(1001).toDF("customer_id")
      val products = Seq(("P1", BigDecimal("2.00"), 9, 3))
        .toDF("product_id", "price", "supplier_id", "store_id")
        .withColumn("price", col("price").cast("decimal(12,2)"))
      val tx = Seq((1L, 1001, "P1", 3, java.sql.Date.valueOf("2020-01-02")))
        .toDF("order_id", "customer_id", "product_id", "quantity", "tx_date")
      FactBuilder.buildFactTyped(tx, customers, products)
    }
    val sale = ds.head()
    assert(sale.order_id == 1L && sale.quantity == 3)
    assert(sale.sales_amount.compareTo(new java.math.BigDecimal("6.00")) == 0)
  }
}
