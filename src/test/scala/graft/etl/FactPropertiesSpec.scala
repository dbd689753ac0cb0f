package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2) over the fact builder and the
  * aggregate algebra. Raw ScalaCheck generators driven by fixed seeds (the
  * scalatest bridge isn't on the offline classpath) — deterministic runs,
  * and each seed exercises a different generated input including the
  * degenerate shapes (empty, all-unknown keys, zero quantities).
  */
class FactPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val txGen: Gen[List[(Long, Int, String, Int, java.sql.Date)]] =
    Gen.listOf(for {
      order <- Gen.choose(1L, 20L)
      cust <- Gen.choose(1000, 1010)
      prod <- Gen.oneOf("P1", "P2", "P3", "PX", "PY")
      qty <- Gen.choose(0, 9)
      day <- Gen.choose(1, 28)
    } yield (order, cust, prod, qty, java.sql.Date.valueOf(f"2020-01-$day%02d")))

  private def samples(n: Int): Seq[List[(Long, Int, String, Int, java.sql.Date)]] =
    (0 until n).flatMap(i =>
      txGen.apply(Gen.Parameters.default.withSize(30), Seed(42L + i)))

  private val customers = (1000 to 1005).toDF("customer_id")
  private val products = Seq(
    ("P1", BigDecimal("2.50"), 9, 3),
    ("P2", BigDecimal("0.99"), 13, 5),
    ("P3", BigDecimal("79.95"), 16, 2))
    .toDF("product_id", "price", "supplier_id", "store_id")
    .withColumn("price", col("price").cast("decimal(12,2)"))

  test("fact invariants: row bound, referential integrity, exact amounts") {
    samples(5).foreach { rows =>
      val tx = rows.toDF("order_id", "customer_id", "product_id",
        "quantity", "tx_date")
      val fact = FactBuilder.buildFact(tx, customers, products).cache()
      try {
        assert(fact.count() <= rows.size)
        assert(fact.join(customers, Seq("customer_id"), "left_anti").isEmpty)
        val prices = Map("P1" -> BigDecimal("2.50"), "P2" -> BigDecimal("0.99"),
          "P3" -> BigDecimal("79.95"))
        fact.collect().foreach { r =>
          val expected = prices.getOrElse(r.getAs[String]("product_id"),
            BigDecimal(0)) * r.getAs[Int]("quantity")
          assert(BigDecimal(r.getAs[java.math.BigDecimal]("sales_amount"))
            == expected.setScale(2))
        }
      } finally fact.unpersist()
    }
  }

  test("rollup grand total equals ungrouped sum") {
    samples(5).filter(_.nonEmpty).foreach { rows =>
      val tx = rows.toDF("order_id", "customer_id", "product_id",
        "quantity", "tx_date")
      val fact = FactBuilder.buildFact(tx, customers, products)
      val grand = fact.rollup(col("store_id"), col("supplier_id"))
        .agg(sum("sales_amount").as("total"))
        .filter(col("store_id").isNull && col("supplier_id").isNull)
        .select("total").collect()
      val direct = fact.agg(sum("sales_amount")).head()
      if (direct.isNullAt(0)) assert(grand.isEmpty || grand.head.isNullAt(0))
      else assert(grand.head.getDecimal(0).compareTo(direct.getDecimal(0)) == 0)
    }
  }

  test("LAG growth is null exactly on first row per partition or prev=0") {
    samples(5).filter(_.nonEmpty).foreach { rows =>
      val tx = rows.toDF("order_id", "customer_id", "product_id",
        "quantity", "tx_date")
      val fact = FactBuilder.buildFact(tx, customers, products)
      val daily = fact.groupBy("product_id", "date_id")
        .agg(sum("sales_amount").cast("double").as("rev"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("product_id").orderBy("date_id")
      val out = daily
        .withColumn("prev", lag(col("rev"), 1).over(w))
        .withColumn("g", (col("rev") - col("prev"))
          / when(col("prev") === 0.0, lit(null)).otherwise(col("prev")) * 100)
        .collect()
      out.foreach { r =>
        val gNull = r.isNullAt(r.fieldIndex("g"))
        val prevNullOrZero = r.isNullAt(r.fieldIndex("prev")) ||
          r.getDouble(r.fieldIndex("prev")) == 0.0
        assert(gNull == prevNullOrZero)
      }
    }
  }
}
