package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimensionsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupDimension keeps one deterministic row per key") {
    val df = Seq((1, "b"), (1, "a"), (2, "c")).toDF("id", "name")
    val out = Dimensions.dedupDimension(df, Seq("id"))
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "a") // min survivor, not arrival order
  }

  test("dateId is yyyyMMdd") {
    val out = Seq(java.sql.Date.valueOf("2021-12-03")).toDF("d")
      .select(Dimensions.dateId(col("d"))).head().getInt(0)
    assert(out == 20211203)
  }

  test("date attributes: weekend flag, quarter, day name") {
    val out = Dimensions.dateDim(
      Seq(
        java.sql.Date.valueOf("2021-12-04"),  // Saturday
        java.sql.Date.valueOf("2021-12-06")). // Monday
        toDF("d"), "d")
      .orderBy("date_id").collect()
    assert(out(0).getAs[Boolean]("is_weekend"))
    assert(!out(1).getAs[Boolean]("is_weekend"))
    assert(out(0).getAs[String]("day_of_week") == "Saturday")
    assert(out(1).getAs[Int]("quarter_num") == 4)
  }

  test("store/supplier dims dedup the denormalized product master") {
    val master = Seq(
      ("P1", "Cat", "2.50", 1, 9, "S1", "Sup9"),
      ("P2", "Cat", "3.00", 1, 9, "S1", "Sup9"),
      ("P3", "Cat", "4.00", 2, 13, "S2", "Sup13"))
      .toDF("Product_ID", "Product_Category", "price$",
        "storeID", "supplierID", "storeName", "supplierName")
    assert(Dimensions.storeDim(master).count() == 2)
    assert(Dimensions.supplierDim(master).count() == 2)
    val prods = Dimensions.productDim(master).orderBy("product_id").collect()
    assert(prods.length == 3)
    assert(prods(0).getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("2.50")) == 0)
  }
}
