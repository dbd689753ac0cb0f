package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.etl.{Dimensions, FactBuilder, Normalize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S4 end-to-end: header'd CSV files streaming into a parquet fact with
  * checkpointed exactly-once sink — the full HYBRIDJOIN pipeline shape
  * (CSV stream loader hybridjoin.py:220-233 → join → batched sink
  * hybridjoin.py:449-486), including master-CSV ingest with the pandas
  * index column.
  */
class CsvStreamE2ESpec extends SparkSpec {
  import spark.implicits._

  private val txSchema = StructType(Seq(
    StructField("orderID", StringType),
    StructField("Customer_ID", StringType),
    StructField("Product_ID", StringType),
    StructField("quantity", StringType),
    StructField("date", StringType)))

  test("CSV files -> streaming fact -> parquet, two files, exactly-once") {
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val out = Files.createTempDirectory("graft_stream_out").toString + "/fact"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    Files.writeString(java.nio.file.Paths.get(s"$dir/part1.csv"),
      """orderID,Customer_ID,Product_ID,quantity,date
        |1,1001,P1,2,2020-01-02
        |2,1002,P2,1,2020-02-03
        |3,9999,P1,2,2020-01-02
        |""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/part2.csv"),
      """orderID,Customer_ID,Product_ID,quantity,date
        |4,1001,PX,3,2020-03-04
        |5,1002,P1,1,05-03-2020
        |""".stripMargin)

    val customers = Seq(1001, 1002).toDF("customer_id")
    val products = Seq(("P1", "2.50", 9, 3), ("P2", "10.00", 13, 5))
      .toDF("product_id", "price", "supplier_id", "store_id")
      .withColumn("price", col("price").cast("decimal(12,2)"))

    val q = StreamingFact.runCsvToParquet(spark, dir, txSchema,
      customers, products, out, ckpt, maxFilesPerTrigger = 1)
    q.awaitTermination()

    val fact = spark.read.parquet(out)
    assert(fact.select("order_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 4L, 5L)) // 9999 dropped by the referential inner join
    assert(fact.filter($"order_id" === 5L).head().getAs[Int]("date_id")
      == 20200305) // dd-MM-yyyy parsed
    // two micro-batches (maxFilesPerTrigger=1) -> two batch_id partitions
    assert(fact.select("batch_id").distinct().count() == 2)
    // restart with same checkpoint: nothing new to process, no duplicates
    val q2 = StreamingFact.runCsvToParquet(spark, dir, txSchema,
      customers, products, out, ckpt, maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 4)
  }

  test("readMasterCsv drops the pandas index column and keeps quoted fields") {
    val dir = Files.createTempDirectory("graft_master_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/products.csv"),
      """,Product_ID,Product_Category,price$,storeID,supplierID,storeName,supplierName
        |0,P001,"Books, Movies & Music",5.25,2,13,Tech Haven,Samsung Electronics
        |1,P002,Electronics,10.00,1,9,Electro Mart,Canon Inc.
        |""".stripMargin)
    val df = Dimensions.readMasterCsv(spark, dir)
    assert(!df.columns.contains("_c0"))
    val prods = Dimensions.productDim(df).orderBy("product_id").collect()
    assert(prods.length == 2)
    assert(prods(0).getAs[String]("product_category") == "Books, Movies & Music")
    assert(prods(0).getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("5.25")) == 0)
    assert(Dimensions.storeDim(df).count() == 2)
  }
}
