package graft.streaming

import graft.SparkSpec
import graft.etl.FactBuilder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The HYBRIDJOIN-parity guarantee (SURVEY.md §5.3): the micro-batched
  * stream-static join produces exactly the batch join's fact table.
  */
case class Tx(order_id: String, customer_id: String, product_id: String,
    quantity: String, date: String)

class StreamingFactSpec extends SparkSpec {
  import spark.implicits._

  private val txRows = Seq(
    Tx("1", "1001", "P1", "4", "2020-01-02"),
    Tx("2", "1002", "P2", "1", "2020-02-03"),
    Tx("3", "9999", "P1", "2", "2020-01-02"), // unknown customer -> dropped
    Tx("4", "1001", "PX", "3", "2020-03-04"), // unknown product -> defaults
    Tx("5", "bad", "P1", "1", "2020-01-05"))  // bad key -> dropped

  private def dims = {
    val customers = Seq(1001, 1002).toDF("customer_id")
    val products = Seq(
      ("P1", BigDecimal("2.50"), 9, 3),
      ("P2", BigDecimal("10.00"), 13, 5))
      .toDF("product_id", "price", "supplier_id", "store_id")
      .withColumn("price", col("price").cast("decimal(12,2)"))
    (customers, products)
  }

  test("streaming fact equals batch fact on the same input") {
    implicit val sqlCtx = spark.sqlContext
    val (customers, products) = dims

    val batchOut = StreamingFact.plan(
      txRows.toDF(), customers, products)
      .orderBy("order_id").collect().toSeq

    val mem = MemoryStream[Tx]
    val streamOut = StreamingFact.plan(mem.toDF(), customers, products)
    val q = streamOut.writeStream
      .format("memory").queryName("fact_stream").outputMode("append").start()
    // two micro-batches: the "pull w tuples, probe, repeat" cycle
    mem.addData(txRows.take(2))
    q.processAllAvailable()
    mem.addData(txRows.drop(2))
    q.processAllAvailable()
    val streamed = spark.table("fact_stream").orderBy("order_id").collect().toSeq
    q.stop()

    assert(streamed == batchOut)
    assert(streamed.map(_.getAs[Long]("order_id")) == Seq(1L, 2L, 4L))
  }
}
