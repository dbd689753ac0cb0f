package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch fact construction with HYBRIDJOIN's join semantics
  * (/root/reference/hybridjoin.py:267-487), re-expressed as a declarative
  * star-enrichment plan:
  *
  *  - inner join to Customer — unmatched stream tuples are silently dropped,
  *    exactly the reference's anti-membership discard (hybridjoin.py:342-362);
  *  - left join to Product with default fill price=0.00 / supplier=1 /
  *    store=1 on miss (hybridjoin.py:109-113,399-404);
  *  - sales_amount = round(quantity * price, 2) in exact decimal
  *    (hybridjoin.py:410-413);
  *  - deterministic date_id (replaces the MAX+1 counter,
  *    hybridjoin.py:149-205).
  *
  * Scale notes: both dimensions are broadcast (5,891 customers / 3,631
  * products in the reference fixtures — and any realistically-sized dim);
  * the fact side streams through a broadcast hash join with zero shuffles.
  * At 100 TB the same plan holds: dims stay broadcast-able, the fact scan
  * partitions by file split, and no stage requires co-partitioning.
  */
object FactBuilder {
  private val Money = DecimalType(12, 2)

  val DefaultSupplierId = 1 // hybridjoin.py:17
  val DefaultStoreId    = 1 // hybridjoin.py:18

  /** Enrich normalized transactions (Normalize.normalizeTransactions output)
    * into the Sales fact. Output: order_id, customer_id, product_id,
    * date_id, store_id, supplier_id, quantity, sales_amount.
    *
    * `broadcastDims = false` drops the broadcast hints for dimensions too
    * large for executor memory — the plan degrades to shuffled joins
    * (AQE still broadcasts if runtime stats allow), same results.
    */
  def buildFact(tx: DataFrame, customerDim: DataFrame,
      productDim: DataFrame, broadcastDims: Boolean = true): DataFrame = {
    def hint(df: DataFrame) = if (broadcastDims) broadcast(df) else df
    val cust = hint(customerDim.select("customer_id"))
    val prod = hint(productDim
      .select("product_id", "price", "supplier_id", "store_id"))
    tx
      .join(cust, Seq("customer_id"), "inner") // referential filter (F10/J6)
      .join(prod, Seq("product_id"), "left")   // enrichment with defaults (F9/J7)
      .select(
        col("order_id"), col("customer_id"), col("product_id"),
        Dimensions.dateId(col("tx_date")).as("date_id"),
        coalesce(col("store_id"), lit(DefaultStoreId)).as("store_id"),
        coalesce(col("supplier_id"), lit(DefaultSupplierId)).as("supplier_id"),
        col("quantity"),
        round(col("quantity").cast(Money) *
          coalesce(col("price"), lit(0).cast(Money)), 2)
          .cast(Money).as("sales_amount"))
  }

  /** Typed view of the fact for callers who want compile-time field checks
    * (Dataset[Sale]); the plan is identical — Encoders add no runtime cost
    * until an action materializes objects.
    */
  def buildFactTyped(tx: DataFrame, customerDim: DataFrame,
      productDim: DataFrame): org.apache.spark.sql.Dataset[graft.schema.Sale] = {
    val df = buildFact(tx, customerDim, productDim)
    import df.sparkSession.implicits._
    df.select(
      col("order_id"), col("customer_id"), col("product_id"), col("date_id"),
      col("store_id"), col("supplier_id"), col("quantity"),
      col("sales_amount").cast(DecimalType(12, 2)).as("sales_amount"))
      .as[graft.schema.Sale]
  }

  /** Scale-aware fact sink: month-partitioned parquet
    * (date_id div 100 = yyyyMM). Partition count stays bounded (one per
    * month) while partition pruning serves the workload's dominant filter
    * axis (year/month); day-level partitioning would create 30× the
    * directories for no extra pruning power on this workload.
    */
  def writeFact(fact: DataFrame, path: String,
      mode: String = "append"): Unit =
    fact
      .withColumn("month_id", expr("date_id div 100"))
      // cluster rows inside each file by the secondary filter axes so
      // parquet row-group min/max statistics skip data on
      // date_id/customer_id predicates (poor-man's z-order)
      .sortWithinPartitions("date_id", "customer_id")
      .write.mode(mode)
      .partitionBy("month_id")
      .parquet(path)

  /** Optional dense sales_id via row_number over a total order — only when a
    * dense key is genuinely required; it forces a global sort, so the default
    * fact output omits it (SURVEY.md §2.3 F8).
    */
  def withSalesId(fact: DataFrame): DataFrame = {
    val w = Window.orderBy("order_id", "product_id", "customer_id", "date_id")
    fact.withColumn("sales_id", row_number().over(w).cast(LongType))
  }
}
