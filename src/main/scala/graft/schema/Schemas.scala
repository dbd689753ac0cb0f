package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for both star schemas (SURVEY.md §1.2/§1.3): the
  * walmart warehouse of the reference (star_schema.sql:16-67) and the
  * driver's testdata. Money is DecimalType — never double — per the
  * determinism discipline; ids are LongType where the reference's sample
  * data shows headroom pressure (order_id up to ~9.9M).
  */
object Schemas {

  // ---- walmart star (reference star_schema.sql) ----

  val customer: StructType = StructType(Seq(
    StructField("customer_id", IntegerType, nullable = false),
    StructField("gender", StringType),            // ENUM('M','F') as string
    StructField("age_group", StringType),         // 7 buckets
    StructField("occupation", IntegerType),
    StructField("city_category", StringType),
    StructField("marital_status", StringType),    // ENUM('0','1')
    StructField("stay_in_current_city_years", IntegerType)))

  val product: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("product_category", StringType),
    StructField("price", DecimalType(12, 2)),
    StructField("supplier_id", IntegerType),
    StructField("store_id", IntegerType)))

  val store: StructType = StructType(Seq(
    StructField("store_id", IntegerType, nullable = false),
    StructField("store_name", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("supplier_id", IntegerType, nullable = false),
    StructField("supplier_name", StringType)))

  val date: StructType = StructType(Seq(
    StructField("date_id", IntegerType, nullable = false),
    StructField("transaction_date", DateType),
    StructField("day_num", IntegerType),
    StructField("month_num", IntegerType),
    StructField("year", IntegerType),
    StructField("day_of_week", StringType),
    StructField("quarter_num", IntegerType),
    StructField("is_weekend", BooleanType)))

  val sales: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("customer_id", IntegerType, nullable = false),
    StructField("product_id", StringType, nullable = false),
    StructField("date_id", IntegerType, nullable = false),
    StructField("store_id", IntegerType),
    StructField("supplier_id", IntegerType),
    StructField("quantity", IntegerType),
    StructField("sales_amount", DecimalType(12, 2))))

  /** Raw transaction stream as read from CSV (all strings; normalization
    * casts them — hybridjoin.py:222-228).
    */
  val rawTransaction: StructType = StructType(Seq(
    StructField("orderID", StringType),
    StructField("Customer_ID", StringType),
    StructField("Product_ID", StringType),
    StructField("quantity", StringType),
    StructField("date", StringType)))
}

/** Typed rows for the Dataset[T] surface where compile-time field checks
  * help (fact building, streaming tests). The workload itself is
  * column-oriented, so DataFrame stays the primary abstraction.
  */
case class Sale(
    order_id: Long,
    customer_id: Int,
    product_id: String,
    date_id: Int,
    store_id: Int,
    supplier_id: Int,
    quantity: Int,
    sales_amount: java.math.BigDecimal)

case class NormalizedTx(
    order_id: Long,
    customer_id: Int,
    product_id: String,
    quantity: Int,
    tx_date: java.sql.Date)
