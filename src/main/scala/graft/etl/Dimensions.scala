package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dimension construction (SURVEY.md §2.2 S2/S5, §2.3 F7/F8), replacing the
  * reference's pandas `drop_duplicates` + INSERT notebook path
  * (/root/reference/master_data.ipynb cells bfa480a3–168be966) and its
  * stateful date-dimension upsert (/root/reference/hybridjoin.py:149-205)
  * with deterministic, distributed builds.
  */
object Dimensions {
  private val Price = DecimalType(12, 2)

  /** CSV master-data source (S2): header'd, quoted fields (categories carry
    * embedded commas), leading unnamed pandas index column dropped — the
    * reference CSVs' exact shape (FIXTURES.md §B1/§B2).
    */
  def readMasterCsv(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
    // pandas' to_csv writes the index as an unnamed first column
    val first = raw.columns.head
    if (first.isEmpty || first.startsWith("_c0") || first == "Unnamed: 0")
      raw.drop(first)
    else raw
  }

  /** Dedup a denormalized master frame into a dimension on `keyCols`.
    * Uses groupBy + min instead of dropDuplicates so the surviving row is
    * deterministic under any partitioning (dropDuplicates keeps an arbitrary
    * row per key — fine single-threaded, not reproducible on a cluster).
    */
  def dedupDimension(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(keyCols.contains)
    if (others.isEmpty) df.distinct()
    else df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(min(others.head).as(others.head),
        others.tail.map(c => min(c).as(c)).toIndexedSeq: _*)
  }

  /** Store dim from the denormalized product master
    * (product_master_data.csv carries storeID/storeName per row).
    */
  def storeDim(productMaster: DataFrame): DataFrame =
    dedupDimension(
      productMaster.select(
        col("storeID").cast(IntegerType).as("store_id"),
        col("storeName").cast(StringType).as("store_name")),
      Seq("store_id"))

  /** Supplier dim, same source. */
  def supplierDim(productMaster: DataFrame): DataFrame =
    dedupDimension(
      productMaster.select(
        col("supplierID").cast(IntegerType).as("supplier_id"),
        col("supplierName").cast(StringType).as("supplier_name")),
      Seq("supplier_id"))

  /** Product dim: id, category, price (exact decimal), plus the
    * supplier/store keys the reference's cache loader probes for
    * (hybridjoin.py:87-113).
    */
  def productDim(productMaster: DataFrame): DataFrame =
    dedupDimension(
      productMaster.select(
        col("Product_ID").cast(StringType).as("product_id"),
        col("Product_Category").cast(StringType).as("product_category"),
        expr("try_cast(regexp_replace(`price$`, '[$,]', '') AS DECIMAL(12,2))")
          .as("price"),
        col("supplierID").cast(IntegerType).as("supplier_id"),
        col("storeID").cast(IntegerType).as("store_id")),
      Seq("product_id"))

  /** F8: deterministic surrogate date key — yyyyMMdd as INT. Replaces the
    * reference's MAX(date_id)+1 counter (hybridjoin.py:149-205), which
    * cannot work on a distributed engine and is not reproducible.
    */
  def dateId(d: Column): Column =
    (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast(IntegerType)

  /** F7: full date-dimension attribute derivation (hybridjoin.py:170-177,
    * 193-199): dayNum/monthNum/year/dayofweek-name/quarter/is_weekend.
    */
  def dateAttributes(d: Column): Seq[(String, Column)] = Seq(
    "date_id"      -> dateId(d),
    "day_num"      -> dayofmonth(d),
    "month_num"    -> month(d),
    "year"         -> year(d),
    "day_of_week"  -> date_format(d, "EEEE"),
    "quarter_num"  -> quarter(d),
    "is_weekend"   -> dayofweek(d).isin(1, 7))

  /** Date dim from the distinct dates present in a fact/stream column. */
  def dateDim(df: DataFrame, dateCol: String): DataFrame = {
    val base = df.select(col(dateCol).cast(DateType).as("transaction_date"))
      .distinct()
    dateAttributes(col("transaction_date")).foldLeft(base) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
  }

  /** Customer dim from the customer master CSV shape
    * (customer_master_data.csv; star_schema.sql:16-25). Enum domains become
    * strings with ingest-time validation by filter.
    */
  def customerDim(customerMaster: DataFrame): DataFrame =
    dedupDimension(
      customerMaster.select(
        expr("try_cast(Customer_ID AS INT)").as("customer_id"),
        col("Gender").cast(StringType).as("gender"),
        col("Age").cast(StringType).as("age_group"),
        expr("try_cast(Occupation AS INT)").as("occupation"),
        col("City_Category").cast(StringType).as("city_category"),
        col("Marital_Status").cast(StringType).as("marital_status"),
        expr("try_cast(Stay_In_Current_City_Years AS INT)")
          .as("stay_in_current_city_years")),
      Seq("customer_id"))
      .filter(col("customer_id").isNotNull)
}
