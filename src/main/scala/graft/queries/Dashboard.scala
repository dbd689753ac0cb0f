package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E3 parity: the 6 queries the reference dashboard re-runs live with an
  * injected year (/root/reference/dashboard.py:54-252 — f-string SQL there,
  * a real parameter here; the serving/charting layer itself is out of
  * engine scope). Shapes follow the dashboard's variants, which add a year
  * filter to the base queries where queries.sql has none.
  */
object Dashboard {
  private val Money = DecimalType(12, 2)

  /** dashboard.py:54-78 — top products per (month, weekend) for the year. */
  def topProducts(w: WalmartStar, year: Int): DataFrame =
    WalmartWorkload.q11TopProductsPerCell(w, year)

  /** dashboard.py:98-108 — demographics, year-scoped. */
  def demographics(w: WalmartStar, year: Int): DataFrame =
    w.sales
      .join(broadcast(w.date.filter(col("year") === year)), Seq("date_id"))
      .join(broadcast(w.customer), Seq("customer_id"))
      .groupBy("gender", "age_group", "city_category")
      .agg(sum("sales_amount").cast(Money).as("total_revenue"),
        sum("quantity").as("units_sold"))
      .orderBy("city_category", "gender", "age_group")

  /** dashboard.py:126-135 — category × occupation, year-scoped. */
  def categoryByOccupation(w: WalmartStar, year: Int): DataFrame =
    w.sales
      .join(broadcast(w.date.filter(col("year") === year)), Seq("date_id"))
      .join(broadcast(w.product.drop("supplier_id", "store_id")), Seq("product_id"))
      .join(broadcast(w.customer), Seq("customer_id"))
      .groupBy("product_category", "occupation")
      .agg(sum("sales_amount").cast(Money).as("total_revenue"),
        sum("quantity").as("units_sold"))
      .orderBy(col("product_category"), col("total_revenue").desc,
        col("occupation"))

  /** dashboard.py:153-165 — quarterly trend for the selected year. */
  def quarterlyTrend(w: WalmartStar, year: Int): DataFrame =
    w.sales
      .join(broadcast(w.date.filter(col("year") === year)), Seq("date_id"))
      .join(broadcast(w.customer), Seq("customer_id"))
      .groupBy("quarter_num", "gender", "age_group")
      .agg(sum("sales_amount").cast(Money).as("total_revenue"),
        sum("quantity").as("units_sold"))
      .orderBy("quarter_num", "gender", "age_group")

  /** dashboard.py:190-209 — top city categories per product category. */
  def topCities(w: WalmartStar, year: Int): DataFrame = {
    val cityRev = w.sales
      .join(broadcast(w.date.filter(col("year") === year)), Seq("date_id"))
      .join(broadcast(w.customer), Seq("customer_id"))
      .join(broadcast(w.product.drop("supplier_id", "store_id")), Seq("product_id"))
      .groupBy("city_category", "product_category")
      .agg(sum("sales_amount").cast(Money).as("total_revenue"))
    val rn = Window.partitionBy(col("product_category"))
      .orderBy(col("total_revenue").desc, col("city_category"))
    cityRev.withColumn("rn", row_number().over(rn))
      .filter(col("rn") <= 5)
      .orderBy("product_category", "rn")
  }

  /** dashboard.py:228-252 — monthly growth per category for the year. */
  def monthlyGrowth(w: WalmartStar, year: Int): DataFrame = {
    val monthly = w.sales
      .join(broadcast(w.date.filter(col("year") === year)), Seq("date_id"))
      .join(broadcast(w.product.drop("supplier_id", "store_id")), Seq("product_id"))
      .groupBy("product_category", "month_num")
      .agg(sum("sales_amount").cast(Money).as("revenue"))
    val win = Window.partitionBy(col("product_category")).orderBy(col("month_num"))
    monthly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(win))
      .withColumn("growth_percent",
        round((col("revenue").cast(DoubleType) - col("prev_revenue").cast(DoubleType))
          / when(col("prev_revenue").cast(DoubleType) === 0.0, lit(null))
            .otherwise(col("prev_revenue").cast(DoubleType)) * 100, 2))
      .orderBy("product_category", "month_num")
  }

  /** All six panels for one year — what a dashboard tick computes. */
  def allPanels(w: WalmartStar, year: Int): Map[String, DataFrame] = Map(
    "top_products" -> topProducts(w, year),
    "demographics" -> demographics(w, year),
    "category_by_occupation" -> categoryByOccupation(w, year),
    "quarterly_trend" -> quarterlyTrend(w, year),
    "top_cities" -> topCities(w, year),
    "monthly_growth" -> monthlyGrowth(w, year))
}
