package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest normalization (SURVEY.md §2.3 F1–F6), re-expressing the reference's
  * row-at-a-time tolerance logic (/root/reference/hybridjoin.py:220-233,
  * 277-298, 382-413) as declarative column transforms that stay inside
  * whole-stage codegen:
  *
  *  - F1 header-name tolerance + trim (hybridjoin.py:227,281,382-385)
  *  - F2 key cast with invalid-row drop (hybridjoin.py:280-286)
  *  - F3 required-field predicate (hybridjoin.py:386-397)
  *  - F4 quantity coercion with default 0 (hybridjoin.py:406-409)
  *  - F6 multi-format date parsing with fallback (hybridjoin.py:137-147)
  */
object Normalize {

  /** F1: canonical names for the transaction stream's known header variants
    * (hybridjoin.py:281,382-385). First present variant wins.
    */
  val HeaderVariants: Map[String, Seq[String]] = Map(
    "order_id"    -> Seq("order_id", "orderID"),
    "customer_id" -> Seq("customer_id", "Customer_ID"),
    "product_id"  -> Seq("product_id", "Product_ID"),
    "quantity"    -> Seq("quantity", "Quantity"),
    "tx_date"     -> Seq("date", "transaction_date"))

  /** Rename alternate headers to canonical names and trim every string
    * column (F1). Unknown columns pass through untouched.
    */
  def canonicalize(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val renamed = HeaderVariants.foldLeft(df) { case (d, (canon, variants)) =>
      variants.find(present.contains) match {
        case Some(v) if v != canon => d.withColumnRenamed(v, canon)
        case _                     => d
      }
    }
    val trimmed = renamed.schema.fields.map {
      case f if f.dataType == StringType => trim(col(f.name)).as(f.name)
      case f                             => col(f.name)
    }
    renamed.select(trimmed.toIndexedSeq: _*)
  }

  /** F2: cast a key column, dropping rows whose value is not parseable —
    * the analog of the reference skipping tuples whose key fails int()
    * (hybridjoin.py:280-286).
    */
  def castKeyOrDrop(df: DataFrame, colName: String, to: DataType): DataFrame =
    df.withColumn(colName, expr(s"try_cast($colName AS ${to.sql})"))
      .filter(col(colName).isNotNull)

  /** F3: drop rows missing any required field (hybridjoin.py:386-397). */
  def requireFields(df: DataFrame, fields: Seq[String]): DataFrame =
    df.na.drop(fields)

  /** F4: quantity coercion int(float(q)) with default 0
    * (hybridjoin.py:406-409).
    */
  def coerceQuantity(colName: String): Column =
    coalesce(
      expr(s"try_cast(try_cast($colName AS DOUBLE) AS INT)"), lit(0))

  /** F6: multi-format date parsing, same format ladder as the reference
    * (hybridjoin.py:137-147), falling back to current_date() as it does.
    */
  def parseDateMultiFormat(colName: String): Column = coalesce(
    tryToDate(colName, "yyyy-MM-dd"),
    tryToDate(colName, "dd-MM-yyyy"),
    tryToDate(colName, "MM/dd/yyyy"),
    tryToDate(colName, "yyyy/MM/dd"),
    current_date())

  private def tryToDate(colName: String, fmt: String): Column =
    expr(s"CAST(try_to_timestamp($colName, '$fmt') AS DATE)")

  /** Full stream-normalization pipeline for a walmart-shaped raw frame:
    * canonical headers → key casts → required fields → quantity/date
    * derivations. Output schema:
    * (order_id LONG, customer_id INT, product_id STRING, quantity INT,
    *  tx_date DATE).
    */
  def normalizeTransactions(raw: DataFrame): DataFrame = {
    val canon = canonicalize(raw)
    val keyed = castKeyOrDrop(canon, "customer_id", IntegerType)
    requireFields(keyed, Seq("order_id", "product_id", "quantity", "tx_date"))
      .select(
        expr("try_cast(order_id AS BIGINT)").as("order_id"),
        col("customer_id"),
        col("product_id").cast(StringType).as("product_id"),
        coerceQuantity("quantity").as("quantity"),
        parseDateMultiFormat("tx_date").as("tx_date"))
      .filter(col("order_id").isNotNull)
  }
}
