package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalize renames alternate headers and trims strings") {
    val raw = Seq((" 1 ", " 1001 ", " P01 ", "2", " 2020-01-02 "))
      .toDF("orderID", "Customer_ID", "Product_ID", "Quantity", "date")
    val out = Normalize.canonicalize(raw)
    assert(out.columns.toSet ==
      Set("order_id", "customer_id", "product_id", "quantity", "tx_date"))
    val r = out.head()
    assert(r.getString(0) == "1" && r.getString(1) == "1001"
      && r.getString(2) == "P01" && r.getString(4) == "2020-01-02")
  }

  test("castKeyOrDrop drops unparseable keys") {
    val raw = Seq("123", "abc", "", "45").toDF("k")
    val out = Normalize.castKeyOrDrop(raw, "k",
      org.apache.spark.sql.types.IntegerType)
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(45, 123))
  }

  test("coerceQuantity handles int-in-float strings and garbage") {
    val raw = Seq("3", "2.7", "x", "").toDF("quantity")
    val out = raw.select(Normalize.coerceQuantity("quantity").as("q"))
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(3, 2, 0, 0))
  }

  test("parseDateMultiFormat accepts all four reference formats") {
    val raw = Seq("2020-01-02", "02-01-2020", "01/02/2020", "2020/01/02")
      .toDF("d")
    val out = raw.select(Normalize.parseDateMultiFormat("d").as("p"))
      .collect().map(_.getDate(0).toString)
    assert(out.toSeq == Seq(
      "2020-01-02", "2020-01-02", "2020-01-02", "2020-01-02"))
  }

  test("parseDateMultiFormat falls back to current_date on garbage") {
    val out = Seq("not-a-date").toDF("d")
      .select(Normalize.parseDateMultiFormat("d").as("p")).head()
    assert(!out.isNullAt(0)) // reference behavior: today(), never null
  }

  test("parseDateMultiFormat: format-shaped but invalid dates don't throw (ANSI)") {
    // 2020-13-45 matches the yyyy-MM-dd shape but is not a real date;
    // try_to_timestamp must yield null (not an ANSI error) and the ladder
    // falls through to the current_date fallback
    val rows = Seq("2020-13-45", "99-99-9999", "31-12-2020").toDF("d")
      .select(Normalize.parseDateMultiFormat("d").as("p")).collect()
    assert(rows.forall(!_.isNullAt(0)))
    assert(rows(2).getDate(0).toString == "2020-12-31") // valid dd-MM-yyyy
  }

  test("normalizeTransactions end-to-end drops invalid rows, keeps valid") {
    val raw = Seq(
      ("1", "1001", "P1", "2", "2020-01-02"),   // valid
      ("2", "oops", "P1", "2", "2020-01-02"),   // bad customer key -> drop
      ("3", "1002", null, "2", "2020-01-02"),   // missing product -> drop
      ("4", "1003", "P2", "x", "2020-01-03"))   // bad qty -> qty 0, kept
      .toDF("orderID", "Customer_ID", "Product_ID", "quantity", "date")
    val out = Normalize.normalizeTransactions(raw)
    val rows = out.orderBy("order_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 4L))
    assert(rows(1).getInt(3) == 0) // coerced quantity default
  }
}
