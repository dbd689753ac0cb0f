package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[TableDiff]]'s classification contract on crafted snapshots —
  * the 'unchanged' class cannot occur across two real order years (two
  * different years with identical count AND spend), so the etl_table_diff
  * oracle alone never exercises it.
  */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private def collectClasses(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      key: Seq[String]): Map[Long, String] =
    TableDiff.diff(a, b, key)
      .select(col(key.head), col("diff_class"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("all four classes on one crafted diff") {
    val a = Seq((1L, 10, "x"), (2L, 20, "y"), (3L, 30, "z"))
      .toDF("k", "v", "w")
    val b = Seq((1L, 10, "x"), (2L, 21, "y"), (4L, 40, "q"))
      .toDF("k", "v", "w")
    val got = collectClasses(a, b, Seq("k"))
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("NULL values: NULL<=>NULL is unchanged, NULL vs value is changed") {
    val a = Seq((1L, Option.empty[Int]), (2L, Option.empty[Int]),
      (3L, Some(3))).toDF("k", "v")
    val b = Seq((1L, Option.empty[Int]), (2L, Some(2)),
      (3L, Option.empty[Int])).toDF("k", "v")
    val got = collectClasses(a, b, Seq("k"))
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"))
  }

  test("an all-NULL-value row still counts as PRESENT (marker, not " +
    "value-null test)") {
    // key 1 exists in A with a NULL value and is absent from B: the
    // marker design must classify it 'removed'; a value-null presence
    // test would misread it as absent from both and drop/mislabel it
    val a = Seq((1L, Option.empty[Int])).toDF("k", "v")
    val b = Seq((2L, Option.empty[Int])).toDF("k", "v")
    val got = collectClasses(a, b, Seq("k"))
    assert(got == Map(1L -> "removed", 2L -> "added"))
  }

  test("multi-column keys and multi-column compares") {
    val a = Seq((1L, 1, "a", 10.0), (1L, 2, "b", 20.0), (2L, 1, "c", 30.0))
      .toDF("k1", "k2", "v1", "v2")
    val b = Seq((1L, 1, "a", 10.0), (1L, 2, "b", 99.0), (3L, 1, "d", 40.0))
      .toDF("k1", "k2", "v1", "v2")
    val got = TableDiff.diff(a, b, Seq("k1", "k2"))
      .select(col("k1"), col("k2"), col("diff_class"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .toMap
    assert(got == Map((1L, 1) -> "unchanged", (1L, 2) -> "changed",
      (2L, 1) -> "removed", (3L, 1) -> "added"))
  }

  test("key-only snapshots (no value columns) classify by presence alone") {
    val a = Seq(Tuple1(1L), Tuple1(2L)).toDF("k")
    val b = Seq(Tuple1(2L), Tuple1(3L)).toDF("k")
    val got = collectClasses(a, b, Seq("k"))
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "added"))
  }

  test("summary counts per class") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("k", "v")
    val b = Seq((1L, 1), (2L, 9), (4L, 4)).toDF("k", "v")
    val got = TableDiff.summary(a, b, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("added" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "unchanged" -> 1L))
  }

  test("guards: empty key, schema mismatch, key not in schema") {
    val a = Seq((1L, 1)).toDF("k", "v")
    val b = Seq((1L, 1)).toDF("k", "w")
    intercept[IllegalArgumentException](TableDiff.diff(a, a, Nil))
    intercept[IllegalArgumentException](TableDiff.diff(a, b, Seq("k")))
    intercept[IllegalArgumentException](TableDiff.diff(a, a, Seq("zz")))
  }
}
