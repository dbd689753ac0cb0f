package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the Z-order clustering key (operators/ZOrder): exact bit
  * placement, bucket range coverage, and the layout property the whole
  * operator exists for — per-file bounding boxes tight in BOTH dimensions,
  * where a single-dim sort layout is tight in one and spans the full range
  * in the other.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places dim bits at stride positions (hand-checked)") {
    // a = 0b1010 -> bits 1,3 at even positions 2,6 = 0b0100_0100
    // b = 0b0101 -> bits 0,2 at odd positions 1,5  = 0b0010_0010
    val got = Seq((0xAL, 0x5L)).toDF("a", "b")
      .select(ZOrder.interleave(4, col("a"), col("b")).as("z"))
      .head().getLong(0)
    assert(got == 0x66L) // 0b0110_0110
  }

  test("bucket covers [0, 2^bits) and hits both endpoints exactly") {
    val df = Seq(0L, 1L, 499L, 999L).toDF("v")
      .withColumn("b", ZOrder.bucket(col("v"), lit(0L), lit(999L), 8))
    val got = df.select("b").as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 127L, 255L))
    val all = spark.range(0, 1000)
      .select(ZOrder.bucket(col("id"), lit(0L), lit(999L), 8).as("b"))
      .agg(min("b"), max("b"), countDistinct("b")).head()
    assert(all.getLong(0) == 0L && all.getLong(1) == 255L
      && all.getLong(2) == 256L)
  }

  test("z-order files have tighter 2-d bounding boxes than a " +
      "single-dim sort layout") {
    // deterministic 64x64 grid, one row per cell
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("x"),
        call_function("div", col("id"), lit(64L)).as("y"))
    val nFiles = 64L
    def boxArea(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy("file_id")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
          .as("area"))
        .agg(avg("area")).head().getDouble(0)
    val z = grid.withColumn("z",
      ZOrder.interleave(6, col("x"), col("y")))
      .withColumn("file_id", shiftright(col("z"), 6)) // 64 rows per file
    val linear = grid
      .withColumn("file_id", call_function("div",
        col("x") * 64 + col("y"), lit(4096L / nFiles)))
    val (zArea, linArea) = (boxArea(z), boxArea(linear))
    // z-order: 64 rows = one aligned 8x8 tile -> area 64.
    // linear (sorted by x then y): a file is one full column stripe of
    // 64 y-values at a single x -> area 64 too, BUT its Y-side spans the
    // whole axis: any predicate on y alone prunes nothing. Compare the
    // worst-side span instead of raw area to capture that.
    def worstSpan(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy("file_id")
        .agg(greatest(max("x") - min("x") + 1, max("y") - min("y") + 1)
          .as("s"))
        .agg(avg("s")).head().getDouble(0)
    assert(zArea <= linArea + 1e-9)
    assert(worstSpan(z) == 8.0, "aligned 8x8 tiles expected")
    assert(worstSpan(linear) == 64.0, "column stripes span the y axis")
  }
}
