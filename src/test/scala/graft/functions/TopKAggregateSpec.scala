package graft.functions

import graft.SparkSpec
import graft.functions.TopKAggregate.top_k
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def data = (1 to 200).map { i =>
    (s"g${i % 5}", (i * 37 % 101).toDouble, f"tag$i%03d")
  }.toDF("g", "score", "tag")

  test("agrees with the window realization, including tie-breaks") {
    // force multiple partitions so partial aggregation + merge both run
    val df = data.repartition(7)
    val viaAgg = df.groupBy("g")
      .agg(top_k(col("score"), col("tag"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("t.score").as("score"), col("t.tag").as("tag"),
        (col("pos") + 1).as("rn"))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("tag"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("g", "score", "tag", "rn")
    assert(viaAgg.orderBy("g", "rn").collect().toSeq ==
      viaWindow.orderBy("g", "rn").collect().toSeq)
  }

  test("groups smaller than k return all rows in rank order") {
    val out = Seq(("a", 1.0, "x"), ("a", 3.0, "y"))
      .toDF("g", "score", "tag")
      .groupBy("g").agg(top_k(col("score"), col("tag"), 10).as("top"))
      .select(explode(col("top")).as("t")).select("t.score", "t.tag")
      .collect()
    assert(out.map(r => (r.getDouble(0), r.getString(1))).toSeq ==
      Seq((3.0, "y"), (1.0, "x")))
  }

  test("null scores and tags are skipped") {
    val out = Seq(("a", Some(2.0), Some("x")), ("a", None, Some("y")),
      ("a", Some(1.0), None))
      .toDF("g", "score", "tag")
      .groupBy("g").agg(top_k(col("score"), col("tag"), 5).as("top"))
      .select(size(col("top"))).head().getInt(0)
    assert(out == 1)
  }

  test("SQL surface: registered top_k and rolling_hash work in spark.sql") {
    GraftFunctions.register(spark)
    data.createOrReplaceTempView("topk_input")
    val viaSql = spark.sql(
      """SELECT g, t.tag, t.score
        |FROM (SELECT g, explode(top_k(score, tag, 3)) AS t
        |      FROM topk_input GROUP BY g)
        |ORDER BY g, t.score DESC, t.tag""".stripMargin)
    assert(viaSql.count() == 15) // 5 groups x 3
    val h = spark.sql("SELECT rolling_hash('abc')").head().getLong(0)
    val expected = "abc".getBytes("UTF-8")
      .foldLeft(0L)((acc, b) => acc * RollingHash.Base + (b & 0xff))
    assert(h == expected)
  }
}
