package graft.functions

import graft.SparkSpec
import graft.functions.RollingHash.rolling_hash
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def reference(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * RollingHash.Base + (b & 0xff))

  test("codegen path matches the interpreted reference implementation") {
    val inputs = Seq("", "a", "hello world", "日本語テキスト", "x" * 10000)
    val out = inputs.toDF("s")
      .select(rolling_hash(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == inputs.map(reference))
  }

  test("null input yields null") {
    val out = Seq[Option[String]](None, Some("a")).toDF("s")
      .select(rolling_hash(col("s")).as("h")).collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }

  test("distinct strings get distinct hashes on a realistic corpus") {
    val n = 1000
    val out = (0 until n).map(i => s"document number $i with suffix")
      .toDF("s").select(rolling_hash(col("s")).as("h"))
      .distinct().count()
    assert(out == n)
  }

  test("expression is codegen-capable (no fallback) inside a projection") {
    // WholeStageCodegen span should cover the projection using the hash
    // (spark.range source — a LocalTableScan would bypass codegen entirely)
    val df = spark.range(3)
      .select(rolling_hash(concat(lit("doc"), col("id"))).as("h"))
    // '*(n)' prefixes mark whole-stage-codegen'd operators in the plan string
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq("doc0", "doc1", "doc2").map(reference))
  }

  test("works through TextAnalysis.rollingFingerprint on documents") {
    val out = Seq((1L, "some document")).toDF("doc_id", "text")
      .select(graft.llm.TextAnalysis.rollingFingerprint(col("text")))
      .head().getLong(0)
    assert(out == reference("some document"))
  }
}
