package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._

class MinHashSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "completely different words about spark shuffles and parquet"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"))
    .toDF("doc_id", "text")

  test("codegen'd expression equals the composed-expression formulation") {
    val staged = docs
      .select(col("doc_id"), Dedup.shingleHashSet(col("text")).as("hs"))
    val viaExpr = staged.select(col("doc_id"),
      MinHashSignature.minhash_signature(col("hs"), Dedup.NumHashes).as("sig"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val viaComposed = staged.select(col("doc_id"),
      Dedup.minhashSignatureFromHashes(col("hs")).as("sig"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(viaExpr.toSeq == viaComposed.toSeq)
    assert(viaExpr(0) == viaExpr(2)) // identical docs, identical signatures
    assert(viaExpr(0) != viaExpr(1))
  }

  test("null and empty inputs yield null signatures") {
    val out = Seq((1L, Some(Seq(5L, 7L)), "a"), (2L, None, "b"),
      (3L, Some(Seq.empty[Long]), "c"))
      .toDF("id", "hs", "tag")
      .select(col("id"),
        MinHashSignature.minhash_signature(col("hs"), 8).as("sig"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1))
    assert(out(0).getSeq[Long](1).size == 8)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("SimHash64 codegen equals the composed simhashFromHashes") {
    val staged = docs
      .select(col("doc_id"), Dedup.tokenHashes(col("text")).as("hs"))
    val viaExpr = staged.select(
      SimHash64.simhash64(col("hs")).as("s"))
      .collect().map(_.getLong(0))
    val viaComposed = staged.select(
      Dedup.simhashFromHashes(col("hs")).as("s"))
      .collect().map(_.getLong(0))
    assert(viaExpr.toSeq == viaComposed.toSeq)
  }

  test("runs inside whole-stage codegen") {
    val df = spark.range(4).select(
      MinHashSignature.minhash_signature(
        array(col("id"), col("id") + 1), 16).as("sig"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(df.collect().forall(_.getSeq[Long](0).size == 16))
  }
}
