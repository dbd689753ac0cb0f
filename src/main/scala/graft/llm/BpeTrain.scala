package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge-table TRAINING — the learn side of the encode loop the
  * engine already ships (functions.BpeTokenCount): iteratively find the
  * most frequent adjacent symbol pair and merge it, emitting the ranked
  * merge table a tokenizer would be built from.
  *
  * Scale shape (the standard distributed-BPE factoring): training
  * statistics live on the DISTINCT-WORD HISTOGRAM, not the corpus — one
  * corpus pass builds (word, freq) by partial-aggregating groupBy (at
  * 100 TB the histogram is millions of rows where the corpus is
  * trillions of tokens), and every round then runs on that small frame:
  * pair counts weighted by word freq (explode + partial-agg sum), one
  * 1-row argmax to the driver (the merge table IS driver-sized by
  * definition), and the merge applied to the symbol arrays with a
  * higher-order fold — no UDF, no per-round corpus scan. Plan depth is
  * bounded by checkpointing every few rounds.
  *
  * Determinism: ties on pair frequency break by (left, right) symbol
  * order, so the learned table is unique for a given corpus — the
  * differential trainer in DifferentialOracleSpec implements the same
  * rule with plain dictionaries.
  */
object BpeTrain {

  /** Letter/digit-run word histogram under the SAME pre-tokenization as
    * BpeAlgo (marks are single-char pre-tokens — nothing to merge, so
    * they carry no training signal).
    */
  def wordHistogram(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(expr(
        s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Non-overlapping left-to-right merge of adjacent (l, r) into l+r —
    * the fold mirrors BpeAlgo.countWord's in-place scan.
    */
  private def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Learn up to `nMerges` merges; stops early when no adjacent pair
    * occurs at least `minFreq` times. Returns (rank, left, right, freq)
    * with rank 0-based in learn order.
    */
  def trainMerges(spark: SparkSession, docs: DataFrame, nMerges: Int,
      minFreq: Long = 2L): Seq[(Int, String, String, Long)] = {
    // (?!^)(?=.) splits between chars only: Spark's split keeps trailing
    // empties (limit -1), so a bare (?!^) would add a phantom "" symbol
    var hist = wordHistogram(docs)
      .select(col("freq"),
        split(col("word"), "(?!^)(?=.)").as("syms"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val best = hist
        .filter(size(col("syms")) >= 2) // sequence(1, 0) would DESCEND
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getAs[Long]("f") < minFreq) done = true
      else {
        val l = best(0).getAs[String]("l")
        val r = best(0).getAs[String]("r")
        learned += ((rank, l, r, best(0).getAs[Long]("f")))
        hist = hist.select(col("freq"),
          mergePair(col("syms"), l, r).as("syms"))
        // bound plan depth: each round nests another fold expression
        if (rank % 4 == 3) hist = hist.localCheckpoint(true)
        rank += 1
      }
    }
    learned.toSeq
  }
}
