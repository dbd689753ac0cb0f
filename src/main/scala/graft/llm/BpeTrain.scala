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
    *
    * Classic sequential BPE = the batched trainer at batchK = 1 (one
    * candidate per round IS the argmax; a 1-pair batch application IS
    * [[mergePair]]; checkpoint cadence coincides because round == rank).
    * The coincidence is additionally pinned by DifferentialOracleSpec,
    * so this delegates rather than keeping a duplicate training loop
    * (review finding).
    */
  def trainMerges(spark: SparkSession, docs: DataFrame, nMerges: Int,
      minFreq: Long = 2L): Seq[(Int, String, String, Long)] =
    trainMergesBatched(spark, docs, nMerges, batchK = 1, minFreq)
      .map { case (k, l, r, f, _) => (k, l, r, f) }

  /** Weighted adjacent-pair counts over the symbol histogram (classic
    * BPE get_stats: OVERLAPPING occurrences — "aaa" counts (a,a) twice).
    */
  private def pairCounts(hist: DataFrame): DataFrame = hist
    .filter(size(col("syms")) >= 2) // sequence(1, 0) would DESCEND
    .select(col("freq"), explode(transform(
      sequence(lit(1), size(col("syms")) - 1),
      i => struct(element_at(col("syms"), i).as("l"),
        element_at(col("syms"), i + 1).as("r")))).as("p"))
    .groupBy(col("p.l").as("l"), col("p.r").as("r"))
    .agg(sum(col("freq")).as("f"))

  /** One-pass left-to-right merge of a BATCH of symbol-disjoint pairs —
    * the when-chain generalization of [[mergePair]]; disjointness (see
    * [[trainMergesBatched]]) guarantees no merge output can feed another
    * pair in the same batch, so one scan is exact.
    */
  private def mergeBatch(syms: Column, ps: Seq[(String, String)]): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) => {
      val append = concat(acc, array(x))
      ps.foldLeft(when(lit(false), append)) { case (w, (l, r)) =>
        w.when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
      }.otherwise(append)
    })

  /** BATCHED trainer — the production-vocab scale path (r7 verdict #3:
    * [[trainMerges]] runs one sequential Spark round per learned merge,
    * so a 32k-merge vocab is 32k blocking job rounds — days of scheduler
    * overhead regardless of data size). Each round counts pairs ONCE and
    * learns up to `batchK` merges from it: candidates are taken in
    * (freq desc, l, r) order and greedily accepted while SYMBOL-DISJOINT
    * — a pair is rejected if its left, right, or concatenation collides
    * with any symbol (or concatenation) already accepted this round.
    * Disjointness makes the batch exact: merging (a,b) cannot create,
    * destroy, or cascade into occurrences of any other accepted pair, so
    * every accepted pair's count is the count sequential training would
    * have seen at its turn. The learned table CAN differ from the
    * sequential one past the first round (sequential re-counting may
    * surface a brand-new pair, e.g. (ab,c), before the next batch
    * member; with batchK = 1 the two trainers coincide — both pinned by
    * DifferentialOracleSpec against a from-scratch dictionary
    * reimplementation of the same rule). Round count drops from nMerges
    * to ~nMerges/batchK: the 32k vocab becomes ~1k rounds at batchK=32 —
    * scheduler-bound hours to minutes (measured: `ScaleProbe bpetrain`).
    *
    * Returns (rank, left, right, freq, round) with rank 0-based in learn
    * order and round the Spark round that learned it.
    */
  def trainMergesBatched(spark: SparkSession, docs: DataFrame, nMerges: Int,
      batchK: Int, minFreq: Long = 2L): Seq[(Int, String, String, Long, Int)] = {
    require(batchK >= 1)
    var hist = wordHistogram(docs)
      .select(col("freq"),
        split(col("word"), "(?!^)(?=.)").as("syms"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Int)]
    var rank = 0
    var round = 0
    var done = false
    while (rank < nMerges && !done) {
      val want = math.min(batchK, nMerges - rank)
      // bounded driver state: top want×8 candidate rows are enough to
      // fill a batch in practice; a shortfall just means a smaller batch
      // this round (never an error — the argmax is always accepted)
      val top = pairCounts(hist)
        .filter(col("f") >= minFreq)
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(want * 8).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        for (row <- top if batch.size < want) {
          val l = row.getAs[String]("l")
          val r = row.getAs[String]("r")
          if (!used(l) && !used(r) && !used(l + r)) {
            batch += ((l, r, row.getAs[Long]("f")))
            used ++= Seq(l, r, l + r)
          }
        }
        batch.foreach { case (l, r, f) =>
          learned += ((rank, l, r, f, round))
          rank += 1
        }
        hist = hist.select(col("freq"),
          mergeBatch(col("syms"), batch.map(p => (p._1, p._2)).toSeq)
            .as("syms"))
        if (round % 4 == 3) hist = hist.localCheckpoint(true)
        round += 1
      }
    }
    learned.toSeq
  }
}
