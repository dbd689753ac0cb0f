package graft.queries

import graft.SparkSpec

/** Semantic invariants of the round-6 curation operators on hand-built
  * corpora (the DuckDB oracle + adversarial pins prove cross-engine
  * agreement; these prove the SEMANTICS are the intended ones on inputs
  * where the expected answer is hand-checkable).
  */
class CurationQueriesSpec extends SparkSpec {
  import spark.implicits._

  /** Writes a documents.parquet a QueryDef can read, mirroring the
    * testdata schema (doc_id, text, lang, source, n_chars).
    */
  private def corpus(docs: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cur").toString
    docs.map { case (id, text, lang, src) =>
      (id, text, lang, src, text.codePointCount(0, text.length).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("span dedup flags shared passages, not short or unique docs") {
    val shared = "alpha beta gamma delta epsilon" // one exact 5-token span
    val dir = corpus(Seq(
      (1L, s"$shared zeta", "en", "web"),     // 2 spans, 1 shared
      (2L, s"intro $shared", "en", "web"),    // 2 spans, 1 shared
      (3L, "one two three four", "en", "web"), // < 5 tokens: no spans
      (4L, "unique words nobody else ever wrote here", "en", "web")))
    val out = CurationQueries.spanDedup.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2, 1, 0.5)))
    assert(out(2L) == ((2, 1, 0.5)))
    assert(out(3L) == ((0, 0, 0.0)))
    assert(out(4L) == ((3, 0, 0.0))) // 7 tokens -> 3 distinct 5-spans
  }

  test("gopher rules pass clean prose and fail each violation class") {
    // 52 words, all alphabetic, stopword-rich, no symbols or bullets
    val clean = (("the quick brown fox jumps over a lazy dog near " +
      "the old stone bridge and ") * 4).trim
    val bullets = "- item one\n- item two\n- item three"
    val symbols = ("word " * 60).trim + " " + ("#" * 40)
    val dir = corpus(Seq(
      (1L, clean, "en", "web"),
      (2L, bullets, "en", "web"),
      (3L, symbols, "en", "web"),
      (4L, "", "en", "web")))
    val rows = CurationQueries.gopherRules.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("pass"),
      s"clean doc should pass: ${rows(1L)}")
    assert(!rows(2L).getAs[Boolean]("pass"))
    assert(rows(2L).getAs[Double]("frac_bullet_lines") == 1.0)
    assert(!rows(3L).getAs[Boolean]("pass"))
    assert(rows(3L).getAs[Double]("symbol_ratio") > CurationQueries.MaxSymbolRatio)
    assert(!rows(4L).getAs[Boolean]("pass"))
    assert(rows(4L).getAs[Int]("n_words") == 0)
  }

  test("split assignment is total, deterministic, and ~80/10/10") {
    val dir = "/root/testdata/sf0.01" // 500 docs: proportions are stable
    val a = CurationQueries.splitAssign.run(spark, dir).collect()
    val b = CurationQueries.splitAssign.run(spark, dir).collect()
    assert(a.toSeq == b.toSeq) // re-run == identical assignment
    val bySplit = a.groupBy(_.getAs[String]("split")).view.mapValues(_.length)
    val n = a.length.toDouble
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train") / n > 0.7 && bySplit("train") / n < 0.9)
    // bucket really is the md5 prefix of the rendered doc_id
    val one = a.head
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(one.getAs[Long]("doc_id").toString.getBytes("UTF-8"))
    assert(one.getAs[String]("bucket") ==
      md.take(1).map(b => f"$b%02x").mkString)
  }

  test("split-partitioned sink: train filter prunes at the scan") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files
      .createTempDirectory("graft_split_sink").toString + "/corpus"
    // the split is a derived COLUMN (one md5 per row, fused into the
    // write scan) — never a join against a split table
    docs.withColumn("split",
      CurationQueries.splitName(CurationQueries.splitBucket(col("doc_id"))))
      .write.partitionBy("split").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // filter-to-train must prune partitions AND columns at the scan
    val q = back.filter(col("split") === "train").select("doc_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.replaceAll("\\s+", " ")
      .matches(".*PartitionFilters: \\[[^\\]]*split[^\\]]*\\].*"),
      s"no split partition filter in scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"column pruning failed:\n$plan")
    // and the written layout agrees with the driver-checked assignment
    val expected = CurationQueries.splitAssign
      .run(spark, "/root/testdata/sf0.001")
      .filter(col("split") === "train").select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(q.as[Long].collect().sorted.toSeq == expected)
  }

  test("bigram familiarity ranks in-distribution text above gibberish") {
    val dir = corpus(Seq(
      (1L, "the cat sat on the mat", "en", "web"),
      (2L, "the rat sat on the cat", "en", "web"),
      (3L, "zq xv qj vz jx", "en", "web"), // bigrams shared with nobody
      (4L, "", "en", "web")))
    val out = CurationQueries.bigramLm.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out(1L)._2 > out(3L)._2,
      s"in-distribution ${out(1L)} should beat gibberish ${out(3L)}")
    assert(out(4L) == ((0, 0.0)))
    assert(out(1L)._1 == "the cat sat on the mat".length - 1)
  }

  test("source card reports exact dup ratio and volume per source") {
    val dir = corpus(Seq(
      (1L, "same text", "en", "web"),
      (2L, "same text", "de", "web"),     // exact dup, different lang
      (3L, "other text", "en", "web"),
      (4L, "solo doc here", "fr", "book")))
    val rows = CurationQueries.sourceCard.run(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val web = rows("web")
    assert(web.getAs[Long]("n_docs") == 3L)
    assert(web.getAs[Long]("n_unique") == 2L)
    assert(web.getAs[Long]("n_langs") == 2L)
    assert(web.getAs[Double]("dup_ratio") == 1.0 / 3.0)
    assert(web.getAs[Long]("total_tokens") == 6L)
    val book = rows("book")
    assert(book.getAs[Long]("n_docs") == 1L &&
      book.getAs[Double]("dup_ratio") == 0.0)
  }
}
