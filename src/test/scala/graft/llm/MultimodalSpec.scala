package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world", "en", "srcA", 11L),
    (1L, "x" * 600, "en", "srcB", 600L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("toMediaTable produces binary payload + typed metadata struct") {
    val m = Multimodal.toMediaTable(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    val r = m.orderBy("media_id").head()
    assert(new String(r.getAs[Array[Byte]]("media"), "UTF-8") == "hello world")
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[String]("format") == "srcA")
    assert(meta.getAs[Int]("width") == 11)
  }

  test("fakeDecode: histogram buckets sum to payload length") {
    val bytes = "abcdef".getBytes("UTF-8")
    val (mean, hist) = Multimodal.fakeDecode(bytes)
    assert(hist.sum == bytes.length)
    assert(math.abs(mean - bytes.map(_ & 0xff).sum.toDouble / bytes.length)
      < 1e-12)
    val (zmean, zhist) = Multimodal.fakeDecode(Array.empty[Byte])
    assert(zmean == 0.0 && zhist.sum == 0)
  }

  test("extractFeatures runs partition-local over binary column") {
    val out = Multimodal.extractFeatures(Multimodal.toMediaTable(docs))
      .orderBy("media_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("n_bytes") == 11)
    assert(out(1).getAs[Int]("n_bytes") == 600)
    assert(out(0).getAs[Seq[Long]]("histogram").sum == 11L)
  }

  test("extractFeatures (ByteStats expression) agrees with fakeDecode") {
    val m = Multimodal.toMediaTable(docs)
    val out = Multimodal.extractFeatures(m).orderBy("media_id").collect()
    val payloads = m.orderBy("media_id").collect()
      .map(_.getAs[Array[Byte]]("media"))
    out.zip(payloads).foreach { case (r, p) =>
      val (mean, hist) = Multimodal.fakeDecode(p)
      assert(r.getAs[Int]("n_bytes") == p.length)
      assert(r.getAs[Double]("mean_byte") == mean)
      assert(r.getSeq[Long](r.fieldIndex("histogram")).toSeq == hist.toSeq)
    }
    // null payloads behave as empty, not as null rows
    val withNull = Seq((9L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "media")
    val nr = Multimodal.extractFeatures(withNull).head()
    assert(nr.getAs[Int]("n_bytes") == 0 && nr.getAs[Double]("mean_byte") == 0.0)
  }

  test("extractFeatures stages the kernel: one byte_stats per row in plan") {
    val m = Multimodal.toMediaTable(
      spark.range(3).selectExpr("id AS doc_id", "CAST(id AS STRING) AS text",
        "'en' AS lang", "'src' AS source", "1L AS n_chars"))
    val plan = Multimodal.extractFeatures(m)
      .queryExecution.optimizedPlan.toString
    val n = "byte_stats".r.findAllMatchIn(plan).size
    assert(n == 1, s"expected 1 byte_stats in optimized plan, got $n:\n$plan")
  }

  test("sampleFrames strides through the payload in 256-byte frames") {
    val out = Multimodal.sampleFrames(Multimodal.toMediaTable(docs), stride = 2)
      .filter($"media_id" === 1L).orderBy("frame_idx").collect()
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(out(0).getAs[Array[Byte]]("frame_bytes").length == 256)
  }
}
