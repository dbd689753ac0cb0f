package graft.streaming

import graft.{SparkSpec, StreamBench}

/** The bench's streaming-throughput lap must complete end-to-end with a
  * committed checkpoint: every input row either lands in the fact or is
  * referentially dropped, the drain splits into the expected micro-batches,
  * and the checkpoint directory carries the commit log that makes a
  * restart a no-op (exactly-once).
  */
class StreamBenchSpec extends SparkSpec {

  test("stream bench drains sf0.001 checkpointed, in bounded micro-batches") {
    val r = StreamBench.run(spark, "/root/testdata/sf0.001",
      nFiles = 6, maxFilesPerTrigger = 2)
    assert(r.inputRows == 1000)
    assert(r.factRows > 0 && r.factRows <= r.inputRows)
    assert(r.batches == 3) // 6 files / 2 per trigger
    assert(r.secs > 0)
    // the commit log exists and has one entry per micro-batch
    val commits = new java.io.File(s"${r.checkpoint}/commits")
      .listFiles().count(f => f.getName.forall(_.isDigit))
    assert(commits == 3, s"expected 3 committed batches, saw $commits")
    StreamBench.cleanup(r)
  }
}
