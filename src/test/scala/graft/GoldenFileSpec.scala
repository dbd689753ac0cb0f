package graft

import scala.io.Source

/** Golden-file pinning for [[GoldenHash.pinnedQueries]] — any oracle-less
  * query (none since r13) plus declared belt-and-suspenders rows (q27's
  * portable HLL): outputs are pinned as content hashes at three scale
  * factors, so a regression cannot hide between oracle runs. Regenerate (after an INTENTIONAL
  * output change only) with:
  *   sbt "runMain graft.GoldenGen /root/testdata/sf0.001"
  * and copy the `GOLDEN name=hash` lines into the resource file.
  */
class GoldenFileSpec extends SparkSpec {

  private def pins(res: String): Map[String, String] = {
    val in = getClass.getResourceAsStream(res)
    assert(in != null, s"missing resource $res — regenerate with graft.GoldenGen")
    try Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }
      .toMap
    finally in.close()
  }

  private def checkAll(sfDir: String, res: String): Unit = {
    val expected = pins(res)
    // every pinned query MUST carry a pin — adding an oracle-less query
    // without pinning it fails here, not silently in the driver's
    // rows-only check
    assert(expected.keySet == GoldenHash.pinnedQueries.toSet,
      s"pin set drift: pinned=${expected.keySet} vs required=${GoldenHash.pinnedQueries}")
    val drifted = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val got = GoldenHash.tableHash(SparkEntry.queries(name)(spark, sfDir))
      if (got == want) None else Some(s"$name: $got != pinned $want")
    }
    assert(drifted.isEmpty, s"golden drift at $sfDir:\n${drifted.mkString("\n")}")
  }

  test("oracle-less queries match pinned golden hashes at sf0.001") {
    checkAll("/root/testdata/sf0.001", "/golden/sf0.001.txt")
  }

  test("oracle-less queries match pinned golden hashes at sf0.01") {
    checkAll("/root/testdata/sf0.01", "/golden/sf0.01.txt")
  }

  test("oracle-less queries match pinned golden hashes at sf0.1") {
    // the bench runs at sf0.1 — without this pin, drift at the bench
    // scale factor would be invisible to every gate
    checkAll("/root/testdata/sf0.1", "/golden/sf0.1.txt")
  }
}
