package graft

import scala.io.Source

/** CI pin of the adversarial oracle gate (r4 verdict "what's missing" #2):
  * every llm_* query runs against the deterministic edge-case corpus
  * (AdversarialCorpus — empty/whitespace/1-2-token/duplicate/unicode docs,
  * zero vectors) and must match its pinned content hash. The hashes were
  * established by the full cross-engine run (tools/make_adversarial.py +
  * Verify + check.py, 59/59 green), so a drift here means an edge-case
  * semantics change that the testdata-based gates cannot see. Regenerate
  * (after an INTENTIONAL change only) with:
  *   sbt "runMain graft.AdversarialGoldenGen"
  */
class AdversarialCorpusSpec extends SparkSpec {

  private def pins: Map[String, String] = {
    val in = getClass.getResourceAsStream("/golden/adversarial.txt")
    assert(in != null,
      "missing /golden/adversarial.txt — regenerate with graft.AdversarialGoldenGen")
    try Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }
      .toMap
    finally in.close()
  }

  test("every llm_* query matches its pinned hash on the adversarial corpus") {
    val expected = pins
    // a new llm_* query without an adversarial pin fails HERE, not
    // silently when only the real-corpus gates run
    assert(expected.keySet == AdversarialCorpus.pinnedQueries.toSet,
      s"pin set drift: pinned=${expected.keySet.toSeq.sorted} " +
        s"vs llm queries=${AdversarialCorpus.pinnedQueries}")
    val dir = java.nio.file.Files.createTempDirectory("graft_adv_spec").toString
    AdversarialCorpus.writeTo(spark, dir)
    val drifted = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val got = GoldenHash.tableHash(SparkEntry.queries(name)(spark, dir))
      if (got == want) None else Some(s"$name: $got != pinned $want")
    }
    assert(drifted.isEmpty,
      s"adversarial-corpus drift:\n${drifted.mkString("\n")}")
  }
}
