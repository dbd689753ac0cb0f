package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 fuzzy self-join (entity resolution / spell-collapse)
  * via the deletion-neighborhood blocking discipline (FastSS): each
  * string emits itself plus every single-character deletion as equi-join
  * KEYS; two strings within Levenshtein distance 1 necessarily share a
  * key (substitution pair → the common deletion at the differing
  * position; insert/delete pair → the shorter string itself), so the
  * candidate join is pure key-equality — NEVER all-pairs — and each
  * key's bucket is structurally bounded at |alphabet|·(len+1) candidates
  * no matter how large the corpus grows (only that many strings can
  * produce a given deletion). Candidates are deduped, then verified with
  * the exact codegen'd `levenshtein` — blocking guarantees recall, the
  * verify guarantees precision.
  *
  * At 100 TB: keys ≈ (len+1)× the dimension being resolved, shuffled by
  * key — the same cost class as a word-level inverted index; the
  * quadratic blow-up a naive similarity cross-join hits is structurally
  * impossible here. The reference's dim-dedup (notebook upsert path,
  * hybridjoin.py:449-486) collapses only EXACT key duplicates; this is
  * the fuzzy rung a real master-data pipeline adds above it.
  */
object FuzzyJoin {

  /** `(id, str, key)` rows: the string itself plus each 1-deletion.
    * Empty/null strings emit only themselves (guarded: Spark's
    * `sequence(1, 0)` counts DOWN, which would fabricate keys DuckDB's
    * `generate_series` does not).
    */
  def deletionKeys(df: DataFrame, id: Column, str: Column): DataFrame =
    df.select(id.as("__id"), str.as("__s"))
      // r16: array_distinct BEFORE the explode — a run of r repeated
      // characters yields the same deletion r times (real entity strings
      // are full of digit/letter runs), and duplicate (string, key) rows
      // multiply candidate-pair sightings m_a·m_b-fold in the key join,
      // each paying a levenshtein verify. Dedup is map-side (no extra
      // exchange) and removes only duplicate SIGHTINGS — the verified
      // pair set is unchanged (the final distinct collapsed them anyway).
      .select(col("__id"), col("__s"), explode(array_distinct(concat(
        array(col("__s")),
        when(length(col("__s")) >= 1, expr(
          "transform(sequence(1, length(__s)), " +
            "i -> concat(substring(__s, 1, i - 1), " +
            "substring(__s, i + 1, 2147483647)))"))
          .otherwise(array())))).as("__k"))

  /** Distinct id-ordered pairs with Levenshtein(a, b) ≤ 1 (including 0:
    * distinct ids carrying identical strings are the classic duplicate
    * entity). Output columns: id_a, str_a, id_b, str_b.
    *
    * Duplicate-robustness (the realistic 100 TB hazard): entity corpora
    * are duplicate-HEAVY, and generating deletion keys per ROW would
    * multiply every bucket by the duplicate multiplicity m — candidate
    * volume ×m², a quadratic term the structural |alphabet|·len bucket
    * bound does not cover (it assumes distinct strings). So candidates
    * are generated over DISTINCT strings only: the deletion join + exact
    * verify runs once per string PAIR regardless of how many rows carry
    * the strings, and id pairs materialize afterwards through two
    * output-bound equi join-backs — distance-0 pairs as the per-string
    * id self-join, distance-1 pairs as the id expansion of each verified
    * string pair. The output is inherently quadratic in multiplicity
    * (that IS the pair list); the candidate stage no longer is.
    * `ScaleProbe fuzzy` measures both axes.
    *
    * Key hashing (r9 verdict #5, the `llm_span_dedup_hashed` precedent):
    * the candidate join's shuffle KEY is `xxhash64(deletion)` — a fixed
    * 8-byte integer — rather than the deletion string itself, which
    * averages the full string length and dominates the shuffle's bytes
    * (keys ≈ (len+1)× the corpus). Recall is preserved structurally:
    * equal strings hash equal, so every true deletion-key match
    * survives; a hash COLLISION can only ADD candidate pairs, and any
    * added pair either fails the exact `levenshtein === 1` verify
    * (dropped) or passes it — in which case lev ≤ 1 guarantees the pair
    * also shares a true deletion key and was already found (the final
    * `distinct` collapses the double sighting). `hashedKeys = false`
    * keeps the plain-string join for A/B measurement (`ScaleProbe
    * fuzzy` reports both).
    */
  def pairsWithin1(df: DataFrame, id: Column, str: Column,
      hashedKeys: Boolean = true): DataFrame = {
    // slim (id, string) rows, deduped so repeated input rows cannot
    // duplicate output pairs (the old per-row form deduped at the end).
    // r16: staged once — rows feeds dist0 (both sides), both dist1
    // join-backs, and strings; unstaged, the scan+distinct re-executed
    // ~5× (stage trace)
    val rows = df.select(id.as("__id"), str.as("__s")).distinct()
      .localCheckpoint(false)
    val strings = rows.select(col("__s")).distinct()
    // exact-duplicate pairs: per-string id self-join — equi on the
    // string, output-sized
    val dist0 = rows.select(col("__s"), col("__id").as("id_a"))
      .join(rows.select(col("__s"), col("__id").as("id_b")), Seq("__s"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("__s").as("str_a"),
        col("id_b"), col("__s").as("str_b"))
    // distance-1 STRING pairs over distinct strings: verify BEFORE
    // distinct — levenshtein runs map-side inside the join stage (a
    // candidate pair appears once per shared key), so the distinct's
    // shuffle carries only verified pairs, not the distance-2 noise
    val rawKeys = deletionKeys(strings, col("__s"), col("__s"))
    val keys0 =
      if (hashedKeys) rawKeys.select(col("__s"), xxhash64(col("__k")).as("__k"))
      else rawKeys
    // r16: explicit key-hash fanout — the verify below is the plan's CPU
    // (one banded levenshtein per candidate SIGHTING, ~1M at sf0.1) and
    // it runs inside the join stage, whose parallelism AQE had coalesced
    // to 2 byte-light partitions. A user repartition is exempt from AQE
    // coalescing and both join sides share the one exchange.
    val keys = graft.Tables.fanoutBy(df.sparkSession, keys0, col("__k"))
    val sa = keys.select(col("__s").as("sa"), col("__k"))
    val sb = keys.select(col("__s").as("sb"), col("__k"))
    // levenshtein with threshold 1 (banded DP, O(len) not O(len²)):
    // returns the distance when ≤ 1, −1 beyond, so `=== 1` is the same
    // predicate as unbounded levenshtein === 1 at a fraction of the cost
    val strPairs = sa.join(sb, Seq("__k"))
      .filter(col("sa") < col("sb") &&
        levenshtein(col("sa"), col("sb"), 1) === 1)
      .select("sa", "sb").distinct()
    // id expansion of each verified string pair (output-bound); pair
    // orientation follows the IDS, so the strings swap with them
    val dist1 = strPairs
      .join(rows.select(col("__s").as("sa"), col("__id").as("ia")), Seq("sa"))
      .join(rows.select(col("__s").as("sb"), col("__id").as("ib")), Seq("sb"))
      .select(
        least(col("ia"), col("ib")).as("id_a"),
        when(col("ia") < col("ib"), col("sa")).otherwise(col("sb"))
          .as("str_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        when(col("ia") < col("ib"), col("sb")).otherwise(col("sa"))
          .as("str_b"))
    dist0.unionByName(dist1)
  }
}
