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
      .select(col("__id"), col("__s"), explode(concat(
        array(col("__s")),
        when(length(col("__s")) >= 1, expr(
          "transform(sequence(1, length(__s)), " +
            "i -> concat(substring(__s, 1, i - 1), " +
            "substring(__s, i + 1, 2147483647)))"))
          .otherwise(array()))).as("__k"))

  /** Distinct id-ordered pairs with Levenshtein(a, b) ≤ 1 (including 0:
    * distinct ids carrying identical strings are the classic duplicate
    * entity). Output columns: id_a, str_a, id_b, str_b.
    */
  def pairsWithin1(df: DataFrame, id: Column, str: Column): DataFrame = {
    val keys = deletionKeys(df, id, str)
    val a = keys.select(col("__id").as("id_a"), col("__s").as("str_a"),
      col("__k"))
    val b = keys.select(col("__id").as("id_b"), col("__s").as("str_b"),
      col("__k"))
    // verify BEFORE distinct: the levenshtein runs map-side inside the
    // join stage (cheap codegen on duplicated candidates — an identical-
    // string pair appears once per shared key), so the distinct's
    // shuffle carries only verified pairs, not the distance-2 noise
    a.join(b, Seq("__k"))
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("str_a"), col("str_b")) <= 1)
      .select("id_a", "str_a", "id_b", "str_b").distinct()
  }
}
