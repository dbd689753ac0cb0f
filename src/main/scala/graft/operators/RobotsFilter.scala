package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robots-exclusion matching per RFC 9309 — the crawl-pipeline rung
  * after [[graft.functions.UrlNormalize]] (normalize → dedup → MAY-FETCH
  * decision): given per-host allow/disallow rules, decide each URL by
  * the spec's group-matching algorithm:
  *
  *  - a rule matches when its path pattern matches a PREFIX of the URL
  *    path, with the two special characters of §2.2.3: `*` matches any
  *    character sequence and a TRAILING `$` anchors the pattern at the
  *    path's end (a non-trailing `$` is a literal octet);
  *  - among matching rules the MOST SPECIFIC wins = the one with the
  *    most octets in its pattern (§2.2.2's longest-match rule; wildcard
  *    octets count — they are pattern octets);
  *  - on a specificity tie, allow beats disallow (§2.2.2: "the least
  *    restrictive rule MUST be used");
  *  - a URL no rule matches is allowed (§2.2.1 default).
  *
  * Patterns compile to anchored regexes with plain column ops (escape
  * regex metacharacters except the two special ones; `*` → `.*`;
  * trailing `$` kept as the anchor, interior `$` escaped) — no UDF, so
  * the whole decision stays one declarative plan: URLs ⋈ host-keyed
  * rules on host, a [[graft.functions.CachedRLike]] match, one per-row
  * window argmax.
  *
  * Scale shape: one ruleset per host (a site's robots.txt is KBs) but
  * host count scales with the crawl, so the rules join is unhinted —
  * AQE broadcasts the ruleset table while it fits and falls back to a
  * host-keyed shuffle join beyond. The only corpus-sized shuffle
  * otherwise is the per-row argmax
  * window, keyed on a row id captured BEFORE the join (so duplicate
  * input rows each keep their verdict — output cardinality == input
  * cardinality, no uniqueness precondition). Candidate rows are
  * |urls| · (rules of that host) — linear in the crawl, never
  * cross-host. Each distinct pattern's regex compiles ONCE per executor
  * (CachedRLike's compiled-pattern cache), not per candidate row as the
  * builtin `regexp_like` would with a non-foldable pattern
  * (`ScaleProbe robots` measures the gap).
  */
object RobotsFilter {

  /** Compile an RFC 9309 path pattern column to the anchored Java regex
    * the matcher evaluates. Exposed for the spec.
    */
  def patternRegex(pattern: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    // 1. escape every regex metacharacter EXCEPT the spec's '*' and '$'
    val esc = regexp_replace(pattern,
      "([\\.\\+\\?\\(\\)\\[\\]\\{\\}\\|\\\\\\^])", "\\\\$1")
    // 2. '*' is the spec's any-sequence wildcard
    val star = regexp_replace(esc, "\\*", ".*")
    // 3. '$' anchors only at pattern end; interior '$' is a literal
    val dollar = regexp_replace(star, "\\$(?!$)", "\\\\\\$")
    concat(lit("^"), dollar)
  }

  /** urls: one row per URL with `host` and `path` columns (extra columns
    * pass through). rules: (host, directive ∈ {allow, disallow},
    * pattern). Returns urls + `verdict` (allow/disallow) + `rule` (the
    * winning pattern, NULL when the §2.2.1 default applied).
    */
  def decide(urls: DataFrame, rules: DataFrame): DataFrame = {
    require(Seq("host", "directive", "pattern")
        .forall(rules.columns.contains),
      s"rules needs host/directive/pattern, got ${rules.columns.mkString(",")}")
    val rx = rules.select(col("host"), col("directive"),
      col("pattern"), length(col("pattern")).as("__plen"),
      patternRegex(col("pattern")).as("__rx"))
    // A NON-matching rule row is demoted to a plen -1 "default allow"
    // candidate instead of being filtered: every URL keeps at least one
    // row (rule-less hosts keep their null left-join row the same way),
    // so the §2.2.1 default needs no second pass or join-back — the one
    // corpus-sized shuffle is the per-row argmax window.
    val m = col("__rx").isNotNull &&
      graft.functions.CachedRLike.cached_rlike(col("path"), col("__rx"))
    // Row id captured BEFORE the join: the argmax partitions on it, so
    // two identical input rows stay two output rows (partitioning on
    // the url columns would merge them and the rn=1 filter would
    // silently drop one).
    val withId = urls.withColumn("__rid", monotonically_increasing_id())
    // rx is one ruleset per HOST — host count scales with the crawl,
    // so the join is unhinted: AQE broadcasts while the ruleset table
    // fits and falls back to a host-keyed shuffle join beyond
    val cand = withId.join(rx, Seq("host"), "left")
      .select(col("__rid") +: urls.columns.map(col) ++: Seq(
        when(m, col("directive")).as("__dir"),
        when(m, col("pattern")).as("__pat"),
        when(m, col("__plen")).otherwise(lit(-1)).as("__plen")): _*)
    // §2.2.2: longest pattern wins, allow beats disallow on ties;
    // pattern text as the final key makes the pick total
    val w = Window.partitionBy(col("__rid"))
      .orderBy(col("__plen").desc, col("__dir").asc_nulls_last,
        col("__pat").asc_nulls_last)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("verdict", coalesce(col("__dir"), lit("allow")))
      .withColumn("rule", col("__pat"))
      .drop("__dir", "__pat", "__plen", "__rn", "__rid")
  }
}
