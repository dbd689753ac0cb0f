package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rlike` with a per-executor compiled-pattern cache for NON-FOLDABLE
  * patterns — the production form of a regex match whose pattern comes
  * from a joined column rather than a literal.
  *
  * Spark's built-in `RLike` caches only the single last-seen pattern,
  * so a broadcast-join plan that interleaves a handful of rule patterns
  * row-by-row (the [[graft.operators.RobotsFilter]] shape: URL ⋈ rules,
  * candidates ordered by URL, pattern changing every row) recompiles on
  * nearly every row. Here each DISTINCT pattern string compiles exactly
  * once per executor JVM into a shared [[ConcurrentHashMap]]; every
  * later row is one hash probe + `Matcher.find`.
  *
  * Match semantics are exactly `RLike`'s: unanchored `find(0)` over the
  * Java regex dialect, null if either side is null, throws on an
  * invalid pattern (same as the builtin). So `cached_rlike(s, p)` is a
  * drop-in for `regexp_like(s, p)` wherever `p` is non-foldable.
  *
  * Cache honesty: the cache is sized for POLICY-scale pattern sets
  * (rule tables, schema registries — the only legitimate sources of a
  * non-foldable pattern column). Past [[CachedRLike.MaxCachedPatterns]]
  * distinct patterns it stops inserting and compiles per miss — a
  * corpus-sized pattern column degrades to the builtin's behavior
  * instead of growing an unbounded executor-lifetime map.
  *
  * Scale shape: map-only, codegen'd static call inside the whole-stage
  * span; the cache is executor-local (no shuffle, no driver state).
  */
case class CachedRLike(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"CachedRLike requires two STRING, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(s: Any, rx: Any): Any =
    CachedRLike.matches(s.asInstanceOf[UTF8String], rx.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, rx) => s"""
      ${ev.value} = graft.functions.CachedRLike.matches($s, $rx);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CachedRLike =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cached_rlike"
}

object CachedRLike {

  /** Insertion cap on the executor-lifetime pattern cache. Policy-scale
    * rule sets sit orders of magnitude below this; a corpus-sized
    * pattern column (a misuse) compiles per miss past the cap rather
    * than growing the map without bound.
    */
  val MaxCachedPatterns = 65536

  private val cache = new ConcurrentHashMap[String, Pattern]()

  /** Static kernel shared by eval and generated code. */
  def matches(s: UTF8String, rx: UTF8String): Boolean = {
    val key = rx.toString
    var p = cache.get(key)
    if (p == null) {
      p = Pattern.compile(key)
      if (cache.size < MaxCachedPatterns) cache.putIfAbsent(key, p)
    }
    // RLike's exact semantics: unanchored search from position 0
    p.matcher(s.toString).find(0)
  }

  def cached_rlike(str: Column, pattern: Column): Column =
    GraftColumnBridge.column(CachedRLike(
      GraftColumnBridge.expression(str), GraftColumnBridge.expression(pattern)))
}
