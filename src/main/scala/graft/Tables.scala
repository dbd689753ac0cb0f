package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema
  * (see /root/repo/TESTDATA.md). One parquet file per table; columnar scans
  * with pushdown/pruning come free from the parquet datasource. At cluster
  * scale the same loaders work against partitioned directories — nothing here
  * assumes a single file.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Targeted compute fanout (r16, guide §2.5 "input skew: one huge
    * unsplittable file" + §1.2 "choose a partitioning that avoids
    * skew"): round-robin repartition to the session's parallelism,
    * placed by the ~25 builders whose next stage is CPU-dominated
    * per-row work (codec decode, text scoring, pair fanout + hashing,
    * vector math). Rationale, measured this round: the testdata tables
    * are single-file single-ROW-GROUP parquet, so a scan — and under a
    * broadcast join everything pipelined on top of it — yields ONE
    * non-empty partition no matter what `maxPartitionBytes` says; the
    * suite's decode/score/pair stages were running on one core of a
    * 32-core machine. A BLANKET repartition in `load` was measured and
    * rejected: it multiplied task counts for the ~190 tiny-job queries
    * (32 tasks/stage × many stages: stream replays +11 s) and lost more
    * than it won. The fanout therefore goes only where per-row CPU ≫
    * per-row shuffle cost — the same placement rule that holds at
    * 100 TB, where rebalancing unsplittable/hot-skewed payloads before
    * an expensive map stage is one extra cheap pass that unlocks the
    * cluster (the guide's §8 fingerprint pass does exactly this).
    * `graft.fanout.parts` overrides the width (0 disables — a cluster
    * whose scans already carry file-count parallelism sets 0);
    * deterministic: round-robin repartition local-sorts its input first
    * (SPARK-23207), so row→partition assignment is reproducible, and
    * every query's semantics are partition-independent anyway (the
    * oracle-hash discipline).
    */
  def fanout(spark: SparkSession, df: DataFrame): DataFrame = {
    val parts = spark.conf.getOption("graft.fanout.parts").map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    if (parts <= 1) df else df.repartition(parts)
  }

  /** Keyed variant of [[fanout]]: hash-repartition on `keys`. Preferred
    * when a downstream join/agg is keyed on the same columns — the
    * exchange then doubles as that operator's required distribution
    * (one shuffle, guide §2.4 "two operations keyed the same way share
    * one exchange") and, unlike round-robin, needs no
    * sort-before-repartition pass on the input.
    */
  def fanoutBy(spark: SparkSession, df: DataFrame,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    val parts = spark.conf.getOption("graft.fanout.parts").map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    if (parts <= 1) df else df.repartition(parts, keys: _*)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts arrives in whatever physical type the generator used —
    * TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as a
    * long via the legacy flag), timestamp[us] (read as TIMESTAMP_NTZ), or
    * a plain TIMESTAMP — so normalize by SCHEMA, not by assumption, to one
    * session-zone TIMESTAMP column. Under the UTC session every branch is
    * value-identical (nanos→micros truncation is exact for
    * whole-microsecond data; NTZ→LTZ is a relabel at UTC), so queries and
    * golden pins see the same instants regardless of generator vintage.
    */
  /** Detected epoch unit of an int64 `ts` column, memoized per directory so
    * the one-row probe job runs once per (dir) per JVM, not per query.
    */
  private val tsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros,
      timestamp_millis, timestamp_seconds}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        // Regeneration-drift guard (r8 advice): a bare int64 carries no
        // unit, and assuming nanos would be silently 1000x off if a future
        // generator vintage writes micros/millis. Infer the unit from the
        // magnitude of one sampled value (epoch ranges for 1973..2096 are
        // 3 orders of magnitude apart, so the bands cannot overlap) and
        // fail loudly outside every band rather than guess.
        val unit = tsUnitCache.computeIfAbsent(d, _ => {
          val first = df.select("ts").filter(col("ts").isNotNull).head(1)
          if (first.isEmpty) throw new IllegalStateException(
            s"events.parquet at $d: int64 ts column with no non-null rows — cannot infer epoch unit")
          val v = math.abs(first(0).getLong(0))
          if (v >= 1e17 && v < 4e18) "nanos"
          else if (v >= 1e14 && v < 4e15) "micros"
          else if (v >= 1e11 && v < 4e12) "millis"
          else if (v >= 1e8 && v < 4e9) "seconds"
          else throw new IllegalStateException(
            s"events.parquet at $d: int64 ts value $v matches no plausible epoch unit (nanos/micros/millis/seconds for years ~1973..2096)")
        })
        unit match {
          case "nanos"   => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case "micros"  => df.withColumn("ts", timestamp_micros(col("ts")))
          case "millis"  => df.withColumn("ts", timestamp_millis(col("ts")))
          case "seconds" => df.withColumn("ts", timestamp_seconds(col("ts")))
        }
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
