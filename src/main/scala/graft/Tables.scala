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
