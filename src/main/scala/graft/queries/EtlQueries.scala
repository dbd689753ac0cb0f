package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** ETL operator family (SURVEY.md §2.2/§2.3) re-targeted onto the testdata
  * tables so the DuckDB oracle can check it end-to-end: `events` plays the
  * transaction stream, `customer` the join dimension (inner = referential
  * drop, hybridjoin.py:342-362), `part` the enrichment dimension (left +
  * default fill, hybridjoin.py:399-404).
  */
object EtlQueries {
  private val Money = DecimalType(18, 2)

  /** E1/F-family analog: the full batch fact build. The product key is
    * parsed out of the JSON-ish props payload (F2 key-cast tolerance),
    * quantity is `value` (F4), sales_amount = round(qty*price, 2) in exact
    * decimal (F5), date_id is the deterministic yyyyMMdd surrogate (F8).
    * Dim hints are soft: AQE broadcasts the slim customer/part
    * projections while they fit `autoBroadcastJoinThreshold` and falls
    * back to a shuffled join on int keys beyond — customer/part grow
    * linearly with the corpus (TPC-H SF), so a forced hint would pin a
    * BroadcastHashJoin onto a multi-billion-row side at 100 TB.
    */
  val factBuild = QueryDef(
    "etl_fact_build",
    (s, dir) => {
      val ev = events(s, dir)
      val cust = customer(s, dir).select("c_custkey", "c_mktsegment")
      val prod = part(s, dir).select("p_partkey", "p_retailprice")
      ev
        .withColumn("part_key",
          expr("try_cast(regexp_extract(props, '[0-9]+', 0) AS BIGINT)"))
        .join(cust, col("user_id") === col("c_custkey"), "inner")
        .join(prod, col("part_key") === col("p_partkey"), "left")
        .select(
          col("event_id"), col("user_id").as("cust_key"), col("c_mktsegment"),
          col("part_key"),
          (year(col("ts")) * 10000 + month(col("ts")) * 100
            + dayofmonth(col("ts"))).cast(IntegerType).as("date_id"),
          col("value").cast(Money).cast(DoubleType).as("quantity"),
          coalesce(col("p_retailprice").cast(Money), lit(0).cast(Money))
            .cast(DoubleType).as("price"),
          round(col("value").cast(Money) *
            coalesce(col("p_retailprice").cast(Money), lit(0).cast(Money)), 2)
            .cast(Money).cast(DoubleType).as("sales_amount"))
        .orderBy("event_id")
    },
    Some("""
      SELECT e.event_id, e.user_id AS cust_key, c.c_mktsegment,
             TRY_CAST(regexp_extract(e.props, '[0-9]+') AS BIGINT) AS part_key,
             CAST(year(e.ts)*10000 + month(e.ts)*100 + day(e.ts) AS INTEGER) AS date_id,
             CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) AS quantity,
             CAST(COALESCE(CAST(p.p_retailprice AS DECIMAL(18,2)),
                      CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS price,
             CAST(CAST(ROUND(CAST(e.value AS DECIMAL(18,2)) *
               COALESCE(CAST(p.p_retailprice AS DECIMAL(18,2)),
                        CAST(0 AS DECIMAL(18,2))), 2) AS DECIMAL(18,2))
               AS DOUBLE) AS sales_amount
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      LEFT JOIN part p
        ON TRY_CAST(regexp_extract(e.props, '[0-9]+') AS BIGINT) = p.p_partkey
      ORDER BY event_id"""))

  /** S5/O4 analog: deterministic dimension dedup of a denormalized source —
    * groupBy + min/count instead of dropDuplicates so the survivor is stable
    * under any partitioning (master_data.ipynb cells bfa480a3–168be966).
    */
  val dimBuild = QueryDef(
    "etl_dim_dedup",
    (s, dir) => {
      part(s, dir)
        .groupBy("p_brand", "p_type")
        .agg(
          count(lit(1)).as("n_parts"),
          min(col("p_partkey")).as("sample_key"),
          min(col("p_retailprice").cast(Money)).cast(DoubleType).as("min_price"))
        .orderBy("p_brand", "p_type")
    },
    Some("""
      SELECT p_brand, p_type, COUNT(*) AS n_parts,
             MIN(p_partkey) AS sample_key,
             CAST(MIN(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price
      FROM part GROUP BY 1,2 ORDER BY p_brand, p_type"""))

  /** F7/F8 analog: the derived date dimension over the distinct order dates —
    * deterministic surrogate key, calendar attributes, weekend flag
    * (hybridjoin.py:170-205 replaced by pure column derivations).
    */
  val dateDim = QueryDef(
    "etl_date_dim",
    (s, dir) => {
      val d = col("transaction_date")
      orders(s, dir)
        .select(col("o_orderdate").cast(DateType).as("transaction_date"))
        .distinct()
        .select(
          (year(d) * 10000 + month(d) * 100 + dayofmonth(d))
            .cast(IntegerType).as("date_id"),
          d,
          dayofmonth(d).as("day_num"),
          month(d).as("month_num"),
          year(d).as("year_num"),
          date_format(d, "EEEE").as("day_of_week"),
          quarter(d).as("quarter_num"),
          dayofweek(d).isin(1, 7).as("is_weekend"))
        .orderBy("date_id")
    },
    Some("""
      SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS INTEGER) AS date_id,
             d AS transaction_date,
             CAST(day(d) AS INTEGER) AS day_num,
             CAST(month(d) AS INTEGER) AS month_num,
             CAST(year(d) AS INTEGER) AS year_num,
             dayname(d) AS day_of_week,
             CAST(quarter(d) AS INTEGER) AS quarter_num,
             isodow(d) IN (6,7) AS is_weekend
      FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
      ORDER BY date_id"""))

  /** Gap-based sessionization over the events stream table — the batch
    * twin of StreamOps.sessionize (10-minute gap), fully oracle-checked:
    * LAG-gap boundary detection, running session ids, per-session
    * aggregates with exact decimal sums. The DEDICATED operator form
    * ([[sessionsWindow]]) shares this oracle verbatim.
    */
  val sessionsBatch = QueryDef(
    "stream_sessions_batch",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          (col("prev_ts").isNull ||
            (unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 600000L))
            .cast("int"))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(Money)).cast(DoubleType).as("total_value"))
        .drop("session_id")
        .orderBy("user_id", "session_start")
    },
    Some("""
      WITH x AS (
        SELECT user_id, ts::TIMESTAMP AS ts, CAST(value AS DECIMAL(18,2)) AS v,
               LAG(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events),
      y AS (
        SELECT *, CASE WHEN prev_ts IS NULL
          OR (epoch_ms(ts) - epoch_ms(prev_ts)) > 600000 THEN 1 ELSE 0 END AS ns
        FROM x),
      z AS (
        SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM y)
      SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events,
             CAST(SUM(v) AS DOUBLE) AS total_value
      FROM z GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** The DEDICATED sessionization operator (`session_window`, Spark's
    * native gap-session aggregate — also the streaming-state form) as a
    * twin of [[sessionsBatch]]'s LAG construction, proven equivalent by
    * sharing its oracle VERBATIM (the q38/q38b twin discipline). Plan
    * difference at scale: session_window is ONE partial-aggregable
    * session-merge aggregation (and the only form that runs under
    * Structured Streaming state); the LAG form is a window sort + two
    * aggs. Boundary semantics ALIGN even at exactly the gap: the LAG
    * form merges a diff == gap event (`> 600000` test) and
    * session_window's merge test is empirically INCLUSIVE at the
    * previous window end despite the docs' half-open "[start,
    * start+gap)" notation — `SessionWindowBoundarySpec` pins the
    * agreement on crafted exact-gap rows, so the twins are equivalent
    * at EVERY gap value, not just on gap-free data.
    */
  val sessionsWindow = QueryDef(
    "stream_sessions_window",
    (s, dir) => {
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(Money)).cast(DoubleType).as("total_value"))
        .drop("session_window")
        .orderBy("user_id", "session_start")
    },
    sessionsBatch.oracle)

  /** Tumbling-window event stats over the events table — the batch twin
    * of StreamOps.windowedEventStats (the SAME groupBy(window(...)) plan;
    * the watermark node is a no-op under batch execution, so this query
    * oracle-checks the exact aggregation the streaming operator runs).
    * Value sums go through decimal so the hash match is order-independent;
    * the oracle floors epochs to the hour exactly like Spark's
    * epoch-aligned tumbling window.
    */
  val windowStatsBatch = QueryDef(
    "stream_window_stats_batch",
    (s, dir) => graft.streaming.StreamOps.windowedEventStats(
      events(s, dir).withColumn("value", col("value").cast(Money)),
      "1 hour", "1 hour")
      .withColumn("total_value", col("total_value").cast(DoubleType))
      .orderBy("window_start", "event_type"),
    Some("""
      WITH w AS (
        -- CAST to plain TIMESTAMP: DuckDB's to_timestamp() returns
        -- TIMESTAMPTZ, but Spark's window.start/.end are TIMESTAMP —
        -- without the cast the driver's schema compare fails (r5 finding).
        SELECT CAST(to_timestamp(floor(epoch(ts::TIMESTAMP) / 3600) * 3600)
                 AS TIMESTAMP) AS window_start,
               event_type, CAST(value AS DECIMAL(18,2)) AS v
        FROM events)
      SELECT window_start,
             CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
             event_type,
             COUNT(*) AS n_events,
             CAST(SUM(v) AS DOUBLE) AS total_value
      FROM w GROUP BY window_start, event_type
      ORDER BY window_start, event_type"""))

  /** Sliding-window twin (StreamOps.slidingEventStats, 20-min windows
    * every 10): each event lands in exactly len/slide = 2 windows — the
    * overlap the tumbling shape cannot express (trend smoothing). The
    * oracle expands the same two epoch-aligned window starts per event
    * with unnest, proving Spark's window() assignment bit-exactly.
    */
  val slidingStatsBatch = QueryDef(
    "stream_sliding_stats_batch",
    (s, dir) => graft.streaming.StreamOps.slidingEventStats(
      events(s, dir).withColumn("value", col("value").cast(Money)),
      "20 minutes", "10 minutes", "1 hour")
      .withColumn("total_value", col("total_value").cast(DoubleType))
      .orderBy("window_start", "event_type"),
    Some("""
      WITH e AS (
        SELECT ts::TIMESTAMP AS ts, event_type,
               CAST(value AS DECIMAL(18,2)) AS v,
               CAST(floor(epoch(ts::TIMESTAMP) / 600) * 600 AS BIGINT) AS b
        FROM events),
      w AS (
        SELECT unnest([b, b - 600]) AS ws, event_type, v FROM e)
      SELECT CAST(to_timestamp(ws) AS TIMESTAMP) AS window_start,
             CAST(to_timestamp(ws + 1200) AS TIMESTAMP) AS window_end,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(v) AS DOUBLE) AS total_value
      FROM w GROUP BY ws, event_type
      ORDER BY window_start, event_type"""))

  /** Trending report: top-3 event types per tumbling hour by event count
    * — the windowed-agg + per-window ranking composition every
    * monitoring/trending surface runs. Built ON the windowed-stats
    * operator (same epoch-aligned tumbling windows), then a row_number
    * over the tiny per-window frame (|windows| × |types| rows, already
    * aggregated — the rank window never sees raw events).
    */
  val streamTrendingBatch = QueryDef(
    "stream_trending_batch",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val stats = graft.streaming.StreamOps.windowedEventStats(
        events(s, dir).withColumn("value", col("value").cast(Money)),
        "1 hour", "1 hour")
      val w = Window.partitionBy(col("window_start"))
        .orderBy(col("n_events").desc, col("event_type"))
      stats
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("window_start"), col("window_end"), col("event_type"),
          col("n_events"),
          col("total_value").cast(DoubleType).as("total_value"),
          col("rank"))
        .orderBy("window_start", "rank")
    },
    Some("""
      WITH w AS (
        SELECT CAST(to_timestamp(floor(epoch(ts::TIMESTAMP) / 3600) * 3600)
                 AS TIMESTAMP) AS window_start,
               event_type, CAST(value AS DECIMAL(18,2)) AS v
        FROM events),
      agg AS (
        SELECT window_start,
               CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP)
                 AS window_end,
               event_type, COUNT(*) AS n_events,
               CAST(SUM(v) AS DOUBLE) AS total_value
        FROM w GROUP BY window_start, event_type),
      ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY window_start
                 ORDER BY n_events DESC, event_type) AS INTEGER) AS rank
        FROM agg)
      SELECT window_start, window_end, event_type, n_events, total_value,
             rank
      FROM ranked WHERE rank <= 3 ORDER BY window_start, rank"""))

  /** Batch twin of StreamOps.dedupStream (dropDuplicatesWithinWatermark):
    * one survivor per content fingerprint — earliest (ts, event_id) wins —
    * plus the per-fingerprint delivery count. The streaming side keeps the
    * first ARRIVAL inside the watermark horizon; with rows fed in
    * event-time order the two are identical, which
    * StreamingDedupParitySpec pins. Oracled here so the dedup semantics
    * themselves are cross-engine-checked, not just spec'd.
    */
  val streamDedupBatch = QueryDef(
    "stream_dedup_batch",
    (s, dir) => graft.streaming.StreamOps.dedupBatchTwin(events(s, dir))
      .orderBy("event_id"),
    Some("""
      WITH f AS (
        -- chr(1) = StreamOps.FpSeparator: a '|' inside a value must not
        -- shift content across slot boundaries. chr(2) = FpNullSentinel,
        -- DISTINCT from the separator so (NULL,'') and ('',NULL) cannot
        -- render identically (concat_ws skips NULL slots entirely)
        SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value,
               md5(concat_ws(chr(1),
                 COALESCE(CAST(user_id AS VARCHAR), chr(2)),
                 COALESCE(event_type, chr(2)),
                 COALESCE(props, chr(2)))) AS fp
        FROM events),
      d AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY ts, event_id)
                 AS rn,
               COUNT(*) OVER (PARTITION BY fp) AS n_dupes
        FROM f)
      SELECT event_id, ts, user_id, event_type, value, fp,
             CAST(n_dupes AS BIGINT) AS n_dupes
      FROM d WHERE rn = 1 ORDER BY event_id"""))

  /** SCD Type-2 dimension history built from a change stream: per user,
    * keep only events where the tracked attribute CHANGES (lag compare),
    * then close each version with the next change's timestamp (lead) —
    * open versions get NULL valid_to and is_current. The classic
    * warehouse versioned-dimension build (the reference's dim upsert,
    * `master_data.ipynb` drop_duplicates, is the degenerate keep-latest
    * form of this).
    *
    * Scale note: both windows partition by user_id with compatible
    * orderings, so Catalyst reuses ONE shuffle+sort for the lag and the
    * lead — the whole history build costs a single exchange of the
    * (already-projected) change columns.
    */
  val scd2Dim = QueryDef(
    "etl_scd2_dim",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("event_id"))
      // event_id stays in the OUTPUT: it names the change event that
      // opened the version, and it is the tie-breaker that makes the
      // final sort total — same-timestamp changes would otherwise order
      // nondeterministically (review finding)
      changes
        .select(col("user_id"), col("event_type"),
          col("ts").as("valid_from"), col("event_id"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("user_id", "valid_from", "event_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
        FROM events),
      c AS (
        SELECT user_id, event_type, ts AS valid_from, event_id
        FROM e WHERE prev_type IS NULL OR prev_type <> event_type),
      v AS (
        SELECT user_id, event_type, valid_from, event_id,
               LEAD(valid_from) OVER (PARTITION BY user_id
                 ORDER BY valid_from, event_id) AS valid_to
        FROM c)
      SELECT user_id, event_type, valid_from, event_id, valid_to,
             valid_to IS NULL AS is_current
      FROM v ORDER BY user_id, valid_from, event_id"""))

  /** INCREMENTAL SCD2 maintenance — the nightly-load twin of
    * [[scd2Dim]]: yesterday's SCD2 table absorbs today's batch (all
    * events after a time frontier, max(ts) − 3 days — nightly loads are
    * time-split, which is what makes incremental SCD2 sound: a batch
    * that could rewrite MID-history would invalidate closed versions,
    * the reason CDC-style modulo splits don't work here) by
    * close-and-append on TOUCHED USERS only:
    *
    *  - untouched users' rows and touched users' CLOSED versions pass
    *    through untouched (broadcast anti/semi joins on the batch's
    *    id-only user set);
    *  - each touched user's tail rebuilds from (their CURRENT version
    *    row as a pseudo-change ∪ their batch events): the lag-collapse
    *    drops batch events that continue the current type (the version
    *    extends, same valid_from/event_id), closes the current row when
    *    the type changes, and chains further changes — all on a
    *    batch-sized frame;
    *  - a user born in the batch chains purely from batch rows.
    *
    * Since every batch ts is after every base ts, the rebuilt tail's
    * first version keeps the old current version's identity, so
    * maintained output ≡ the full-history rebuild — proven by running
    * the UNCHANGED full-history oracle against the incremental plan.
    * Per-batch cost scales with the batch + touched tails, never the
    * history table.
    */
  val scd2Incremental = QueryDef(
    "etl_scd2_incremental",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def chains(df: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val w2 = Window.partitionBy(col("user_id"))
          .orderBy(col("valid_from"), col("event_id"))
        df.withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
          .select(col("user_id"), col("event_type"),
            col("ts").as("valid_from"), col("event_id"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
          .withColumn("is_current", col("valid_to").isNull)
      }
      val ev = events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      val frontier = ev.agg(
        (max(col("ts")) - expr("INTERVAL 3 DAYS")).as("t0"))
      val tagged = ev.crossJoin(broadcast(frontier))
      val base = tagged.filter(col("ts") < col("t0")).drop("t0")
      val batch = tagged.filter(col("ts") >= col("t0")).drop("t0")
      val baseV = chains(base).localCheckpoint(false)
      val touched = batch.select("user_id").distinct()
      // touched is delta-keyed (unbounded on a backfill): unhinted
      val untouched = baseV.join(touched, Seq("user_id"),
        "left_anti")
      val touchedBase = baseV.join(touched, Seq("user_id"),
        "left_semi")
      val closed = touchedBase.filter(!col("is_current"))
      val pseudo = touchedBase.filter(col("is_current"))
        .select(col("user_id"), col("valid_from").as("ts"),
          col("event_id"), col("event_type"))
      val rebuilt = chains(pseudo.unionByName(batch))
      untouched.unionByName(closed).unionByName(rebuilt)
        .orderBy("user_id", "valid_from", "event_id")
    },
    scd2Dim.oracle)

  /** The SCD2 CONSUMER: every event joined to the dimension version that
    * was current AT the event's timestamp — the point-in-time lookup that
    * is the whole reason warehouses build SCD2 history (the generalization
    * of the reference's date-keyed dim lookup, hybridjoin.py:149-205).
    *
    * Versions come from the same change-stream build as `etl_scd2_dim`;
    * empty versions `[t, t)` — produced when two changes share a
    * timestamp, the earlier being closed at the instant it opened — are
    * dropped FIRST, which makes valid_from unique per user and the as-of
    * match deterministic on both engines. The lookup itself is
    * operators.AsOfJoin (union + one per-user window — no join, no
    * broadcast assumption, so a 100 TB fact against a billion-row version
    * table costs one co-partitioned shuffle), checked against DuckDB's
    * native ASOF LEFT JOIN.
    */
  val scd2AsAt = QueryDef(
    "etl_scd2_asat",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = ev
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("version_event_id"))
      val versions = changes
        .select(col("user_id"), col("event_type").as("asat_type"),
          col("ts").as("valid_from"), col("event_id").as("version_event_id"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
        .filter(col("valid_to").isNull || col("valid_from") < col("valid_to"))
        .withColumn("version_from", col("valid_from"))
      val evs = ev.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"),
        col("value").cast(Money).cast(DoubleType).as("value"))
      graft.operators.AsOfJoin.asofJoin(evs, versions, "user_id", "ts",
        "valid_from", Seq("asat_type", "version_from", "version_event_id"))
        .orderBy("event_id")
    },
    Some("""
      WITH e AS (
        SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
        FROM events),
      c AS (
        SELECT user_id, event_type, ts AS valid_from, event_id
        FROM e WHERE prev_type IS NULL OR prev_type <> event_type),
      v AS (
        SELECT user_id, event_type AS asat_type, valid_from,
               event_id AS version_event_id,
               LEAD(valid_from) OVER (PARTITION BY user_id
                 ORDER BY valid_from, event_id) AS valid_to
        FROM c),
      nv AS (
        SELECT * FROM v WHERE valid_to IS NULL OR valid_from < valid_to)
      SELECT ev.event_id, ev.ts, ev.user_id, ev.event_type,
             CAST(CAST(ev.value AS DECIMAL(18,2)) AS DOUBLE) AS value,
             nv.asat_type, nv.valid_from AS version_from,
             nv.version_event_id
      FROM (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type,
                   value FROM events) ev
      ASOF LEFT JOIN nv
        ON ev.user_id = nv.user_id AND ev.ts >= nv.valid_from
      ORDER BY event_id"""))

  /** Semi-structured payload parsing: the JSON props column through a real
    * JSON parser (from_json with a declared schema — not the regex
    * fallback), plus a per-key aggregate. The shape every event pipeline
    * needs at ingest.
    */
  val jsonProps = QueryDef(
    "etl_json_props",
    (s, dir) => {
      val parsed = events(s, dir)
        .withColumn("p", from_json(col("props"),
          StructType(Seq(StructField("k", IntegerType)))))
        .select(col("event_id"), col("event_type"), col("p.k").as("k"),
          col("value").cast(Money).as("v"))
      parsed.groupBy("event_type", "k")
        .agg(count(lit(1)).as("n_events"),
          sum(col("v")).cast(DoubleType).as("total_value"))
        .orderBy("event_type", "k")
    },
    Some("""
      SELECT event_type,
             -- json_valid guard mirrors Spark's from_json, which yields
             -- NULL on malformed input where DuckDB's extractor throws
             -- (adversarial-corpus finding)
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
             END AS k,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
      FROM events GROUP BY 1,2 ORDER BY event_type, k"""))

  /** As-of enrichment (operators.AsOfJoin): every click picks up the
    * user's most recent purchase value at or before the click — checked
    * against DuckDB's native ASOF LEFT JOIN. The Spark side is the
    * union+window composition (one shuffle, works at any right-side size).
    */
  val asofEnrich = QueryDef(
    "etl_asof_enrich",
    (s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"),
          col("value").cast(Money).as("purchase_value"))
      graft.operators.AsOfJoin.asofJoin(clicks, purchases,
        "user_id", "ts", "pts", Seq("purchase_value"))
        .withColumn("purchase_value", col("purchase_value").cast(DoubleType))
        .orderBy("event_id")
    },
    Some("""
      SELECT c.event_id, c.user_id, c.ts,
             CAST(p.purchase_value AS DOUBLE) AS purchase_value
      FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
            WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS pts,
                      CAST(value AS DECIMAL(18,2)) AS purchase_value
                      FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts >= p.pts
      ORDER BY event_id"""))

  /** As-of enrichment with a tolerance window: a purchase older than one
    * day no longer counts (payload nulls out, the click row stays). The
    * DuckDB twin is ASOF LEFT JOIN + an interval nullify — boundary is
    * inclusive on both sides.
    */
  val asofWindow = QueryDef(
    "etl_asof_window",
    (s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"),
          col("value").cast(Money).as("purchase_value"))
      graft.operators.AsOfJoin.asofJoinWithin(clicks, purchases,
        "user_id", "ts", "pts", Seq("purchase_value"), maxGapSeconds = 86400L)
        .withColumn("purchase_value", col("purchase_value").cast(DoubleType))
        .orderBy("event_id")
    },
    Some("""
      SELECT c.event_id, c.user_id, c.ts,
             CASE WHEN c.ts - p.pts <= INTERVAL 1 DAY
                  THEN CAST(p.purchase_value AS DOUBLE) END AS purchase_value
      FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
            WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS pts,
                      CAST(value AS DECIMAL(18,2)) AS purchase_value
                      FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts >= p.pts
      ORDER BY event_id"""))

  /** CDC changelog apply — the lakehouse MERGE/compaction primitive:
    * the event stream read as a changelog on user_id (last writer wins,
    * 'error' = tombstone), compacted to the final snapshot. One
    * partial-aggregating max_by(struct) per key — each executor ships one
    * candidate row per key it saw, NOT every change (the window-rank
    * realization ships the full changelog through the shuffle; same
    * min_by discipline as stream_dedup_batch). Deterministic under ties
    * via the (ts, event_id) order struct. Deletes drop AFTER compaction:
    * a tombstone only erases the key if it IS the last write.
    */
  val cdcApply = QueryDef(
    "etl_cdc_apply",
    (s, dir) => graft.operators.CdcMerge
      .compact(events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"), col("ts"),
          col("event_id")),
        Seq("user_id"), Seq("ts", "event_id"))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"),
        col("event_type").as("last_type"),
        col("value").cast(Money).cast(DoubleType).as("last_value"),
        col("ts").as("updated_at"),
        col("event_id").as("last_event_id"))
      .orderBy("user_id"),
    Some("""
      WITH r AS (
        SELECT user_id, event_type, value, ts::TIMESTAMP AS ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, event_type AS last_type,
             CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
             ts AS updated_at, event_id AS last_event_id
      FROM r WHERE rn = 1 AND event_type <> 'error'
      ORDER BY user_id"""))

  /** INCREMENTAL CDC apply — the steady-state daily-lakehouse shape of
    * [[cdcApply]] (r7 verdict #4): a NEW changelog batch merges into an
    * EXISTING compacted table instead of recompacting the world. The
    * split is by event_id (every 5th event is "today's batch"), so batch
    * timestamps INTERLEAVE with the base — late data included, which is
    * what makes the merge a real max_by fold rather than
    * "newer-batch-always-wins".
    *
    * Merge discipline (the `llm_dedup_incremental` pattern applied to the
    * warehouse, = the steady-state form of the reference's batched upsert
    * contract, hybridjoin.py:449-486):
    *  - the base compaction RETAINS tombstones ('error' rows) — a
    *    compacted CDC table must keep them mergeable until a fold
    *    horizon, else a late non-delete could resurrect behind one;
    *  - touched = the new batch's distinct keys — an id-only frame,
    *    broadcast-sized by the batch, never by the table;
    *  - untouched base rows pass through with NO recompute (one
    *    broadcast anti join — at 100 TB this is the whole point: cost
    *    scales with the batch, not the table);
    *  - touched keys recompact over (base candidate row ∪ new rows) —
    *    max_by over the same (ts, event_id) order struct, correct
    *    because the base row is already the max of the old changes;
    *  - tombstones drop only in the final SERVING view.
    *
    * The oracle is the full-changelog window rank — the incremental
    * merge is proven row-equal to compacting the concatenated changelog
    * from scratch.
    */
  val cdcApplyIncremental = QueryDef(
    "etl_cdc_apply_incremental",
    (s, dir) => {
      import graft.operators.CdcMerge
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"), col("ts"),
          col("event_id"))
      val isNew = pmod(col("event_id"), lit(5)) === 0
      val key = Seq("user_id")
      val ord = Seq("ts", "event_id")
      val base = CdcMerge.compact(ev.filter(!isNew), key, ord) // yesterday
      val newBatch = ev.filter(isNew)                          // today
      CdcMerge.merge(base, newBatch, key, ord)
        .filter(col("event_type") =!= "error")
        .select(col("user_id"),
          col("event_type").as("last_type"),
          col("value").cast(Money).cast(DoubleType).as("last_value"),
          col("ts").as("updated_at"),
          col("event_id").as("last_event_id"))
        .orderBy("user_id")
    },
    cdcApply.oracle)

  /** INCREMENTAL AGGREGATE maintenance — the materialized-view rung above
    * [[cdcApplyIncremental]]: a per-type serving aggregate
    * (users, total value) over the compacted CDC snapshot, maintained
    * under today's changelog batch by RETRACT/INSERT deltas instead of
    * recomputation — the near-real-time-warehouse op the reference's
    * dashboard would run between full loads. Delta discipline:
    *
    *  - the maintained aggregate = yesterday's aggregate (stands in for
    *    the persisted MV; at steady state it is a |groups|-row table)
    *    MINUS the touched keys' OLD serving contributions PLUS their NEW
    *    ones — a moved key (type A → B) decrements A and increments B,
    *    a tombstoned key only decrements, a new key only increments;
    *  - touched = the batch's distinct ids (broadcast, batch-sized);
    *    retract reads the base snapshot via a broadcast SEMI join
    *    (key-pruned at scale), insert is the batch-keys recompaction —
    *    every delta-side frame scales with the BATCH, never the table;
    *  - tombstones ('error') never contribute on either side: they were
    *    not in the serving aggregate, so they must not be retracted;
    *  - contributions fold as (±1, ±value) with the value summed in
    *    exact DECIMAL (order-independent; the fold introduces negatives,
    *    which decimal addition handles exactly where a float fold would
    *    reorder error); groups folded to zero users drop.
    *
    * The oracle recomputes the aggregate from the FULL changelog from
    * scratch — maintained ≡ recomputed, proven cross-engine.
    */
  val cdcAggIncremental = QueryDef(
    "etl_cdc_agg_incremental",
    (s, dir) => {
      import graft.operators.CdcMerge
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"), col("ts"),
          col("event_id"))
      val isNew = pmod(col("event_id"), lit(5)) === 0
      val key = Seq("user_id")
      val ord = Seq("ts", "event_id")
      val baseSnap = CdcMerge.compact(ev.filter(!isNew), key, ord)
      val batch = ev.filter(isNew)
      CdcMerge.maintainAgg(baseSnap, batch, key, ord,
        "event_type", col("value").cast(Money),
        col("event_type") =!= "error")
        .select(col("event_type").as("last_type"),
          col("n_keys").as("n_users"),
          col("total").cast(DoubleType).as("total_value"))
        .orderBy("last_type")
    },
    Some("""
      WITH r AS (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events),
      s AS (SELECT * FROM r WHERE rn = 1 AND event_type <> 'error')
      SELECT event_type AS last_type,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
      FROM s GROUP BY 1 ORDER BY 1"""))

  /** Concurrent-session analysis via the bucketed interval-overlap join
    * (operators.IntervalJoin): per session, how many OTHER users had a
    * session overlapping it in time. The overlap join is interval-vs-
    * interval — past J3's interval-vs-scalar range join — realized as
    * explode-to-time-buckets + equi-join + report-once dedup, never a
    * theta nested loop; the DuckDB oracle IS the theta join (its IEJoin
    * handles it at oracle scale), so the bucketed plan is proven
    * equivalent to the quadratic definition on every row.
    */
  /** One oracle for BOTH overlap realizations: the quadratic theta-join
    * definition (DuckDB's IEJoin handles it at oracle scale).
    */
  private val SessionOverlapOracle: Option[String] = Some("""
      WITH x AS (
        SELECT user_id, ts::TIMESTAMP AS ts,
               LAG(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts)
                 AS prev_ts
        FROM events),
      y AS (
        SELECT *, CASE WHEN prev_ts IS NULL
          OR (epoch_ms(ts) - epoch_ms(prev_ts)) > 600000 THEN 1 ELSE 0 END
          AS ns
        FROM x),
      z AS (
        SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM y),
      s AS (
        SELECT user_id, MIN(ts) AS st, MAX(ts) AS en
        FROM z GROUP BY user_id, sid),
      o AS (
        SELECT a.user_id, a.st, COUNT(*) AS n
        FROM s a JOIN s b
          ON a.user_id <> b.user_id AND a.st <= b.en AND b.st <= a.en
        GROUP BY 1, 2)
      SELECT s.user_id, s.st AS session_start, s.en AS session_end,
             COALESCE(o.n, 0) AS n_concurrent
      FROM s LEFT JOIN o ON s.user_id = o.user_id AND s.st = o.st
      ORDER BY s.user_id, session_start""")

  /** Shared session derivation for the two overlap realizations. */
  private def sessionFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 600000L))
          .cast("int"))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .drop("session_id")
  }

  /** The rank-arithmetic realization of the SAME overlap counts —
    * #overlaps = #{starts <= end} − #{ends < start} − 1 (self; same-user
    * sessions are >10-min-gap-separated, so self is the only same-user
    * overlap) — via IntervalJoin.overlapCounts: two bucketed running
    * counts, no pair stream at all. overlapJoin's intermediate is
    * quadratic in per-bucket concurrency (inherent when the PAIRS are
    * the output); when only counts are needed this is the 100 TB plan.
    * Both queries run against the IDENTICAL theta-join oracle, so both
    * realizations are proven row-equal to the quadratic definition.
    */
  val sessionOverlapFast = QueryDef(
    "etl_session_overlap_fast",
    (s, dir) => graft.operators.IntervalJoin
      .overlapCounts(sessionFrame(s, dir).localCheckpoint(false),
        "session_start", "session_end", bucketMillis = 3600000L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_overlap").as("n_concurrent"))
      .orderBy("user_id", "session_start"),
    SessionOverlapOracle)

  val sessionOverlap = QueryDef(
    "etl_session_overlap",
    (s, dir) => {
      // feeds both overlap sides AND the join-back — stage it once
      val sessions = sessionFrame(s, dir).localCheckpoint(false)
      val a = sessions.select(col("user_id").as("a_user"),
        col("session_start").as("a_start"), col("session_end").as("a_end"))
      val b = sessions.select(col("user_id").as("b_user"),
        col("session_start").as("b_start"), col("session_end").as("b_end"))
      // maxBucketRows runs the HOT-BUCKET-GUARDED code path (the __bk
      // blacklist) with a cap generously above any real bucket here, so
      // the oracle proves the capped plan row-equal to the quadratic
      // definition; the cap's effect on a planted pathological bucket is
      // measured by `ScaleProbe hotbucket`
      val counts = graft.operators.IntervalJoin
        .overlapJoin(a, b, "a_start", "a_end", "b_start", "b_end",
          bucketMillis = 600000L, maxBucketRows = 100000L)
        .filter(col("a_user") =!= col("b_user"))
        .groupBy(col("a_user").as("user_id"),
          col("a_start").as("session_start"))
        .agg(count(lit(1)).as("n_concurrent"))
      sessions.join(counts, Seq("user_id", "session_start"), "left")
        .select(col("user_id"), col("session_start"), col("session_end"),
          coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"))
        .orderBy("user_id", "session_start")
    },
    SessionOverlapOracle)

  /** Multi-touch attribution — the marketing readout one step past the
    * raw pair stream (stream_attrib_batch) and the single-touch funnel:
    * each purchase splits ONE unit of credit across ALL clicks by the
    * same user in the preceding 24 hours (the standard one-day click
    * window), credit summed per campaign (the
    * JSON props key of the click, the etl_json_props parse, mod 10).
    * The cross-engine trick is the credit arithmetic: equal-split 1/k
    * is not exactly representable and a DOUBLE 1/k fold sums
    * engine-ordered — so credit is integer PARTS-PER-MILLION with the
    * remainder assigned deterministically to the EARLIEST clicks:
    * ppm = 10⁶ div k + (1 if rank ≤ 10⁶ mod k else 0), which sums to
    * exactly 10⁶ per attributed purchase and keeps the whole readout
    * exact BIGINTs. Plan: user-keyed equi join with the time-range
    * residual (the attributeJoin shape), ONE purchase-partitioned
    * window carrying both frames (rank + full count — same partition
    * and order spec, one sort), campaign-keyed partial agg.
    * Unattributed purchases simply contribute no rows (inner join) —
    * the readout is about where credit LANDED. Skew: per-user fanout is
    * clicks×purchases, so a BOT user is a quadratic term — the escape
    * is a clicks-per-user cap (count → broadcast blacklist → drop from
    * attribution; crediting a bot is wrong anyway, so the cap is a
    * correctness policy). `ScaleProbe multitouch` measures it: a
    * planted 80k-click bot injects 640M pair rows uncapped (×4 bot →
    * ×3.8 time, quadratic) while the capped path stays at clean-corpus
    * time — flat at 0.6 s even at 1.28M bot clicks (164 G would-be
    * pairs, structurally un-runnable uncapped).
    */
  val multitouch = QueryDef(
    "etl_multitouch_attribution",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click" && col("user_id").isNotNull)
        .withColumn("camp",
          from_json(col("props"),
            StructType(Seq(StructField("k", IntegerType))))
            .getField("k") % 10)
        .where(col("camp").isNotNull)
        .select(col("user_id").as("cu"), col("event_id").as("click_id"),
          col("ts").as("click_ts"), col("camp"))
      val buys = ev
        .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
        .select(col("user_id").as("bu"), col("event_id").as("buy_id"),
          col("ts").as("buy_ts"),
          (coalesce(col("value").cast(Money), lit(0).cast(Money)) * 100)
            .cast(LongType).as("buy_cents"))
      val touch = buys.join(clicks,
        col("bu") === col("cu") &&
          col("buy_ts") >= col("click_ts") &&
          col("buy_ts") < col("click_ts") + expr("INTERVAL 24 HOUR"))
      val wr = Window.partitionBy(col("buy_id"))
        .orderBy(col("click_ts"), col("click_id"))
      touch
        .withColumn("r", row_number().over(wr))
        .withColumn("k", count(lit(1)).over(wr.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("ppm",
          expr("1000000 div k") +
            when(col("r") <= expr("1000000 % k"), 1L).otherwise(0L))
        .groupBy(col("camp").as("campaign"))
        .agg(count(lit(1)).cast(LongType).as("n_touches"),
          sum(col("ppm")).cast(LongType).as("attributed_ppm"),
          // revenue attribution: Σ cents·ppm, exact BIGINT (credited
          // revenue = this / 10⁶ cents — the division stays with the
          // reader, not the engine's float unit)
          sum(col("buy_cents") * col("ppm")).cast(LongType)
            .as("attributed_cents_ppm"))
        .orderBy("campaign")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id AS cu, event_id AS click_id,
               ts::TIMESTAMP AS click_ts,
               CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
                 AS camp
        FROM events
        WHERE event_type = 'click' AND user_id IS NOT NULL
          AND props IS NOT NULL AND json_valid(props)
          AND CAST(json_extract_string(props, '$.k') AS INTEGER)
              IS NOT NULL),
      buys AS (
        SELECT user_id AS bu, event_id AS buy_id, ts::TIMESTAMP AS buy_ts,
               CAST(COALESCE(CAST(value AS DECIMAL(18,2)),
                             CAST(0 AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS buy_cents
        FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL),
      touch AS (
        SELECT buy_id, camp, click_ts, click_id, buy_cents
        FROM buys JOIN clicks ON bu = cu
          AND buy_ts >= click_ts
          AND buy_ts < click_ts + INTERVAL 24 HOUR),
      credit AS (
        SELECT camp, buy_cents,
               1000000 // (COUNT(*) OVER (PARTITION BY buy_id))
               + CASE WHEN (ROW_NUMBER() OVER (PARTITION BY buy_id
                              ORDER BY click_ts, click_id))
                        <= 1000000 % (COUNT(*) OVER (PARTITION BY buy_id))
                      THEN 1 ELSE 0 END AS ppm
        FROM touch)
      SELECT camp AS campaign, CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(SUM(ppm) AS BIGINT) AS attributed_ppm,
             CAST(SUM(buy_cents * ppm) AS BIGINT) AS attributed_cents_ppm
      FROM credit GROUP BY 1 ORDER BY campaign"""))

  /** Click→purchase conversion funnel — the event-sequence shape every
    * product warehouse computes: per user, the FIRST click, the first
    * purchase AT OR AFTER that click, and the seconds between. The
    * sequence constraint (purchase after click) is NOT a range join:
    * clicks reduce to one min-ts row per user first, purchases then
    * equi-join on user_id and the "after" condition folds into a
    * conditional MIN aggregate — two partial-aggregating shuffles on the
    * same key, no interval machinery, skew-bounded by events-per-user.
    * Left join keeps never-converting clickers (converted = false).
    * Integer-division seconds (millis div 1000) — identical truncation
    * in both engines on the non-negative diff.
    */
  val funnel = QueryDef(
    "etl_click_purchase_funnel",
    (s, dir) => {
      val ev = events(s, dir)
      val firstClick = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("first_click_ts"))
      val conv = firstClick
        .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts")),
          Seq("user_id"), "left")
        .groupBy(col("user_id"), col("first_click_ts"))
        .agg(min(when(col("pts") >= col("first_click_ts"), col("pts")))
          .as("first_purchase_ts"))
      conv
        .withColumn("converted", col("first_purchase_ts").isNotNull)
        .withColumn("secs_to_convert",
          expr("(unix_millis(first_purchase_ts) " +
            "- unix_millis(first_click_ts)) div 1000"))
        .orderBy("user_id")
    },
    Some("""
      WITH fc AS (
        SELECT user_id, MIN(ts::TIMESTAMP) AS first_click_ts
        FROM events WHERE event_type = 'click' GROUP BY 1),
      conv AS (
        SELECT fc.user_id, fc.first_click_ts,
               MIN(CASE WHEN p.pts >= fc.first_click_ts THEN p.pts END)
                 AS first_purchase_ts
        FROM fc LEFT JOIN (
          SELECT user_id, ts::TIMESTAMP AS pts
          FROM events WHERE event_type = 'purchase') p
          ON fc.user_id = p.user_id
        GROUP BY 1, 2)
      SELECT user_id, first_click_ts, first_purchase_ts,
             first_purchase_ts IS NOT NULL AS converted,
             (epoch_ms(first_purchase_ts) - epoch_ms(first_click_ts)) // 1000
               AS secs_to_convert
      FROM conv ORDER BY user_id"""))

  /** Batch twin of StreamOps.attributeJoin (left-outer, 30-minute
    * horizon): every click paired with each purchase by the same user
    * inside [click_ts, click_ts + 30 min), never-converting clicks kept
    * with null purchase columns. Same plan the stream runs (the watermark
    * node is a no-op in batch), so the DuckDB oracle checks the streaming
    * operator's join semantics end-to-end; StreamAttributionSpec pins
    * stream ≡ batch on the same rows, including the outer-side
    * watermark-gated null emission. Unlike `etl_click_purchase_funnel`
    * (first-click→first-purchase aggregate), this is the raw pair stream —
    * the shape ad-attribution pipelines persist.
    */
  val attribBatch = QueryDef(
    "stream_attrib_batch",
    (s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("click_user"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("buy_user"),
          col("event_id").as("buy_id"), col("ts").as("buy_ts"),
          col("value").cast(Money).cast(DoubleType).as("amount"))
      graft.streaming.StreamOps
        .attributeJoin(clicks, buys, "30 MINUTES", "1 hour", "left_outer")
        .select(col("click_user").as("user_id"), col("click_id"),
          col("click_ts"), col("buy_id"), col("buy_ts"), col("amount"))
        // asc_nulls_last: DuckDB's ASC default is NULLS LAST, Spark's is
        // nulls-first — the outer-side null buy_ids must sort identically
        .orderBy(col("user_id"), col("click_id"), asc_nulls_last("buy_id"))
    },
    Some("""
      SELECT c.user_id, c.click_id, c.click_ts, p.buy_id, p.buy_ts, p.amount
      FROM (SELECT user_id, event_id AS click_id, ts::TIMESTAMP AS click_ts
            FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT user_id, event_id AS buy_id, ts::TIMESTAMP AS buy_ts,
                        CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS amount
                 FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.buy_ts >= c.click_ts
       AND p.buy_ts < c.click_ts + INTERVAL 30 MINUTE
      ORDER BY c.user_id, c.click_id, p.buy_id"""))

  /** Time-series gap fill + LOCF — the densification every downstream
    * forecasting/report consumer needs: each user's daily value series is
    * completed over the user's OWN active span (sequence() explode of
    * [first day, last day] — per-user bounded, no global calendar join),
    * missing days get n_events = 0, and the carried value is the last
    * observed daily total. LOCF is computed by the engine-portable
    * gaps-and-islands trick — a running COUNT of non-null observations
    * assigns each gap row to the island of the observation it follows,
    * then MAX over (user, island) recovers that single non-null value —
    * instead of IGNORE NULLS window syntax, so Spark and DuckDB provably
    * run the same algorithm (both stay partial-agg/window-partitioned by
    * user; nothing global). Leading-gap rows (none here by construction:
    * every span starts at an observed day) would carry NULL.
    */
  val gapFill = QueryDef(
    "etl_gap_fill",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(Money)).cast(Money).as("day_value"))
      val calendar = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
      calendar.join(daily, Seq("user_id", "day"), "left")
        .withColumn("island",
          count(col("day_value"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("locf_value",
          max(col("day_value"))
            .over(Window.partitionBy(col("user_id"), col("island"))))
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("day_value").cast(DoubleType).as("day_value"),
          col("locf_value").cast(DoubleType).as("locf_value"),
          col("n_events").isNull.as("is_gap"))
        .orderBy("user_id", "day")
    },
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                 AS day_value
        FROM events GROUP BY 1, 2),
      cal AS (
        SELECT user_id,
               UNNEST(generate_series(MIN(day), MAX(day),
                 INTERVAL 1 DAY))::DATE AS day
        FROM daily GROUP BY user_id),
      joined AS (
        SELECT c.user_id, c.day, d.n_events, d.day_value
        FROM cal c LEFT JOIN daily d
          ON c.user_id = d.user_id AND c.day = d.day),
      isl AS (
        SELECT *, COUNT(day_value) OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM joined)
      SELECT user_id, day, COALESCE(n_events, 0) AS n_events,
             CAST(day_value AS DOUBLE) AS day_value,
             CAST(MAX(day_value) OVER (PARTITION BY user_id, island)
               AS DOUBLE) AS locf_value,
             n_events IS NULL AS is_gap
      FROM isl ORDER BY user_id, day"""))

  /** Z-order clustering layout report — the write-side file-skipping
    * story (operators/ZOrder): lineitem keyed by the Morton interleave of
    * (l_partkey, l_suppkey) 8-bit range buckets, grouped into files by
    * the z-key's top bits (file = z >> 6 → ≤1024 files), reporting each
    * file's row count and min/max BOUNDING BOX in both dimensions. The
    * boxes are the artifact that matters at 100 TB: they are what parquet
    * row-group stats expose to scan pruning, and under z-order they stay
    * tight in BOTH keys (ScaleProbe zorder measures the resulting skip
    * rate vs a single-dim sort layout). Plan: one broadcast 1-row bounds
    * aggregate, then map-only exact-integer key arithmetic (codegen
    * column ops, no UDF) into a partial-agg groupBy — nothing global. The
    * oracle replays the identical shift/mask arithmetic (both sides are
    * generated from ZOrder.interleave/interleaveSql).
    */
  val zorderLayout = {
    val ZO = graft.operators.ZOrder
    val pkB = ZO.bucketSql("l_partkey", "pk_lo", "pk_hi", 8)
    val skB = ZO.bucketSql("l_suppkey", "sk_lo", "sk_hi", 8)
    QueryDef(
      "etl_zorder_layout",
      (s, dir) => {
        val li = lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
        val bounds = li.agg(
          min(col("l_partkey")).as("pk_lo"), max(col("l_partkey")).as("pk_hi"),
          min(col("l_suppkey")).as("sk_lo"), max(col("l_suppkey")).as("sk_hi"))
        li.crossJoin(broadcast(bounds))
          .withColumn("z", ZO.interleave(8,
            ZO.bucket(col("l_partkey"), col("pk_lo"), col("pk_hi"), 8),
            ZO.bucket(col("l_suppkey"), col("sk_lo"), col("sk_hi"), 8)))
          .withColumn("file_id", shiftright(col("z"), 6))
          .groupBy("file_id")
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_partkey")).as("pk_min"),
            max(col("l_partkey")).as("pk_max"),
            min(col("l_suppkey")).as("sk_min"),
            max(col("l_suppkey")).as("sk_max"))
          .orderBy("file_id")
      },
      Some(s"""
      WITH b AS (
        SELECT MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi,
               MIN(l_suppkey) AS sk_lo, MAX(l_suppkey) AS sk_hi
        FROM lineitem),
      z AS (
        SELECT l_partkey, l_suppkey,
               (${ZO.interleaveSql(8, pkB, skB)}) AS z
        FROM lineitem, b)
      SELECT z >> 6 AS file_id, COUNT(*) AS n_rows,
             MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
             MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
      FROM z GROUP BY 1 ORDER BY file_id"""))
  }

  /** Distribution-drift monitor (the MLOps / data-quality op a pipeline
    * runs before trusting a new period's data against a reference
    * period): the latest order year's order-value distribution vs the
    * previous year's, over a FIXED 20-bucket equi-width layout spanning
    * the combined range (one shared layout is what makes the two
    * histograms comparable — the StreamingHistogram lesson). Per bucket,
    * a smoothed chi-square-style contribution
    * d² · (N_ref+B)/(ref_n+1) with d = obs_n/N_obs − (ref_n+1)/(N_ref+B)
    * (add-one smoothing so never-seen-before buckets — drift INTO new
    * value ranges, the case that matters most — are defined rather than
    * divide-by-zero), flagged at 3.84 (the χ²₁ 95% critical value).
    * Cross-engine: counts and bucket bounds are exact integers and the
    * contribution is ONE fixed DOUBLE tree over them (the Wilson/q51
    * discipline — `d` bound once as a column so the squared term is the
    * same tree on both engines). The per-bucket TOTAL is deliberately
    * not emitted: a Σ of doubles is engine-fold-ordered; the per-bucket
    * rows carry strictly more information anyway. Plan: THREE
    * column-pruned passes over (o_totalprice, o_orderdate) — the year
    * scalar, the range stats, the bucket counts; the sketch's inherent
    * two passes plus the latest-year scalar subquery — with the
    * duplicated scalar subtrees collapsed at runtime by AQE's
    * ReuseExchange (the q47 discipline, pinned in DistDriftSpec), and
    * everything after the scans a ≤ B-row frame.
    */
  val distDrift = QueryDef(
    "etl_dist_drift",
    (s, dir) => {
      val B = 20
      val o = orders(s, dir).select(
        (col("o_totalprice").cast(Money) * 100).cast(LongType).as("cents"),
        year(col("o_orderdate")).as("y"))
      val my = o.agg(max(col("y")).as("ymax"))
      val base = o.crossJoin(broadcast(my))
        .where(col("y") >= col("ymax") - 1)
        .select(col("cents"), (col("y") === col("ymax")).as("is_obs"))
      val stats = base.agg(
        min(col("cents")).as("mn"), max(col("cents")).as("mx"),
        sum(when(col("is_obs"), 1L).otherwise(0L)).as("n_obs"),
        sum(when(!col("is_obs"), 1L).otherwise(0L)).as("n_ref"))
      val hist = base.crossJoin(broadcast(stats))
        .groupBy(expr(s"((cents - mn) * $B) div (mx - mn + 1)").as("bucket"))
        .agg(sum(when(col("is_obs"), 1L).otherwise(0L)).as("obs_n"),
          sum(when(!col("is_obs"), 1L).otherwise(0L)).as("ref_n"))
      hist.crossJoin(broadcast(stats))
        .withColumn("lo",
          expr(s"mn + (bucket * (mx - mn + 1) + ${B - 1}) div $B"))
        .withColumn("hi",
          expr(s"mn + ((bucket + 1) * (mx - mn + 1) + ${B - 1}) div $B - 1"))
        .withColumn("d",
          col("obs_n").cast(DoubleType) / col("n_obs").cast(DoubleType) -
            (col("ref_n") + 1).cast(DoubleType) /
            (col("n_ref") + B).cast(DoubleType))
        .withColumn("contrib",
          col("d") * col("d") * (col("n_ref") + B).cast(DoubleType) /
            (col("ref_n") + 1).cast(DoubleType))
        .select(col("bucket").cast(IntegerType).as("bucket"),
          col("lo"), col("hi"),
          col("ref_n").cast(LongType).as("ref_n"),
          col("obs_n").cast(LongType).as("obs_n"),
          col("contrib"), (col("contrib") > 3.84).as("flagged"))
        .orderBy("bucket")
    },
    Some("""
      WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents,
               year(o_orderdate) AS y
        FROM orders),
      my AS (SELECT MAX(y) AS ymax FROM o),
      base AS (
        SELECT cents, (y = ymax) AS is_obs FROM o, my
        WHERE y >= ymax - 1),
      stats AS (
        SELECT MIN(cents) AS mn, MAX(cents) AS mx,
               SUM(CASE WHEN is_obs THEN 1 ELSE 0 END) AS n_obs,
               SUM(CASE WHEN NOT is_obs THEN 1 ELSE 0 END) AS n_ref
        FROM base),
      hist AS (
        SELECT ((cents - mn) * 20) // (mx - mn + 1) AS bucket,
               SUM(CASE WHEN is_obs THEN 1 ELSE 0 END) AS obs_n,
               SUM(CASE WHEN NOT is_obs THEN 1 ELSE 0 END) AS ref_n
        FROM base, stats GROUP BY 1),
      calc AS (
        SELECT bucket, ref_n, obs_n,
               mn + (bucket * (mx - mn + 1) + 19) // 20 AS lo,
               mn + ((bucket + 1) * (mx - mn + 1) + 19) // 20 - 1 AS hi,
               CAST(obs_n AS DOUBLE) / CAST(n_obs AS DOUBLE)
                 - CAST(ref_n + 1 AS DOUBLE) / CAST(n_ref + 20 AS DOUBLE)
                 AS d,
               n_ref
        FROM hist, stats)
      SELECT CAST(bucket AS INTEGER) AS bucket, lo, hi,
             CAST(ref_n AS BIGINT) AS ref_n,
             CAST(obs_n AS BIGINT) AS obs_n,
             d * d * CAST(n_ref + 20 AS DOUBLE) / CAST(ref_n + 1 AS DOUBLE)
               AS contrib,
             d * d * CAST(n_ref + 20 AS DOUBLE) / CAST(ref_n + 1 AS DOUBLE)
               > 3.84 AS flagged
      FROM calc ORDER BY bucket"""))

  /** The STREAMING drift monitor (streaming/StreamingDrift.Monitor —
    * reference histogram fixed at creation, observed side folded through
    * StreamingHistogram.Maintainer state) driven as a batch replay and
    * proven equivalent to [[distDrift]] by sharing its oracle VERBATIM
    * (the q38/q38b twin discipline; r9 verdict #7 — the drift maintainer
    * was spec-only, invisible in CORRECTNESS). Same data, same layout:
    * the previous order year builds the reference histogram
    * (StreamingHistogram.bucketCounts — the exact construction the
    * monitor mandates), the latest year streams through `absorb` in
    * THREE deterministic micro-batches (fold-invariance means any
    * batching yields the same report — StreamingDriftSpec pins it), and
    * the monitor's driftReport() must reproduce the batch query's rows
    * bit-for-bit, lo/hi re-derived from the same integer bucket
    * inversion. The two driver-side collects are 1-row scalars (year
    * max, range stats) — the bounded-collect discipline.
    */
  val distDriftStream = QueryDef(
    "stream_drift_report",
    (s, dir) => {
      val B = 20
      val o = orders(s, dir).select(
        (col("o_totalprice").cast(Money) * 100).cast(LongType).as("cents"),
        year(col("o_orderdate")).as("y"))
      val ymax = o.agg(max(col("y"))).collect()(0).getInt(0)
      val base = o.where(col("y") >= ymax - 1)
      val st = base.agg(min(col("cents")), max(col("cents"))).collect()(0)
      val (mn, mx) = (st.getLong(0), st.getLong(1))
      val ref = graft.streaming.StreamingHistogram.bucketCounts(
        base.where(col("y") === ymax - 1), "cents", mn, mx, B)
      val mon = new graft.streaming.StreamingDrift.Monitor(
        "cents", mn, mx, B, ref)
      val obs = base.where(col("y") === ymax)
      (0 until 3).foreach(i =>
        mon.absorb(obs.filter(pmod(col("cents"), lit(3)) === i)))
      val span = s"(${mx}L - ${mn}L + 1)"
      mon.driftReport().get
        .withColumn("lo",
          expr(s"${mn}L + (CAST(bucket AS BIGINT) * $span + ${B - 1}) div $B"))
        .withColumn("hi",
          expr(s"${mn}L + ((CAST(bucket AS BIGINT) + 1) * $span + ${B - 1}) div $B - 1"))
        .select(col("bucket"), col("lo"), col("hi"), col("ref_n"),
          col("obs_n"), col("contrib"), col("flagged"))
        .orderBy("bucket")
    },
    distDrift.oracle)

  /** Late-arriving dimension / INFERRED MEMBERS (the Kimball pattern the
    * reference's FK constraints push to load time): facts referencing a
    * dimension row that has not arrived yet must not be dropped (revenue
    * vanishes) nor fail the load (one early fact kills the batch) — the
    * warehouse inserts a placeholder "inferred member" per missing key,
    * carrying what the FACTS already know (first-seen date, exact order
    * count and spend), to be type-1-overwritten when the real row lands
    * (that update is the CdcMerge/SCD2 machinery). The generated data
    * has zero orphan keys, so the late feed is SIMULATED by a
    * deterministic policy knob — the dimension stream is missing every
    * c_custkey % 97 = 0 row (~1%) — which keeps the inferred path
    * exercised and oracled at every SF instead of pinning an empty
    * table. Plan: one fact pass left-joined to the dim's id frame
    * (broadcast at dim scale; keyed equi beyond), orphan keys partial-
    * agg to the inferred frame, corpus-wide matched/inferred totals
    * ride every row via a broadcast 1-row crossJoin (the q16 global-
    * count discipline — a misclassified fact anywhere breaks the hash).
    */
  val inferredMembers = QueryDef(
    "etl_inferred_members",
    (s, dir) => {
      val o = orders(s, dir).select(col("o_custkey"), col("o_orderdate"),
        col("o_totalprice").cast(Money).as("price"))
      val dimLate = customer(s, dir)
        .filter(!(col("c_custkey") % 97 === 0))
        .select(col("c_custkey"))
      // dimLate is customer-derived — SF-scaling — so no forced hint
      val flagged = o.join(dimLate,
        col("o_custkey") === col("c_custkey"), "left")
        .withColumn("is_matched", col("c_custkey").isNotNull)
      val totals = flagged.agg(
        sum(when(col("is_matched"), 1L).otherwise(0L))
          .as("total_matched_orders"),
        sum(when(!col("is_matched"), 1L).otherwise(0L))
          .as("total_inferred_orders"))
      flagged.filter(!col("is_matched"))
        .groupBy(col("o_custkey").as("custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("first_seen"),
          count(lit(1)).as("n_orders"),
          sum(col("price")).cast(DoubleType).as("spend"))
        .crossJoin(broadcast(totals))
        .orderBy("custkey")
    },
    Some("""
      WITH dim_late AS (
        SELECT c_custkey FROM customer WHERE NOT (c_custkey % 97 = 0)),
      flagged AS (
        SELECT o_custkey, o_orderdate,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               (c_custkey IS NOT NULL) AS is_matched
        FROM orders LEFT JOIN dim_late ON o_custkey = c_custkey),
      totals AS (
        SELECT SUM(CASE WHEN is_matched THEN 1 ELSE 0 END)
                 AS total_matched_orders,
               SUM(CASE WHEN NOT is_matched THEN 1 ELSE 0 END)
                 AS total_inferred_orders
        FROM flagged)
      SELECT o_custkey AS custkey,
             MIN(CAST(o_orderdate AS DATE)) AS first_seen,
             COUNT(*) AS n_orders,
             CAST(SUM(price) AS DOUBLE) AS spend,
             CAST(total_matched_orders AS BIGINT) AS total_matched_orders,
             CAST(total_inferred_orders AS BIGINT) AS total_inferred_orders
      FROM flagged, totals
      WHERE NOT is_matched
      GROUP BY o_custkey, total_matched_orders, total_inferred_orders
      ORDER BY custkey"""))

  /** Data-freshness report (the ingestion-SLA panel an ops dashboard
    * serves beside the drift monitor): per event type, the latest event
    * time, row count, and the LAG in whole seconds behind the freshest
    * type — "clicks are current but purchases stopped arriving 3 hours
    * ago" is an ingestion incident the totals alone cannot show. One
    * |types|-sized aggregate + a broadcast scalar max; lag is integer
    * millis div 1000 (identical truncation, non-negative by
    * construction). NULL event types group and sort NULLS FIRST on
    * both engines (the check.py ASC-nullable discipline).
    */
  val freshnessReport = QueryDef(
    "etl_freshness_report",
    (s, dir) => {
      val fresh = events(s, dir)
        .where(col("ts").isNotNull)
        .groupBy(col("event_type"))
        .agg(max(col("ts")).as("latest"), count(lit(1)).as("n_events"))
      val g = fresh.agg(max(col("latest")).as("global_latest"))
      fresh.crossJoin(broadcast(g))
        .select(col("event_type"), col("latest"),
          col("n_events").cast(LongType).as("n_events"),
          expr("(unix_millis(global_latest) - unix_millis(latest)) div 1000")
            .as("lag_s"))
        .orderBy("event_type")
    },
    Some("""
      WITH fresh AS (
        SELECT event_type, MAX(ts::TIMESTAMP) AS latest,
               COUNT(*) AS n_events
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      g AS (SELECT MAX(latest) AS global_latest FROM fresh)
      SELECT event_type, latest, CAST(n_events AS BIGINT) AS n_events,
             (epoch_ms(global_latest) - epoch_ms(latest)) // 1000 AS lag_s
      FROM fresh, g
      ORDER BY event_type NULLS FIRST"""))

  /** Column-profiling report (the ANALYZE/data-quality staple): one row
    * per lineitem column with row/null/exact-distinct counts and typed
    * min/max (numeric → DOUBLE slots, string/timestamp → VARCHAR slots,
    * the other pair NULL). Plan shape: a UNION of per-column 1-row
    * aggregates — each branch's parquet scan is COLUMN-PRUNED to exactly
    * one column, so the union reads one full-table-width of bytes total,
    * each branch a clean 2-phase partial-agg distinct. The tempting
    * "one wide aggregate" alternative (all 11 COUNT(DISTINCT)s in one
    * agg) plans as an 11× Expand over an ALL-columns scan — measured
    * 21.3 s vs 1.4 s at sf0.1 — because every expanded copy carries the
    * full row and no column prunes. Spark plan and DuckDB oracle are
    * generated from the same column-spec list so the per-column slot
    * wiring cannot drift between engines.
    */
  val profileTable = {
    // (column, kind): num -> DOUBLE min/max, str -> VARCHAR, ts -> VARCHAR
    // via an explicit second-truncating format both engines share
    val cols: Seq[(String, String)] = Seq(
      "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
      "l_linenumber" -> "num", "l_quantity" -> "num",
      "l_extendedprice" -> "num", "l_discount" -> "num", "l_tax" -> "num",
      "l_returnflag" -> "str", "l_linestatus" -> "str",
      "l_shipdate" -> "ts")
    val oracle = {
      val aggs = cols.flatMap { case (c, kind) =>
        Seq(s"COUNT($c) AS ${c}__nn", s"COUNT(DISTINCT $c) AS ${c}__nd") ++
          (kind match {
            case "num" => Seq(s"CAST(MIN($c) AS DOUBLE) AS ${c}__mn",
              s"CAST(MAX($c) AS DOUBLE) AS ${c}__mx")
            case "str" => Seq(s"MIN($c) AS ${c}__mn", s"MAX($c) AS ${c}__mx")
            case "ts" => Seq(
              s"strftime(MIN($c), '%Y-%m-%d %H:%M:%S') AS ${c}__mn",
              s"strftime(MAX($c), '%Y-%m-%d %H:%M:%S') AS ${c}__mx")
          })
      }.mkString(",\n               ")
      val branches = cols.map { case (c, kind) =>
        val (mnNum, mxNum, mnStr, mxStr) =
          if (kind == "num") (s"${c}__mn", s"${c}__mx",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
          else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"${c}__mn", s"${c}__mx")
        s"""SELECT '$c' AS col_name, n_rows,
               n_rows - ${c}__nn AS n_null, ${c}__nd AS n_distinct,
               $mnNum AS min_num, $mxNum AS max_num,
               $mnStr AS min_str, $mxStr AS max_str FROM a"""
      }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH a AS (
        SELECT COUNT(*) AS n_rows,
               $aggs
        FROM lineitem)
      $branches
      ORDER BY col_name"""
    }
    QueryDef(
      "etl_profile_table",
      (s, dir) => {
        val li = lineitem(s, dir)
        val branches = cols.map { case (c, kind) =>
          val (mn, mx) = kind match {
            case "num" => (min(col(c)).cast(DoubleType),
              max(col(c)).cast(DoubleType))
            case "str" => (min(col(c)), max(col(c)))
            case _ => (date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss"),
              date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss"))
          }
          val (mnNum, mxNum, mnStr, mxStr) =
            if (kind == "num")
              (mn, mx, lit(null).cast(StringType), lit(null).cast(StringType))
            else
              (lit(null).cast(DoubleType), lit(null).cast(DoubleType), mn, mx)
          li.agg(
            count(lit(1)).as("n_rows"),
            (count(lit(1)) - count(col(c))).as("n_null"),
            countDistinct(col(c)).as("n_distinct"),
            mnNum.as("min_num"), mxNum.as("max_num"),
            mnStr.as("min_str"), mxStr.as("max_str"))
            .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
              col("n_distinct"), col("min_num"), col("max_num"),
              col("min_str"), col("max_str"))
        }
        branches.reduce(_ unionByName _).orderBy("col_name")
      },
      Some(oracle))
  }

  /** KMV distinct-count sketch (operators/KmvDistinct) over lineitem's
    * part keys, k = 256, reported beside the exact distinct with the
    * realized relative error — the ENGINE-PORTABLE approximate-distinct
    * rung beside q27's portable HLL (both now md5-replayable): KMV's
    * k-min set under the deterministic md5 fold is bit-replayable in
    * DuckDB, so estimate and error are a TRUE cross-engine green row. The exact count here is the
    * honesty column (at bench scale it is cheap); production use is the
    * sketch alone — mergeable k-min sets per partition/day, ~1/√(k−2)
    * error at constant state. rel_err is derived from the est column in
    * a second projection so both engines build the identical one-node
    * DOUBLE tree on top of the same est value.
    */
  val kmvDistinct = QueryDef(
    "etl_kmv_distinct",
    (s, dir) => {
      val li = lineitem(s, dir)
      val sk = graft.operators.KmvDistinct.sketch(li, col("l_partkey"), 256)
      val exact = li.agg(
        countDistinct(col("l_partkey")).as("exact_distinct"))
      sk.crossJoin(broadcast(exact))
        .withColumn("rel_err",
          (col("est_distinct") - col("exact_distinct").cast(DoubleType)) /
            col("exact_distinct").cast(DoubleType))
    },
    Some("""
      WITH h AS (
        SELECT DISTINCT list_reduce(
          list_transform(generate_series(1, 12),
            i -> CAST(strpos('0123456789abcdef',
                   substr(md5(CAST(l_partkey AS VARCHAR)), i, 1)) - 1
                   AS BIGINT)),
          (a, b) -> a * 16 + b) AS hv
        FROM lineitem WHERE l_partkey IS NOT NULL),
      kmin AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(hv) AS kth_hash
            FROM kmin),
      x AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
              AS exact_distinct FROM lineitem),
      e AS (
        SELECT CAST(256 AS INTEGER) AS k, n_kept, kth_hash,
               CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
                    ELSE CAST(255 AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
                         / CAST(kth_hash AS DOUBLE) END AS est_distinct,
               exact_distinct
        FROM s, x)
      SELECT k, n_kept, kth_hash, est_distinct, exact_distinct,
             (est_distinct - CAST(exact_distinct AS DOUBLE))
               / CAST(exact_distinct AS DOUBLE) AS rel_err
      FROM e"""))

  /** Exact heavy hitters — (event_type, user) pairs with at least 15
    * events (operators.HeavyHitters.exact): partial-agg groupBy then
    * threshold, the exact rung of the heavy-hitter ladder. The sketch
    * rung (fixed-state Count-Min, no per-key rows at all) is
    * HeavyHitters.sketch, pinned ⊇-consistent with this exact output in
    * HeavyHittersSpec — same pairing as q27's exact/HLL distinct.
    */
  val heavyHitters = QueryDef(
    "etl_heavy_hitters",
    (s, dir) => graft.operators.HeavyHitters
      .exact(events(s, dir), Seq("event_type", "user_id"), 15L)
      .orderBy("event_type", "user_id"),
    Some("""
      SELECT event_type, user_id, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 15
      ORDER BY event_type, user_id"""))

  /** The STREAMING heavy-hitter maintainer
    * (streaming/StreamingHeavyHitters — per-key counts held as driver
    * state, thresholded on demand) driven as a batch replay in three
    * deterministic micro-batches and proven equivalent to
    * [[heavyHitters]] by sharing its oracle VERBATIM (the
    * stream_drift_report twin discipline): per-key counting is
    * associative + commutative, so any batching folds to the one-shot
    * groupBy — which is exactly why the EXACT maintainer can be oracled
    * while order-dependent Misra-Gries/SpaceSaving summaries cannot.
    */
  val heavyHittersStream = QueryDef(
    "stream_heavy_hitters",
    (s, dir) => {
      val m = new graft.streaming.StreamingHeavyHitters.Maintainer(
        Seq("event_type", "user_id"))
      val ev = events(s, dir)
      (0 until 3).foreach(i =>
        m.absorb(ev.filter(pmod(col("event_id"), lit(3)) === i)))
      m.heavyHitters(15L).get.orderBy("event_type", "user_id")
    },
    heavyHitters.oracle)

  /** Salted skew join proven equivalent to the plain plan: the salted
    * fact→dim join + aggregate must hash-match an oracle that knows nothing
    * about salting. The salt spreads any hot user over 16 shuffle
    * partitions; correctness is invariant because the dim side is
    * replicated per salt.
    */
  val skewSalted = QueryDef(
    "etl_skew_salted",
    (s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("value").cast(Money).as("v"))
      val cust = customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.SkewJoin.saltedJoin(ev, cust, "user_id", salts = 16)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          sum(col("v")).cast(DoubleType).as("total_value"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1 ORDER BY c_mktsegment"""))

  /** Constraint validation report (star_schema.sql:16-67 CHECKs + one FK,
    * re-expressed as set-oriented scans): per-constraint violation counts
    * over the testdata, plus the orphan-fact FK count. All zeros on clean
    * data — the point is the report shape is stable and oracle-checkable.
    */
  val constraintReport = QueryDef(
    "etl_constraint_report",
    (s, dir) => {
      import graft.etl.Constraints
      val li = lineitem(s, dir)
      val checks = Constraints.checkReport(li, Seq(
        Constraints.Check("quantity_nonneg", col("l_quantity") >= 0),
        Constraints.Check("price_positive", col("l_extendedprice") > 0),
        Constraints.Check("discount_in_range",
          col("l_discount").between(0.0, 1.0)),
        Constraints.Check("returnflag_domain",
          col("l_returnflag").isin("A", "N", "R"))))
      val orphans = Constraints.fkViolations(
        li, orders(s, dir), "l_orderkey", "o_orderkey")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("orderkey_fk").as("constraint_name"), col("n_violations"))
      checks.union(orphans).orderBy("constraint_name")
    },
    Some("""
      SELECT 'discount_in_range' AS constraint_name,
             COUNT(*) FILTER (WHERE l_discount NOT BETWEEN 0.0 AND 1.0
                              OR l_discount IS NULL) AS n_violations
      FROM lineitem
      UNION ALL
      SELECT 'orderkey_fk', COUNT(*) FROM lineitem
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      UNION ALL
      SELECT 'price_positive',
             COUNT(*) FILTER (WHERE l_extendedprice <= 0
                              OR l_extendedprice IS NULL)
      FROM lineitem
      UNION ALL
      SELECT 'quantity_nonneg',
             COUNT(*) FILTER (WHERE l_quantity < 0 OR l_quantity IS NULL)
      FROM lineitem
      UNION ALL
      SELECT 'returnflag_domain',
             COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R')
                              OR l_returnflag IS NULL)
      FROM lineitem
      ORDER BY constraint_name"""))

  /** Snapshot reconciliation ([[graft.operators.TableDiff]]) — the
    * data-recon op a warehouse runs to validate a migration/backfill or to
    * audit what a load changed: two keyed snapshots of the per-customer
    * order aggregate (the two latest order years), full-outer joined on
    * the primary key and every key classified added / removed / changed /
    * unchanged, with exact count/spend deltas per class. The value compare
    * is exact DECIMAL — a float-summed snapshot would misclassify ties as
    * "changed" non-deterministically.
    *
    * Scale shape: each snapshot is one keyed partial agg; the diff is ONE
    * pk-keyed sort-merge join (full outer is not broadcastable semantics —
    * the q26 class, PlanSweep-allowlisted) and the classification is
    * map-side on the joined row; the per-class rollup is a ≤ 4-group agg.
    * At 100 TB real snapshot tables are bucketed by pk, making the diff
    * join shuffle-free; nothing here is ever all-pairs or driver-side.
    * The 'unchanged' class cannot occur across two real order years —
    * `TableDiffSpec` pins all four classes (plus NULL-value and all-NULL-
    * row semantics) on crafted snapshots.
    */
  val tableDiff = QueryDef(
    "etl_table_diff",
    (s, dir) => {
      val o = orders(s, dir)
      val maxYr = o.agg(max(year(col("o_orderdate"))).as("max_yr"))
      val scoped = o.crossJoin(broadcast(maxYr))
      def snap(offset: Int) = scoped
        .filter(year(col("o_orderdate")) === col("max_yr") - offset)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(Money)).cast(Money).as("spend"))
      graft.operators.TableDiff.diff(snap(1), snap(0), Seq("o_custkey"))
        .select(col("diff_class"),
          (coalesce(col("cnt_b"), lit(0L)) -
            coalesce(col("cnt_a"), lit(0L))).as("cd"),
          (coalesce(col("spend_b"), lit(0).cast(Money)) -
            coalesce(col("spend_a"), lit(0).cast(Money))).as("sd"))
        .groupBy(col("diff_class"))
        .agg(count(lit(1)).as("n_keys"), sum(col("cd")).as("cnt_delta"),
          sum(col("sd")).cast(DoubleType).as("spend_delta"))
        .orderBy(col("diff_class"))
    },
    Some("""
      WITH maxy AS (SELECT MAX(year(o_orderdate)) AS y FROM orders),
      a AS (
        SELECT o_custkey, COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DECIMAL(18,2)) AS spend
        FROM orders, maxy WHERE year(o_orderdate) = y - 1 GROUP BY 1),
      b AS (
        SELECT o_custkey, COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DECIMAL(18,2)) AS spend
        FROM orders, maxy WHERE year(o_orderdate) = y GROUP BY 1),
      d AS (
        SELECT CASE WHEN a.cnt IS NULL THEN 'added'
                    WHEN b.cnt IS NULL THEN 'removed'
                    WHEN a.cnt = b.cnt AND a.spend = b.spend
                      THEN 'unchanged'
                    ELSE 'changed' END AS diff_class,
               COALESCE(b.cnt, 0) - COALESCE(a.cnt, 0) AS cd,
               COALESCE(b.spend, 0) - COALESCE(a.spend, 0) AS sd
        FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey)
      SELECT diff_class, COUNT(*) AS n_keys,
             CAST(SUM(cd) AS BIGINT) AS cnt_delta,
             CAST(SUM(sd) AS DOUBLE) AS spend_delta
      FROM d GROUP BY 1 ORDER BY diff_class"""))

  /** Fuzzy entity resolution on the customer dimension
    * ([[graft.operators.FuzzyJoin]]): all distinct customer pairs whose
    * names are within Levenshtein distance 1 — the fuzzy rung above
    * `etl_dim_dedup`'s exact-key collapse. Candidate generation is the
    * deletion-neighborhood equi join (bucket sizes structurally bounded
    * at |alphabet|·len — never all-pairs, never corpus-dependent); the
    * exact `levenshtein` verify runs map-side inside the join stage.
    * Output: the first 200 pairs in (id_a, id_b) order plus the global
    * pair count (broadcast 1-row cross join, the established scalar
    * pattern) — the count makes the hash sensitive to a single missed
    * or phantom pair ANYWHERE, not just in the emitted head.
    */
  val entityFuzzyPairs = QueryDef(
    "etl_entity_fuzzy_pairs",
    (s, dir) => {
      // staged: feeds BOTH the global count and the output head — without
      // it the whole deletion-join pipeline executes twice (the
      // OrderedPrefix staging lesson)
      val pairs = graft.operators.FuzzyJoin.pairsWithin1(
        customer(s, dir), col("c_custkey"), col("c_name"))
        .localCheckpoint(false)
      val total = pairs.agg(count(lit(1)).as("total_pairs"))
      pairs.crossJoin(broadcast(total))
        .select(col("id_a").as("c_custkey_a"), col("str_a").as("name_a"),
          col("id_b").as("c_custkey_b"), col("str_b").as("name_b"),
          col("total_pairs"))
        .orderBy("c_custkey_a", "c_custkey_b")
        .limit(200)
    },
    Some("""
      WITH k AS (
        SELECT c_custkey, c_name, c_name AS k FROM customer
        UNION ALL
        SELECT c_custkey, c_name,
               substr(c_name, 1, i - 1) || substr(c_name, i + 1) AS k
        FROM (SELECT c_custkey, c_name,
                     unnest(range(1, length(c_name) + 1)) AS i
              FROM customer) d),
      pairs AS (
        SELECT DISTINCT a.c_custkey AS ca, a.c_name AS na,
                        b.c_custkey AS cb, b.c_name AS nb
        FROM k a JOIN k b ON a.k = b.k AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1),
      tot AS (SELECT COUNT(*) AS total_pairs FROM pairs)
      SELECT ca AS c_custkey_a, na AS name_a,
             cb AS c_custkey_b, nb AS name_b, total_pairs
      FROM pairs, tot
      ORDER BY ca, cb LIMIT 200"""))

  /** Portable Bloom-filter semi-join reduction (operators/BloomPrefilter):
    * the persistable runtime-filter rung. A selectively filtered dimension
    * (parts with p_size ≤ 5, ~10%) compiles to a 32768-bit bitmap
    * (1 KB as 32-bit words); the fact scan applies it MAP-SIDE (k=3
    * bit tests against the dense word-array literal — one codegen'd
    * filter, no shuffle) so non-matching fact rows die before the join
    * exchange — at 100 TB the shuffle carries selectivity + fp of the
    * fact instead of all of it, and unlike Catalyst's injected
    * `bloom_filter_agg` (RuntimeBloomSpec) the bitmap is an ordinary
    * DataFrame a pipeline can persist and re-apply across jobs. The key
    * is integral, so the hash is the Knuth multiplicative family (exact
    * BIGINT arithmetic — ~6× cheaper per row than the md5 family, which
    * ScaleProbe bloom measures losing to a RAM-speed local shuffle on
    * hash cost alone): bitmap and pass set are bit-reproducible
    * cross-engine, the oracle rebuilds the bitmap in SQL and must agree
    * on probed/passed/matched/false-positive row counts AND the exact
    * revenue over the verified join (any hash divergence anywhere shows
    * up as a count mismatch). The oracle probes at DISTINCT-key level
    * (bloom pass is a key property) — same counts, |keys| hashes instead
    * of |rows|.
    */
  val bloomPrefilter = QueryDef(
    "etl_bloom_prefilter",
    (s, dir) => {
      val mBits = 1 << 15
      val k = 3
      val keys = part(s, dir).filter(col("p_size") <= 5)
        .select(col("p_partkey"))
      val bitmap = graft.operators.BloomPrefilter
        .buildBitmapLong(keys, col("p_partkey"), mBits, k)
        .localCheckpoint(false)
      val li = lineitem(s, dir).select("l_partkey", "l_extendedprice")
      // staged: feeds the passed-count AND the verify join
      val passed = graft.operators.BloomPrefilter
        .prefilterLong(li, col("l_partkey"), bitmap, mBits, k)
        .localCheckpoint(false)
      val matched = passed.join(keys,
        col("l_partkey") === col("p_partkey"), "left_semi")
      val probedN = li.agg(count(lit(1)).as("probed_rows"))
      val passedN = passed.agg(count(lit(1)).as("passed_rows"))
      val matchedN = matched.agg(count(lit(1)).as("matched_rows"),
        coalesce(sum(col("l_extendedprice").cast(Money)), lit(0).cast(Money))
          .cast(DoubleType).as("revenue"))
      probedN.crossJoin(broadcast(passedN)).crossJoin(broadcast(matchedN))
        .select(col("probed_rows"), col("passed_rows"), col("matched_rows"),
          (col("passed_rows") - col("matched_rows"))
            .as("false_positive_rows"),
          col("revenue"))
    },
    Some(s"""
      WITH keys AS (SELECT p_partkey AS key FROM part WHERE p_size <= 5),
      js AS (SELECT unnest([0, 1, 2]) AS j),
      kpos AS (
        SELECT key, j,
               (((key % 2147483648) *
                 (CASE j WHEN 0 THEN 1640531527
                         WHEN 1 THEN 1013904223
                         ELSE 668265261 END)) % 2147483648) // 65536 AS pos
        FROM keys CROSS JOIN js),
      bitmap AS (
        SELECT pos // 32 AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
        FROM kpos GROUP BY 1),
      pk AS (SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS nrows,
                    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
             FROM lineitem GROUP BY 1),
      ppos AS (
        SELECT key, j,
               (((key % 2147483648) *
                 (CASE j WHEN 0 THEN 1640531527
                         WHEN 1 THEN 1013904223
                         ELSE 668265261 END)) % 2147483648) // 65536 AS pos
        FROM pk CROSS JOIN js),
      hits AS (
        SELECT p.key, COUNT(*) AS nh
        FROM ppos p JOIN bitmap b ON b.word = p.pos // 32
          AND (b.bits & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INTEGER)))
              <> 0
        GROUP BY 1),
      passk AS (SELECT pk.key, pk.nrows, pk.rev
                FROM pk JOIN hits ON pk.key = hits.key WHERE hits.nh = 3),
      matchedk AS (SELECT p.nrows, p.rev
                   FROM passk p JOIN keys k ON p.key = k.key)
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS probed_rows,
        (SELECT CAST(COALESCE(SUM(nrows), 0) AS BIGINT) FROM passk)
          AS passed_rows,
        (SELECT CAST(COALESCE(SUM(nrows), 0) AS BIGINT) FROM matchedk)
          AS matched_rows,
        (SELECT CAST(COALESCE(SUM(nrows), 0) AS BIGINT) FROM passk)
          - (SELECT CAST(COALESCE(SUM(nrows), 0) AS BIGINT) FROM matchedk)
          AS false_positive_rows,
        CAST((SELECT COALESCE(SUM(rev), 0) FROM matchedk) AS DOUBLE)
          AS revenue"""))

  /** Small-file compaction planning (the OPTIMIZE/bin-packing layout op a
    * lakehouse table needs continuously): per partition (event_type), the
    * day-files — (type, day) leaf files with a declared 100 B/row size
    * model — are packed into contiguous target-sized merge bins by
    * GROUPED prefix sum: bin = (running size BEFORE this file) div
    * target, via `OrderedPrefix.rankAndPrefixBy`'s per-group `__prefix`
    * (bucket = month — a monotone coarsening of the day order). The
    * contiguous-by-order packing is what table formats actually ship
    * (preserves clustering, one pass), and the grouped two-phase prefix
    * has NO single-partition exchange — at 100 TB the plan is a
    * file-manifest-sized shuffle keyed by (partition, month-bucket),
    * never the data. Exact integers throughout → full cross-engine row.
    */
  val compactionPlan = QueryDef(
    "etl_compaction_plan",
    (s, dir) => {
      val target = 20000L
      val files = events(s, dir)
        .groupBy(col("event_type"),
          (year(col("ts")) * 10000 + month(col("ts")) * 100 +
            dayofmonth(col("ts"))).cast(IntegerType).as("date_id"))
        .agg((count(lit(1)) * 100L).as("size_bytes"))
      val ranked = graft.operators.OrderedPrefix.rankAndPrefixBy(
        files, Seq("event_type"),
        expr("date_id div 100"), Seq(col("date_id")),
        Some(col("size_bytes")))
      ranked
        .withColumn("bin",
          expr(s"((__prefix - size_bytes) div $target)").cast(IntegerType))
        .select(col("event_type"), col("date_id"), col("size_bytes"),
          col("bin"))
        .orderBy("event_type", "date_id")
    },
    Some("""
      WITH files AS (
        SELECT event_type,
               CAST(EXTRACT(year FROM ts) * 10000
                 + EXTRACT(month FROM ts) * 100
                 + EXTRACT(day FROM ts) AS INTEGER) AS date_id,
               CAST(COUNT(*) * 100 AS BIGINT) AS size_bytes
        FROM events GROUP BY 1, 2),
      pre AS (
        SELECT event_type, date_id, size_bytes,
               SUM(size_bytes) OVER (PARTITION BY event_type ORDER BY date_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
        FROM files)
      SELECT event_type, date_id, size_bytes,
             CAST((pfx - size_bytes) // 20000 AS INTEGER) AS bin
      FROM pre ORDER BY event_type, date_id"""))

  /** Incremental JOIN-view maintenance (`operators/JoinMv`) — the delta
    * rule for a materialized equi-join view, completing the MV family
    * beside `etl_cdc_agg_incremental`'s aggregate maintenance: the
    * enriched user-state view (user CDC state ⋈ customer dim) kept
    * current under CDC batches to BOTH sides. The A side replays the
    * etl_cdc_apply_incremental split (every 5th event = today's batch,
    * timestamps interleave → late data is real); the B side upserts
    * every 10th customer (acctbal + 100, version 2) and TOMBSTONES every
    * 50th — so the batch exercises upsert, delete, insert and
    * pass-through in one run. V' = V ⋉̄ J ∪ (A' ⋉ J) ⋈ (B' ⋉ J) where J
    * = the affected join keys (old + new version of every touched row,
    * both sides, broadcast — batch-sized, never table-sized): untouched
    * view rows pass through one broadcast anti join with NO recompute;
    * only the touched join groups re-join. The oracle is the
    * from-scratch join of both fully-compacted changelogs — the
    * incremental fold is proven row-equal to rebuilding the view.
    */
  val joinMvIncremental = QueryDef(
    "etl_join_mv_incremental",
    (s, dir) => {
      import graft.operators.{CdcMerge, JoinMv}
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"), col("ts"),
          col("event_id"))
      val isNew = pmod(col("event_id"), lit(5)) === 0
      // bases must be COMPACTED (the JoinMv/CdcMerge.merge contract —
      // a raw changelog base leaks old versions of b-touched keys);
      // staged: aBase feeds the view build AND three maintain consumers
      val aBase = CdcMerge.compact(ev.filter(!isNew),
        Seq("user_id"), Seq("ts", "event_id")).localCheckpoint(false)
      val aBatch = ev.filter(isNew)
      val aKey = Seq("user_id"); val aOrd = Seq("ts", "event_id")
      val aServ = col("event_type") =!= "error"
      val cust = customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_name"),
          col("c_acctbal").cast(Money).as("bal"), col("c_mktsegment"))
      val bBase = cust
        .withColumn("ver", lit(1L)).withColumn("is_del", lit(false))
      val bBatch = cust.filter(pmod(col("user_id"), lit(10)) === 0)
        .withColumn("bal", (col("bal") + 100).cast(Money))
        .withColumn("ver", lit(2L))
        .withColumn("is_del", pmod(col("user_id"), lit(50)) === 0)
      val bKey = Seq("user_id"); val bOrd = Seq("ver")
      val bServ = !col("is_del")
      val view = JoinMv.fromScratch(aBase, aKey, aOrd, aServ,
        bBase, bKey, bOrd, bServ, Seq("user_id"))
      JoinMv.maintain(view, aBase, aBatch, aKey, aOrd, aServ,
        bBase, bBatch, bKey, bOrd, bServ, Seq("user_id"))
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").cast(Money).cast(DoubleType).as("last_value"),
          col("ts").as("updated_at"), col("c_name"),
          col("bal").cast(DoubleType).as("acctbal"), col("c_mktsegment"))
        .orderBy("user_id")
    },
    Some("""
      WITH a AS (
        SELECT user_id, event_type, value, ts::TIMESTAMP AS ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events),
      acur AS (SELECT user_id, event_type, value, ts FROM a
               WHERE rn = 1 AND event_type <> 'error'),
      b0 AS (SELECT c_custkey AS user_id, c_name,
                    CAST(c_acctbal AS DECIMAL(18,2)) AS bal, c_mktsegment,
                    1 AS ver, FALSE AS is_del
             FROM customer),
      b1 AS (SELECT user_id, c_name, CAST(bal + 100 AS DECIMAL(18,2)) AS bal,
                    c_mktsegment, 2 AS ver, user_id % 50 = 0 AS is_del
             FROM b0 WHERE user_id % 10 = 0),
      b AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY ver DESC) AS rn
            FROM (SELECT * FROM b0 UNION ALL SELECT * FROM b1)),
      bcur AS (SELECT user_id, c_name, bal, c_mktsegment FROM b
               WHERE rn = 1 AND NOT is_del)
      SELECT acur.user_id, acur.event_type AS last_type,
             CAST(CAST(acur.value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
             acur.ts AS updated_at, bcur.c_name,
             CAST(bcur.bal AS DOUBLE) AS acctbal, bcur.c_mktsegment
      FROM acur JOIN bcur USING (user_id) ORDER BY user_id"""))

  /** The STREAMING CDC compactor (streaming/StreamingCdc — a changelog
    * stream continuously folded into a compacted table, one CdcMerge
    * per micro-batch) driven as a batch replay in three deterministic
    * micro-batches and proven equivalent to [[cdcApply]] by sharing its
    * oracle VERBATIM (the stream_heavy_hitters twin discipline):
    * last-writer-wins compaction over a total (ts, event_id) order is
    * associative — merging per-batch maxima equals the one-shot max —
    * so any batching folds to the full-changelog window rank the oracle
    * computes. Batch splits are by event_id, so timestamps INTERLEAVE
    * across batches: every merge is a real max_by fold, not
    * newest-batch-wins.
    */
  val cdcApplyStream = QueryDef(
    "stream_cdc_apply",
    (s, dir) => {
      val m = new graft.streaming.StreamingCdc.Compactor(
        Seq("user_id"), Seq("ts", "event_id"))
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"), col("ts"),
          col("event_id"))
      (0 until 3).foreach(i =>
        m.absorb(ev.filter(pmod(col("event_id"), lit(3)) === i)))
      m.current.get
        .filter(col("event_type") =!= "error")
        .select(col("user_id"),
          col("event_type").as("last_type"),
          col("value").cast(Money).cast(DoubleType).as("last_value"),
          col("ts").as("updated_at"),
          col("event_id").as("last_event_id"))
        .orderBy("user_id")
    },
    cdcApply.oracle)

  /** The STREAMING join-view maintainer (streaming/StreamingJoinMv —
    * TWO changelog streams folded into compacted side tables and their
    * materialized equi-join view) driven as a batch replay with the A
    * side in three micro-batches INTERLEAVED with the B side's two, and
    * proven equivalent to [[joinMvIncremental]] by sharing its oracle
    * VERBATIM: the oracle is the from-scratch join of both
    * fully-compacted changelogs, and the per-batch delta rule
    * (V' = V ⋉̄ J ∪ (A' ⋉ J) ⋈ (B' ⋉ J)) folds to it under any
    * interleaving because side compaction is associative and untouched
    * join groups pass through unchanged. Same inputs as the batch row:
    * event CDC state on the A side, the customer upsert/tombstone batch
    * on the B side.
    */
  val joinMvStream = QueryDef(
    "stream_join_mv",
    (s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"), col("ts"),
          col("event_id"))
      val isNew = pmod(col("event_id"), lit(5)) === 0
      val cust = customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_name"),
          col("c_acctbal").cast(Money).as("bal"), col("c_mktsegment"))
      val b0 = cust
        .withColumn("ver", lit(1L)).withColumn("is_del", lit(false))
      val b1 = cust.filter(pmod(col("user_id"), lit(10)) === 0)
        .withColumn("bal", (col("bal") + 100).cast(Money))
        .withColumn("ver", lit(2L))
        .withColumn("is_del", pmod(col("user_id"), lit(50)) === 0)
      val m = new graft.streaming.StreamingJoinMv.Maintainer(
        Seq("user_id"), Seq("ts", "event_id"), col("event_type") =!= "error",
        Seq("user_id"), Seq("ver"), !col("is_del"),
        Seq("user_id"))
      // interleave the sides: old A in two batches around B's initial
      // load, then today's A batch, then B's upsert/tombstone batch
      m.absorbA(ev.filter(!isNew && pmod(col("event_id"), lit(2)) === 0))
      m.absorbB(b0)
      m.absorbA(ev.filter(!isNew && pmod(col("event_id"), lit(2)) === 1))
      m.absorbA(ev.filter(isNew))
      m.absorbB(b1)
      m.currentView.get
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").cast(Money).cast(DoubleType).as("last_value"),
          col("ts").as("updated_at"), col("c_name"),
          col("bal").cast(DoubleType).as("acctbal"), col("c_mktsegment"))
        .orderBy("user_id")
    },
    joinMvIncremental.oracle)

  val all: Seq[QueryDef] = Seq(factBuild, dimBuild, dateDim, sessionsBatch,
    sessionsWindow,
    windowStatsBatch, slidingStatsBatch, streamTrendingBatch,
    streamDedupBatch, scd2Dim,
    attribBatch, gapFill, zorderLayout, profileTable,
    scd2Incremental, scd2AsAt, jsonProps, asofEnrich, asofWindow, funnel,
    multitouch, distDrift, distDriftStream, inferredMembers,
    freshnessReport, heavyHitters, heavyHittersStream, kmvDistinct,
    sessionOverlap, sessionOverlapFast, cdcApply, cdcApplyIncremental,
    cdcAggIncremental, skewSalted,
    constraintReport, entityFuzzyPairs, bloomPrefilter, compactionPlan,
    joinMvIncremental, tableDiff, cdcApplyStream, joinMvStream)
}
