package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines corpus source — the format LLM training corpora actually
  * ship in (one JSON document per line, schema drifting across dumps).
  *
  * Scale disciplines this encodes:
  *  - the schema is DECLARED, never inferred: `spark.read.json` without
  *    a schema runs a full inference pass over the data before the real
  *    read — at 100 TB that is a second scan of the corpus that produces
  *    a schema you should have pinned anyway (and that can silently
  *    change between dumps, the schema-evolution trap
  *    `SchemaEvolutionSpec` pins for parquet);
  *  - malformed lines are QUARANTINED, not dropped or fatal: PERMISSIVE
  *    mode routes the raw offending line into a corrupt-record column so
  *    the pipeline can count/inspect/re-drive them — on a billion-line
  *    crawl dump some lines ARE broken, and silently dropping them makes
  *    loss invisible while FAILFAST makes one bad line kill a day's job;
  *  - fields absent from a line are NULL, fields not in the declared
  *    schema are ignored — both directions of schema drift read cleanly.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Read `path` as JSONL under the declared `schema`, with malformed
    * lines captured in [[CorruptCol]] (added to the schema here — the
    * caller declares only real fields).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"declare only real fields; $CorruptCol is added by the source")
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** The ingest split: (clean rows without the corrupt column, quarantine
    * rows carrying the raw malformed line).
    *
    * Built on a TEXT scan + `from_json` rather than the json file
    * source: Spark's json source refuses any query whose scan (after
    * column pruning) references only the corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — with no
    * real field to parse, nothing could be corrupt), and its suggested
    * workaround is caching the parsed corpus, which is exactly wrong at
    * corpus scale. The text form has no such restriction, runs the SAME
    * Jackson parser per line, and both branches stay cheap projections
    * of one text scan — no cache, no second parse of clean lines.
    * Whitespace-only lines are skipped (matching the json source).
    */
  def readSplit(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"declare only real fields; $CorruptCol is added by the source")
    val full = schema.add(StructField(CorruptCol, StringType))
    val raw = spark.read.text(path).filter(trim(col("value")) =!= "")
    val parsed = raw.select(col("value"),
      from_json(col("value"), full, java.util.Map.of(
        "mode", "PERMISSIVE", "columnNameOfCorruptRecord", CorruptCol))
        .as("p"))
    val clean = parsed.filter(col(s"p.$CorruptCol").isNull)
      .select(schema.fieldNames.toSeq.map(f => col(s"p.$f").as(f)): _*)
    val quarantine = parsed.filter(col(s"p.$CorruptCol").isNotNull)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
  }
}
