package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema-evolution reads — the lakehouse ingest concern beside
  * Tables.events' vintage-adaptive timestamp handling: a table directory
  * whose parquet files were written under DIFFERENT schema versions
  * (columns added over time) must read as the unified schema with
  * null-fill for pre-evolution rows. Pins the operational facts a
  * pipeline must know:
  *  - `mergeSchema=true` unifies add-column evolution (new column
  *    nullable, old files null-filled);
  *  - WITHOUT the option Spark takes one file's footer — reading the
  *    directory can silently DROP the new column depending on which
  *    file wins, which is why ingest must set the option (or declare the
  *    schema explicitly, the Tables.load discipline);
  *  - filters on the evolved column are null-safe over pre-evolution
  *    rows (no phantom matches);
  *  - an explicit read schema (the production form — footer merging
  *    scans every footer, which at 100 TB of files is itself a job)
  *    reads both vintages without mergeSchema.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def withEvolvedDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_schevo").toString
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.mode("append").parquet(dir)
      Seq((3L, "c", 30), (4L, "d", 40)).toDF("id", "v", "score")
        .write.mode("append").parquet(dir)
      f(dir)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("mergeSchema unifies add-column evolution with null-fill") {
    withEvolvedDir { dir =>
      val df = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(df.columns.sorted.toSeq == Seq("id", "score", "v"))
      val rows = df.select("id", "score").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some(r.getInt(1)))).toMap
      assert(rows == Map(1L -> None, 2L -> None,
        3L -> Some(30), 4L -> Some(40)))
    }
  }

  test("filters on the evolved column are null-safe for old rows") {
    withEvolvedDir { dir =>
      val df = spark.read.option("mergeSchema", "true").parquet(dir)
      // score > 0 must not phantom-match null-filled pre-evolution rows
      assert(df.filter(col("score") > 0).count() == 2L)
      assert(df.filter(col("score").isNull).count() == 2L)
    }
  }

  test("an explicit read schema serves both vintages without footer " +
    "merging (the production form)") {
    withEvolvedDir { dir =>
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType),
        StructField("score", IntegerType)))
      val df = spark.read.schema(schema).parquet(dir)
      assert(df.count() == 4L)
      assert(df.filter(col("score").isNotNull).count() == 2L)
    }
  }
}
