package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run per-partition over the binary payloads.
  *
  * REAL pixel decode exists for the four mainstream image containers
  * ([[graft.functions.BmpPixels]], [[graft.functions.PngPixels]],
  * [[graft.functions.GifPixels]], [[graft.functions.JpegPixels]] —
  * each built from its public specification) plus WAV/MP4 header
  * metadata; `fakeDecode` remains only as the FORMAT-AGNOSTIC feature
  * kernel (byte-level statistics that need no codec) demonstrating the
  * generic plumbing — schema, batch iteration, partition-local
  * processing — a caller would wrap around any further codec.
  *
  * Scale notes: binary payloads never shuffle — every stage below is a
  * map-only pass; partition sizing is controlled by the upstream source
  * (spark.sql.files.maxPartitionBytes), which is the right knob when
  * payloads are MBs each.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("histogram", ArrayType(LongType), nullable = false)))

  /** Wrap any table with a text payload into the multimodal shape: the
    * payload becomes an opaque binary column + metadata struct. In a real
    * pipeline this is the ingest boundary where image/audio bytes arrive.
    */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("media"),
      struct(
        col("source").as("format"),
        pmod(col("n_chars"), lit(640)).cast(IntegerType).as("width"),
        pmod(col("n_chars") * 7, lit(480)).cast(IntegerType).as("height"))
        .as("meta"))

  /** STUB — deterministic fake decode standing in for a real codec
    * (libjpeg / ffmpeg / soundfile are not in this container). Produces a
    * 16-bucket byte histogram + mean, which is the shape a real
    * feature-extract kernel (e.g. CLIP preprocessor input stats) returns.
    */
  def fakeDecode(payload: Array[Byte]): (Double, Array[Long]) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b / 16) += 1
      sum += b
      i += 1
    }
    (if (payload.length == 0) 0.0 else sum.toDouble / payload.length, hist)
  }

  /** Feature extraction over the binary column as a codegen'd Catalyst
    * expression (graft.functions.ByteStats) — map-only, no shuffle, fused
    * into the scan under whole-stage codegen. The stats struct is staged
    * as its own projection so the kernel runs once per row, then fields
    * are unpacked (the repo's staged-projection discipline).
    *
    * A REAL decode kernel backed by native codecs would instead be a
    * mapPartitions/mapInPandas batch pass — that shape lives in the git
    * history of this method; the expression form is right for the fake
    * kernel so it benchmarks honestly.
    */
  def extractFeatures(media: DataFrame): DataFrame =
    media
      .select(col("media_id"),
        graft.functions.ByteStats.byte_stats(
          coalesce(col("media"), lit(Array.empty[Byte]))).as("__f"))
      .select(col("media_id"),
        col("__f.n_bytes").as("n_bytes"),
        col("__f.mean_byte").as("mean_byte"),
        col("__f.histogram").as("histogram"))

  /** Frame sampling for a (fake) video payload: every nth 256-byte block
    * becomes a "frame" row — the explode-with-stride shape of real frame
    * sampling, as pure column expressions.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        greatest(expr("(octet_length(media) + 255) div 256").cast(IntegerType),
          lit(1)))
      .select(col("media_id"), col("media"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        col("media").substr(col("frame_idx") * 256 + 1, lit(256))
          .as("frame_bytes"))
}
