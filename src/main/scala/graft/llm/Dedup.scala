package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, all built so the
  * candidate-generation join is KEY-EQUI (hash/band bucket), never an
  * all-pairs cartesian — the property that keeps them viable at 100 TB:
  *
  *  - exact: hash-groupBy on content (one shuffle on the content hash);
  *  - MinHash + LSH: shingle → k-min signature → banded bucket join;
  *  - SimHash: 64-bit signature → 16-bit chunk bucket join (Hamming LSH);
  *  - n-gram Jaccard: exact verification on LSH candidates only.
  *
  * Skew control: any bucket larger than `maxBucket` is dropped from
  * candidate generation (a degenerate bucket means the key carries no
  * discriminating power — standard LSH practice) so a hot key can never
  * produce a quadratic blow-up.
  */
object Dedup {
  val NumHashes = 64 // MinHash signature length
  val Bands = 32     // 32 bands x 2 rows: sensitive at low Jaccard
  val RowsPerBand: Int = NumHashes / Bands
  val MaxBucket = 100

  private val Prime = 2147483647L // 2^31 - 1

  /** Word n-gram shingles as a distinct array. Documents shorter than n
    * tokens yield their whole token sequence as the single shingle
    * (try_element_at keeps out-of-range slots null; concat_ws drops them).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ",
          (0 until n).map(k => try_element_at(toks, i + k + 1)): _*)))
  }

  /** Exact duplicate groups: hash-groupBy on the content digest, not the
    * content — grouping by `text` itself would shuffle the whole corpus'
    * bytes; grouping by (md5, length) shuffles 48 bytes per row and is
    * exact for any real corpus (a 128-bit collision at equal length is
    * ~2^-64 at petabyte scale). Survivor = min doc id, deterministic under
    * any partitioning.
    */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        md5(col("text").cast(BinaryType)).as("fp_md5"),
        length(col("text")).as("len"))
      .groupBy(col("fp_md5"), col("len"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"), col("fp_md5"))

  /** MinHash signature: for each of NumHashes permutations i,
    * sig[i] = min over shingles of ((a_i * h + b_i) mod p), where h is the
    * shingle's 32-bit murmur hash. Computed per-row over the shingle array
    * (no explode, no shuffle) — the whole signature stage fuses into the
    * document scan.
    */
  def minhashSignature(sh: Column): Column = {
    val hashes = transform(sh, s => pmod(hash(s).cast(LongType), lit(Prime)))
    val perms = (0 until NumHashes).map { i =>
      val a = 2L * i + 1 // odd multipliers
      val b = 40503L * (i + 1) % Prime
      array_min(transform(hashes, h => pmod(h * a + b, lit(Prime))))
    }
    array(perms: _*)
  }

  /** Banded LSH keys from a signature: one 'band:hash' key per band. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)), b =>
      concat_ws(":", b,
        hash(slice(sig, b * RowsPerBand + 1, lit(RowsPerBand))).cast(StringType)))

  /** Candidate near-duplicate pairs via the banded bucket join, with
    * signature-agreement estimate of Jaccard. The only join is equi on the
    * band key; oversized buckets are dropped (skew control).
    */
  def minhashCandidates(docs: DataFrame): DataFrame = {
    val sigs = docs
      .select(col("doc_id"), minhashSignature(shingles(col("text"))).as("sig"))
    val banded = sigs
      .select(col("doc_id"), col("sig"), explode(bandKeys(col("sig"))).as("band"))
    val smallBuckets = banded
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy(col("band"))))
      .filter(col("bucket_size") <= MaxBucket)
      .select(col("doc_id"), col("sig"), col("band"))
    val a = smallBuckets
      .select(col("band"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = smallBuckets
      .select(col("band"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          (x === y).cast(IntegerType)), v => v === 1)).cast(DoubleType)
          / NumHashes.toDouble)
      .drop("sig_a", "sig_b")
  }

  /** Exact n-gram Jaccard verification of candidate pairs — the expensive
    * set comparison runs only on LSH survivors, never all pairs.
    */
  def verifyJaccard(candidates: DataFrame, docs: DataFrame,
      threshold: Double): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
    candidates
      .join(sh.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter"))
          .cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of each
    * token's xxhash64. Bit b of the signature is 1 iff more token hashes
    * have bit b set than unset. Pure column expressions, no shuffle.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(split(trim(text), "\\s+"), t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming-LSH candidates: docs sharing any 16-bit chunk of the SimHash
    * are candidates (guaranteed to catch pairs within Hamming distance 3).
    */
  def simhashCandidates(docs: DataFrame): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash(col("text")).as("simhash"))
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        concat_ws(":", lit(c),
          shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL))): _*))
        .as("chunk"))
    val small = chunks
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy(col("chunk"))))
      .filter(col("bucket_size") <= MaxBucket)
    val a = small.select(col("chunk"), col("doc_id").as("doc_a"),
      col("simhash").as("sim_a"))
    val b = small.select(col("chunk"), col("doc_id").as("doc_b"),
      col("simhash").as("sim_b"))
    a.join(b, Seq("chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
