package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (array<float>).
  *
  *  - Brute-force top-k: the QUERY set is broadcast; the candidate corpus is
  *    scanned exactly once with a fused dot-product expression. This is the
  *    correct baseline at any scale when |queries| is small: one pass, no
  *    shuffle of the corpus, TakeOrdered per query.
  *  - LSH (sign-random-projection) buckets: candidates share a hyperplane
  *    sign signature; the expensive exact scoring runs only within buckets
  *    — the scale path when |queries| is large or for all-pairs near-dup.
  *
  * All dot products fold left-to-right in double precision, so scores are
  * bit-stable and order-independent of partitioning.
  */
object Similarity {

  /** Sequential-fold dot product — the codegen'd expression
    * (graft.functions.DotProduct): identical left-to-right IEEE fold as
    * the composed aggregate(zip_with(...)) form and DuckDB's
    * list_dot_product (the ANN oracle hash-checks this), without boxed
    * per-element lambdas.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Embedding dimensionality from one corpus row — a LIMIT-1 probe, not a
    * scan. Used when the caller doesn't pass an explicit dim.
    */
  def embeddingDim(df: DataFrame, embeddingCol: String = "embedding"): Int =
    df.select(size(col(embeddingCol)).as("d")).limit(1).head.getInt(0)

  /** L2-normalize the embedding column: after this, dot product IS cosine
    * — normalize once at ingest, score with the cheap kernel at query
    * time. Both the cast array and the norm are staged as their own
    * projections (a lambda-captured norm would re-evaluate PER ELEMENT —
    * trap #2 of the repo's expression discipline); zero vectors pass
    * through unchanged.
    */
  def l2Normalized(corpus: DataFrame,
      embeddingCol: String = "embedding"): DataFrame =
    corpus
      .withColumn("__v", asDouble(col(embeddingCol)))
      .withColumn("__n", norm(col("__v")))
      .withColumn("unit",
        when(col("__n") === 0.0, col("__v"))
          .otherwise(transform(col("__v"), x => x / col("__n"))))
      .drop("__v", "__n")

  /** Symmetric int8 scalar quantization — the storage rung of the
    * embedding toolkit: q_i = floor(v_i · 127 / s + 0.5) with per-vector
    * scale s = max|v_i| (round-half-up spelled as floor(x + 0.5) so both
    * engines apply the same tie rule on bit-identical doubles; Spark's
    * round() is HALF_UP but other engines' round() may be half-even).
    * A 4-byte-float vector becomes 1 byte/dim + one scale — 4× smaller,
    * and int8 dot products run in exact BIGINT. Reconstruction error is
    * bounded by s/254 per element (EmbedQuantizeSpec checks the bound and
    * the recall cost on the real corpus). Zero vectors (s = 0) quantize
    * to all-zero, guarded like l2Normalized. Scale/maxabs are staged
    * projections (lambda-captured aggregates would re-evaluate per
    * element — repo expression-discipline trap #2); the plan is map-only.
    */
  def scalarQuantize(corpus: DataFrame,
      embeddingCol: String = "embedding"): DataFrame =
    corpus
      .withColumn("__v", asDouble(col(embeddingCol)))
      .withColumn("scale",
        aggregate(col("__v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("qvec",
        when(col("scale") === 0.0,
          transform(col("__v"), _ => lit(0).cast(IntegerType)))
          .otherwise(transform(col("__v"),
            x => floor(x * lit(127.0) / col("scale") + lit(0.5))
              .cast(IntegerType))))
      .drop("__v")

  /** Brute-force top-k over the INT8-QUANTIZED corpus — the retrieval
    * path that pairs with [[scalarQuantize]]: scores are exact-BIGINT
    * integer dot products (per-vector scales cancel in the cosine, so
    * ranking needs no dequantization), normalized by the quantized norms
    * only for the final cosine value. Element products are ≤ 127² and
    * corpus dims are bounded, so the integer fold is exact in both
    * engines (the oracle's double fold over integer terms is exact below
    * 2^53). Zero-norm QUANTIZED vectors are excluded like the float path.
    * At scale this reads 4× fewer bytes per candidate than the float
    * kernel and the multiply-accumulate is integer — the standard
    * memory-bound ANN serving trade.
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    def quant(df: DataFrame, idAs: String, vecAs: String, n2As: String) =
      scalarQuantize(df)
        .select(col("vec_id").as(idAs),
          col("qvec").cast(ArrayType(LongType)).as(vecAs))
        .withColumn(n2As,
          aggregate(col(vecAs), lit(0L), (a, x) => a + x * x))
        .filter(col(n2As) > 0)
    val q = broadcast(quant(queries, "query_id", "qq", "qn2"))
    val c = quant(corpus, "neighbor_id", "cq", "cn2")
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("int_dot",
        aggregate(zip_with(col("qq"), col("cq"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("qcosine",
        col("int_dot").cast(DoubleType) /
          (sqrt(col("qn2").cast(DoubleType)) *
            sqrt(col("cn2").cast(DoubleType))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("int_dot"),
        col("qcosine"), col("rank"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. Queries are broadcast; ranking is a window per query id with
    * deterministic tie-breaking.
    *
    * Zero-norm vectors carry no direction: their cosine is undefined, and
    * under Spark 4's ANSI mode the division THROWS rather than yielding
    * NaN — every similarity entry point here excludes them up front
    * (adversarial-corpus finding; oracles carry the same predicate).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // Pre-compute norms on each side so the per-pair work is one dot product
    // — the query norm would otherwise be re-folded for every corpus row.
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
      .withColumn("qnorm", norm(col("qv")))
      .filter(col("qnorm") > 0))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cnorm", norm(col("cv")))
      .filter(col("cnorm") > 0)
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed — reproducible
    * across runs and engines).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rng.nextGaussian())
  }

  /** Sign-random-projection bucket key: one bit per hyperplane. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit).toIndexedSeq: _*)
      when(dot(v, plane) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: score only within each bucket (equi join on the
    * bucket key). Fewer planes → bigger buckets → better recall, more work.
    * `dim` defaults to a one-row probe of the corpus (pass it explicitly to
    * skip the probe job).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 8, dim: Int = 0): DataFrame = {
    val d = if (dim > 0) dim else embeddingDim(corpus)
    val planes = hyperplanes(nPlanes, d)
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
      .filter(dot(col("qv"), col("qv")) > 0) // see bruteForceTopK
      .withColumn("bucket", lshBucket(col("qv"), planes)))
    val c = corpus.select(
      col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
      .filter(dot(col("cv"), col("cv")) > 0)
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF-style ANN: the corpus is partitioned into nlist inverted lists by
    * nearest centroid; a query scores only the lists of its nprobe nearest
    * centroids. Centroids are deterministic (the nlist lowest-id vectors —
    * a seed-free stand-in for k-means that keeps runs reproducible).
    *
    * Scale shape: assignment is one corpus scan against a broadcast
    * centroid table (nlist small); candidate generation is an equi join on
    * centroid_id — the corpus is never compared all-pairs, and increasing
    * nlist shrinks per-list work linearly.
    */
  /** Corpus→inverted-list assignment as a PURE argmin expression: one
    * map-only pass computing nlist dot products per row, the best taken by
    * array_max over (aff, -centroid_id) structs — max affinity, ties to
    * the LOWEST centroid id, the exact order a per-row window would use
    * (rank 1 of aff DESC, centroid_id ASC). No crossJoin row blow-up, no
    * corpus-wide shuffle, no window state; each aff is evaluated once
    * (the structs are array elements, never re-inlined). Exposed
    * separately from [[ivfTopK]] so the map-only plan shape is
    * spec-pinnable (IvfPlanSpec: no Window, no Exchange).
    */
  def ivfAssign(corpus: DataFrame,
      centArr: Array[(Long, Array[Double])]): DataFrame = {
    def nearestExpr(vCol: String): Column =
      -array_max(array(centArr.map { case (cid, v) =>
        struct(dot(col(vCol), array(v.map(lit).toIndexedSeq: _*)).as("aff"),
          lit(-cid).as("nid"))
      }.toIndexedSeq: _*)).getField("nid")
    corpus
      .select(col("vec_id").as("neighbor_id"),
        asDouble(col("embedding")).as("cv"))
      .filter(dot(col("cv"), col("cv")) > 0) // see bruteForceTopK
      .withColumn("centroid_id", nearestExpr("cv"))
  }

  /** The IVF centroid table: the nlist lowest-id vectors (deterministic,
    * seed-free stand-in for k-means). O(nlist · dim) model-parameter
    * collect, shared by [[ivfTopK]] and the streaming cell maintainer.
    */
  def centroidTable(corpus: DataFrame, nlist: Int)
      : Array[(Long, Array[Double])] =
    corpus.orderBy("vec_id").limit(nlist)
      .select(col("vec_id"), asDouble(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    // The centroid table is the MODEL PARAMETER of IVF — nlist rows that
    // live on the driver by design (k-means would train them there too).
    // Collecting it is O(nlist · dim), not a data-path collect; the
    // broadcast-side frame is rebuilt FROM the collected rows (identical
    // by construction) so the corpus is not scanned a second time.
    val centArr = centroidTable(corpus, nlist)
    ivfSearchLists(ivfAssign(corpus, centArr), queries, centArr, k, nprobe)
  }

  /** The probe+rank stage of [[ivfTopK]] over ALREADY-ASSIGNED inverted
    * lists (centroid_id, neighbor_id, cv) — split out so the streaming
    * index maintainer (StreamingAnnIvf) can measure recall over its
    * ACCUMULATED lists with the exact batch search plan: same probes,
    * same join, same ranking, so fold ≡ one-shot reduces to the lists
    * frame being union-equal, which assignment purity gives for free.
    */
  def ivfSearchLists(corpusLists: DataFrame, queries: DataFrame,
      centArr: Array[(Long, Array[Double])], k: Int,
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = broadcast(
      centArr.toSeq.map { case (cid, v) => (cid, v.toSeq) }
        .toDF("centroid_id", "centv"))
    // Query probes keep the broadcast-join + tiny window (top-nprobe per
    // query over nlist rows — queries are few; the window partitions by
    // query id over ≤nlist rows each).
    val queryProbes = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("aff").desc, col("centroid_id"))
      queries.select(col("vec_id").as("query_id"),
        asDouble(col("embedding")).as("qv"))
        .filter(dot(col("qv"), col("qv")) > 0)
        .crossJoin(cents)
        .withColumn("aff", dot(col("qv"), col("centv")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= nprobe)
        .drop("centv", "aff", "crank")
    }

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    // No dedup needed before ranking: each corpus vector lives in EXACTLY
    // one inverted list (the argmin is unique) and a query's probes are
    // distinct lists, so (query, neighbor) pairs are unique by
    // construction — a dropDuplicates here would shuffle the whole scored
    // set for nothing.
    corpusLists.join(queryProbes, Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, generated
    * within LSH buckets only (equi join, no cartesian).
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      nPlanes: Int = 8, dim: Int = 0): DataFrame = {
    val d = if (dim > 0) dim else embeddingDim(corpus)
    val planes = hyperplanes(nPlanes, d)
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .filter(dot(col("v"), col("v")) > 0) // see bruteForceTopK
      .withColumn("bucket", lshBucket(col("v"), planes))
    // bucket join on slim (bucket, id) rows; vectors re-attached to the
    // DEDUPED pairs — carrying 64-double arrays through the Σ bucket²
    // intermediate is the same shuffle explosion Dedup.minhashCandidates
    // documents. nPlanes is the bucket-size knob: more planes at scale.
    val slim = c.select(col("bucket"), col("vec_id"))
    val pairs = slim.select(col("bucket"), col("vec_id").as("vec_a"))
      .join(slim.select(col("bucket"), col("vec_id").as("vec_b")), Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .dropDuplicates("vec_a", "vec_b")
    pairs
      .join(c.select(col("vec_id").as("vec_a"), col("v").as("va")), Seq("vec_a"))
      .join(c.select(col("vec_id").as("vec_b"), col("v").as("vb")), Seq("vec_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Top principal direction of the int8-quantized corpus via `iters`
    * power iterations in EXACT integer arithmetic — the dimensionality-
    * reduction probe an embedding pipeline runs before choosing an index
    * (a dominant direction means IVF/OPQ-style rotation pays; PCA-whitened
    * ANN is the standard pre-processing). Each iteration computes
    * y = Σ_rows q·(q·v) without ever materializing the d×d covariance:
    * a per-row BIGINT dot product d_i = q_i·v (dim-keyed broadcast join
    * against the ≤ dim-row v frame), then per-component re-aggregation
    * y_j = Σ q_ij·d_i — two |rows·dim|-keyed shuffles per iteration, the
    * k-means cost class, never all-pairs. v is then rescaled to
    * max|v_j| = 1024 with SIGN-SPLIT truncating division
    * (sign(y)·((|y|·1024) div m)): Spark's `div` truncates toward zero
    * while DuckDB's `//` floors, so the operand is kept non-negative —
    * on that domain the two agree bit-for-bit. All accumulators are
    * exact BIGINT (|q| ≤ 127, |v| ≤ 1024, dim-bounded folds), so both
    * engines replay the identical integer trajectory; an all-zero y
    * (m = 0) short-circuits to the zero vector rather than dividing.
    * Overflow headroom: per-row contribution ≤ 127²·1024·dim ≈ 10⁹ at
    * dim 64, so corpora to ~10⁹ rows fit int64; beyond that, drop the
    * rescale target from 1024 to 256.
    *
    * Returns one row per dimension: (dim, y, v) — the final raw
    * accumulator and its rescaled direction.
    */
  def pcaPowerIteration(corpus: DataFrame, dim: Int,
      iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val qpos = scalarQuantize(corpus)
      .select(col("vec_id"), col("qvec").cast(ArrayType(LongType)).as("q"))
      .select(col("vec_id"), posexplode(col("q")).as(Seq("pos", "qv")))
      // feeds both shuffles of every iteration — staged once
      .localCheckpoint(false)
    var v = spark.range(dim)
      .select(col("id").cast(IntegerType).as("pos"), lit(1L).as("v"))
    var y: DataFrame = null
    for (_ <- 1 to iters) {
      val d = qpos.join(broadcast(v), Seq("pos"))
        .groupBy("vec_id").agg(sum(col("qv") * col("v")).as("d"))
      y = qpos.join(d, Seq("vec_id"))
        .groupBy("pos").agg(sum(col("qv") * col("d")).as("y"))
        .localCheckpoint(false) // eager: bounds lineage across iterations
      val m = y.agg(max(abs(col("y"))).as("m"))
      v = y.crossJoin(broadcast(m))
        .select(col("pos"),
          when(col("m") === 0L, lit(0L))
            .otherwise((when(col("y") < 0L, lit(-1L)).otherwise(lit(1L))) *
              expr("(abs(y) * 1024) div m")).as("v"))
    }
    v.join(y, Seq("pos"))
      .select(col("pos").as("dim"), col("y"), col("v"))
      .orderBy("dim")
  }

  // ---- product quantization (PQ) ----

  /** PQ policy knobs: M subspaces of `dim / PqSubspaces` dims each, K
    * centroids per subspace (codes are 4 bits ⇒ a 64-dim float vector
    * compresses 256 bytes → 4 bytes, 64×), and the global integer grid
    * every coordinate is snapped to (floor(x·1000 + 0.5) — the
    * scalarQuantize rounding discipline, but a GLOBAL grid: unlike the
    * cosine path, L2 distances compare coordinates ACROSS vectors, so a
    * per-vector scale would not cancel). On the grid every subspace
    * distance is an exact-BIGINT sum of ≤ 8 squared diffs — engine-
    * portable, no float summation order anywhere.
    */
  val PqSubspaces = 8
  val PqCentroids = 16
  val PqGrid = 1000.0

  /** Grid-quantized components: one row per (id, pos) with the integer
    * coordinate. Map-side generate off the corpus scan.
    */
  private def pqComponents(df: DataFrame, idAs: String): DataFrame =
    df.select(col("vec_id").as(idAs),
      posexplode(transform(asDouble(col("embedding")),
        x => floor(x * lit(PqGrid) + lit(0.5)).cast(LongType)))
        .as(Seq("pos", "x")))

  /** Seeded PQ codebook: centroid k of subspace m is the m-th subvector
    * of corpus vector vec_id = k (k < PqCentroids) — the deterministic
    * seeding step of PQ training, model-sized (M·K·subDim rows) and
    * broadcastable by construction. Lloyd's refinement of codebooks is
    * the proven k-means machinery (llm/KMeans.scala); keeping the
    * codebook at its seed here is a declared policy knob so the encode
    * and ADC arithmetic stay exactly cross-engine-checkable, not a
    * capability gap.
    */
  def pqCodebook(corpus: DataFrame, subDim: Int): DataFrame =
    pqComponents(corpus.filter(col("vec_id") < PqCentroids), "k")
      .select(col("k").cast(IntegerType).as("k"),
        (col("pos") / subDim).cast(IntegerType).as("m"),
        (col("pos") % subDim).as("j"), col("x").as("c"))

  /** PQ encode: each vector's code in subspace m is the argmin-distance
    * centroid (ties to the smaller k). The candidate stage is the
    * standard O(N·D·K) PQ-encode kernel as a broadcast equi join — the
    * corpus component stream joins the model-sized codebook on (m, j),
    * partial-aggregates the exact-BIGINT squared distances down to
    * (id, m, k), and a (id, m)-partitioned window picks the argmin.
    * Nothing here depends on corpus size except linearly.
    */
  /** The exact-BIGINT subspace distance frame (id, m, k, dist) — every
    * vector against every centroid of every subspace. Shared kernel of
    * [[pqEncode]] (per-subspace argmin) and [[ivfPqSearch]] (whose
    * COARSE distance is the sum over m — the full-vector L2 to seed k —
    * and whose query LUT is this frame filtered to the query ids).
    */
  def pqSubDists(corpus: DataFrame, subDim: Int): DataFrame = {
    val sub = pqComponents(corpus, "vec_id")
      .select(col("vec_id"), (col("pos") / subDim).cast(IntegerType).as("m"),
        (col("pos") % subDim).as("j"), col("x"))
    sub.join(broadcast(pqCodebook(corpus, subDim)), Seq("m", "j"))
      .groupBy("vec_id", "m", "k")
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
  }

  def pqEncode(corpus: DataFrame, subDim: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("dist"), col("k"))
    pqSubDists(corpus, subDim).withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("m"), col("k").as("code"), col("dist"))
  }

  /** Packed PQ codes: one BIGINT per vector, 4 bits per subspace code —
    * the 4-byte-per-vector index payload ADC serving actually ships.
    */
  def pqCodes(corpus: DataFrame, subDim: Int): DataFrame =
    pqEncode(corpus, subDim)
      .groupBy("vec_id")
      .agg(sum(col("code").cast(LongType) *
        expr("shiftleft(CAST(1 AS BIGINT), m * 4)")).as("pqcode"))

  /** ADC (asymmetric distance computation) top-k: per query, the lookup
    * table LUT[m][k] = exact subspace distance from the query's m-th
    * subvector to centroid k — M·K entries per query, model-sized,
    * broadcast — and every corpus vector's approximate distance is the
    * sum of its M code lookups: a broadcast equi join on (m, code) plus
    * a partial agg, never touching the original vectors. This is the
    * billion-scale serving shape: the corpus side streams 4-byte codes,
    * all float work happened once at LUT build.
    */
  /** The ADC serving kernel shared by [[pqSearch]], [[ivfPqSearch]], and
    * the `ScaleProbe pq` build-vs-serve split: codes (vec_id, m, code) ×
    * broadcast LUT (query_id, m, code, ld) equi join, partial-agg sum,
    * per-query rank. `cands` optionally restricts to routed
    * (query_id, vec_id) candidates (the IVF path).
    */
  def adcTopK(codes: DataFrame, lut: DataFrame, k: Int,
      cands: Option[DataFrame] = None): DataFrame = {
    val stream = cands match {
      case Some(c) => c.join(codes, Seq("vec_id"))
        .join(broadcast(lut), Seq("query_id", "m", "code"))
      case None => codes
        .join(broadcast(lut), Seq("m", "code"))
        .filter(col("vec_id") =!= col("query_id"))
    }
    val scored = stream.groupBy("query_id", "vec_id")
      .agg(sum(col("ld")).as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adist"), col("rank"))
  }

  /** Per-query ADC lookup table (query_id, m, code, ld): the exact
    * subspace distance from each query subvector to each centroid —
    * M·K rows per query, model-sized, the only float→int work serving
    * does per query.
    */
  def pqLut(corpus: DataFrame, subDim: Int, nQueries: Int): DataFrame = {
    val qsub = pqComponents(corpus.filter(col("vec_id") < nQueries),
      "query_id")
      .select(col("query_id"),
        (col("pos") / subDim).cast(IntegerType).as("m"),
        (col("pos") % subDim).as("j"), col("x"))
    qsub.join(broadcast(pqCodebook(corpus, subDim)), Seq("m", "j"))
      .groupBy("query_id", "m", "k")
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("ld"))
      .withColumnRenamed("k", "code")
  }

  def pqSearch(corpus: DataFrame, k: Int, subDim: Int,
      nQueries: Int = 10): DataFrame =
    adcTopK(pqEncode(corpus, subDim).drop("dist"),
      pqLut(corpus, subDim, nQueries), k)

  /** IVF-PQ: the composed billion-scale index (coarse routing × code
    * compression — the FAISS IndexIVFPQ serving shape). Every vector is
    * assigned to the inverted list of its nearest coarse centroid —
    * which here is the SAME 16 seeds as the PQ codebooks, so the coarse
    * distance is simply Σ over m of the subspace distances already
    * computed (full-vector exact-BIGINT L2, one extra partial agg over
    * the shared [[pqSubDists]] frame, no second corpus pass). A query
    * probes its `nprobe` nearest lists (ties → smaller k) and runs the
    * [[pqSearch]] ADC over ONLY those lists' candidates: at scale the
    * candidate stream is nprobe/nlist of the corpus, each candidate 4
    * bytes. Residual encoding (PQ over x − coarse centroid) is a
    * declared policy omission: it refines quality, not the serving
    * shape, and skipping it keeps every number exactly
    * cross-engine-checkable on the shared integer grid.
    */
  def ivfPqSearch(corpus: DataFrame, k: Int, subDim: Int,
      nQueries: Int = 10, nprobe: Int = 4): DataFrame = {
    val d = pqSubDists(corpus, subDim).localCheckpoint(false)
    val coarse = d.groupBy("vec_id", "k")
      .agg(sum(col("dist")).as("cdist"))
    val wa = Window.partitionBy(col("vec_id"))
      .orderBy(col("cdist"), col("k"))
    val assign = coarse.withColumn("__rn", row_number().over(wa))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("k").as("list"))
    val probes = coarse.filter(col("vec_id") < nQueries)
      .withColumn("__rn", row_number().over(wa))
      .filter(col("__rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("k").as("list"))
    val codes = {
      val w = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("dist"), col("k"))
      d.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("vec_id"), col("m"), col("k").as("code"))
    }
    val lut = d.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("m"),
        col("k").as("code"), col("dist").as("ld"))
    val cands = assign.join(broadcast(probes), Seq("list"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("vec_id"), col("query_id"))
    adcTopK(codes, lut, k, Some(cands))
  }
}
