package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ArrayType(FloatType)).
  *
  * Design for 100 TB:
  *  - Brute-force cosine top-k is the correctness baseline: a broadcast
  *    of the (tiny) query side against a scan of the corpus, finishing
  *    in TakeOrderedAndProject — one pass, no shuffle of the corpus.
  *  - IVF is the scale path: a deterministic "coarse quantizer" assigns
  *    every vector to its nearest centroid once (projection), queries
  *    probe only their nProbe nearest cells — at cluster scale the cell
  *    assignment is the partition key, so a probe touches few partitions.
  *  - SRP-LSH (signed random projections) is the near-dup path: sign-bit
  *    signatures + band-bucket shuffle, identical layout to MinHash LSH.
  *
  * All float math is upcast to double per element; sums that must be
  * hash-stable across engines go through DECIMAL (see dotDecimal).
  */
object Similarity {

  /** Exact dot product in double — index-order accumulation. Native
    * expression (tight float loop); the zip_with/aggregate composition
    * computes the same value interpreted at ~100× the cost. */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeExprs.dotf(a, b)

  /** Order-independent dot product: per-element products rounded to
    * DECIMAL(28,14) and summed exactly. Matches the DuckDB oracle
    * SUM(CAST(x*y AS DECIMAL(28,14))) regardless of evaluation order. */
  def dotDecimal(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") * y.cast("double")).cast("decimal(28,14)")),
      lit(0).cast("decimal(28,14)"),
      (acc, v) => (acc + v).cast("decimal(28,14)"))
      .cast("double")

  /** Cosine similarity, hash-stable variant (decimal dots, double combine). */
  def cosineDecimal(a: Column, b: Column): Column =
    dotDecimal(a, b) / sqrt(dotDecimal(a, a) * dotDecimal(b, b))

  /** Brute-force top-k by cosine against one anchor vector. */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      anchorId: Long, k: Int): DataFrame = {
    val anchor = embeddings.filter(col(idCol) === anchorId)
      .select(col(vecCol).as("anchor_vec"))
    embeddings
      .join(broadcast(anchor))
      .select(col(idCol),
        cosineDecimal(col(vecCol), col("anchor_vec")).as("cos_sim"))
      .filter(col(idCol) =!= anchorId)
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** SRP signature: `bits` sign bits of dot(v, plane_b) packed to
    * BIGINT; plane components are hashes of (b, i) mapped to [-1, 1),
    * recomputed on the fly — no broadcast state. Native expression. */
  def srpSignature(vec: Column, bits: Int): Column =
    graft.functions.NativeExprs.srpSig(vec, bits)

  /** SRP-LSH candidate pairs with exact cosine attached (no threshold):
    * band the signature, bucket-join, score candidates. Buckets larger
    * than `maxBucket` are dropped — same skew guard as Dedup.capBuckets;
    * members still pair via their other bands. */
  def srpCandidatePairs(embeddings: DataFrame, idCol: String, vecCol: String,
      bits: Int = 32, bands: Int = 4, maxBucket: Int = 1000): DataFrame = {
    val chunk = bits / bands
    val vecs = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
    val sigs = vecs.select(col("id"), srpSignature(col("v"), bits).as("sig"))
    // ids only into the bucket aggregation; vectors re-joined after dedup
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => call_function("shiftright", col("sig"), b * chunk)
            .bitwiseAND(lit((1L << chunk) - 1)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk_val")
    Dedup.bucketPairs(banded, Seq("band", "chunk_val"), maxBucket)
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      // double cosine: candidate scoring has no cross-engine oracle, and
      // Spark's index-order fold is deterministic run-to-run
      .withColumn("cos_sim",
        dot(col("v_a"), col("v_b")) /
          sqrt(dot(col("v_a"), col("v_a")) * dot(col("v_b"), col("v_b"))))
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Embedding near-dup pairs via SRP-LSH: candidates ≥ threshold. */
  def srpNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      bits: Int = 32, bands: Int = 4, cosThreshold: Double = 0.9): DataFrame =
    srpCandidatePairs(embeddings, idCol, vecCol, bits, bands)
      .filter(col("cos_sim") >= cosThreshold)

  private def cosD(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Nearest-centroid assignment: (id, vec, cell_id). argmax via max_by
    * (partial+final hash aggregate); ids only through the shuffle. */
  def assignCells(embeddings: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    embeddings.join(broadcast(centroids))
      .select(col(idCol), col("cent_id"),
        cosD(col(vecCol), col("cent_vec")).as("cent_cos"))
      .groupBy(col(idCol))
      .agg(max_by(col("cent_id"),
        struct(col("cent_cos"), (-col("cent_id")).as("neg_id"))).as("cell_id"))
      .join(embeddings.select(col(idCol), col(vecCol)), Seq(idCol))

  /** Lloyd-iteration k-means over the embedding corpus, fully
    * distributed and RUN-TO-RUN DETERMINISTIC: init = every `stride`-th
    * id (no RNG), assignment = broadcast argmax, update = per-dimension
    * mean computed as an exact DECIMAL sum (a double sum's value depends
    * on partition merge order; decimal addition is associative, so the
    * centroids are bit-stable however the cluster schedules tasks).
    * Empty cells drop out — standard Lloyd behavior. */
  def kmeansCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      stride: Long = 50, iters: Int = 2): DataFrame = {
    var centroids = embeddings.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
    (1 to iters).foreach { _ =>
      val assigned = assignCells(embeddings, centroids, idCol, vecCol)
      centroids = assigned
        .select(col("cell_id"), posexplode(col(vecCol)))
        .groupBy(col("cell_id"), col("pos"))
        .agg((sum(col("col").cast(org.apache.spark.sql.types.DecimalType(28, 14)))
          .cast("double") / count(lit(1)).cast("double")).cast("float").as("m"))
        .groupBy(col("cell_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cent_vec"))
        .select(col("cell_id").as("cent_id"), col("cent_vec"))
    }
    centroids
  }

  /** IVF-style ANN: centroids from [[kmeansCentroids]] when `kmeansIters`
    * > 0, else the deterministic stride sample. Every vector is assigned
    * to its nearest centroid (cell); a query probes only its `nProbe`
    * nearest cells. At scale, `assigned` is written partitioned by
    * cell_id so probes prune partitions instead of scanning
    * (IvfPartitionSpec proves the pruning). */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      anchorId: Long, k: Int, stride: Long = 50, nProbe: Int = 2,
      kmeansIters: Int = 0): DataFrame = {
    val centroids =
      if (kmeansIters > 0)
        kmeansCentroids(embeddings, idCol, vecCol, stride, kmeansIters)
      else embeddings.filter(col(idCol) % stride === 0)
        .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))

    // Cell assignment: nearest centroid by cosine (broadcast the
    // centroids). argmax via max_by — a partial+final hash aggregate, no
    // window sort over the N×C expansion. Tie-break: highest cos, then
    // lowest cent_id (negated inside the ordering struct). Plain double
    // cosine here: the assignment is internal and Spark's fold order is
    // deterministic, so the cross-engine decimal trick isn't needed.
    val cos = cosD _
    val assigned = assignCells(embeddings, centroids, idCol, vecCol)

    // the anchor's nProbe nearest cells
    val anchor = embeddings.filter(col(idCol) === anchorId)
      .select(col(vecCol).as("anchor_vec"))
    val probeCells = centroids.join(broadcast(anchor))
      .select(col("cent_id"),
        cos(col("cent_vec"), col("anchor_vec")).as("c"))
      .orderBy(col("c").desc, col("cent_id").asc)
      .limit(nProbe)
      .select(col("cent_id").as("cell_id"))

    assigned.join(broadcast(probeCells), Seq("cell_id"))
      .join(broadcast(anchor))
      .select(col(idCol),
        cos(col(vecCol), col("anchor_vec")).as("cos_sim"))
      .filter(col(idCol) =!= anchorId)
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }
}
