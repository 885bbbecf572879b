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

  /** Exact dot product in double — sequential fold in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

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

  /** Deterministic pseudo-random unit-ish hyperplane component:
    * hash(plane, dim) mapped to [-1, 1). Shared by signature and probe
    * sides, so it needs no broadcast state — it's recomputed in codegen. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (xxhash64(plane, dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** SRP signature: `bits` sign bits of dot(v, plane_i), packed to BIGINT. */
  def srpSignature(vec: Column, bits: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)), p => {
        val s = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast("double") * planeComponent(p, i)),
          lit(0.0), (acc, v) => acc + v)
        when(s > 0.0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, v) => acc.bitwiseOR(v))

  /** Embedding near-dup pairs via SRP-LSH: band the signature, bucket-join,
    * verify candidates with exact cosine. */
  def srpNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      bits: Int = 32, bands: Int = 4, cosThreshold: Double = 0.9): DataFrame = {
    val chunk = bits / bands
    val sigs = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      srpSignature(col(vecCol), bits).as("sig"))
    val banded = sigs.select(col("id"), col("v"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => call_function("shiftright", col("sig"), b * chunk)
            .bitwiseAND(lit((1L << chunk) - 1)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk_val")
    val l = banded.select(col("band"), col("chunk_val"), col("id").as("id_a"), col("v").as("v_a"))
    val r = banded.select(col("band"), col("chunk_val"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("band", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos_sim", cosineDecimal(col("v_a"), col("v_b")))
      .filter(col("cos_sim") >= cosThreshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** IVF-style ANN: centroids = deterministic sample of the corpus
    * (every `stride`-th id). Every vector is assigned to its nearest
    * centroid (cell); a query probes only its `nProbe` nearest cells.
    * At scale, `assigned` is written partitioned by cell_id so probes
    * prune partitions instead of scanning. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      anchorId: Long, k: Int, stride: Long = 50, nProbe: Int = 2): DataFrame = {
    val centroids = embeddings.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))

    // cell assignment: nearest centroid by cosine (broadcast the centroids)
    val assigned = embeddings.join(broadcast(centroids))
      .select(col(idCol), col(vecCol),
        col("cent_id"),
        cosineDecimal(col(vecCol), col("cent_vec")).as("cent_cos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("cent_cos").desc, col("cent_id").asc)))
      .filter(col("rk") === 1)
      .select(col(idCol), col(vecCol), col("cent_id").as("cell_id"))

    // the anchor's nProbe nearest cells
    val anchor = embeddings.filter(col(idCol) === anchorId)
      .select(col(vecCol).as("anchor_vec"))
    val probeCells = centroids.join(broadcast(anchor))
      .select(col("cent_id"),
        cosineDecimal(col("cent_vec"), col("anchor_vec")).as("c"))
      .orderBy(col("c").desc, col("cent_id").asc)
      .limit(nProbe)
      .select(col("cent_id").as("cell_id"))

    assigned.join(broadcast(probeCells), Seq("cell_id"))
      .join(broadcast(anchor))
      .select(col(idCol),
        cosineDecimal(col(vecCol), col("anchor_vec")).as("cos_sim"))
      .filter(col(idCol) =!= anchorId)
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }
}
