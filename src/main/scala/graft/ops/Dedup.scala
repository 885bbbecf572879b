package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Design for 100 TB:
  *  - exact dedup = one hash-shuffle on the normalized key (window over
  *    the key partition; no driver materialization).
  *  - MinHash/SimHash signatures are per-row higher-order-function
  *    projections (no shuffle, codegen-friendly); candidate generation is
  *    shuffle-by-band (explode bands → hash-partition on (band, hash)),
  *    so each LSH bucket meets on one reducer — the standard scalable
  *    layout. Only bucket-mates are pair-joined; no quadratic blowup.
  *  - Exact verification (Jaccard / Hamming) runs only on candidates.
  */
object Dedup {

  /** Keep the minimum-id row per normalized text key. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val key = lower(trim(col(textCol)))
    val w = Window.partitionBy(key).orderBy(col(idCol).asc)
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** MinHash signature: for each of `numHashes` seeds, the min xxhash64
    * over the document's k-token shingles. Pure projection. */
  def minHashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val shingles = TextAnalysis.shingleHashes(text, k)
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingles, h => xxhash64(h, seed))))
  }

  /** LSH candidate pairs from MinHash signatures, verified with exact
    * shingle-set Jaccard. bands × rowsPerBand must equal numHashes. */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

    val sigs = docs.select(col(idCol).as("id"),
      TextAnalysis.shingleHashes(col(textCol), k).as("shingles"),
      minHashSignature(col(textCol), k, numHashes).as("sig"))

    // explode to (band, band_hash, id): the shuffle key is the bucket.
    val banded = sigs.select(col("id"), col("shingles"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    val l = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("shingles").as("sh_a"))
    val r = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("shingles").as("sh_b"))

    val candidates = l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact Jaccard of two pre-deduplicated arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - size(array_intersect(a, b))
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  /** 64-bit SimHash: sign of the per-bit sum of token-hash bits. */
  def simHash(text: Column): Column = {
    val toks = array_distinct(TextAnalysis.tokens(lower(text)))
    val bitSums = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, tk) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", xxhash64(tk), i)
            .bitwiseAND(1) === 1, 1).otherwise(-1)),
        (x, y) => x + y))
    // fold sign bits into one BIGINT
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, i) => when(s > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit chunks
    * (exact match on ≥1 chunk ⇒ candidate, guarantees recall for
    * hamming ≤ 3), verify with popcount of xor. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val banded = sigs.select(col("id"), col("sim"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => call_function("shiftright", col("sim"), b * 16).bitwiseAND(0xFFFFL))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val l = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs within a blocking key (here: a column
    * like `source`) — the quadratic-but-blocked baseline the LSH paths
    * approximate. At 100 TB the blocking key bounds each block's pair
    * count; unblocked pairwise comparison is never shipped. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3, threshold: Double = 0.1): DataFrame = {
    val grams = docs.select(col(blockCol).as("blk"), col(idCol).as("id"),
      array_distinct(TextAnalysis.shingleHashes(col(textCol), n)).as("g"))
    val a = grams.select(col("blk"), col("id").as("id_a"), col("g").as("g_a"))
    val b = grams.select(col("blk"), col("id").as("id_b"), col("g").as("g_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
