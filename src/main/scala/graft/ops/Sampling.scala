package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines. No rand(): hash-based assignment is reproducible across
  * runs, retries and cluster layouts (a task retry re-hashing the same
  * row gets the same verdict — rand() would not), and it needs no
  * shuffle — every operator here is a pure per-row projection.
  *
  * The draw is the 13-hex-char md5 prefix of `salt:key`, compared
  * lexicographically against a precomputed hex threshold. Fixed-length
  * lowercase hex orders identically to its numeric value, and md5 is
  * bit-identical across engines, so the exact same sample is
  * reproducible in any SQL engine (the DuckDB oracle checks it
  * end-to-end — an xxhash64-keyed draw would be Spark-only).
  */
object Sampling {

  /** Stable uniform draw: first 13 hex chars (52 bits) of
    * md5("salt:key"). */
  def hashHex(key: Column, salt: String): Column =
    substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 13)

  /** Threshold such that hashHex < threshold keeps ~`rate` of keys.
    * 13 hex chars = 52 bits, exact in a Double; rate ≥ 1 returns "g",
    * which is lexicographically above every hex string. */
  def hexThreshold(rate: Double): String = {
    val max = 1L << 52
    val v = math.round(rate * max.toDouble)
    if (v >= max) "g" else if (v <= 0L) "" else f"$v%013x"
  }

  /** Keep ~`rate` of rows, deterministically by key. */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "sample"): DataFrame =
    df.filter(hashHex(col(keyCol), salt) < lit(hexThreshold(rate)))

  /** Per-stratum rates, e.g. Map("en" -> 1.0, "de" -> 0.1): the
    * up/down-sampling mix every corpus rebalance runs. Strata missing
    * from the map are dropped (empty threshold — below every hash). */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], salt: String = "stratified"): DataFrame = {
    val threshold = rates.foldLeft(lit("")) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(hexThreshold(r))).otherwise(acc)
    }
    df.filter(hashHex(col(keyCol), salt) < threshold)
  }

  /** Fixed-budget contiguous sequence packing: within each `shardCol`
    * partition, rows in `orderCol` order are assigned to consecutive
    * packs of ~`budget` tokens (pack id = exclusive running token total
    * div budget). The window is PARTITIONED by shard — no global sort;
    * at 100 TB the shard column (language, source, date bucket) is the
    * unit of parallelism, exactly how a packing job shards. Integer
    * division keeps the assignment engine-exact. */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Long.MinValue, -1)
    val prior = coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L))
    // Integral `div`, not `/`+cast: double division loses exactness once the
    // running token total passes 2^53 — reachable in a 100 TB corpus shard.
    df.withColumn("graft_prior_tokens", prior)
      .withColumn("pack_id", expr(s"graft_prior_tokens div ${budget}L"))
      .drop("graft_prior_tokens")
  }

  /** Disjoint train/val/test assignment by key hash; fractions must sum
    * to ≤ 1 (remainder → "train" absorbs the rounding). */
  def split(df: DataFrame, keyCol: String, valFrac: Double, testFrac: Double,
      salt: String = "split"): DataFrame = {
    val u = hashHex(col(keyCol), salt)
    df.withColumn("split",
      when(u < lit(hexThreshold(valFrac)), "val")
        .when(u < lit(hexThreshold(valFrac + testFrac)), "test")
        .otherwise("train"))
  }
}
