package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines. No rand(): hash-based assignment is reproducible across
  * runs, retries and cluster layouts (a task retry re-hashing the same
  * row gets the same verdict — rand() would not), and it needs no
  * shuffle — every operator here is a pure per-row projection.
  */
object Sampling {

  /** Stable uniform [0,1) derived from a key column (+ salt so
    * different stages draw independent samples from the same keys). */
  def hashUnit(key: Column, salt: String): Column =
    (pmod(xxhash64(key, lit(salt)), lit(1000000000L)).cast("double") / 1e9)

  /** Keep ~`rate` of rows, deterministically by key. */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "sample"): DataFrame =
    df.filter(hashUnit(col(keyCol), salt) < rate)

  /** Per-stratum rates, e.g. Map("en" -> 1.0, "de" -> 0.1): the
    * up/down-sampling mix every corpus rebalance runs. Strata missing
    * from the map are dropped. */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], salt: String = "stratified"): DataFrame = {
    val rate = rates.foldLeft(lit(-1.0)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashUnit(col(keyCol), salt) < rate)
  }

  /** Disjoint train/val/test assignment by key hash; fractions must sum
    * to ≤ 1 (remainder → "train" absorbs the rounding). */
  def split(df: DataFrame, keyCol: String, valFrac: Double, testFrac: Double,
      salt: String = "split"): DataFrame = {
    val u = hashUnit(col(keyCol), salt)
    df.withColumn("split",
      when(u < valFrac, "val")
        .when(u < valFrac + testFrac, "test")
        .otherwise("train"))
  }
}
