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

  /** The hash draw as a uniform double in [0, 1): the 52-bit integer
    * value of [[hashHex]] over 2^52. Both the integer (≤ 2^52) and the
    * division are exact in a double, so any engine computing the same
    * md5 prefix gets the bit-identical u — DuckDB:
    * `(('0x' || substr(md5(...), 1, 13))::UBIGINT) / 4503599627370496.0`. */
  def uniform01(key: Column, salt: String): Column =
    conv(hashHex(key, salt), 16, 10).cast("double") / lit(4503599627370496.0)

  /** Per-row weighted keep: row survives iff u < weight (weights ≤ 0
    * drop, ≥ 1 keep) — quality-proportional downsampling, deterministic
    * by key like every sampler here. Pure projection, no shuffle. */
  def weighted(df: DataFrame, keyCol: String, weight: Column,
      salt: String = "weighted"): DataFrame =
    df.filter(uniform01(col(keyCol), salt) < weight)

  /** Per-group quota: the top `n` rows of each group by `orderCols`
    * (with a total tie-break included by the caller) — the per-domain
    * cap every web-corpus curation run applies ("keep the 1000 best
    * documents per registered domain").
    *
    * Two-phase salted window, NOT one `row_number` over the group: a
    * single window concentrates each group's entire row set into one
    * task, and web domains are exactly the skewed key (one domain can
    * be 1% of a 100 TB corpus). Phase 1 splits each group into `salts`
    * deterministic sub-partitions (id-hash) and takes a local top-n, so
    * no task ever sees more than group/salts rows; phase 2 ranks the
    * surviving salts×n rows per group — bounded, tiny. Output rank is
    * phase 2's row_number: identical to the unsalted ranking because
    * every global top-n row is necessarily in its salt's local top-n. */
  def topNPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], n: Int, saltKeyCol: String,
      salts: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("graft_salt",
      pmod(xxhash64(col(saltKeyCol)), lit(salts)))
    val w1 = Window.partitionBy((groupCols.map(col) :+ col("graft_salt")): _*)
      .orderBy(orderCols: _*)
    val w2 = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    salted.withColumn("graft_r1", row_number().over(w1))
      .filter(col("graft_r1") <= n)
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= n)
      .drop("graft_salt", "graft_r1")
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

  /** Temperature-resampled source mixture — the standard LLM data-mix
    * op: sample source `s` with mixture weight `N_s^α / Σ N_t^α`
    * (α = 0.5, i.e. sqrt scaling — upweights small sources, flattens
    * large ones), scaled so the expected keep count is `targetFrac` of
    * the corpus. Per-row keep rate for source s:
    * `min(1, targetFrac·N_total·√N_s / Σ√N_t / N_s)`.
    *
    * Cross-engine exact: `sqrt` is correctly rounded IEEE on every
    * engine, the Σ√N accumulation is order-independent via a decimal
    * cast, the remaining chain is fixed-order double arithmetic, and
    * the draw is the exact md5 52-bit uniform — so DuckDB replays the
    * exact sample.
    *
    * Scale: two tiny aggregations (one row per source) broadcast back
    * onto the corpus; the corpus itself is filtered in place with no
    * shuffle. α is pinned to 0.5 because non-half powers go through
    * `pow`, whose rounding is libm-specific — a cross-engine trap. */
  def temperatureMixture(df: DataFrame, keyCol: String, sourceCol: String,
      targetFrac: Double, salt: String = "mix"): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("graft_n"))
    // corpus-wide totals attached via an unpartitioned window over the
    // per-source counts (tiny: one row per source) — no cross join
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val rates = counts
      .withColumn("graft_ntot", sum(col("graft_n")).over(all))
      .withColumn("graft_z",
        sum(sqrt(col("graft_n").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(28, 10))).over(all)
          .cast("double"))
      .withColumn("graft_rate",
        least(lit(1.0),
          lit(targetFrac) * col("graft_ntot").cast("double")
            * sqrt(col("graft_n").cast("double"))
            / col("graft_z") / col("graft_n").cast("double")))
      .select(col(sourceCol), col("graft_rate"))
    df.join(broadcast(rates), sourceCol)
      .filter(uniform01(col(keyCol), salt) < col("graft_rate"))
      .drop("graft_rate")
  }
}
