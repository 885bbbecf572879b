package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salting. AQE's skew-join handling splits
  * oversized SORT-MERGE partitions at runtime, but a broadcast-unable
  * dimension joined on a pathologically hot key (the classic "null-ish
  * default id" or "boilerplate doc" key at 100 TB) still funnels one
  * key's rows through one task. Salting shards the hot key explicitly:
  *
  *   fact side: salt = hash(row-local column) % S  (deterministic —
  *              no rand(), which would break retry/replay semantics)
  *   dim side:  exploded ×S, one copy per salt value
  *   join key:  (key, salt) — the hot key now lands on S tasks.
  *
  * Result set is IDENTICAL to the unsalted join (verified in SkewSpec);
  * only the partitioning changes.
  */
object Skew {

  /** Inner equi-join of `fact` to `dim` on `key`, sharded `salts` ways.
    * `saltSource` must be a fact-side column that varies within the hot
    * key (an id, a line number) so shards balance. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
