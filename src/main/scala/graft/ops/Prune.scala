package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomExprs

/** Scan-side pruning: shrink the FACT side of a semi join before its
  * shuffle, the dominant cost of selective star joins at 100 TB.
  *
  * A plain `fact SEMI JOIN dim` shuffles every fact row on the join key
  * (or, broadcast, still streams every fact row through the probe); when
  * the dim side is selective (a filtered dimension: one nation's
  * suppliers, one tenant's ids), most shuffled bytes are thrown away at
  * the join. `bloomSemiJoin` builds a bloom filter over the dim keys
  * (distributed treeAggregate via `DataFrameStatFunctions.bloomFilter`;
  * only the merged ~1 MB filter reaches the driver) and applies it as a
  * native codegen'd predicate INSIDE the fact scan stage, so non-matching
  * rows die before the exchange. Bloom filters have no false negatives,
  * so the exact semi join that follows sees every true match and removes
  * the false positives — the composition is value-identical to the plain
  * semi join at ANY fpp, which is what makes the operator
  * DuckDB-oracle-checkable.
  *
  * This is the manual, always-on form of Spark's AQE runtime bloom
  * filter (spark.sql.optimizer.runtime.bloomFilter.*), which only
  * triggers under size heuristics; a pipeline that KNOWS its dim side is
  * selective pins the plan shape instead of hoping.
  */
object Prune {

  /** `fact` rows whose `factKey` appears in `dim.dimKey` (exact), with a
    * bloom pre-filter on the fact scan. `expectedKeys`/`fpp` size the
    * filter: ~1.2 MB per million keys at 1% fpp.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey)).distinct()
    // The dim side is small by contract (that's when pruning pays); one
    // count sizes the filter. At 100 TB this is a metadata-cheap job on
    // the already-filtered dimension, not on the fact table.
    val n = keys.count()
    // Empty dim: a semi join against nothing is empty — and
    // stat.bloomFilter cannot build from zero rows (null merged buffer).
    if (n == 0) return fact.filter(lit(false))
    val bloom = keys.stat.bloomFilter(dimKey, n, fpp)
    fact.filter(BloomExprs.mightContainLong(col(factKey), bloom))
      .join(keys, fact(factKey) === keys(dimKey), "left_semi")
  }
}
