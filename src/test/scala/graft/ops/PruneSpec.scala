package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomExprs

/** Bloom semi-join pruning: exactness at any fpp (no false negatives +
  * exact post-join), the plan carries the probe below the join, and the
  * probe really prunes.
  */
class PruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = spark.range(0, 10000)
    .select(col("id").as("k"), (col("id") % 7).as("v"))
  private lazy val dim = spark.range(0, 10000, 137)
    .select(col("id").as("dk")) // 73 keys, ~0.7% selectivity

  test("result equals the plain semi join even at an absurd 50% fpp") {
    val pruned = Prune.bloomSemiJoin(fact, "k", dim, "dk", fpp = 0.5)
      .select("k").collect().map(_.getLong(0)).toSet
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(pruned === plain)
    assert(pruned.size === 73)
  }

  test("plan: bloom probe sits in the fact branch, below a semi join") {
    val plan = Prune.bloomSemiJoin(fact, "k", dim, "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"))
    assert(plan.contains("LeftSemi"))
  }

  test("the probe filter actually prunes non-matching rows pre-join") {
    val keys = dim.select(col("dk")).distinct()
    val bloom = keys.stat.bloomFilter("dk", 73, 0.01)
    val kept = fact.filter(BloomExprs.mightContainLong(col("k"), bloom)).count()
    // 73 true keys + ~1% of the other 9927 rows as false positives
    assert(kept >= 73 && kept < 73 + 500, s"kept=$kept")
  }

  test("an empty dim side yields an empty result, not a crash") {
    val empty = dim.filter(col("dk") < 0)
    assert(Prune.bloomSemiJoin(fact, "k", empty, "dk").count() === 0)
  }

  test("null fact keys are dropped, matching IN-subquery semantics") {
    val withNull = fact.select(
      when(col("k") === 5, lit(null).cast("long")).otherwise(col("k")).as("k"))
    val pruned = Prune.bloomSemiJoin(withNull, "k", dim, "dk")
      .collect().map(_.getLong(0)).toSet
    assert(!pruned.contains(5L))
    assert(pruned.contains(137L))
  }
}
