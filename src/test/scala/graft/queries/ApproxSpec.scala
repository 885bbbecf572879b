package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Bounds for the approximate aggregates (SURVEY.md §2b rows 26–27),
  * which are deliberately omitted from the DuckDB oracle set: HLL++ and
  * quantile-sketch results must land within ±5% of the exact answers on
  * sf0.01 (cited from Relational.scala's agg_approx_* entries).
  */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact per returnflag") {
    val li = Tables.load(spark, dir, "lineitem")
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"flag $k: approx $a vs exact $e drifts > 5%")
    }
  }

  test("merged HLL sketches track the single-pass sketch and exact count") {
    val li = Tables.load(spark, dir, "lineitem")
    // the union of per-group sketches and one sketch over the whole
    // column may use different estimator paths (DataSketches union
    // gadget), so they need not be bit-equal — but both must land
    // within 5% of exact and within 2% of each other
    val merged = li.groupBy(col("l_returnflag"))
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().head.getLong(0)
    val single = li
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("est"))
      .collect().head.getLong(0)
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    assert(math.abs(merged - single).toDouble / exact <= 0.02,
      s"merged $merged vs single-pass $single diverge > 2%")
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"merged estimate $merged vs exact $exact drifts > 5%")
    assert(math.abs(single - exact).toDouble / exact <= 0.05,
      s"single-pass estimate $single vs exact $exact drifts > 5%")
  }

  test("percentile_approx within 5% of exact median per returnflag") {
    val li = Tables.load(spark, dir, "lineitem")
    val approx = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) / e <= 0.05,
        s"flag $k: approx p50 $a vs exact $e drifts > 5%")
    }
  }
}
