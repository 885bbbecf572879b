package graft.engine

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec

/** Co-located join via bucketing — the 100 TB strategy for repeated
  * big-big joins on a stable key: bucket both tables by the join key at
  * write time and the join needs NO shuffle at read time (Exchange
  * disappears from the plan; SortMergeJoin reads bucket-aligned
  * partitions). The inventory's ad-hoc queries rightly rely on
  * broadcast/AQE instead; this spec proves the bucketed path works for
  * the pipeline tables where it matters.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ customer by custkey joins without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    // tables land in the default warehouse dir (gitignored spark-warehouse/)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    Tables.load(spark, dir, "orders")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.load(spark, dir, "customer")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable broadcast so the join would otherwise shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          spark.table("b_orders")("o_custkey") === spark.table("b_customer")("c_custkey"))
        .select("o_orderkey", "c_name")
      val n = joined.count()
      assert(n > 0)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(!finalPlan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$finalPlan")

      // sanity: same join over raw parquet DOES shuffle
      val raw = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          Tables.load(spark, dir, "orders")("o_custkey") ===
            Tables.load(spark, dir, "customer")("c_custkey"))
        .select("o_orderkey", "c_name")
      raw.count()
      val rawPlan = raw.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(rawPlan.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
