package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** The bucketing story proved on real plans: co-bucketed tables join
  * with ZERO Exchange, and aggregation on the bucket key reuses the
  * on-disk partitioning — the layout that makes repeated hot-key work
  * shuffle-free at 100 TB. */
class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withColocationConf[T](body: => T): T = {
    // force the join to actually be a (potentially shuffled) SMJ: tiny
    // test tables would otherwise broadcast, hiding the property
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  private lazy val tables: Unit = {
    val base = Files.createTempDirectory("graft-bucketed").toFile
    base.deleteOnExit()
    Layout.writeBucketed(Tables.load(spark, dir, "customer"),
      "b_customer", "c_custkey", 8, s"${base.getAbsolutePath}/b_customer")
    Layout.writeBucketed(Tables.load(spark, dir, "orders"),
      "b_orders", "o_custkey", 8, s"${base.getAbsolutePath}/b_orders")
  }

  test("co-bucketed equi-join runs with zero Exchange") {
    tables
    withColocationConf {
      val joined = Layout.coLocatedJoin(spark, "b_customer", "b_orders",
        "c_custkey", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange"), s"co-bucketed join still shuffles:\n$plan")
      // and it is actually correct
      assert(joined.count() ==
        Tables.load(spark, dir, "orders").count())
    }
  }

  test("aggregation on the bucket key reuses the table partitioning") {
    tables
    withColocationConf {
      val agg = spark.table("b_orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucket-key aggregation shuffles:\n$plan")
      assert(agg.count() > 0)
    }
  }

  test("a non-bucketed copy of the same join DOES shuffle (the baseline)") {
    withColocationConf {
      val c = Tables.load(spark, dir, "customer")
      val o = Tables.load(spark, dir, "orders")
      val plan = c.join(o, c("c_custkey") === o("o_custkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), s"expected a shuffle baseline:\n$plan")
    }
  }
}
