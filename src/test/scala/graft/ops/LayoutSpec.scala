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

  test("zorderValue interleaves bits (worked 2-D examples)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (4095L, 4095L))
      .toDF("x", "y")
      .select(Layout.zorderValue(Seq(col("x"), col("y")), 12).as("z"))
    val zs = df.collect().map(_.getLong(0))
    // x bits land at even positions, y bits at odd: z(3,5)=interleave(
    // x=011, y=101) = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 39
    assert(zs.toSeq === Seq(0L, 1L, 2L, 39L, (1L << 24) - 1))
  }

  test("z-order layout clusters BOTH dimensions (data-skipping spans)") {
    // uniform 2-D grid; after z-layout each partition should cover a
    // small sub-rectangle of BOTH x and y — a plain sort by x would
    // leave y spans at full width in every partition
    val n = 1 << 14
    val grid = spark.range(n).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    val parts = 16
    val laid = Layout.zorderLayout(grid, Seq("x", "y"), bitsPer = 7, parts)
    val spans = laid
      .select(col("x"), col("y"), spark_partition_id().as("pid"))
      .groupBy(col("pid"))
      .agg((max(col("x")) - min(col("x"))).as("xspan"),
        (max(col("y")) - min(col("y"))).as("yspan"))
      .collect()
    val avgX = spans.map(_.getAs[Long]("xspan")).sum.toDouble / spans.length
    val avgY = spans.map(_.getAs[Long]("yspan")).sum.toDouble / spans.length
    // full spans are 127; a 16-way z-layout of a 128×128 grid gives
    // 32×64-ish tiles — both dims well under half the full span
    assert(avgX < 64, s"avg x span $avgX — x not clustered")
    assert(avgY < 80, s"avg y span $avgY — y not clustered")
    assert(laid.count() === n)
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
