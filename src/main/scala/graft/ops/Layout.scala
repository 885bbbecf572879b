package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout control for the 100 TB posture: bucketing.
  *
  * A fact table joined or aggregated on the same hot key query after
  * query (customer id, document id) pays a full shuffle every time when
  * stored as plain files. Writing it BUCKETED by that key stores the
  * hash-partitioning in the table layout itself: every later equi-join
  * against a table bucketed the same way, and every aggregation on the
  * bucket key, reuses the on-disk partitioning — zero Exchange in the
  * plan (LayoutSpec pins both). At 100 TB this turns the dominant
  * repeated cost of a star-schema workload into a one-time write cost.
  *
  * The reference delegates physical layout to Trino connectors; this is
  * the Spark-native equivalent of a bucketed Hive/Iceberg table.
  */
object Layout {

  /** Write `df` as a bucketed, per-bucket-sorted table at `path`.
    * Sorting within buckets lets sort-merge joins skip their sort when
    * both sides are written this way. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket keys. With equal
    * bucket counts the join consumes the tables' own partitioning —
    * no shuffle of either side. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Z-order (Morton) value: interleave the low `bitsPer` bits of each
    * column, first column at the lowest bit. Inputs must already be
    * non-negative and < 2^bitsPer (callers bucket/clamp first — rank,
    * epoch-bucket, or modulo); 64 / cols.size bits max each.
    *
    * Pure bit arithmetic composed from codegen'd builtins, shared with
    * [[zorderSql]] so a SQL engine reproduces the exact value — which is
    * what lets the driver oracle-check the curve itself. */
  def zorderValue(cols: Seq[Column], bitsPer: Int): Column = {
    require(cols.nonEmpty && bitsPer * cols.size <= 63,
      s"${cols.size} cols × $bitsPer bits exceeds a signed 64-bit z-value")
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      bit <- 0 until bitsPer
    } yield shiftleft(shiftright(c.cast("long"), bit).bitwiseAND(lit(1L)),
      bit * cols.size + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same z-value as ANSI SQL text over the given column
    * expressions (DuckDB dialect: `>>`/`<<`/`&`/`|` on BIGINT). */
  def zorderSql(cols: Seq[String], bitsPer: Int): String = {
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      bit <- 0 until bitsPer
    } yield s"(((CAST($c AS BIGINT) >> $bit) & 1) << ${bit * cols.size + ci})"
    terms.mkString(" | ")
  }

  /** Cluster `df` for multi-dimensional data skipping: range-partition
    * and sort by the z-value of `dims`. After this layout, parquet
    * row-group min/max stats are narrow on EVERY dim column — a filter
    * on any single dimension prunes most files, where a plain sort by
    * one column only skips on that column. This is Delta/Iceberg
    * `ZORDER BY` re-expressed as plain Spark: one range shuffle, then
    * an in-partition sort, both scale-linear. */
  def zorderLayout(df: DataFrame, dims: Seq[String], bitsPer: Int,
      partitions: Int): DataFrame = {
    val z = zorderValue(dims.map(col), bitsPer).as("graft_z")
    df.withColumn("graft_z", z)
      .repartitionByRange(partitions, col("graft_z"))
      .sortWithinPartitions(col("graft_z"))
      .drop("graft_z")
  }
}
