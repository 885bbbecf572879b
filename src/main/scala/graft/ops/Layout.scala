package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
