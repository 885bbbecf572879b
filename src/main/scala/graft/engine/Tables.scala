package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table access (repo:TESTDATA.md). The reference resolves
  * tables remotely via Trino's catalog (reference internal/trino/client.go:707);
  * here the "catalog" is a directory of parquet files registered as views.
  *
  * 100 TB posture: `spark.read.parquet` on a directory of files gives
  * partitioned, vectorized, predicate-pushdown scans for free; nothing
  * here materializes on the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    // natively (PARQUET_TYPE_ILLEGAL). Read nanos as raw longs and convert
    // to µs timestamps (truncating, matching DuckDB's ns→µs cast).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (idempotent; overwrites). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Run SQL against the testdata views (registers views first). */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }
}
