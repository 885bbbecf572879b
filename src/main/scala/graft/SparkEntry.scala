package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared t2 inventory (SURVEY.md §2b); every entry
  * with a DuckDB-expressible, hash-stable result also appears in
  * `oracleSql` with identical column names and a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Shape of the reference's documented example (reference
    * docs/tools.md:15): customers per region, GROUP BY + ORDER BY DESC,
    * adapted to the testdata star schema (customer⋈nation⋈region).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val c = Tables.load(spark, d, "customer")
    val n = Tables.load(spark, d, "nation")
    val r = Tables.load(spark, d, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("customer_count"))
      .orderBy(col("customer_count").desc, col("r_name").asc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ Windows.defs ++ Shapes.defs ++ Funcs.defs ++
      TimeOps.defs ++ PipelineOps.defs ++ MetaOps.defs ++ TpchSql.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Windows.oracles ++ Shapes.oracles ++
      Funcs.oracles ++ TimeOps.oracles ++ PipelineOps.oracles ++
      MetaOps.oracles ++ TpchSql.oracles
}
