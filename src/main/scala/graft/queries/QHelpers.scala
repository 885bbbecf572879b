package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables

/** Shared helpers for the declared query inventory (SURVEY.md §2b).
  *
  * Determinism rules (SURVEY.md §7 / FIXTURES.md): every oracle-checked
  * query ends with a total ORDER BY; floating-point aggregates are made
  * order-independent by casting to DECIMAL *before* the aggregate (exact
  * decimal arithmetic in both Spark and DuckDB), then casting the result
  * back to DOUBLE so both engines emit bit-identical values. Plain
  * ROUND(SUM(double)) is NOT enough: at sf0.01 a 60k-row double sum can
  * differ between engines by ~1e-5, which flips the rounded digit near
  * .005 boundaries.
  */
object QHelpers {
  type Q = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Order-independent exact sum of a double column, emitted as double.
    * DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE). */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Order-independent average of a double column, emitted as double.
    * DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x). */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(c)

  /** DuckDB SQL fragment matching [[dsum]]. */
  def sqlDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"

  /** DuckDB SQL fragment matching [[davg]]. */
  def sqlDavg(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT($x)"
}
