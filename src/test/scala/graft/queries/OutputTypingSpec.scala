package graft.queries

import org.apache.spark.sql.types.{ArrayType, DateType, DecimalType}

import graft.SparkSpec
import graft.SparkEntry

/** Output-typing rule for oracle-checked queries (checker-layer only).
  *
  * The driver's correctness checker reads the Spark result via pyarrow
  * (DECIMAL → `Decimal` objects, DATE → `datetime.date`) and the DuckDB
  * oracle via `.df()` (DECIMAL → float64, DATE → `Timestamp`), then
  * compares at the pandas layer — so those types hash-mismatch even when
  * every value is identical, and ARRAY columns crash its lexsort
  * outright. Rule: a query with an oracle must not emit DECIMAL, DATE,
  * or ARRAY columns in its FINAL projection.
  *
  * Scope note: this is a constraint on the comparison layer, not on the
  * engine — decimal arithmetic stays decimal internally (see TpchSql
  * sum_charge: the order-independent DECIMAL(38,14) sum is computed
  * exactly and only the final value is cast to DOUBLE). When a query
  * needs exact-precision verification, pin the decimal via a VARCHAR
  * rendering (see fn_cast_types.dec_str) rather than weakening this rule.
  * Rows-only queries (no oracle) may emit any type.
  */
class OutputTypingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no oracle-checked query emits DECIMAL, DATE, or ARRAY output columns") {
    val bad = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, dir).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] => s"$name.${f.name}: DECIMAL"
        case f if f.dataType == DateType               => s"$name.${f.name}: DATE"
        case f if f.dataType.isInstanceOf[ArrayType]   => s"$name.${f.name}: ARRAY"
      }
    }
    assert(bad.isEmpty,
      s"checker-incomparable output columns (cast to DOUBLE/TIMESTAMP or scalarize):\n  ${bad.mkString("\n  ")}")
  }
}
