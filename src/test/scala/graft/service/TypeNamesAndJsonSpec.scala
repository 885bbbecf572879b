package graft.service

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Edge coverage for the pure mappers: the Spark→Trino type-name
  * lattice (SURVEY.md §1 full type surface) and the JSON writer's
  * value handling. */
class TypeNamesAndJsonSpec extends AnyFunSuite {

  test("type lattice maps to Trino names") {
    assert(TypeNames.trino(BooleanType) == "boolean")
    assert(TypeNames.trino(ByteType) == "tinyint")
    assert(TypeNames.trino(ShortType) == "smallint")
    assert(TypeNames.trino(IntegerType) == "integer")
    assert(TypeNames.trino(LongType) == "bigint")
    assert(TypeNames.trino(FloatType) == "real")
    assert(TypeNames.trino(DoubleType) == "double")
    assert(TypeNames.trino(DecimalType(18, 4)) == "decimal(18,4)")
    assert(TypeNames.trino(StringType) == "varchar")
    assert(TypeNames.trino(BinaryType) == "varbinary")
    assert(TypeNames.trino(DateType) == "date")
    assert(TypeNames.trino(TimestampType) == "timestamp(6)")
    assert(TypeNames.trino(ArrayType(FloatType)) == "array(real)")
    assert(TypeNames.trino(MapType(StringType, LongType)) == "map(varchar, bigint)")
    assert(TypeNames.trino(StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))) ==
      "row(a integer, b varchar)")
    assert(TypeNames.trino(ArrayType(StructType(Seq(StructField("x", DoubleType))))) ==
      "array(row(x double))")
    assert(TypeNames.trino(YearMonthIntervalType()) == "interval year to month")
    assert(TypeNames.trino(DayTimeIntervalType()) == "interval day to second")
  }

  test("json writer: special values") {
    assert(Json.write(Double.NaN) == "\"NaN\"")
    assert(Json.write(Map("t" -> java.sql.Timestamp.valueOf("1995-01-01 12:00:00")))
      == "{\"t\":\"1995-01-01 12:00:00.0\"}")
    assert(Json.write(Array[Byte](0x0a, 0x7f.toByte)) == "\"0a7f\"")
    assert(Json.write(BigDecimal("12.3400")) == "12.3400")
    assert(Json.write(Seq(1, None, Some("x"))) == "[1,null,\"x\"]")
    assert(Json.write("tab\tnl\nq\"") == "\"tab\\tnl\\nq\\\"\"")
  }

  test("json writer: rows serialize in schema order") {
    val schema = StructType(Seq(
      StructField("zed", IntegerType), StructField("alpha", StringType)))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](1, "a"), schema)
    assert(Json.write(row) == "{\"zed\":1,\"alpha\":\"a\"}")
  }

  test("json parser: numbers, nesting, escapes, errors") {
    assert(Json.parse("[1, 2.5, -3, 1e2]") == Vector(1L, 2.5, -3L, 100.0))
    assert(Json.parse("{\"a\":{\"b\":[true,false,null]}}")
      .asInstanceOf[collection.Map[String, Any]]("a")
      .asInstanceOf[collection.Map[String, Any]]("b") == Vector(true, false, null))
    assert(Json.parse("\"\\u0041\\n\"") == "A\n")
    intercept[Exception](Json.parse("{\"a\":}"))
    intercept[Exception](Json.parse("[1,2"))
  }
}
