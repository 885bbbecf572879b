package graft.dialect

import org.apache.spark.sql.types.TimeType

import graft.SparkSpec

/** Trino `time` type support (reference passes TIME through unchanged,
  * internal/trino/client.go:284-290). Spark 4.1's native TimeType is
  * enabled in every graft session via spark.sql.timeType.enabled;
  * these pins cover the lattice: literal, cast, construction, field
  * extraction, comparison, parquet round-trip, Trino type naming, and
  * JSON rendering. */
class TimeTypeSpec extends SparkSpec {

  test("TIME literal, cast, make_time, extract, comparison") {
    val r = spark.sql(
      """SELECT TIME'23:59:59' AS lit,
        |  CAST('12:34:56.123' AS TIME) AS c,
        |  make_time(1, 2, 3.5) AS mk,
        |  hour(TIME'12:34:56') AS h,
        |  minute(TIME'12:34:56') AS m,
        |  second(TIME'12:34:56') AS s,
        |  TIME'12:34:56' < TIME'13:00:00' AS lt""".stripMargin).collect()(0)
    assert(r.get(0) == java.time.LocalTime.of(23, 59, 59))
    assert(r.get(1) == java.time.LocalTime.parse("12:34:56.123"))
    assert(r.get(2) == java.time.LocalTime.parse("01:02:03.500"))
    assert(r.getInt(3) == 12 && r.getInt(4) == 34 && r.getInt(5) == 56)
    assert(r.getBoolean(6))
  }

  test("TIME round-trips through parquet as TIME(MICROS)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_time").toString
    spark.sql("SELECT make_time(12, 34, 56.789) AS t").write
      .mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema.fields(0).dataType == TimeType(6))
    assert(back.collect()(0).get(0) == java.time.LocalTime.parse("12:34:56.789"))
  }

  test("Trino type name and JSON rendering") {
    assert(graft.service.TypeNames.trino(TimeType(6)) == "time(6)")
    assert(graft.service.Json.write(java.time.LocalTime.of(1, 2, 3)) == "\"01:02:03\"")
  }
}
