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

  test("CAST(timestamp AS TIME) extracts time-of-day with fraction (TimeCastRule)") {
    // Spark 4.1 has no native timestamp→time cast; graft's resolution
    // rule rewrites it to make_time(hour, minute, second+fraction),
    // matching Trino's cast semantics
    val r = spark.sql(
      """SELECT CAST(TIMESTAMP'2001-08-22 03:04:05.125' AS TIME) AS a,
        |  CAST(TIMESTAMP_NTZ'2001-08-22 23:59:59' AS TIME) AS b""".stripMargin).collect()(0)
    assert(r.get(0) == java.time.LocalTime.parse("03:04:05.125"))
    assert(r.get(1) == java.time.LocalTime.of(23, 59, 59))
    // over a column, not just a literal
    val col = spark.sql(
      "SELECT CAST(ts AS TIME) AS t FROM (SELECT TIMESTAMP'2020-01-02 10:20:30.5' AS ts)")
    assert(col.schema.fields(0).dataType.isInstanceOf[TimeType])
    assert(col.collect()(0).get(0) == java.time.LocalTime.parse("10:20:30.500"))
  }

  test("CAST(ts AS TIME) works through execute_query; time with time zone rejected") {
    val cfg = graft.config.EngineConfig.fromEnv(Map.empty).toOption.get
    val qs = new graft.service.QueryService(
      new graft.engine.Engine(cfg, Some("/root/testdata/sf0.001"), Some(spark)))
    val ok = qs.execute(
      "SELECT CAST(TIMESTAMP'2001-08-22 03:04:05.125' AS TIME) AS t")
    assert(ok.exists(_.rows.head.head.toString == "03:04:05.125"), ok)
    val rej = qs.execute("SELECT CAST(x AS TIME WITH TIME ZONE) FROM (SELECT 1 AS x)")
    assert(rej.isLeft && rej.left.exists(_.contains("time with time zone")), rej)
    val rejPrec = qs.execute("SELECT CAST(x AS TIME(3) WITH TIME ZONE) FROM (SELECT 1 AS x)")
    assert(rejPrec.isLeft && rejPrec.left.exists(_.contains("time with time zone")), rejPrec)
    // `timestamp with time zone` is NOT caught by the TIME reject —
    // the CAST type translator maps it to Spark's TIMESTAMP (the LTZ
    // instant type; sessions pinned UTC), so the cast WORKS
    assert(TrinoFunctions.preprocess(
      "SELECT CAST('2001-08-22' AS TIMESTAMP WITH TIME ZONE)")
      .toUpperCase.endsWith("AS TIMESTAMP)"))
    assert(qs.execute("SELECT CAST('2001-08-22' AS TIMESTAMP WITH TIME ZONE)")
      .exists(_.rows.head.head.toString.startsWith("2001-08-22")))
    // inside a string literal: untouched
    assert(TrinoFunctions.preprocess("SELECT 'time with time zone'")
      == "SELECT 'time with time zone'")
  }
}
