package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted-join semantics: identical results to the plain join, with the
  * hot key sharded across salt partitions. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // 10k facts, 90% on one hot key
    val fact = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"))
    val dim = Seq((1L, "hot"), (20L, "cold20"), (30L, "cold30"))
      .toDF("k", "label")

    val plain = fact.join(dim, Seq("k"), "inner")
      .select("id", "k", "label").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", saltSource = col("id"), salts = 8)
      .select("id", "k", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 9000 + 2) // hot key rows + ids 20 and 30
  }

  test("salt values actually spread the hot key") {
    val fact = spark.range(1000).select(col("id"), lit(1L).as("k"))
    val saltCounts = fact
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(8L)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length == 8)
    assert(saltCounts.max < 1000 / 8 * 2) // no shard hogs the key
  }
}
