package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling/splitting: reproducibility, rate accuracy,
  * stratum handling, and split disjointness/coverage. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def keys = spark.range(20000).select(col("id"))

  test("bernoulli is reproducible and hits the rate within 2%") {
    val a = Sampling.bernoulli(keys.toDF(), "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulli(keys.toDF(), "id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size / 20000.0 - 0.3) < 0.02)
  }

  test("different salts draw independent samples") {
    val a = Sampling.bernoulli(keys.toDF(), "id", 0.3, salt = "s1")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulli(keys.toDF(), "id", 0.3, salt = "s2")
      .collect().map(_.getLong(0)).toSet
    val overlap = (a & b).size.toDouble / a.size
    assert(math.abs(overlap - 0.3) < 0.05) // independent ⇒ overlap ≈ rate
  }

  test("stratified applies per-stratum rates and drops unknown strata") {
    val df = spark.range(30000)
      .select(col("id"),
        when(col("id") % 3 === 0, "en").when(col("id") % 3 === 1, "de")
          .otherwise("xx").as("lang"))
    val out = Sampling.stratified(df, "id", "lang", Map("en" -> 1.0, "de" -> 0.2))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") == 10000L)
    assert(math.abs(out("de") / 10000.0 - 0.2) < 0.03)
    assert(!out.contains("xx"))
  }

  test("split is disjoint, covering, and close to the requested fractions") {
    val out = Sampling.split(keys.toDF(), "id", valFrac = 0.1, testFrac = 0.2)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.02)
    assert(math.abs(counts("test") / 20000.0 - 0.2) < 0.02)
    assert(counts("train") == 20000L - counts("val") - counts("test"))
  }

  test("weighted sampling keeps ≈ the mean weight and is reproducible") {
    val df = spark.range(20000).select(col("id"),
      (col("id") % 100).cast("double") / 100.0 as "w") // mean weight 0.495
    val a = Sampling.weighted(df.toDF(), "id", col("w")).collect().map(_.getLong(0)).toSet
    val b = Sampling.weighted(df.toDF(), "id", col("w")).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size / 20000.0 - 0.495) < 0.02)
    // weight 0 rows can never survive; weight→1 rows almost always do
    assert(!a.exists(_ % 100 == 0))
  }

  test("temperature mixture upweights small sources, hits the target total") {
    // 10k docs from 'big', 400 from 'small' — α=0.5 should keep a far
    // larger FRACTION of 'small' than of 'big'
    val docs = spark.range(10400).select(col("id"),
      when(col("id") < 10000, "big").otherwise("small").as("src"))
    val kept = Sampling.temperatureMixture(docs.toDF(), "id", "src", targetFrac = 0.25)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracBig = kept.getOrElse("big", 0L) / 10000.0
    val fracSmall = kept.getOrElse("small", 0L) / 400.0
    assert(fracSmall > 2 * fracBig, s"small=$fracSmall big=$fracBig")
    // expected totals: rate_s = 0.25 * 10400 * sqrt(N_s) / (sqrt(1e4)+sqrt(400)) / N_s
    val z = math.sqrt(10000.0) + math.sqrt(400.0)
    val expBig = 0.25 * 10400 * math.sqrt(10000.0) / z
    val expSmall = math.min(400.0, 0.25 * 10400 * math.sqrt(400.0) / z)
    assert(math.abs(kept("big") - expBig) / expBig < 0.05)
    assert(math.abs(kept("small") - expSmall) / expSmall < 0.1)
    // deterministic replay
    val again = Sampling.temperatureMixture(docs.toDF(), "id", "src", targetFrac = 0.25)
      .agg(count(lit(1))).collect()(0).getLong(0)
    assert(again == kept.values.sum)
  }

  test("CharBigrams native expression matches substring semantics incl. UTF-8") {
    val df = Seq((1L, "abcd"), (2L, "añb"), (3L, "x"), (4L, ""))
      .toDF("id", "s")
      .select(col("id"),
        graft.functions.NativeExprs.charBigrams(col("s")).as("bg"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("ab", "bc", "cd"))
    assert(m(2L) == Seq("añ", "ñb")) // 2-byte code point sliced whole
    assert(m(3L) == Seq.empty && m(4L) == Seq.empty)
  }

  test("charLmScore ranks fluent text above character mash") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then the dog sleeps"),
      (2L, "the cat and the dog and the fox ran over the hill to the barn door"),
      (3L, "zq xj qz jx zx qj xq jz zq xj qz jx zx qj xq jz zq xj qz jx zx qj"))
      .toDF("doc_id", "text")
    val scores = TextAnalysis.charLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1) > scores(3) && scores(2) > scores(3),
      s"fluent docs must outscore mash: $scores")
  }

  test("salted topNPerGroup equals the plain one-window ranking on a skewed group") {
    // group "hot" holds 95% of rows — the web-domain skew case the
    // salted two-phase layout exists for
    val df = spark.range(10000).select(
      when(col("id") < 9500, "hot").otherwise(concat(lit("g"), col("id") % 7)).as("grp"),
      col("id").as("doc"), (col("id") * 37 % 1000).as("score"))
    val salted = Sampling.topNPerGroup(df, Seq("grp"),
        Seq(col("score").desc, col("doc").asc), n = 10, saltKeyCol = "doc")
      .select("grp", "doc", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("score").desc, col("doc").asc)
    val plain = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10).select("grp", "doc", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(salted === plain)
    assert(salted.size === 8 * 10) // hot + 7 cold groups, 10 each
  }

  test("contamination is 1.0 for eval members' duplicates and low for unrelated text") {
    val docs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // dup of eval 1
      (101L, "completely different words about query engines and columnar scans"))
      .toDF("doc_id", "text")
    val eval = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.contamination(docs, eval)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(100L) == 1.0)
    assert(out(101L) == 0.0)
  }
}
