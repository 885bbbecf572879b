package graft.ops

import graft.SparkSpec

/** Unigram-entropy quality signal: hand-replayable values on a tiny
  * corpus, and the −Σ p·ln p identity on the real one. */
class TextEntropySpec extends SparkSpec {
  import spark.implicits._

  test("entropy is 0 for one-token boilerplate and ln k for uniform docs") {
    val docs = Seq(
      (1L, "a a a a"),        // single repeated token -> H = 0
      (2L, "a b c d"),        // uniform over 4 -> H = ln 4
      (3L, "a a b b"),        // uniform over 2 -> H = ln 2
      (4L, "a a a b")).toDF("doc_id", "text") // skewed -> between
    val out = TextAnalysis.unigramEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 4L && math.abs(out(1L)._2) < 1e-9)
    assert(math.abs(out(2L)._2 - math.log(4)) < 1e-8)
    assert(math.abs(out(3L)._2 - math.log(2)) < 1e-8)
    // skewed: H = ln4 - (3 ln3)/4, strictly between 0 and ln 2 bounds
    val expected4 = math.log(4) - 3.0 * math.log(3) / 4.0
    assert(math.abs(out(4L)._2 - expected4) < 1e-8)
    assert(out(4L)._2 > out(1L)._2 && out(4L)._2 < out(2L)._2)
  }

  test("native kernel equals the composed explode/count/sum plan bitwise") {
    val docs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val kernel = TextAnalysis.unigramEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val composed = TextAnalysis.unigramEntropyComposed(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(kernel.nonEmpty && kernel == composed) // bitwise: == on doubles
  }

  test("kernel path is a shuffle-free projection; tokenless docs drop") {
    val docs = Seq((1L, "a b a"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramEntropy(docs, "doc_id", "text")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L)) // 2, 3 drop
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan) // zero shuffles
  }

  test("matches -sum(p ln p) recomputed per doc on the real corpus") {
    val docs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = TextAnalysis.unigramEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && out.size == texts.length)
    texts.foreach { case (id, text) =>
      val counts = text.toLowerCase.split(" ").filter(_.nonEmpty)
        .groupBy(identity).values.map(_.length.toDouble).toSeq
      val t = counts.sum
      val h = counts.map(c => -(c / t) * math.log(c / t)).sum
      assert(math.abs(out(id) - h) < 1e-7, s"doc $id: ${out(id)} vs $h")
    }
  }
}
