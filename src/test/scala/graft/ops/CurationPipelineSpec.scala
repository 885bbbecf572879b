package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** The ops composed as a real training-data curation pipeline: exact
  * dedup → near-dup candidate removal → quality gate → language tag →
  * token budget. One declarative DataFrame chain — Catalyst sees the
  * whole plan, so filters/projections fuse and nothing materializes
  * between stages (the property that makes the same chain viable at
  * 100 TB).
  */
class CurationPipelineSpec extends SparkSpec {

  test("dedup → quality → langid → token budget composes in one plan") {
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.load(spark, dir, "documents")
    val total = docs.count()

    // 1. exact dedup (min doc_id per normalized text)
    val deduped = Dedup.exact(docs)

    // 2. drop the higher id of every MinHash near-dup pair
    val dupIds = Dedup.minHashPairs(docs, "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    val nearDeduped = deduped.join(dupIds, Seq("doc_id"), "left_anti")

    // 3. quality gate + language tag + token budget
    val quality = TextAnalysis.quality(nearDeduped, "doc_id", "text")
      .filter(col("n_words") >= 10 && col("stopword_ratio") <= 0.9)
    val (lang, _) = TextAnalysis.langId(col("text"))
    val curated = nearDeduped
      .join(quality.select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), lang.as("lang_pred"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_tokens"))

    val rows = curated.collect()
    assert(rows.nonEmpty && rows.length < total)
    // near-dup pairs leave only one survivor: re-running pair detection
    // on the curated ids finds nothing at the same threshold
    val survivors = curated.select(col("doc_id"))
    val residualPairs = Dedup.minHashPairs(
      docs.join(survivors, Seq("doc_id")), "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.5).count()
    assert(residualPairs == 0, s"curated set still has $residualPairs near-dup pairs")
    // token budget column is populated and positive
    assert(rows.forall(_.getInt(2) > 0))
  }
}
