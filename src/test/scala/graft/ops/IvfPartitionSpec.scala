package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** The IVF scale path spelled out: persist the cell assignment
  * partitioned BY cell_id, and a probe of nProbe cells prunes to those
  * partitions at scan time (PartitionFilters in the plan; the other
  * cells' files are never opened). This is what Similarity.ivfTopK's
  * doc comment promises for the 100 TB layout.
  */
class IvfPartitionSpec extends SparkSpec {

  test("probing persisted IVF cells prunes partitions at the parquet scan") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-ivf").toFile
    out.deleteOnExit()

    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    val cos = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      Similarity.dot(a, b) / sqrt(Similarity.dot(a, a) * Similarity.dot(b, b))

    // cell assignment, persisted partitioned by cell
    emb.join(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        cos(col("embedding"), col("cent_vec")).as("c"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("c"), (-col("cent_id")).as("n"))).as("cell_id"))
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .write.partitionBy("cell_id").mode("overwrite")
      .parquet(out.getAbsolutePath)

    val assigned = spark.read.parquet(out.getAbsolutePath)
    val probed = assigned.filter(col("cell_id").isin(0L, 50L))
    assert(probed.count() > 0)

    val plan = probed.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).getOrElse(plan)
    assert(scanLine.contains("PartitionFilters") && scanLine.contains("cell_id"),
      s"partition pruning missing:\n$scanLine")
    // the partition filter is not a post-scan data filter
    assert(!scanLine.contains("PushedFilters: [In(cell_id"), scanLine)
  }

  test("buildIvfIndex + ivfTopKIndexed: probe prunes and matches the ad-hoc path") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-ivfidx").toFile
    out.deleteOnExit()
    val emb = Tables.load(spark, dir, "embeddings")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      out.getAbsolutePath, nCells = 8)
    val anchor = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)

    val probe = Similarity.ivfTopKIndexed(spark, out.getAbsolutePath,
      "vec_id", "embedding", anchor, k = 11, nProbe = 3)
    val plan = probe.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).getOrElse(plan)
    assert(scanLine.contains("PartitionFilters") && scanLine.contains("cell_id"),
      s"indexed probe does not prune:\n$scanLine")

    val adhoc = Similarity.ivfTopK(emb, "vec_id", "embedding",
        anchorId = 0L, k = 10, nCells = 8, nProbe = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // indexed probe includes the anchor itself (no id filter) — drop it
    val indexed = probe.select("vec_id").collect().map(_.getLong(0))
      .filterNot(_ == 0L).take(10).toSet
    assert(indexed == adhoc, s"indexed=$indexed adhoc=$adhoc")
  }

  test("merged md5-twin index probe prunes cell partitions too") {
    // the embed_ivf_merge serving claim: after build(even)+merge(odd),
    // ivfIndexProbeMd5's cell filter must reach the scan as a
    // PartitionFilter — unprobed cells' files are never opened
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val idx = Files.createTempDirectory("graft-ivf-merge-prune").toString
    Similarity.buildIvfIndexMd5(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", idx, nCells = 16)
    Similarity.mergeIvfIndexMd5(emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", idx)
    val probe = Similarity.ivfIndexProbeMd5(spark, idx, "vec_id",
      anchorId = 0L, k = 10, nProbe = 2)
    assert(probe.count() > 0)
    val plan = probe.queryExecution.executedPlan.toString
    // the cells scan (not the anchor lookup) must carry the partition
    // filter: find a FileScan line with a non-empty cell_id filter
    val pruned = plan.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("PartitionFilters") &&
        l.contains("cell_id") && !l.contains("PartitionFilters: []"))
    assert(pruned, s"merged-index probe lost partition pruning:\n$plan")
  }
}
