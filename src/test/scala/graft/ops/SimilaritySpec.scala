package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Similarity-search behaviors: k-means determinism and convergence
  * direction, IVF recall against brute force, SRP candidate sanity. */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def emb = Tables.load(spark, dir, "embeddings")

  test("kmeans centroids are bit-identical across runs (decimal means)") {
    def run() = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = 40, iters = 2)
      .orderBy("cent_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
    val a = run()
    val b = run()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty && a.forall(_._2.length == 64))
  }

  test("kmeans does not increase mean distance to assigned centroid") {
    def meanCos(centroids: org.apache.spark.sql.DataFrame): Double = {
      val assigned = Similarity.assignCells(emb, centroids, "vec_id", "embedding")
      assigned.join(broadcast(centroids),
          assigned("cell_id") === centroids("cent_id"))
        .select((Similarity.dot(col("embedding"), col("cent_vec")) /
          sqrt(Similarity.dot(col("embedding"), col("embedding")) *
            Similarity.dot(col("cent_vec"), col("cent_vec")))).as("c"))
        .agg(avg("c")).collect().head.getDouble(0)
    }
    val seedInit = Similarity.seedCentroidsDf(emb, "vec_id", "embedding", 40)
    val before = meanCos(seedInit)
    val after = meanCos(Similarity.kmeansCentroids(emb, "vec_id", "embedding", 40, 2))
    assert(after >= before - 1e-9, s"kmeans regressed assignment: $before -> $after")
  }

  test("IVF top-k (kmeans cells) overlaps the brute-force top-k") {
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
        nCells = 40, nProbe = 3, kmeansIters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivf.size == 10)
    assert((brute & ivf).nonEmpty, s"no overlap: brute=$brute ivf=$ivf")
  }

  test("PQ: codebooks deterministic, codes in range, ADC top-k overlaps brute force") {
    val books = Similarity.pqTrainCodebooks(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2)
    val rows = books.collect()
    assert(rows.forall(_.getSeq[Float](2).length == 8)) // dsub = 64/8
    assert(rows.map(_.getInt(0)).toSet == (0 until 8).toSet)
    // deterministic retrain (hash seeds + decimal means)
    val again = Similarity.pqTrainCodebooks(emb, "vec_id", "embedding", 8, 16, 2)
      .orderBy("sub", "cent_id").collect().map(r => r.getSeq[Float](2).toVector)
    assert(again.toSeq ==
      books.orderBy("sub", "cent_id").collect().map(_.getSeq[Float](2).toVector).toSeq)
    // codes reference existing centroids in every subspace
    val validIds = rows.groupBy(_.getInt(0)).map { case (s, rs) =>
      s -> rs.map(_.getLong(1)).toSet }
    val codes = Similarity.pqEncode(emb, books, "vec_id", "embedding").collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Long](1)
      assert(cs.length == 8)
      cs.zipWithIndex.foreach { case (c, s) => assert(validIds(s)(c), s"sub $s code $c") }
    }
    // ADC approximation finds most of the true neighborhood
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", 0L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pq.size == 10)
    assert((brute & pq).size >= 3, s"pq recall too low: brute=$brute pq=$pq")
  }

  test("native SrpSigMd5D equals the higher-order-function composition") {
    // the native expression must be BIT-identical to the Catalyst
    // aggregate/zip_with quantized-BIGINT fold it replaces (which the
    // DuckDB oracles replay) — every signature, both bit widths
    Seq(16, 32).foreach { bits =>
      val both = emb.select(col("vec_id"),
          Similarity.srpSigMd5(col("embedding"), bits, 64).as("native"),
          Similarity.srpSigMd5Hof(col("embedding"), bits, 64).as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(both.count() == 0, s"bits=$bits: native and HOF signatures diverge")
    }
  }

  test("native DotQuantD equals the higher-order-function composition") {
    val a = emb.select(col("vec_id"), col("embedding"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val diverged = a.join(b, col("vec_id") % 37 === col("vb") % 37)
      .select(
        Similarity.dotQuant(col("embedding"), col("eb")).as("native"),
        Similarity.dotQuantHof(col("embedding"), col("eb")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diverged.count() == 0, "native and HOF quantized dots diverge")
  }

  test("batch kNN equals the single-anchor path for every anchor") {
    val batch = Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
        nAnchors = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(batch.length == 15)
    (0L until 3L).foreach { a =>
      val single = Similarity.cosineTopK(emb, "vec_id", "embedding", a, 5)
        .collect().map(r => (a, r.getLong(0), r.getDouble(1)))
      assert(batch.filter(_._1 == a).toSeq == single.toSeq,
        s"anchor $a: two-phase salted top-k diverged from single-anchor")
    }
  }

  test("IVF assignment is a shuffle-free projection (no Exchange)") {
    val assigned = Similarity.assignCells(emb,
      Similarity.seedCentroidsDf(emb, "vec_id", "embedding", 8),
      "vec_id", "embedding")
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("SRP candidates carry correct exact cosines") {
    val pairs = Similarity.srpCandidatePairs(emb, "vec_id", "embedding",
        bits = 32, bands = 4)
      .orderBy(desc("cos_sim")).limit(5).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }
}
