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

  /** Mean ADC recall@10 vs brute force over `nAnchors` anchors, with
    * codebooks trained at `iters` Lloyd iterations. All model-sized
    * state (2000 vectors, 8 codes each) evaluates driver-side with the
    * SAME LUT algebra as Similarity.adcTopK — one train + one encode
    * per call instead of 50 Spark jobs. */
  private def pqMeanRecall(iters: Int, nAnchors: Int = 50,
      m: Int = 8, ksub: Int = 256): Double = {
    // pqTrainCodebooks is eager (Lloyd collects per iteration; the
    // returned DF is local driver state), so train ONCE and reuse
    val booksDf = Similarity.pqTrainCodebooks(emb, "vec_id", "embedding",
      m = m, ksub = ksub, iters = iters)
    val books = booksDf
      .collect().groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map(_._2.map(r => (r.getLong(1), r.getSeq[Float](2).toArray)).sortBy(_._1))
    val codes = Similarity.pqEncode(emb, booksDf, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val dsub = books(0)(0)._2.length
    def dotRange(a: Array[Float], off: Int, c: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += a(off + i).toDouble * c(i).toDouble; i += 1 }
      acc
    }
    def l2(v: Array[Float]): Double =
      math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    val posOf = books.map(_.map(_._1).zipWithIndex.toMap)
    val recalls = (0L until nAnchors.toLong).map { a =>
      val av = vecs(a)
      val brute = vecs.iterator.filter(_._1 != a)
        .map { case (id, v) =>
          (dotRange(av, 0, v) / (l2(av) * l2(v)), id) }
        .toSeq.sortBy { case (c, id) => (-c, id) }.take(10).map(_._2).toSet
      val dotLut = books.zipWithIndex.map { case (b, s) =>
        b.map(c => dotRange(av, s * dsub, c._2)) }
      val n2Lut = books.map(_.map(c => { val n = l2(c._2); n * n }))
      val qnorm = l2(av)
      val adc = codes.iterator.filter(_._1 != a)
        .map { case (id, cs) =>
          var dot = 0.0; var n2 = 0.0; var s = 0
          while (s < cs.length) {
            val p = posOf(s)(cs(s)); dot += dotLut(s)(p); n2 += n2Lut(s)(p); s += 1
          }
          (dot / (qnorm * math.sqrt(n2)), id)
        }.toSeq.sortBy { case (c, id) => (-c, id) }.take(10).map(_._2).toSet
      (brute & adc).size / 10.0
    }
    recalls.sum / recalls.size
  }

  test("PQ mean recall@10 over 50 anchors clears the geometry pin") {
    // The single-anchor >= 3/10 overlap pin can't catch a codebook
    // geometry regression (the SRP fixed-bucket-width bug class). Mean
    // recall@10 over 50 anchors at the production config (m=8,
    // ksub=256 — classic 8-bit PQ codes — iters=2) is stable because
    // training is bit-deterministic; measured sweep on this corpus
    // (recorded in PERF.md): (8,16)→0.254, (8,64)→0.418, (8,256)→0.686,
    // (16,64)→0.622, (16,256)→0.832. Trained codebooks must both clear
    // an absolute bar AND beat the untrained (iters=0, hash-sample
    // seeds only) codebooks (0.654) — so zeroing out Lloyd, or any
    // assignment/mean bug that degrades quantization, fails here.
    val trained = pqMeanRecall(iters = 2)
    val untrained = pqMeanRecall(iters = 0)
    info(f"PQ mean recall@10, 50 anchors: iters=2 $trained%.3f, iters=0 $untrained%.3f")
    assert(trained >= 0.6, f"trained recall $trained%.3f below 0.6 pin")
    assert(trained > untrained + 0.02,
      f"Lloyd refinement not improving recall: $trained%.3f vs $untrained%.3f")
  }

  test("PQ persisted-index probe is bit-identical to the train-inline path") {
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_spec").toString
    Similarity.buildPqIndex(emb, "vec_id", "embedding", idx)
    val anchor = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val probeDf = Similarity.pqTopKIndexed(spark, idx, "vec_id", anchor,
      k = 10, excludeId = Some(0L))
    val probe = probeDf.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val inline = Similarity.pqTopK(emb, "vec_id", "embedding", 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(probe.toSeq == inline.toSeq,
      s"probe diverged from inline:\n${probe.toSeq}\n${inline.toSeq}")
    // plan pin: the probe is ONE scan of the persisted codes ending in
    // TakeOrderedAndProject — no training aggregates, no float corpus
    val plan = probeDf.queryExecution.executedPlan.toString
    assert(plan.contains(idx), s"probe does not scan the persisted index:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k tail:\n$plan")
    assert(!plan.toLowerCase.contains("posexplode"),
      s"training subvector explode leaked into the probe plan:\n$plan")
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

  test("native L2QuantD equals the zip_with/aggregate fold it replaced") {
    // the exact HOF the PQ twin used before the native kernel
    def qdistHof(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(
        zip_with(a, b, (x, c) =>
          floor((x.cast("double") - c.cast("double")) *
            (x.cast("double") - c.cast("double")) * lit(1e12) + lit(0.5))
            .cast("long")),
        lit(0L), (acc, v) => acc + v)
    val a = emb.select(col("vec_id"), col("embedding"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val diverged = a.join(b, col("vec_id") % 37 === col("vb") % 37)
      .select(
        graft.functions.NativeExprs.l2QuantD(col("embedding"), col("eb"))
          .as("native"),
        qdistHof(col("embedding"), col("eb")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diverged.count() == 0, "native and HOF quantized L2 diverge")
  }

  test("native quant assignment kernels equal their HOF compositions") {
    // NearestCellQuant vs the transform/array_max struct argmax
    val (nat, hof) = Similarity.cellAssignPair(emb, "vec_id", "embedding", 8)
    val n = nat.orderBy("graft_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val h = hof.orderBy("graft_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(n.nonEmpty && n.toSeq == h.toSeq)
    // PqCodesQuant vs the per-sub array_min struct argmin
    val seedVs = emb.orderBy("vec_id").limit(4).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toSeq)
    val books = (0 until 8).map(s => seedVs.zipWithIndex.map {
      case (v, i) => (i.toLong, v.slice(s * 8, (s + 1) * 8)) }.toSeq)
    val diff = emb.select(
        graft.functions.NativeExprs.pqCodesQuant(col("embedding"), books, 8)
          .as("n"),
        Similarity.pqCodesQuantHof(col("embedding"), books, 8).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(diff == 0)
  }

  test("md5 twins: assignment/probe is one scan — no exchange, no join (r15)") {
    // The optimization-round contract for the twin family: centroid
    // models collect to the driver and assignment is a pure projection
    // (cellExprQuant), so the query tail plans as scan → filter →
    // project → TakeOrderedAndProject with NO Exchange and NO join of
    // any kind (the former shape carried a corpus × nCells crossJoin,
    // a shuffled argmax and a corpus self-join).
    Seq(
      Similarity.ivfTopKMd5(emb, "vec_id", "embedding",
        anchorId = 0L, k = 5, nCells = 8, nProbe = 2),
      Similarity.pqTopKMd5(emb, "vec_id", "embedding",
        anchorId = 0L, k = 5, ksub = 8)
    ).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p.take(1500))
      assert(!p.contains("Join"), p.take(1500))
      assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    }
  }

  test("semDeDupMd5 marks planted near-duplicates, keeps the lowest id") {
    import spark.implicits._
    // base corpus + two planted copies of vector 3 (tiny perturbation —
    // cosine ≈ 1 with the original)
    val base = emb.limit(50)
    val v3 = base.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Float](0)
    val planted = Seq(
      (9001L, v3.map(x => x + 1e-4f)),
      (9002L, v3.map(x => x - 1e-4f)))
      .toDF("vec_id", "embedding")
    val docs = base.select(col("vec_id"), col("embedding")).union(planted)
    val r = Similarity.semDeDupMd5(docs, "vec_id", "embedding",
        nClusters = 8, simThreshold = 0.9)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r.size == 52)
    // copies land in vector 3's cluster and are marked; the original
    // (lowest id of the group) survives
    assert(!r(3L), "original must be kept")
    assert(r(9001L) && r(9002L), s"planted copies must be dups: $r")
    // determinism across re-evaluation
    val again = Similarity.semDeDupMd5(docs, "vec_id", "embedding",
        nClusters = 8, simThreshold = 0.9)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r == again)
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

  test("IVF merge: build(even)+merge(odd) probes bitwise like the single build") {
    // production path: the standing quantizer comes from the even half;
    // the single-build comparison assigns the WHOLE corpus against the
    // same centroids — additivity holds because assignment is a pure
    // per-row function of (vector, quantizer)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-merge").toString
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    val cents = Similarity.buildIvfIndex(even, "vec_id", "embedding",
      s"$tmp/idx", nCells = 16)
    Similarity.mergeIvfIndex(odd, "vec_id", "embedding", s"$tmp/idx")
    val merged = spark.read.parquet(s"$tmp/idx/cells")
      .select(col("vec_id"), col("cell_id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Similarity.assignCells(emb, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.nonEmpty && merged == whole)
    // the persisted md5-twin trio: merged probe equals the single-build
    // probe bit for bit (same quantizer, pure assignment)
    Similarity.buildIvfIndexMd5(even, "vec_id", "embedding",
      s"$tmp/twin_m", nCells = 16)
    Similarity.mergeIvfIndexMd5(odd, "vec_id", "embedding", s"$tmp/twin_m")
    val probeMerged = Similarity.ivfIndexProbeMd5(spark, s"$tmp/twin_m",
        "vec_id", 0L, 10, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // single-build equivalent: same even-half seed pool, whole corpus.
    // buildIvfIndexMd5 seeds from its input, so seed the comparison
    // index manually: centroids copied from the merged index, cells
    // re-derived from the whole corpus in one build.
    val centsTwin = spark.read.parquet(s"$tmp/twin_m/centroids")
    centsTwin.write.parquet(s"$tmp/twin_s/centroids")
    Similarity.mergeIvfIndexMd5(emb, "vec_id", "embedding", s"$tmp/twin_s")
    val probeSingle = Similarity.ivfIndexProbeMd5(spark, s"$tmp/twin_s",
        "vec_id", 0L, 10, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probeMerged.nonEmpty && probeMerged == probeSingle)
  }

  test("PQ merge: build(even)+merge(odd) probes bitwise like the single build") {
    // encoding is a pure per-row function of (vector, codebooks):
    // fold the odd half into an even-half index, then compare against
    // encoding the whole corpus with the same standing books
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-merge").toString
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    val books = Similarity.buildPqIndex(even, "vec_id", "embedding",
      s"$tmp/idx", m = 8, ksub = 16, iters = 1)
    Similarity.mergePqIndex(odd, "vec_id", "embedding", s"$tmp/idx")
    val anchorVec = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val merged = Similarity.pqTopKIndexed(spark, s"$tmp/idx", "vec_id",
        anchorVec, k = 10, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // single-build equivalent: whole corpus encoded with the SAME books
    Similarity.pqEncode(emb, books, "vec_id", "embedding")
      .write.parquet(s"$tmp/single/codes")
    spark.read.parquet(s"$tmp/idx/codebooks")
      .write.parquet(s"$tmp/single/codebooks")
    val single = Similarity.pqTopKIndexed(spark, s"$tmp/single", "vec_id",
        anchorVec, k = 10, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(merged.nonEmpty && merged == single)
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
