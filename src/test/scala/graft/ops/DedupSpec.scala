package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property checks for the dedup operators (SURVEY.md §2b rows 56/59):
  * exact duplicates must always pair under MinHash LSH (identical
  * shingle sets ⇒ identical signatures ⇒ same bucket in every band),
  * SimHash of identical text has hamming 0, and exact dedup keeps the
  * minimum id per key.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
    (3L, "The Quick Brown Fox jumps over the lazy dog today"), // case-dup of 1
    (4L, "completely different content about distributed query engines and shuffles"),
    (5L, "another unrelated document mentioning embeddings vectors and cosine metrics")
  ).toDF("doc_id", "text")

  test("exact dedup keeps the minimum doc_id per normalized text") {
    val kept = Dedup.exact(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L)) // 2 and 3 normalize to doc 1's key
  }

  test("exact duplicates always pair under MinHash LSH") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L))) // lowercase-normalized shingles
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a >= 4L || b >= 4L })
  }

  test("MinHash LSH recalls every exact-Jaccard pair of the real corpus") {
    // ground truth: the blocked-quadratic exact operator, unblocked
    // (single block) so no pair escapes the comparison
    val corpus = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("one", org.apache.spark.sql.functions.lit(1))
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        blockCols = Seq("one"), n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashPairs(corpus, "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
    val missed = exact -- lsh
    assert(missed.isEmpty,
      s"LSH missed ${missed.size}/${exact.size} true pairs: ${missed.take(5)}")
  }

  test("MinHash pair jaccard is 1.0 for exact duplicates") {
    val j = Dedup.minHashPairs(docs, "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.5)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("jaccard").as[Double].collect()
    assert(j.length == 1 && j.head == 1.0)
  }

  test("SimHash of identical (normalized) text is identical; pairs have hamming 0") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs((1L, 3L)) == 0)
  }

  test("blocked n-gram jaccard finds the dup pair inside its block") {
    val blocked = docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val pairs = Dedup.ngramJaccardPairs(blocked, "doc_id", "text",
        blockCols = Seq("lang", "source"), n = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) == 1.0)
    assert(!m.contains((4L, 5L)))
  }

  test("LSH bucket cap drops degenerate buckets but keeps small ones") {
    // 30 identical docs → every band-bucket holds all 30; cap of 10 drops
    // them all (no pairs); the cap must not fire for the 5-doc corpus.
    val boiler = (1L to 30L).map(i => (i, "same boilerplate text repeated forever and ever amen"))
      .toDF("doc_id", "text")
    val capped = Dedup.minHashPairs(boiler, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.5, maxBucket = 10)
    assert(capped.count() == 0)
    val uncapped = Dedup.minHashPairs(boiler, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.5, maxBucket = 1000)
    assert(uncapped.count() == 30L * 29L / 2L)
  }

  test("connected components resolve transitive chains and leave singletons") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // chain 1-2-3 (1~2, 2~3 but NOT 1~3 directly), pair 4-5, singleton 6
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(nodes, edges)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("connected components: pointer doubling converges a long chain in O(log d) rounds") {
    import spark.implicits._
    // a 64-node chain has diameter 63 — plain one-hop min propagation
    // needs 63 rounds (over the default maxIters); with the shortcut
    // the label reaches everyone in ~log2(63) + slack
    val n = 64
    val nodes = (1L to n.toLong).toDF("id")
    val edges = (1L until n.toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.ccWithRounds(nodes, edges)
    val comps = labels.select("comp").distinct().collect().map(_.getLong(0)).toSeq
    assert(comps == Seq(1L), comps)
    assert(rounds <= 10, s"expected O(log d) convergence, took $rounds rounds")
  }

  test("containment flags a short doc embedded in a long one; jaccard does not") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 40).map(i => s"filler$i word$i more$i").mkString(" ")
    val docs = Seq((1L, small, "en", "s"), (2L, big, "en", "s"),
      (3L, "unrelated totally different text entirely", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val cont = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cont.toSeq == Seq((1L, 2L))) // directed: 1 inside 2, never 2 inside 1
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), n = 3, threshold = 0.3).count()
    assert(jac == 0, "symmetric jaccard should miss the embedded doc")
  }

  test("persisted minhash index: probe finds cross dups only, never batch-internal pairs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (2L, "completely different standing corpus document about engines and scans"),
      (3L, "a third unrelated document mentioning streams windows and watermarks"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again tonight"), // dup of 1
      (101L, "fresh novel content that matches nothing in the standing corpus at all"),
      (102L, "fresh novel content that matches nothing in the standing corpus at all")) // dup of 101 — batch-internal
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-idx").toString
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", dir)
    val hits = Dedup.probeMinhashIndex(batch, "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.toSeq == Seq((100L, 1L, 1.0)))
  }

  test("minhash index layout is persisted; merge/probe read it, never guess") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (2L, "completely different standing corpus document about engines and scans"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again tonight"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-layout").toString
    // non-default geometry at build; probe/merge take NO geometry args —
    // they read k/numHashes/bands from the index's _graft_layout
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", dir,
      k = 2, numHashes = 32, bands = 8)
    val hits = Dedup.probeMinhashIndex(batch, "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq == Seq((100L, 1L)))
    Dedup.mergeMinhashIndex(batch, "doc_id", "text", dir) // reads layout: no throw
    // a missing layout file means corrupt/half-written/pre-layout index:
    // merge and probe refuse loudly instead of silently mixing geometries
    assert(new java.io.File(s"$dir/_graft_layout").delete())
    assert(intercept[java.io.IOException](
      Dedup.probeMinhashIndex(batch, "doc_id", "text", dir))
      .getMessage.contains("_graft_layout"))
    assert(intercept[java.io.IOException](
      Dedup.mergeMinhashIndex(batch, "doc_id", "text", dir))
      .getMessage.contains("_graft_layout"))
    // md5 twin: same contract
    val md5Dir = java.nio.file.Files.createTempDirectory("graft-mh-md5-layout").toString
    Dedup.buildMinhashIndexMd5(corpus, "doc_id", "text", md5Dir, numHashes = 8)
    Dedup.probeMinhashIndexMd5(batch, "doc_id", "text", md5Dir).collect()
    assert(new java.io.File(s"$md5Dir/_graft_layout").delete())
    assert(intercept[java.io.IOException](
      Dedup.probeMinhashIndexMd5(batch, "doc_id", "text", md5Dir))
      .getMessage.contains("_graft_layout"))
  }

  test("minhash index: build(A) + merge(B) probes identically to build(A ∪ B)") {
    val docs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 400)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val probe = docs.filter(col("doc_id") >= 300) // overlaps both halves' dups
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val inc = java.nio.file.Files.createTempDirectory("graft-mh-inc").toString
    val full = java.nio.file.Files.createTempDirectory("graft-mh-full").toString
    Dedup.buildMinhashIndex(a.filter(col("doc_id") < 300), "doc_id", "text", inc)
    Dedup.mergeMinhashIndex(b.filter(col("doc_id") < 300), "doc_id", "text", inc)
    Dedup.buildMinhashIndex(docs.filter(col("doc_id") < 300), "doc_id", "text", full)
    def hits(dir: String) = Dedup.probeMinhashIndex(probe, "doc_id", "text", dir)
      .orderBy("new_id", "index_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val hi = hits(inc)
    assert(hi.nonEmpty && hi == hits(full)) // bitwise: the index is row-identical
  }

  test("md5-twin minhash index: merged probe equals the all-pairs edge rule") {
    val docs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 300)
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-md5").toString
    Dedup.buildMinhashIndexMd5(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", dir)
    Dedup.mergeMinhashIndexMd5(docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", dir)
    val probed = Dedup.probeMinhashIndexMd5(docs.filter(col("doc_id") % 3 === 2),
        "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: the minHashMd5Edges rule (uncapped) over the full set,
    // restricted to (probe × indexed) pairs
    val sigs = Dedup.minHashMd5(docs, "doc_id", "text", 16)
    val aSig = sigs.select(col("doc_id").as("new_id"), col("seed"), col("minhash"))
      .filter(col("new_id") % 3 === 2)
    val bSig = sigs.select(col("doc_id").as("index_id"), col("seed"), col("minhash"))
      .filter(col("index_id") % 3 =!= 2)
    val expected = aSig.join(bSig, Seq("seed", "minhash"))
      .groupBy("new_id", "index_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probed.nonEmpty && probed == expected)
  }

  test("connected components: reliable-checkpoint mode gives identical labels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(nodes, edges, checkpointDir = Some(dir))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }
}
