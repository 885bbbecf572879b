package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Design for 100 TB:
  *  - exact dedup = one hash-shuffle on the normalized key (window over
  *    the key partition; no driver materialization).
  *  - MinHash/SimHash signatures are per-row higher-order-function
  *    projections (no shuffle, codegen-friendly); candidate generation is
  *    shuffle-by-band (explode bands → hash-partition on (band, hash)),
  *    so each LSH bucket meets on one reducer — the standard scalable
  *    layout. Only bucket-mates are pair-joined; no quadratic blowup.
  *  - Exact verification (Jaccard / Hamming) runs only on candidates.
  */
object Dedup {

  /** Spread CPU-heavy per-row kernels (shingling, 64-seed minhash,
    * simhash tallies) across all cores when the SOURCE under-partitions
    * — the driver's test parquet is a single row group, so without this
    * every signature pass runs on one core. At real scale file splits
    * already exceed cores and this is a no-op; the repartition moves
    * only the skinny (id, text) projection, and every consumer is
    * order-independent (groupBy/join), so results are bit-identical. */
  private[graft] def toCores(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Keep the minimum-id row per normalized text key. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val key = lower(trim(col(textCol)))
    val w = Window.partitionBy(key).orderBy(col(idCol).asc)
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** MinHash signature over pre-computed shingle hashes: for each of
    * `numHashes` seeds, the min seeded rehash. Native expression — a
    * tight primitive loop per row (the transform/array_min composition
    * is interpreted and allocates per element; it benchmarked 100×
    * slower at sf0.1). */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.NativeExprs.minhashSig(shingles, numHashes)

  /** Candidate pairs from exploded (bucketKeys…, id) rows: the bucket
    * SELF-JOIN layout (the one every at-scale LSH implementation and
    * the DuckDB oracles use). Bucket sizes are counted first and
    * degenerate buckets (> maxBucket — m near-identical boilerplate
    * docs would otherwise emit m²/2 pairs on one reducer, the classic
    * 100 TB LSH skew failure) are dropped BEFORE the join; members of a
    * dropped bucket still pair through their other bands. The join
    * streams its quadratic output and AQE can split a skewed bucket
    * across reducers — unlike the previous collect_list + pair-array
    * enumeration, which materialized up to maxBucket²/2 structs inside
    * ONE row (measured 2.5 s of a 2.8 s pipeline on skew-collapsed
    * sign-bit buckets, and an OOM risk at a larger cap). */
  def bucketPairs(banded: DataFrame, bucketKeys: Seq[String], maxBucket: Int,
      carry: Seq[String] = Nil,
      preDistinct: DataFrame => DataFrame = identity): DataFrame = {
    val keyCols = bucketKeys.map(col)
    // Materialize the (ids + bucket keys + carried payload — still
    // corpus-linear, skinny) banded table ONCE: the count branch and
    // both self-join sides would otherwise each re-derive it, re-running
    // the upstream signature computation 3× (measured as 3× the whole
    // sig cost). Same executor-storage layout the CC loop uses for its
    // edge set.
    //
    // `carry` columns ride through the self-join as <c>_a/<c>_b — a
    // verifier needing per-id payload (e.g. the simhash signature for
    // the hamming check) reads it off the pair row instead of joining
    // the candidate stream back to the corpus twice (two shuffle joins
    // of the quadratic stream against a corpus-sized table; measured
    // 2× the whole pipeline at 100× sf0.1). `preDistinct` runs on the
    // raw pair stream BEFORE the distinct, so a cheap verify filter
    // shrinks the dedup shuffle instead of following it.
    val saved = Lineage.cut(banded)
    val kept = saved.join(
      saved.groupBy(keyCols: _*).agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n").between(2, maxBucket))
        .select(keyCols: _*),
      bucketKeys)
    val a = kept.select(keyCols ++ (col("id").as("id_a") +:
      carry.map(c => col(c).as(s"${c}_a"))): _*)
    val b = kept.select(keyCols ++ (col("id").as("id_b") +:
      carry.map(c => col(c).as(s"${c}_b"))): _*)
    val pairs = a.join(b, bucketKeys)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a") +: col("id_b") +:
        carry.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b"))): _*)
    preDistinct(pairs).dropDuplicates("id_a", "id_b")
  }

  /** LSH candidate pairs from MinHash signatures, verified with exact
    * shingle-set Jaccard. bands × rowsPerBand must equal numHashes. */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      jaccardThreshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

    val shingled = docs.select(col(idCol).as("id"),
      TextAnalysis.shingleHashes(col(textCol), k).as("shingles"))
    val sigs = shingled.select(col("id"),
      minHashSignature(col("shingles"), numHashes).as("sig"))

    // Explode to (band, band_hash, id): the shuffle key is the bucket.
    // Only ids travel into the bucket aggregation — shingle payloads
    // are re-joined AFTER candidate dedup, so the shuffle rows stay ~24
    // bytes wide instead of carrying two ~150-element arrays each. (At
    // 100 TB `shingled` would be checkpointed; here recomputing the
    // projection is cheaper than shuffling it.)
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    val candidates = bucketPairs(banded, Seq("band", "band_hash"), maxBucket)

    candidates
      .join(shingled.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(shingled.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Shingle sets + banded MinHash bucket keys for `docs` — the shared
    * prep of [[minHashPairs]] and the persisted-index path. */
  private[graft] def shinglesAndBands(docs: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, bands: Int): (DataFrame, DataFrame) = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val shingled = toCores(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), TextAnalysis.shingleHashes(col(textCol), k).as("shingles"))
    val banded = shingled
      .select(col("id"), minHashSignature(col("shingles"), numHashes).as("sig"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    (shingled, banded)
  }

  /** The index's layout parameters, persisted at build time as a tiny
    * `_graft_layout` properties file in the index directory and READ
    * BACK by merge/probe — never taken from caller defaults. Merging
    * or probing with a different (k, numHashes, bands) than the build
    * silently mixes band geometries: exact-Jaccard verification removes
    * the false positives, but the missed candidates become silent false
    * negatives in dedup (r12 ADVICE; same failure class
    * [[graft.ops.Retrieval]] guards with bucketHexWidth). */
  private def writeLayout(df: DataFrame, file: String,
      kv: Seq[(String, Int)]): Unit = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(kv.map { case (k, v) => s"$k=$v" }.mkString("\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  private def readLayout(df: DataFrame, file: String,
      keys: Seq[String]): Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    if (!fs.exists(p))
      throw new java.io.IOException(s"$file is missing — corrupt, " +
        "half-written, or pre-layout MinHash index; rebuild it with " +
        "buildMinhashIndex (merge/probe refuse to guess band geometry: " +
        "a wrong guess silently drops candidates)")
    val in = fs.open(p)
    val m =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.contains("=")).map { l =>
          val Array(k, v) = l.split("=", 2); (k, v.trim.toInt)
        }.toMap
      finally in.close()
    val missing = keys.filterNot(m.contains)
    if (missing.nonEmpty)
      throw new java.io.IOException(
        s"$file lacks keys ${missing.mkString(", ")} — corrupt index layout")
    m
  }

  /** Build a PERSISTED MinHash LSH index: band-bucket keys (written
    * `partitionBy(band)`) plus the shingle sets needed for exact
    * verification at probe time, plus the `_graft_layout` parameter
    * file merge/probe read the band geometry from. Build once over the
    * standing corpus; every later ingest batch probes it without
    * touching corpus text — the daily operation of a production
    * pipeline (the dedup analog of the persisted IVF index,
    * `Similarity.buildIvfIndex`). */
  def buildMinhashIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, k: Int = 3, numHashes: Int = 64, bands: Int = 16): Unit = {
    val (shingled, banded) = shinglesAndBands(docs, idCol, textCol, k, numHashes, bands)
    // layout first: it is configuration, not a completeness marker —
    // the data writes' _SUCCESS files remain the completeness signal
    writeLayout(docs, s"$path/_graft_layout",
      Seq("k" -> k, "numHashes" -> numHashes, "bands" -> bands))
    // cluster by the partition column before a partitionBy write: one
    // writer (and one file) per band instead of every input partition
    // opening every band directory — n_partitions × n_bands small files
    // is the classic partitioned-write mistake at any scale
    banded.repartition(col("band"))
      .write.mode("overwrite").partitionBy("band").parquet(s"$path/bands")
    shingled.write.mode("overwrite").parquet(s"$path/shingles")
  }

  /** Fold an ingest batch into a persisted MinHash index — the
    * incremental-maintenance half every other index family has
    * ([[graft.ops.Retrieval.mergeBm25Index]],
    * `Similarity.mergeIvfIndex`, `Similarity.mergePqIndex`). Doc ids
    * must be new to the index (same disjointness contract as the BM25
    * merge). The index holds NO cross-document aggregate — band rows
    * and shingle sets are pure per-document projections — so merging is
    * a pure APPEND into the standing layout (new files inside the
    * existing band directories, new shingle files), and
    * `build(A); merge(B)` is row-identical to `build(A ∪ B)`: probe
    * results are bitwise equal, pinned in DedupSpec. Band geometry
    * (k, numHashes, bands) comes from the index's own `_graft_layout`,
    * never a caller argument — mixing geometries cannot happen. */
  def mergeMinhashIndex(newDocs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val lay = readLayout(newDocs, s"$path/_graft_layout",
      Seq("k", "numHashes", "bands"))
    val (shingled, banded) = shinglesAndBands(newDocs, idCol, textCol,
      lay("k"), lay("numHashes"), lay("bands"))
    banded.repartition(col("band"))
      .write.mode("append").partitionBy("band").parquet(s"$path/bands")
    shingled.write.mode("append").parquet(s"$path/shingles")
  }

  /** Probe an ingest batch against a persisted index: ONLY cross pairs
    * (new doc × indexed doc), exact-Jaccard verified. The probe side
    * computes signatures for the batch alone; the join shuffles on the
    * bucket key, so cost scales with the BATCH size and bucket
    * collisions, never with the standing corpus (whose banded table
    * streams from parquet, pre-partitioned by band). */
  def probeMinhashIndex(newDocs: DataFrame, idCol: String, textCol: String,
      path: String, jaccardThreshold: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    val lay = readLayout(newDocs, s"$path/_graft_layout",
      Seq("k", "numHashes", "bands"))
    val (newShingled, newBanded) = shinglesAndBands(newDocs, idCol, textCol,
      lay("k"), lay("numHashes"), lay("bands"))
    val idxBanded = spark.read.parquet(s"$path/bands")
    val idxShingled = spark.read.parquet(s"$path/shingles")
    val candidates = newBanded
      .select(col("band"), col("band_hash"), col("id").as("new_id"))
      .join(idxBanded.select(col("band"), col("band_hash"), col("id").as("index_id")),
        Seq("band", "band_hash"))
      .select(col("new_id"), col("index_id"))
      .dropDuplicates("new_id", "index_id")
    candidates
      .join(newShingled.select(col("id").as("new_id"), col("shingles").as("sh_a")),
        Seq("new_id"))
      .join(idxShingled.select(col("id").as("index_id"), col("shingles").as("sh_b")),
        Seq("index_id"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("new_id"), col("index_id"), col("jaccard"))
  }

  /** 64-bit SimHash: sign of the per-bit sum of token-hash bits. Token
    * hashing stays on Spark's codegen'd xxhash64; the 64-wide bit
    * tally runs in a native expression (the nested zip_with/transform
    * equivalent is interpreted and allocates a 64-int array per token). */
  def simHash(text: Column): Column =
    graft.functions.NativeExprs.simhash64(
      transform(array_distinct(TextAnalysis.tokens(lower(text))),
        tk => xxhash64(tk)))

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit chunks
    * (exact match on ≥1 chunk ⇒ candidate, guarantees recall for
    * hamming ≤ 3), verify with popcount of xor. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val banded = sigs.select(col("id"), col("sim"),
        posexplode(graft.functions.NativeExprs.chunkSplit(col("sim"), 4, 16)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    // The 8-byte signature rides the banded frame (carry) so the
    // hamming verify reads both sigs off the pair row — no join back to
    // the corpus — and runs BEFORE the pair-distinct, so only verified
    // near-dups reach that shuffle.
    bucketPairs(banded, Seq("band", "chunk"), maxBucket, carry = Seq("sim"),
      preDistinct = _.withColumn("hamming",
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
        .filter(col("hamming") <= maxHamming))
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Seed-free 60-bit SimHash over md5 token hashes — the cross-engine
    * verification variant of [[simHash]]: the token hash is md5 (first
    * 15 hex chars = 60 bits), which any SQL engine computes
    * bit-identically, so a DuckDB oracle can replay the full
    * majority-vote signature (xxhash64 seeds are Spark-only). Same
    * plan shape as the production path: per-row projection → one
    * per-doc aggregation; the native SimHash64 tally runs the bit
    * counting (bits 60-63 are zero for every token, so they majority
    * to 0 — a 60-bit signature in a 64-bit frame). */
  def simHashMd5(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .select(col(idCol),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("bigint").as("th"))
      .groupBy(col(idCol))
      .agg(graft.functions.NativeExprs.simhash64(collect_list(col("th"))).as("sig"))

  /** Seed-free MinHash over md5: per seed s in [0, numHashes), the
    * minimum of md5(s + ":" + token) hex prefixes. Min of fixed-length
    * lowercase hex = numeric min, so the signature needs no hex→int
    * conversion anywhere and a DuckDB oracle replays it exactly.
    * Output: (id, seed, minhash) — numHashes rows per doc.
    *
    * Layout: md5 is computed once per DISTINCT token (the vocabulary),
    * not once per occurrence×seed — a per-seed minimum over occurrences
    * equals the minimum over the doc's distinct token set, so hashing
    * the vocabulary and joining it back on `tok` is value-identical
    * while cutting the hash work from |occurrences|×seeds to
    * |vocab|×seeds. The join is left to AQE: a small vocabulary
    * broadcasts, a web-scale one shuffle-joins co-partitioned on the
    * token — both correct, neither re-hashes. The per-doc aggregate is
    * an element-wise min over the seed array (partial map-side). */
  def minHashMd5(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(array_distinct(split(lower(col(textCol)), " "))).as("tok"))
    val vocab = toks.select(col("tok")).distinct()
      .select(col("tok"), transform(sequence(lit(0), lit(numHashes - 1)),
        s => substring(md5(concat_ws(":", s, col("tok"))), 1, 15)).as("hvs"))
    val mins = (0 until numHashes).map(i =>
      min(element_at(col("hvs"), i + 1)).as(s"m$i"))
    toks.join(vocab, Seq("tok"))
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        posexplode(array((0 until numHashes).map(i => col(s"m$i")): _*)))
      .select(col(idCol), col("pos").cast("int").as("seed"),
        col("col").as("minhash"))
  }

  /** Near-dup edges from [[minHashMd5]] signatures: two docs are joined
    * when ≥ `minShared` of their `numHashes` per-seed minima coincide —
    * a seed-band LSH join expressed in cross-engine-verifiable md5
    * terms. One shuffle on (seed, minhash); only bucket-mates pair, and
    * buckets larger than `maxBucket` are dropped BEFORE the self-join
    * (the standard LSH skew guard — a degenerate bucket of B docs would
    * otherwise emit B²/2 pairs on one reducer; measured: uncapped, this
    * corpus's tiny vocabulary makes sf0.1 blow past 10 minutes). The
    * cap is part of the operator semantics and the oracle mirrors it. */
  def minHashMd5Edges(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, minShared: Int = 8, maxBucket: Int = 100): DataFrame = {
    val mh = minHashMd5(docs, idCol, textCol, numHashes)
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("seed"), col("minhash"))))
      .filter(col("bucket_n") <= maxBucket)
    val a = mh.select(col(idCol).as("id_a"), col("seed"), col("minhash"))
    val b = mh.select(col(idCol).as("id_b"), col("seed"), col("minhash"))
    a.join(b, Seq("seed", "minhash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("id_a"), col("id_b"))
  }

  /** Oracle-verification twin of the persisted MinHash index
    * ([[buildMinhashIndex]]/[[mergeMinhashIndex]]/[[probeMinhashIndex]]):
    * the index stores the seed-wise [[minHashMd5]] signature rows
    * (id, seed, minhash) partitioned by seed — every hash is md5 hex,
    * so a DuckDB oracle replays build, merge, AND probe exactly,
    * giving the persisted dedup path the cross-engine proof the IVF/PQ
    * twins already have. Like the production index, there is no
    * cross-document aggregate: merge is a pure append and
    * `build(A); merge(B)` ≡ `build(A ∪ B)` row-for-row. */
  def buildMinhashIndexMd5(docs: DataFrame, idCol: String, textCol: String,
      path: String, numHashes: Int = 16): Unit = {
    writeLayout(docs, s"$path/_graft_layout", Seq("numHashes" -> numHashes))
    writeMd5Sigs(docs, idCol, textCol, path, numHashes, "overwrite")
  }

  /** Fold a batch of NEW doc ids into the md5-twin index (append);
    * numHashes comes from the index's `_graft_layout`, like the
    * production twin. */
  def mergeMinhashIndexMd5(newDocs: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    writeMd5Sigs(newDocs, idCol, textCol, path,
      readLayout(newDocs, s"$path/_graft_layout", Seq("numHashes"))("numHashes"),
      "append")

  private def writeMd5Sigs(docs: DataFrame, idCol: String, textCol: String,
      path: String, numHashes: Int, mode: String): Unit =
    minHashMd5(docs, idCol, textCol, numHashes)
      .select(col(idCol).as("id"), col("seed"), col("minhash"))
      .repartition(col("seed")) // one writer, one file per seed dir
      .write.mode(mode).partitionBy("seed").parquet(s"$path/sigs")

  /** Probe an ingest batch against the md5-twin index: batch signatures
    * join the standing (seed, minhash) table, cross pairs sharing
    * ≥ `minShared` of `numHashes` seed-minima survive — the same
    * seed-band semantics as [[minHashMd5Edges]], restricted to
    * (new × indexed) pairs. One shuffle on (seed, minhash); cost
    * scales with the batch's signature rows and bucket collisions,
    * never the standing corpus (which streams from parquet,
    * pre-partitioned by seed). */
  def probeMinhashIndexMd5(newDocs: DataFrame, idCol: String, textCol: String,
      path: String, minShared: Int = 8): DataFrame = {
    val spark = newDocs.sparkSession
    val numHashes =
      readLayout(newDocs, s"$path/_graft_layout", Seq("numHashes"))("numHashes")
    val newSigs = minHashMd5(newDocs, idCol, textCol, numHashes)
      .select(col(idCol).as("new_id"), col("seed"), col("minhash"))
    val idx = spark.read.parquet(s"$path/sigs")
      .select(col("id").as("index_id"), col("seed").cast("int").as("seed"),
        col("minhash"))
    newSigs.join(idx, Seq("seed", "minhash"))
      .groupBy(col("new_id"), col("index_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Connected components over near-dup edges — the step that turns
    * pairwise matches into dedup CLUSTERS (keep one canonical doc per
    * component; pairs alone cannot resolve transitive chains A~B~C).
    *
    * Iterative min-label propagation WITH pointer doubling: each round
    * a node adopts the minimum of its own label, its neighbors' labels
    * (one shuffle-join + aggregate), and — from round 3 — its label's
    * label (one more shuffle-join of the label table through itself,
    * the Shiloach-Vishkin shortcut). The shortcut doubles label reach
    * every round, so convergence is O(log diameter) rounds instead of
    * O(diameter) on chain-shaped graphs. It is deferred two rounds
    * because near-dup graphs in practice are forests of tiny cliques
    * that converge in round 1 (round 2 confirms) — those runs never pay
    * the extra join, while anything still moving by round 3 is
    * chain-shaped and gets the doubling. Each label table is
    * checkpoint'ed so lineage does not deepen with iterations — the
    * bounded-round layout GraphX/Pregel CC uses, built from plain
    * DataFrame ops. The driver sees only one aggregate value per round
    * (the label sum), never the labels.
    *
    * `checkpointDir`: when set, per-round label tables go through
    * reliable `checkpoint()` into that directory instead of
    * `localCheckpoint()`. localCheckpoint stores blocks on executors —
    * an executor loss mid-run kills the job; the reliable form is the
    * hardened choice on a real cluster (HDFS/object-store dir), the
    * default the fast choice locally. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 20, checkpointDir: Option[String] = None): DataFrame =
    ccWithRounds(nodes, edges, maxIters, checkpointDir)._1

  /** As connectedComponents, also returning the rounds taken (the
    * convergence round included) — pinned by DedupSpec's chain test. */
  private[graft] def ccWithRounds(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 20, checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val sc = nodes.sparkSession.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)
    // reliable when a dir is configured — here or session-wide
    // (sc.setCheckpointDir at engine build): Lineage.cut reads the
    // context, so a cluster deployment flips every round's label table
    // to the executor-loss-safe path without touching call sites
    def save(df: DataFrame, eager: Boolean): DataFrame = Lineage.cut(df, eager)
    // materialize the (usually expensive) edge derivation ONCE — the
    // loop must not re-run LSH/self-join lineage every round
    val sym = save(edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst"))), true)
    var labels = save(nodes.select(col("id"), col("id").as("comp")), true)
    // convergence via the label-sum: monotonically non-increasing, and
    // strictly decreasing while any label still moves — one cheap
    // aggregate per round instead of a self-join diff count. Decimal
    // sum: id sums can exceed Long at large node counts.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d   // empty node set
    }
    var prevSum = labelSum(labels)
    var i = 0
    var converged = false
    while (!converged && i < maxIters) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("nbr_min"))
      val withNbr = labels.as("l")
        .join(nbrMin, col("l.id") === nbrMin("src"), "left")
      // the shortcut side: comp values are always node ids, so joining
      // l.comp against the (checkpointed) label table reads each
      // label's label — every term derives from the SAME materialized
      // `labels`, nothing recomputes
      val stepped =
        if (i < 2) withNbr.select(col("l.id").as("id"),
          least(col("l.comp"), coalesce(col("nbr_min"), col("l.comp"))).as("comp"))
        else {
          val thru = labels.select(col("id").as("p_id"), col("comp").as("p_comp"))
          withNbr.join(thru, col("l.comp") === col("p_id"), "left")
            .select(col("l.id").as("id"),
              least(col("l.comp"),
                coalesce(col("nbr_min"), col("l.comp")),
                coalesce(col("p_comp"), col("l.comp"))).as("comp"))
        }
      // lazy checkpoint: the convergence aggregate right below is the
      // action that materializes it — one job per round, not two
      val next = save(stepped, false)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      i += 1
    }
    (labels, i)
  }

  /** Exact n-gram Jaccard pairs within a blocking key (e.g. lang+source)
    * — the quadratic-but-blocked baseline the LSH paths approximate. At
    * 100 TB the blocking key bounds each block's pair count; unblocked
    * pairwise comparison is never shipped. Uses string shingles (not
    * xxhash64) so a DuckDB oracle can mirror it exactly. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int = 3, threshold: Double = 0.1): DataFrame = {
    // Distinct string shingles define the semantics (and the DuckDB
    // oracle); the pairwise intersects run on xxhash64 of each shingle -
    // long-array intersection beats per-pair string hashing, and a
    // count-changing collision needs two distinct shingles of one doc
    // colliding in 64 bits (~1e-15 for this corpus).
    val grams = docs.select(
      concat_ws("", blockCols.map(col): _*).as("blk"),
      col(idCol).as("id"),
      // same hashes as transform(shingleStrings, xxhash64), pre-sorted
      // so each pairwise intersect is a single merge scan
      array_sort(TextAnalysis.shingleHashes(col(textCol), n)).as("g"))
    val a = grams.select(col("blk").as("blk_a"), col("id").as("id_a"), col("g").as("g_a"))
    val b = grams.select(col("blk").as("blk_b"), col("id").as("id_b"), col("g").as("g_b"))
    def jac = {
      val inter = graft.functions.NativeExprs
        .sortedIntersectCount(col("g_a"), col("g_b"))
      inter.cast("double") /
        (size(col("g_a")) + size(col("g_b")) - inter).cast("double")
    }
    // The jaccard threshold lives IN the join condition: the join
    // operator evaluates it on the streamed pair without materializing
    // an output row per candidate - at ~N^2/blocks candidate pairs, the
    // per-pair output-row copy (two ~150-element arrays) costs more
    // than the intersects themselves.
    a.join(b,
        col("blk_a") === col("blk_b") && col("id_a") < col("id_b") &&
          jac >= threshold,
        "inner")
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
  }

  /** Directed near-CONTAINMENT pairs within a blocking key:
    * |A ∩ B| / |A| ≥ threshold means doc A's shingles mostly appear in
    * doc B — the quote-inclusion / page-wrapping case symmetric Jaccard
    * misses (a short doc embedded in a long one has low Jaccard but
    * containment ≈ 1). Same blocked layout, grams prep and in-join
    * predicate as [[ngramJaccardPairs]]; pairs are DIRECTED
    * (id_a contained in id_b, both orientations evaluated). */
  def ngramContainmentPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val grams = docs.select(
      concat_ws("", blockCols.map(col): _*).as("blk"),
      col(idCol).as("id"),
      array_sort(TextAnalysis.shingleHashes(col(textCol), n)).as("g"))
    val a = grams.select(col("blk").as("blk_a"), col("id").as("id_a"), col("g").as("g_a"))
    val b = grams.select(col("blk").as("blk_b"), col("id").as("id_b"), col("g").as("g_b"))
    def containment = graft.functions.NativeExprs
      .sortedIntersectCount(col("g_a"), col("g_b"))
      .cast("double") / size(col("g_a")).cast("double")
    a.join(b,
        col("blk_a") === col("blk_b") && col("id_a") =!= col("id_b") &&
          containment >= threshold,
        "inner")
      .select(col("id_a"), col("id_b"), containment.as("containment"))
  }
}
