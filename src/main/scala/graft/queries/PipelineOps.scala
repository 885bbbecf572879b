package graft.queries

import org.apache.spark.sql.functions._

import QHelpers._
import graft.ops.{Dedup, Layout, Multimodal, Sampling, Similarity, TextAnalysis, UrlOps}

/** SURVEY.md §2b rows 56–59 + the LLM-data-pipeline extension suite:
  * dedup (exact / MinHash-LSH / SimHash / blocked n-gram), text analysis
  * (stats, quality, lang-id, fingerprint, token count), and similarity
  * search over embeddings (brute-force kNN, SRP-LSH, IVF).
  *
  * Oracle-checked where DuckDB can express the same computation
  * hash-stably (string shingles, integer ratios, decimal-routed dot
  * products); the xxhash64/LSH-dependent queries are rows-only but fully
  * deterministic (fixed seeds, total ORDER BY).
  */
object PipelineOps {

  /** The composed dedup ∧ decontamination ∧ repetition keep-set
    * (curation_keep; curation_mix builds on it). Shingle HASHES stand
    * in for the strings on the Spark side (the native expression is
    * the fast path; a ratio-changing collision needs two distinct
    * shingles colliding in 64 bits, ~1e-15 — same argument dedup_ngram
    * documents). The oracle computes the same ratios from the strings;
    * the kept set is identical. */
  private def curationKept(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    curationKeptFrom(t(s, d, "documents"), Seq("doc_id", "lang", "source"))
      .orderBy(col("doc_id"))

  /** The shared curation survivorship pipeline over any doc-shaped
    * input (must carry doc_id + text + whatever `outCols` selects):
    * exact-dedup keeper window ∧ decontamination ∧ repetition. r15:
    * callers that need extra per-doc columns (curation_mix's DSIR
    * weight) CARRY them through instead of joining the corpus back to
    * itself on doc_id afterwards (guide §2.4). */
  private def curationKeptFrom(docs: org.apache.spark.sql.DataFrame,
      outCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val eval = docs.filter(col("doc_id") < 10)
      .select(explode(TextAnalysis.shingleHashes(col("text"), 3)).as("h"))
      .agg(sort_array(collect_set(col("h"))).as("ev"))
    val sh = array_sort(TextAnalysis.shingleHashes(col("text"), 3))
    val total =
      greatest(size(TextAnalysis.tokens(lower(trim(col("text"))))) - 2, lit(1))
    val contamOk =
      graft.functions.NativeExprs.sortedIntersectCount(col("sh"), col("ev"))
        .cast("double") / size(col("sh")).cast("double") < 0.08
    val repOk =
      lit(1.0) - size(col("sh")).cast("double") / col("total").cast("double") < 0.05
    // exact-dedup survivorship INLINE: a doc survives iff it is the
    // min-id row of its normalized-text group (Dedup.exact's rule), so
    // the keep flag is the same row_number window evaluated directly
    // on the corpus — the former derive-canon-then-left-semi-join shape
    // paid the window's shuffle PLUS a corpus-sized semi-join exchange
    // pair for the identical row set (r15; guide §2.4)
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(lower(trim(col("text")))).orderBy(col("doc_id").asc)
    docs
      .withColumn("graft_rn", row_number().over(wKey))
      .filter(col("graft_rn") === 1 && col("doc_id") >= 10)
      .select(outCols.map(col) ++ Seq(sh.as("sh"), total.as("total")): _*)
      .join(broadcast(eval))
      .filter(contamOk && repOk)
      .select(outCols.map(col): _*)
  }

  /** The fixed BM25 keyword query (text_bm25_topk) — corpus-present
    * terms so tf/df/dl all shape the ranking. */
  private val Bm25Terms = Seq("hash", "join", "window", "stream")

  /** The text_bm25_topk oracle, GENERATED from the same Bm25Terms the
    * Spark side uses, term column by term column — the two engines stay
    * in lockstep by construction. The idf's ln is replayed BITWISE
    * through the same 20-sqrt + 3-term-series detLn expression
    * (sqrt and the four arithmetic ops are IEEE-exact in both); the
    * per-term scores add as DECIMAL(18,12) exactly like the Spark side.
    */
  /** SQL half of TextAnalysis.detLn's sqrt reduction: 20 nested sqrts
    * around `arg` (the series stages are written per call site). */
  private def sqlSqrt20(arg: String): String =
    (1 to 20).foldLeft(arg)((a, _) => s"sqrt($a)")

  private def bm25OracleSql: String = bm25OracleSqlOver("documents")

  /** Same replay over a bounded corpus (`relation` may be a filtered
    * subquery) — the merge query bounds its input the way the ANN
    * twins do: verification value is per-row arithmetic, not corpus
    * size, and the bench shouldn't pay a triple index build on the
    * full table every round. */
  private def bm25OracleSqlOver(relation: String): String =
    s"""WITH ${bm25ScoredCtes(relation)}
       |SELECT doc_id, n_terms, bm25 FROM scored WHERE n_terms > 0
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  /** The CTE chain up to `scored(doc_id, n_terms, bm25)` — shared by
    * the plain top-k oracle and the hybrid-RRF oracle (which re-ranks
    * the scored pool rather than taking it verbatim). */
  private def bm25ScoredCtes(relation: String): String = {
    val ts = Bm25Terms
    val tfCols = ts.map(t =>
      s"    len(list_filter(string_split(lower(text), ' '), x -> x = '$t')) AS tf_$t")
      .mkString(",\n")
    val dfCols = ts.map(t =>
      s"    SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n")
    def sqrt20(t: String) = sqlSqrt20(
      s"((CAST(n AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) " +
        s"/ (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)")
    val rCols = ts.map(t => s"  ${sqrt20(t)} AS r_$t").mkString(",\n")
    val ttCols = ts.map(t => s"  r_$t - 1.0 AS tt_$t").mkString(",\n")
    val idfCols = ts.map(t =>
      s"  (tt_$t - tt_$t*tt_$t/2.0 + tt_$t*tt_$t*tt_$t/3.0) * 1048576.0 AS idf_$t")
      .mkString(",\n")
    val nTerms = ts.map(t => s"(CASE WHEN p.tf_$t > 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val scoreTerms = ts.map(t =>
      s"      CAST(CASE WHEN p.tf_$t > 0 THEN i.idf_$t * " +
        s"(CAST(p.tf_$t AS DOUBLE) * 2.2) /\n" +
        s"        (CAST(p.tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 *\n" +
        s"          (CAST(p.dl * i.n AS DOUBLE) / CAST(i.t AS DOUBLE))))\n" +
        s"        ELSE 0.0 END AS DECIMAL(18,12))").mkString(" +\n")
    s"""proj AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS dl,
       |$tfCols
       |  FROM $relation),
       |stats AS (
       |  SELECT COUNT(*) AS n, SUM(dl) AS t,
       |$dfCols
       |  FROM proj WHERE dl > 0),
       |idf0 AS (SELECT n, t,
       |$rCols
       |FROM stats),
       |idf1 AS (SELECT n, t,
       |$ttCols
       |FROM idf0),
       |idf AS (SELECT n, t,
       |$idfCols
       |FROM idf1),
       |scored AS (
       |  SELECT p.doc_id,
       |    CAST($nTerms AS BIGINT) AS n_terms,
       |    CAST(
       |$scoreTerms
       |      AS DOUBLE) AS bm25
       |  FROM proj p, idf i)""".stripMargin
  }

  /** retrieval_hybrid_rrf oracle: top-50 of the shared BM25 scored
    * pool, top-50 of the quantized-cosine list (the embed_knn_cosine
    * replay), ranks as row_number over the same (score desc, id)
    * orders, fused as `1/(60+r)` sums — every double op is a single
    * IEEE divide/add, so the fusion replays bitwise. */
  private def hybridRrfOracleSql: String =
    s"""WITH ${bm25ScoredCtes("documents")},
       |b0 AS (
       |  SELECT doc_id, bm25 FROM scored WHERE n_terms > 0
       |  ORDER BY bm25 DESC, doc_id LIMIT 50),
       |b AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_bm25
       |  FROM b0),
       |a AS (SELECT embedding AS av FROM embeddings WHERE vec_id = 0),
       |dcos AS (
       |  SELECT e.vec_id,
       |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(a.av[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dab,
       |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(e.embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS daa,
       |    CAST(SUM(CAST(floor(CAST(a.av[s.i] AS DOUBLE)*CAST(a.av[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dbb
       |  FROM embeddings e, a, generate_series(1, 64) AS s(i)
       |  GROUP BY e.vec_id),
       |c0 AS (
       |  SELECT vec_id, dab / sqrt(daa * dbb) AS cos_sim FROM dcos
       |  WHERE vec_id <> 0
       |  ORDER BY cos_sim DESC, vec_id LIMIT 50),
       |c AS (
       |  SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS r_cos
       |  FROM c0),
       |f AS (
       |  SELECT COALESCE(b.doc_id, c.vec_id) AS doc_id,
       |    COALESCE(1.0 / (60 + b.r_bm25), 0.0) +
       |      COALESCE(1.0 / (60 + c.r_cos), 0.0) AS rrf,
       |    b.r_bm25 AS r_bm25, c.r_cos AS r_cos
       |  FROM b FULL OUTER JOIN c ON b.doc_id = c.vec_id)
       |SELECT doc_id, rrf, r_bm25, r_cos FROM f
       |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  val defs: Map[String, Q] = Map(
    // 56. exact dedup: keep min doc_id per normalized text. One
    // hash-shuffle on the key; no driver materialization.
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // 59. MinHash LSH near-dup pairs, Jaccard-verified. Deterministic
    // (xxhash64, fixed band layout) but not DuckDB-expressible.
    "dedup_minhash" -> ((s, d) =>
      Dedup.minHashPairs(t(s, d, "documents"), "doc_id", "text",
          k = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // SimHash near-dup pairs (hamming ≤ 3 of 64 bits), summarized as a
    // per-distance histogram: this corpus's tiny vocabulary makes most
    // token SETS near-identical, so the raw pair list is ~100k rows of
    // colliding signatures — the histogram keeps the full pipeline
    // exercised with a bounded, deterministic output.
    "dedup_simhash" -> ((s, d) =>
      Dedup.simHashPairs(t(s, d, "documents"), "doc_id", "text",
          maxHamming = 3)
        .groupBy(col("hamming"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("hamming"))),

    // Cross-engine SimHash: md5 token hashes (60-bit signature), every
    // doc's full majority-vote signature checked against DuckDB.
    "dedup_simhash_md5" -> ((s, d) =>
      Dedup.simHashMd5(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Cross-engine MinHash: per-seed md5 minima as hex strings (min of
    // fixed-length hex = numeric min) — the signature algebra verified
    // end-to-end against DuckDB.
    "dedup_minhash_md5" -> ((s, d) =>
      Dedup.minHashMd5(t(s, d, "documents"), "doc_id", "text", numHashes = 16)
        .orderBy(col("doc_id"), col("seed"))),

    // Near-dup CLUSTERS: md5-minhash band edges (≥8/16 shared seeds) →
    // connected components → (doc, component) assignment. The
    // pairs→clusters step every global dedup needs; fully
    // oracle-checked (DuckDB replays the edges and the reachability
    // min-label via a recursive CTE).
    "dedup_components" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")),
          Dedup.minHashMd5Edges(docs, "doc_id", "text", 16, 8))
        .orderBy(col("id"))
    }),

    // Blocked exact n-gram Jaccard (string shingles → oracle-checkable).
    "dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          blockCols = Seq("lang", "source"), n = 3, threshold = 0.3)
        .orderBy(col("id_a"), col("id_b"))),

    // Per-vector int8 quantization (ops/Similarity.quantizeInt8),
    // verified through exact integer checksums of the quantized array
    // (Σq_i and Σq_i·i — ARRAY columns cannot cross the checker) plus
    // the double scale. floor(x/scale + 0.5) quantization is
    // bit-reproducible across engines, so this is fully oracle-checked.
    "embed_quantize_int8" -> ((s, d) => {
      val q = Similarity.quantizeInt8(t(s, d, "embeddings"), "vec_id", "embedding")
      q.select(col("vec_id"), col("scale"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x.cast("long")).as("qsum"),
          aggregate(zip_with(col("q"), sequence(lit(1), size(col("q"))),
              (a, b) => a.cast("long") * b.cast("long")),
            lit(0L), (acc, x) => acc + x).as("qdot"))
        .orderBy(col("vec_id"))
    }),

    // Directed near-containment pairs (|A∩B|/|A|): the quote-inclusion
    // dedup case symmetric Jaccard misses; same blocked exact layout as
    // dedup_ngram.
    "dedup_containment" -> ((s, d) =>
      Dedup.ngramContainmentPairs(t(s, d, "documents"), "doc_id", "text",
          blockCols = Seq("lang", "source"), n = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // 57. per-language corpus stats — partial+final hash agg on lang.
    "text_stats" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"),
          sum(TextAnalysis.wordCount(col("text")).cast("long")).as("total_words"))
        .withColumn("avg_words",
          col("total_words").cast("double") / col("n_docs").cast("double"))
        .orderBy(col("lang"))),

    // Per-doc quality features: pure per-row projections (codegen'd).
    "text_quality" -> ((s, d) =>
      TextAnalysis.quality(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Gopher rule bank (Rae et al. 2021, Table A1 — the published
    // quality-filter thresholds DCLM/RefinedWeb inherit), the subset
    // expressible over this corpus: word-count bounds [50, 100k], mean
    // word length in [3, 10], symbol-to-word ratio (# and ellipsis)
    // <= 0.1, and >= 2 distinct Gopher stop words present. Pure per-row
    // projection — integer word counts and IEEE double ratios are
    // engine-exact, so the whole bank is oracle-checked.
    "text_gopher_rules" -> ((s, d) => {
      val words = filter(split(col("text"), " "), w => w =!= "")
      val nWords = size(words).cast("long")
      // greatest(1, n) denominator keeps the projection total on
      // zero-word docs (they fail the n_words >= 50 rule regardless)
      val denom = greatest(lit(1L), nWords)
      val charSum = aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long"))
      val meanLen = charSum.cast("double") / denom
      val nHash = (length(col("text")) -
        length(regexp_replace(col("text"), "#", ""))).cast("long")
      val nEllipsis = ((length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("long")
      val symbolRatio = (nHash + nEllipsis).cast("double") / denom
      val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      val nStops = stops.map(sw =>
        array_contains(words, sw).cast("int")).reduce(_ + _)
      // per-rule verdicts: the corpus is synthetic word soup, so the
      // stopword rule rejects everything (vocab has ≤1 English stop
      // word) — each rule's own column keeps the output informative
      t(s, d, "documents").select(col("doc_id"),
          nWords.as("n_words"), meanLen.as("mean_word_len"),
          symbolRatio.as("symbol_ratio"), nStops.as("n_stopwords"))
        .withColumn("rule_words",
          col("n_words") >= 50 && col("n_words") <= 100000)
        .withColumn("rule_word_len",
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
        .withColumn("rule_symbols", col("symbol_ratio") <= 0.1)
        .withColumn("rule_stopwords", col("n_stopwords") >= 2)
        .withColumn("keep", col("rule_words") && col("rule_word_len") &&
          col("rule_symbols") && col("rule_stopwords"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID heuristic: argmax of marker-token hits.
    "text_langid" -> ((s, d) => {
      val (lang, best) = TextAnalysis.langId(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), lang.as("lang_pred"), best.as("score"))
        .orderBy(col("doc_id"))
    }),

    // Lang-ID accuracy vs the labeled lang column — the curation
    // telemetry a pipeline tracks per ingest batch.
    "text_langid_accuracy" -> ((s, d) => {
      val (lang, _) = TextAnalysis.langId(col("text"))
      t(s, d, "documents")
        .select(col("lang"), (lang === col("lang")).cast("int").as("hit"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("hit").cast("long")).as("n_correct"),
          (sum(col("hit").cast("long")).cast("double") /
            count(lit(1)).cast("double")).as("accuracy"))
        .orderBy(col("lang"))
    }),

    // Content fingerprint: md5 of whitespace-normalized lowercase text.
    "text_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // BPE-ish pre-tokenizer count (the cheap LLM token-budget proxy).
    "text_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.bpeishTokenCount(col("text")).as("n_tokens"))
        .orderBy(col("doc_id"))),

    // 58. brute-force cosine top-k vs anchor vec_id=0 — broadcast anchor,
    // one corpus pass, TakeOrderedAndProject.
    "embed_knn_cosine" -> ((s, d) =>
      Similarity.cosineTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        anchorId = 0L, k = 10)),

    // SRP-LSH candidate pairs, top-20 by exact cosine. Rows-only
    // (hash-seeded hyperplanes) but deterministic. Auto geometry:
    // chunk bits scale with log₂(corpus) (identical to the old fixed
    // 32/4 at sf≤0.1; at 100× data the fixed geometry measured 686×
    // base wall-clock from candidate explosion — see PERF.md).
    "embed_srp_topdups" -> ((s, d) =>
      Similarity.srpCandidatePairsAuto(t(s, d, "embeddings"), "vec_id", "embedding",
          bands = 4)
        .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
        .limit(20)),

    // The full SRP near-dup pipeline (band → bucket → pairs → cosine →
    // top-20) in its cross-engine form: md5 planes + decimal dots, so
    // the ENTIRE pipeline — not just the signature — is oracle-checked.
    // 32 bits in 4×8-bit bands: the SAME banding geometry as the
    // production xxhash64 path (srpCandidatePairs defaults), so this
    // twin has production's recall, and 256 buckets/band keeps the
    // within-bucket quadratic pair generation bounded (8-bit chunks vs
    // the round-5 4-bit chunks whose 16 buckets produced ~500k scored
    // candidates).
    "embed_srp_topdups_md5" -> ((s, d) =>
      Similarity.srpCandidatePairsMd5(
          t(s, d, "embeddings").filter(col("vec_id") < 2000),
          "vec_id", "embedding", bits = 32, dims = 64, bands = 4)
        .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
        .limit(20)),

    // Cross-engine SRP: md5-derived hyperplanes + decimal dot signs —
    // the sign-bit signature algebra verified against DuckDB. Bounded
    // to a fixed id range so bench cost is sf-independent.
    "embed_srp_md5" -> ((s, d) =>
      t(s, d, "embeddings")
        .filter(col("vec_id") < 2000)
        .select(col("vec_id"),
          Similarity.srpSigMd5(col("embedding"), bits = 16, dims = 64).as("sig"))
        .orderBy(col("vec_id"))),

    // IVF ANN top-k: fixed-cardinality hash-sampled quantizer (k never
    // scales with the corpus), shuffle-free projection assignment, probe
    // nProbe cells selected on the driver.
    "embed_ivf_topk" -> ((s, d) =>
      Similarity.ivfTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        anchorId = 0L, k = 10, nCells = 40, nProbe = 2)),

    // Same probe path over 2 Lloyd iterations of deterministic
    // distributed k-means (decimal means — bit-stable under any task
    // scheduling; see Similarity.kmeansCentroids).
    "embed_ivf_kmeans" -> ((s, d) =>
      Similarity.ivfTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        anchorId = 0L, k = 10, nCells = 40, nProbe = 2, kmeansIters = 2)),

    // Oracle-verification twin of the IVF probe (the md5 pattern of
    // dedup_minhash_md5 / embed_srp_topdups_md5): md5-ordered seeds,
    // quantized-dot cosine at every stage — assignment, probe
    // selection, final scores — fully replayed by DuckDB.
    "embed_ivf_topk_md5" -> ((s, d) =>
      Similarity.ivfTopKMd5(t(s, d, "embeddings"), "vec_id", "embedding",
        anchorId = 0L, k = 10, nCells = 40, nProbe = 2)),

    // The k-means flavor of the twin: one integer-quantized Lloyd
    // update of the md5 seeds, then the same replayed probe — DuckDB
    // verifies the distributed mean update itself.
    "embed_ivf_kmeans_md5" -> ((s, d) =>
      Similarity.ivfKmeansMd5(t(s, d, "embeddings"), "vec_id", "embedding",
        anchorId = 0L, k = 10, nCells = 40, nProbe = 2)),

    // Incremental ANN index maintenance wired end to end (the
    // embedding-side analog of bm25_index_merge): build the persisted
    // IVF index over the even half (md5 seeds drawn from that half),
    // FOLD the odd half in against the standing quantizer
    // (Similarity.mergeIvfIndexMd5 — assign + append, no retrain),
    // probe the merged index. Assignment is a pure per-row function of
    // (vector, quantizer), so the merged cells equal assigning the
    // whole corpus against the even-half centroids — which is exactly
    // what the DuckDB oracle replays: the incremental path is
    // hash-verified, not just unit-pinned.
    "embed_ivf_merge" -> ((s, d) => {
      // Bounded corpus (vec_id < 2000, the ANN-twin convention): the
      // additivity being verified is per-row arithmetic, not corpus
      // size, and the bench shouldn't pay a double index build on the
      // full table every round.
      val docs = t(s, d, "embeddings").filter(col("vec_id") < 2000)
      val idx = idxPath("ivf_merge", d)
      Similarity.buildIvfIndexMd5(docs.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", idx, nCells = 40)
      Similarity.mergeIvfIndexMd5(docs.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", idx)
      Similarity.ivfIndexProbeMd5(s, idx, "vec_id", anchorId = 0L,
        k = 10, nProbe = 2)
    }),

    // PQ/ADC twin: md5-seeded per-subspace codebooks, one quantized
    // Lloyd update, integer-quantized L2 for assignment/encode/ADC —
    // the whole product-quantization pipeline as exact BIGINT
    // arithmetic, fully replayed by DuckDB.
    "embed_pq_topk_md5" -> ((s, d) =>
      Similarity.pqTopKMd5(t(s, d, "embeddings"), "vec_id", "embedding",
        anchorId = 0L, k = 10)),

    // SemDeDup (Abbas et al. 2023): cluster embeddings, mark
    // within-cluster above-threshold cosine pairs as semantic
    // duplicates, keep the lowest id — the embedding-space dedup of a
    // pretraining pipeline, fully replayed by the DuckDB oracle
    // (md5-seeded clusters + quantized-dot cosine at every stage).
    "embed_semdedup" -> ((s, d) =>
      Similarity.semDeDupMd5(t(s, d, "embeddings"), "vec_id", "embedding",
          nClusters = 40, simThreshold = 0.4)
        .orderBy(col("vec_id"))),

    // Benchmark-contamination screen: per-doc shingle overlap against
    // the (stand-in) eval set doc_id < 10, broadcast as one vocabulary.
    "text_contamination" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextAnalysis.contamination(
          docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10))
        .orderBy(col("doc_id"))
    }),

    // Deterministic stratified sampling: rebalance the language mix
    // (keep all zh/de, 30% of en). md5-threshold keyed — reproducible
    // across runs/retries AND oracle-checked (DuckDB replays the exact
    // same sample).
    "sample_stratified" -> ((s, d) =>
      Sampling.stratified(t(s, d, "documents"), "doc_id", "lang",
          Map("zh" -> 1.0, "de" -> 1.0, "en" -> 0.3))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Exact substring-duplication profile (the suffix-array dedup of
    // "Deduplicating Training Data Makes Language Models Better",
    // re-expressed Spark-shaped): 50-char windows every 10 chars; a
    // window whose text recurs in ≥2 distinct docs marks a duplicated
    // span. Stride-10 windows guarantee any shared substring of ≥59
    // chars is caught. Per doc: total windows, duplicated windows. At
    // corpus scale the windows group on xxhash64(chunk) (8-byte
    // shuffle keys); here they group on the chunk text itself so DuckDB
    // replays the exact computation — same algebra, oracle-checkable.
    // ONE window exchange (r15; guide §2.4): repartition by chunk, so
    // hash(chunk) satisfies both the (chunk, doc_id) occurrence
    // aggregation and the distinct-doc count window (one row per
    // (chunk, doc) ⇒ count(*) over the chunk partition IS
    // countDistinct(doc_id)) — the former derive-nd-then-join shape
    // shuffled the window stream twice more (the nd aggregation and
    // the join's probe side) for the identical per-doc counts.
    "dedup_substring" -> ((s, d) => {
      val wChunk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("chunk"))
      TextAnalysis.chunkFixed(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", step = 10, win = 50)
        .filter(length(col("chunk")) === 50)
        .repartition(col("chunk"))
        .groupBy(col("chunk"), col("doc_id"))
        .agg(count(lit(1)).as("graft_cnt"))
        .withColumn("nd", count(lit(1)).over(wChunk))
        .groupBy(col("doc_id"))
        .agg(sum(col("graft_cnt")).as("n_windows"),
          sum(when(col("nd") >= 2, col("graft_cnt")).otherwise(0L)).as("n_dup"))
        .orderBy(col("doc_id"))
    }),

    // Fixed-window chunking with overlap (256-char windows every 200):
    // the pretraining/RAG document slicer, as one generator projection.
    "text_chunk_overlap" -> ((s, d) =>
      TextAnalysis.chunkFixed(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", step = 200, win = 256)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Quality-weighted sampling: keep probability proportional to
    // document length (capped at 1) — the soft curation filter that
    // keeps long docs and thins short ones. The 52-bit md5 draw and the
    // weight comparison are exact doubles on both engines, so DuckDB
    // replays the exact sample.
    "sample_weighted" -> ((s, d) =>
      Sampling.weighted(
          t(s, d, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", least(lit(1.0), col("n_chars") / lit(800.0)))
        .orderBy(col("doc_id"))),

    // Per-group uniform sample without replacement: each source's 5
    // docs ranked by the md5 draw — the deterministic "random N per
    // domain" sampler; same salted two-phase window as the quota.
    "sample_group_uniform" -> ((s, d) =>
      Sampling.topNPerGroup(
          t(s, d, "documents").select(col("source"), col("doc_id")),
          Seq("source"),
          Seq(Sampling.hashHex(col("doc_id"), "grpsample").asc, col("doc_id").asc),
          n = 5, saltKeyCol = "doc_id")
        .orderBy(col("source"), col("rank"))),

    // Per-domain quota: keep each source's top-5 documents by length
    // (doc_id tie-break) — the per-domain cap of web-corpus curation.
    // Salted two-phase top-N (ops/Sampling.topNPerGroup) so one hot
    // domain never concentrates into a single task; the result and rank
    // are identical to the plain one-window ranking, which is the
    // oracle.
    "sample_domain_quota" -> ((s, d) =>
      Sampling.topNPerGroup(
          t(s, d, "documents").select(col("source"), col("doc_id"), col("n_chars")),
          Seq("source"), Seq(col("n_chars").desc, col("doc_id").asc),
          n = 5, saltKeyCol = "doc_id")
        .orderBy(col("source"), col("rank"))),

    // Temperature-resampled source mixture (α = 0.5): the LLM
    // data-mix op — sqrt-scaled source weights upweight small sources,
    // expected keep = 25% of the corpus. Rates broadcast; the exact
    // md5 draw makes DuckDB replay the exact sample.
    "sample_temperature" -> ((s, d) =>
      Sampling.temperatureMixture(
          t(s, d, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source", targetFrac = 0.25)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // Train/val/test split assignment, summarized per split.
    "sample_split_counts" -> ((s, d) =>
      Sampling.split(t(s, d, "documents"), "doc_id", valFrac = 0.1, testFrac = 0.1)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"))),

    // URL-keyed dedup (ops/UrlOps): the corpus has no URL column, so
    // each doc gets a deterministic crawl URL synthesized from
    // (source, doc_id) with exactly the noise canonicalization must
    // remove — uppercase scheme/host, www. prefix, default :443 port,
    // tracking params, fragment, trailing slash. doc_id % 200 keys real
    // duplicate groups per source. The oracle replays the synthesis AND
    // the canonicalization.
    "dedup_url" -> ((s, d) => {
      val withUrl = t(s, d, "documents").select(col("doc_id"),
        concat(lit("HTTPS://WWW."), col("source"),
          lit(":443/Articles/"), (col("doc_id") % 40).cast("string"),
          lit("/?utm_source=feed&id="), (col("doc_id") % 200).cast("string"),
          lit("&utm_campaign=c"), (col("doc_id") % 7).cast("string"),
          lit("#sec"), (col("doc_id") % 3).cast("string")).as("url"))
      UrlOps.dedupByUrl(withUrl, "doc_id", "url")
        .orderBy(col("canonical_url"))
    }),

    // Deterministic epoch ordering: the global shuffle + source
    // interleave a training run reads the corpus in. Rank within each
    // source by a seeded md5 draw (PARTITIONED window — no global
    // sort), then the epoch order interleaves sources rank-by-rank so
    // no source clumps. First 500 positions emitted via ORDER BY +
    // LIMIT = TakeOrderedAndProject: top-k per partition + driver
    // merge, never a full global sort — the only epoch-order plan that
    // survives 100 TB.
    "sample_epoch_order" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(Sampling.hashHex(col("doc_id"), "epoch1").asc, col("doc_id").asc)
      t(s, d, "documents").select(col("doc_id"), col("source"))
        .withColumn("rank_in_source", row_number().over(w))
        .orderBy(col("rank_in_source"),
          md5(concat_ws(":", lit("src"), col("source"))), col("doc_id"))
        .limit(500)
    }),

    // Exact length quantiles per language — the distribution summary a
    // curation dashboard tracks. Spark's exact `percentile` and
    // DuckDB's quantile_cont share the linear-interpolation definition.
    // One sorted pass computes all five quantiles (a single array-valued
    // agg), then the array is scalarized — the checker cannot compare
    // array-typed output columns.
    "text_length_quantiles" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(expr("percentile(length(text), array(0.25D, 0.5D, 0.75D, 0.9D, 0.99D))")
          .as("qs"))
        .select(col("lang"),
          element_at(col("qs"), 1).as("q25"),
          element_at(col("qs"), 2).as("q50"),
          element_at(col("qs"), 3).as("q75"),
          element_at(col("qs"), 4).as("q90"),
          element_at(col("qs"), 5).as("q99"))
        .orderBy(col("lang"))),

    // Repetition-ratio quality signal (1 − distinct/total 3-gram
    // shingles) — the boilerplate/spam filter axis.
    // Corpus-trained character-bigram LM score (ops/TextAnalysis
    // .charLmScore): the model-based quality signal next to the
    // heuristic text_quality — avg P(next char | char), no log (libm
    // rounding trap), decimal-exact accumulation.
    "text_charlm_score" -> ((s, d) =>
      TextAnalysis.charLmScore(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // CCNet-style LM-quality bucketing (Wenzek et al. 2020, "CCNet:
    // Extracting High Quality Monolingual Datasets from Web Crawl
    // Data", arXiv:1911.00359): score every document with the
    // corpus-trained LM (the paper's wiki-trained KenLM stands in as
    // the charlm), then split EACH LANGUAGE into head/middle/tail
    // terciles by model score — the head-only (or head+middle) cut is
    // the paper's quality filter. NTILE over (lang, score desc,
    // doc_id) is the standard-SQL tercile both engines compute
    // identically; the score itself is the exact decimal-summed avg_p.
    "text_ccnet_buckets" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // lang rides the scoring aggregation as a carried group column
      // (functionally dependent on doc_id) — no corpus join back to
      // the doc table (r15; guide §2.4)
      val scored = TextAnalysis.charLmScore(docs, "doc_id", "text",
        carryCols = Seq("lang"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("avg_p").desc, col("doc_id"))
      scored
        .withColumn("tercile", ntile(3).over(w))
        .select(col("doc_id"), col("lang"), col("avg_p"),
          when(col("tercile") === 1, "head")
            .when(col("tercile") === 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    }),

    "text_repetition" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.repetitionRatio(col("text"), 3).as("repetition"))
        .orderBy(col("doc_id"))),

    // Compression-ratio quality signal (Gopher: document
    // compressibility as the repetition/boilerplate proxy) —
    // per-source aggregate over the per-row native deflate_ratio
    // projection. No SQL oracle (DuckDB has no zlib function);
    // rows-only check + NativeExprsSpec invariant pins.
    "text_compression_ratio" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("source"),
          graft.functions.NativeExprs.deflateRatio(col("text")).as("ratio"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          avg(col("ratio")).as("avg_ratio"),
          sum((col("ratio") < 0.4).cast("long")).as("n_repetitive"))
        .orderBy(col("source"))),

    // PII redaction pass: the corpus has no real PII (synthetic word
    // soup), so each doc gets a deterministic contact block appended
    // (email + IP + phone derived from doc_id) and the scrubber must
    // mask all three — the oracle replays the synthesis AND the scrub.
    "text_pii_scrub" -> ((s, d) => {
      val contact = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"),
        lit(" call 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.scrubPii(contact).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // Corpus vocabulary heavy-hitters: document frequency + collection
    // frequency, top-50. The stopword/tokenizer-vocab feedback loop of
    // a curation pipeline — one token shuffle, partial aggs upstream.
    "text_vocab_topk" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok"))
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("cf"))
        .orderBy(col("df").desc, col("cf").desc, col("tok"))
        .limit(50)),

    // Unigram Shannon entropy per document
    // (ops/TextAnalysis.unigramEntropy): the vocabulary-diversity
    // quality signal — near-zero for one-token boilerplate, high for
    // diverse text. Fully oracle-checked (integer-argument detLn,
    // decimal-exact term sum).
    "text_unigram_entropy" -> ((s, d) =>
      TextAnalysis.unigramEntropy(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // BM25 top-k retrieval (ops/TextAnalysis.bm25TopK): rank the corpus
    // against a fixed keyword query — the retrieval/contamination-audit
    // primitive next to the embedding kNN family. Fully oracle-checked:
    // the idf's ln goes through the sqrt-reduced detLn kernel (only
    // IEEE-exact ops, so DuckDB replays it BITWISE), and per-term
    // scores sum as DECIMAL(18,12) like charlm.
    "text_bm25_topk" -> ((s, d) =>
      TextAnalysis.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Bm25Terms, 20)),

    // TF-IDF keyword extraction: the top-3 terms per document by
    // tf * ln(N/df) — the document-summarization / clustering-feature
    // primitive next to BM25's corpus ranking. ONE token exchange
    // (repartition by tok BEFORE the aggregation): hash(tok) satisfies
    // the (tok, doc_id) grouping AND the per-term df window, so tf and
    // df come out of the same exchange with no tok-side join at all —
    // the former tf ⋈ (tf→df ⋈ N) shape recomputed the token
    // aggregation three times and re-shuffled the postings per branch
    // (r15; guide §2.4). N comes from one cheap projection pass over
    // the corpus (docs with ≥1 token — exactly countDistinct(doc_id)
    // of the tf stream, replaying the tokenizer's emptiness rule).
    // idf through detLn (bitwise-replayable); per-doc ranking is a
    // window over posting-sized rows, never raw text.
    "text_tfidf_keywords" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val nn = docs.agg(sum(when(exists(split(lower(col("text")), " "),
        tk => tk =!= ""), 1L).otherwise(0L)).as("n"))
      val wTok = org.apache.spark.sql.expressions.Window
        .partitionBy(col("tok"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok"))
      docs
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .repartition(col("tok"))
        .groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("df", count(lit(1)).over(wTok))
        .crossJoin(broadcast(nn))
        .withColumn("score", col("tf").cast("double") *
          TextAnalysis.detLn(col("n").cast("double") / col("df").cast("double")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("tok"), col("score"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // BM25 index materialization (ops/Retrieval.buildBm25Index): the
    // build-once half of the retrieval serving pair — md5-bucketed
    // postings carrying doc lengths, terms, corpus stats. Output: one
    // summary row per write bucket, oracle-replayed (md5 bucketing is
    // engine-neutral).
    "bm25_index_build" -> ((s, d) => {
      val idx = bm25IndexPath(d)
      graft.ops.Retrieval.buildBm25Index(t(s, d, "documents"), "doc_id",
        "text", idx)
      s.read.parquet(s"$idx/postings")
        .groupBy(col("bucket"))
        .agg(countDistinct(col("tok")).as("n_terms"),
          count(lit(1)).as("n_postings"))
        .orderBy(col("bucket"))
    }),

    // BM25 served from the PERSISTED index: bucket-pruned postings scan
    // + broadcast idf, never the corpus text. Bitwise-identical to the
    // ad-hoc text_bm25_topk (same detLn idf, same decimal-exact sum) —
    // so it shares that query's full DuckDB oracle.
    "bm25_index_probe" -> ((s, d) => {
      val idx = bm25IndexPath(d)
      // corpus_stats is the LAST output of the build (driver-written
      // after both data writes) — its existence certifies a complete index
      if (!new java.io.File(s"$idx/corpus_stats").exists())
        graft.ops.Retrieval.buildBm25Index(t(s, d, "documents"), "doc_id",
          "text", idx)
      graft.ops.Retrieval.probeBm25Index(s, idx, Bm25Terms, 20)
    }),

    // Incremental index maintenance wired end to end: index the even
    // half of the corpus, FOLD the odd half in (postings append +
    // df/corpus re-aggregation, Retrieval.mergeBm25Index), probe the
    // merged index. Because df/N/token totals are additive over
    // disjoint doc sets, the merged probe equals the whole-corpus scan
    // bitwise — so this too shares text_bm25_topk's full oracle: the
    // incremental path is hash-verified, not just unit-pinned.
    "bm25_index_merge" -> ((s, d) => {
      // Bounded corpus (doc_id < 300, the ANN-twin convention): the
      // additivity being verified is per-row arithmetic, and the
      // bench shouldn't pay a triple full-table index build per round.
      val docs = t(s, d, "documents").filter(col("doc_id") < 300)
      // hexChars=1 (16 buckets): right-sized layout for the 300-doc
      // verification corpus — 256 near-empty partitioned-write files
      // were pure task overhead (the self-describing index records the
      // width; probe pruning adapts).
      //
      // The STANDING half (index the even docs) is built once per
      // (format, testdata) — that is the amortized part of the daily
      // operation. Each run then folds the odd batch into a FRESH COPY
      // (a driver-side file copy of a 16-bucket index; copying into
      // the standing dir would double-count df on the second run), so
      // the measured work is merge + probe: what one ingest batch
      // actually costs against a standing index.
      val base = idxPath("bm25_merge_base", d)
      if (!new java.io.File(s"$base/corpus_stats").exists())
        graft.ops.Retrieval.buildBm25Index(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", base, hexChars = 1)
      val idx = idxPath("bm25_merge", d)
      copyIndexDir(s, base, idx)
      graft.ops.Retrieval.mergeBm25Index(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", idx)
      graft.ops.Retrieval.probeBm25Index(s, idx, Bm25Terms, 20)
    }),

    // Hybrid retrieval (ops/Retrieval.hybridRrf): reciprocal-rank
    // fusion of the BM25 top-50 and the cosine top-50 vs anchor
    // vec_id=0 — the standard RAG lexical+dense serving composition.
    // Fully oracle-checked: ranks over already-bitwise scores, fusion
    // is one IEEE divide+add per list.
    "retrieval_hybrid_rrf" -> ((s, d) =>
      graft.ops.Retrieval.hybridRrf(t(s, d, "documents"),
        t(s, d, "embeddings"), Bm25Terms, anchorId = 0L,
        poolK = 50, k = 20)),

    // DSIR importance weights (Xie et al. 2023): hashed word-{1,2}gram
    // bucket models for a target slice (lang='en') vs the raw corpus,
    // per-doc mean importance ratio in the log-free integer-quantized
    // algebra — the data-mixing primitive. Fully oracle-checked
    // (DuckDB replays tokenization, hashing, both models, the ratio).
    "dsir_weights" -> ((s, d) =>
      TextAnalysis.dsirWeights(t(s, d, "documents"), "doc_id", "text",
          col("lang") === "en")
        .orderBy(col("doc_id"))),

    // The resampling step: deterministic top-k by importance weight
    // (the Gumbel-noise draw of the paper, replayed determinism-first
    // like every sampler here) — TakeOrderedAndProject, no global sort.
    "dsir_select" -> ((s, d) =>
      TextAnalysis.dsirWeights(t(s, d, "documents"), "doc_id", "text",
          col("lang") === "en")
        .orderBy(col("weight").desc, col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("weight"))),

    // Embedding near-dup CLUSTERS: the full story end to end — SRP-LSH
    // candidates (md5 planes, production 4×8-bit banding geometry),
    // decimal cosine >= 0.35 as edges, then connected components. Pairs
    // alone can't resolve transitive chains (A~B~C must dedup as one
    // group); this composes the two oracle-checked halves and the
    // oracle replays BOTH (srp pipeline + recursive-CTE min-label
    // propagation).
    "embed_dedup_clusters" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("vec_id") < 2000)
      val edges = Similarity.srpCandidatePairsMd5(emb, "vec_id", "embedding",
          bits = 32, dims = 64, bands = 4)
        .filter(col("cos_sim") >= 0.35)
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(emb.select(col("vec_id").as("id")), edges)
        .orderBy(col("id"))
    }),

    // BPE-training prep: adjacent character-pair frequencies weighted
    // by word frequency — iteration 1 of byte-pair-encoding tokenizer
    // training. The corpus collapses to the (tiny) vocabulary FIRST
    // (one token shuffle with map-side partial counts); all pair
    // explosion happens on vocab rows, never on the corpus — the only
    // layout that survives 100 TB.
    "text_bpe_pairs" -> ((s, d) => {
      val words = t(s, d, "documents")
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .filter(length(col("w")) >= 2)
      words
        .select(col("freq"), explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("pair"))
        .limit(20)
    }),

    // The persisted-index daily operation wired end to end: index the
    // standing corpus (even doc_ids) once, probe the ingest batch (odd
    // ids) against it — pair cost scales with the batch, never the
    // corpus. Rows-only (xxhash64 signatures) but deterministic; the
    // streaming face is Streams.minhashProbeStream (batch-parity
    // pinned in StreamsSpec).
    "dedup_index_probe" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val idx = idxPath("mh_idx", d)
      // build-once, probe-per-run (the bm25_index_probe convention):
      // the query measures the PROBE path; testdata is immutable, so a
      // standing index keyed by the sf dir is the serving reality.
      // Guard on _SUCCESS of the LAST-written output (shingles) — a
      // bare directory check would treat a killed half-finished build
      // as a valid standing index forever.
      if (!new java.io.File(s"$idx/shingles/_SUCCESS").exists())
        Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", idx)
      Dedup.probeMinhashIndex(docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", idx)
        .orderBy(col("new_id"), col("index_id"))
    }),

    // The dedup analog of bm25_index_merge, on the md5-twin index so
    // the WHOLE incremental path (build → merge → probe) is
    // hash-verified cross-engine: index a third of a bounded corpus,
    // FOLD the second third in (pure append — the index holds no
    // cross-document aggregate, so build(A);merge(B) ≡ build(A∪B)
    // row-for-row), probe the last third. Pairs share ≥8/16 md5
    // seed-minima (the dedup_components edge rule restricted to
    // new × indexed).
    "dedup_index_merge" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 600)
      val idx = idxPath("mh_md5_merge", d)
      Dedup.buildMinhashIndexMd5(docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", idx)
      Dedup.mergeMinhashIndexMd5(docs.filter(col("doc_id") % 3 === 1),
        "doc_id", "text", idx)
      Dedup.probeMinhashIndexMd5(docs.filter(col("doc_id") % 3 === 2),
        "doc_id", "text", idx)
        .orderBy(col("new_id"), col("index_id"))
    }),

    // The actual BPE training loop — 6 argmax-merge iterations over the
    // vocabulary (TextAnalysis.bpeTrain; text_bpe_pairs is iteration 1's
    // pair count). Oracle: the 6 steps unrolled as chained DuckDB CTEs
    // replaying the same wrap → pair-count → argmax → replace algebra.
    "text_bpe_train" -> ((s, d) =>
      TextAnalysis.bpeTrain(t(s, d, "documents"), "text", merges = 6)
        .orderBy(col("step"))),

    // BPE ENCODE with the trained merges — the tokenizer-application
    // half of the pipeline (train → encode → pack). The merge table is
    // model-sized driver state baked into a native expression
    // (NativeExprs.BpeEncodeWords): encoding is a pure per-row
    // projection, zero shuffle, per-task word memoization. Output per
    // doc: token count + md5 over the encoded-word stream, both
    // replayed exactly by the DuckDB oracle's replace-chain encode.
    "text_bpe_encode" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val merges = TextAnalysis.bpeTrain(docs, "text", merges = 6)
        .orderBy(col("step")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq   // ≤ 6 rows
      docs
        .select(col("doc_id"),
          graft.functions.NativeExprs.bpeEncodeWords(lower(col("text")), merges)
            .as("enc"))
        .select(col("doc_id"), col("enc"),
          concat_ws("|", col("enc")).as("j"))
        // symbols per word = internal '><' count + 1 → total tokens =
        // '><' occurrences + word count (pure codegen string arithmetic)
        .select(col("doc_id"),
          (((length(col("j")) - length(expr("replace(j, '><', '')"))) / 2)
            + size(col("enc"))).cast("long").as("n_tokens"),
          md5(col("j")).as("enc_md5"))
        .orderBy(col("doc_id"))
    }),

    // PQ index materialization: codebook train + whole-corpus m-code
    // encode, persisted (Similarity.buildPqIndex) — the build-once half
    // of the PQ serving pair. Output: one deterministic md5 per
    // (sub, cent_id) codebook entry (training is bit-deterministic:
    // hash-ordered seeds + decimal means). Rows-only.
    "pq_index_build" -> ((s, d) => {
      val idx = pqIndexPath(d)
      Similarity.buildPqIndex(t(s, d, "embeddings"), "vec_id", "embedding", idx)
        .select(col("sub"), col("cent_id"),
          md5(concat_ws(",", transform(col("cent_vec"), x => x.cast("string"))))
            .as("cent_md5"))
        .orderBy(col("sub"), col("cent_id"))
    }),

    // Product-quantized ANN, served from the PERSISTED index: the probe
    // reads codebooks (model-sized, driver) + the 8-byte-per-vector
    // codes table and never touches the float corpus — training left
    // the query path (build-if-absent keeps the pair order-independent;
    // pq_index_build always rebuilds). Rows-only (float k-means has no
    // cross-engine oracle) but bit-identical to the train-inline
    // Similarity.pqTopK (SimilaritySpec pins probe ≡ inline); recall
    // vs brute force pinned over 50 anchors in SimilaritySpec.
    "embed_pq_topk" -> ((s, d) => {
      val idx = pqIndexPath(d)
      val emb = t(s, d, "embeddings")
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$idx/codes/_SUCCESS")))
        Similarity.buildPqIndex(emb, "vec_id", "embedding", idx)
      val anchor = emb.filter(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0)
      Similarity.pqTopKIndexed(s, idx, "vec_id", anchor, k = 10,
        excludeId = Some(0L))
    }),

    // Batch kNN: all 5 anchors answered in ONE corpus pass with
    // two-phase salted top-k (see Similarity.cosineTopKBatch) — the
    // embedding-serving shape, oracle-checked end to end.
    "embed_knn_batch" -> ((s, d) =>
      Similarity.cosineTopKBatch(t(s, d, "embeddings"), "vec_id", "embedding",
        nAnchors = 5, k = 10)),

    // Fixed-budget sequence packing per language shard: the batch
    // assignment step before training-data serialization.
    "pack_sequences" -> ((s, d) =>
      Sampling.packSequences(
          t(s, d, "documents").select(col("doc_id"), col("lang"),
            TextAnalysis.bpeishTokenCount(col("text")).as("n_tokens")),
          "lang", "doc_id", "n_tokens", budget = 2048L)
        .orderBy(col("doc_id"))),

    // Z-order curve values (ops/Layout.zorderValue): the clustering key
    // behind multi-dimensional data skipping (Delta/Iceberg ZORDER BY).
    // The curve itself is oracle-checked — zorderSql emits the identical
    // bit arithmetic in DuckDB SQL; zorderLayout's skipping effect is
    // pinned in LayoutSpec.
    "layout_zorder" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Layout.zorderValue(
            Seq(col("n_chars") % 4096, col("doc_id") % 4096), 12).as("z"))
        .orderBy(col("z"), col("doc_id"))),

    // The composed curation pipeline as ONE declarative plan: exact-dedup
    // canonical ∧ repetition below threshold ∧ not benchmark-contaminated,
    // emitting the kept corpus. Each stage is an oracle-verified operator;
    // this query proves they COMPOSE (Catalyst fuses the semi/anti joins
    // and projections into one pipeline — no materialization between
    // stages, which is the point at 100 TB).
    "curation_keep" -> ((s, d) => curationKept(s, d)),

    // The COMPOSED pipeline a pretraining run actually executes, as
    // one declarative chain: survivors of dedup ∧ decontamination ∧
    // repetition (curation_keep) → DSIR importance top-200 (the
    // data-mixing step) → deterministic epoch ordering (per-source
    // hash rank + source-interleaved output). Fully oracle-checked by
    // chaining the three replay fragments.
    "curation_mix" -> ((s, d) => {
      // DSIR weight scored in place (a pure per-row projection over
      // the driver-held model) and CARRIED through the survivorship
      // pipeline — the former curationKept ⋈ dsirWeights corpus
      // self-join on doc_id is gone (r15; guide §2.4); the model still
      // trains on the full corpus, so every weight is unchanged
      val scored = TextAnalysis.dsirWeights(t(s, d, "documents"),
        "doc_id", "text", col("lang") === "en",
        carryCols = Seq("lang", "source", "text"))
      val sel = curationKeptFrom(scored, Seq("doc_id", "source", "weight"))
        .orderBy(col("weight").desc, col("doc_id"))
        .limit(200)
        .select(col("doc_id"), col("source"), col("weight"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(Sampling.hashHex(col("doc_id"), "epoch1").asc, col("doc_id").asc)
      sel.withColumn("rank_in_source", row_number().over(win))
        .orderBy(col("rank_in_source"),
          md5(concat_ws(":", lit("src"), col("source"))), col("doc_id"))
    }),

    // Multimodal: each document rendered into a REAL blob (PNG for
    // even text lengths, WAV for odd — ops/codecs), then the metadata
    // is decoded back OUT of the bytes (PNG IHDR walk / WAV fmt+data
    // parse). Dims are deterministic in (doc_id, length), so the
    // decode is oracle-checked by arithmetic: a one-byte encoder or
    // parser drift fails the hash compare.
    "mm_blob_meta" -> ((s, d) =>
      Multimodal.withBlobAndMeta(t(s, d, "documents"))
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.n_samples").as("n_samples"))
        .orderBy(col("doc_id"))),

    // Audio-frame windowing plan (ops/Multimodal.audioWindows): window
    // offsets computed from the DECODED metadata column alone —
    // payload bytes are parsed once at ingest and never re-touched.
    "mm_audio_windows" -> ((s, d) =>
      Multimodal.audioWindows(
          Multimodal.withBlobAndMeta(t(s, d, "documents")), "doc_id")
        .orderBy(col("doc_id"), col("window_idx"))),

    // Frame sampling: every 256th decoded value (pixel subsample / PCM
    // decimation); the count per doc is oracle-checked.
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(Multimodal.withBlobAndMeta(t(s, d, "documents")))
        .select(col("doc_id"), size(col("frames")).as("n_frames"))
        .orderBy(col("doc_id"))),

    // Partition-batched FULL decode — zlib inflate + unfilter every
    // PNG, PCM-parse every WAV — checksummed against the arithmetic
    // oracle. The strongest codec check: every decoded value feeds the
    // hash-compared sum.
    "mm_decode_batch" -> ((s, d) =>
      Multimodal.decodeBatch(
          Multimodal.withBlobAndMeta(t(s, d, "documents"))
            .select(col("doc_id"), col("payload")))
        .select(col("doc_id"), col("format"), col("n_values"),
          col("decoded_checksum"))
        .orderBy(col("doc_id"))),

    // NN image resize to 16×12 over the REAL decoded PNGs — the resize
    // grid is pure integer arithmetic (sx = x*w div ow), so the DuckDB
    // oracle replays the resized checksum value-for-value without a
    // codec. WAV rows drop out (image op).
    "mm_resize_batch" -> ((s, d) =>
      Multimodal.resizeBatch(
          Multimodal.withBlobAndMeta(t(s, d, "documents"))
            .select(col("doc_id"), col("payload")), ow = 16, oh = 12)
        .filter(col("resized_checksum").isNotNull)
        .select(col("doc_id"), col("resized_w"), col("resized_h"),
          col("resized_checksum"))
        .orderBy(col("doc_id")))
  )

  /** Format version baked into every standing-index path. Bump it when
    * the on-disk layout, shingle/signature hashing, or bucket scheme of
    * ANY persisted index changes: a standing index in java.io.tmpdir
    * outlives the JVM, and a layout change without a path change would
    * make probes silently read a stale-format index (the v1 paths had
    * exactly that hazard). v2: BM25 terms/ bucketed like postings/. */
  // v3: MinHash indexes now carry a _graft_layout parameter file that
  // merge/probe require (r13) — pre-layout standing indexes must not
  // be reused
  private val IndexFormatVersion = "v3"

  /** Session-stable location of a persisted index for a data dir: the
    * build query writes it, the probe query reads it (building first if
    * this JVM hasn't yet — the data under `d` is immutable for the life
    * of a test/bench session, so the cache key is (format, dir)). */
  private def idxPath(kind: String, d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_${IndexFormatVersion}_${d.hashCode}"

  /** Replace `dst` with a fresh copy of the (small, verification-sized)
    * index at `src` — driver-side, no Spark job. Used by the merge
    * queries so each run folds its batch into a pristine standing
    * index instead of double-counting into last run's merged one.
    *
    * Files HARDLINK instead of copying bytes (both trees live on the
    * same local filesystem): the merge only ever appends new files,
    * swaps whole bucket directories, or delete-then-recreates the
    * stats file — never writes into an existing file — so shared
    * inodes are safe, and the per-run clone cost drops from a full
    * byte copy to directory metadata. Falls back to a plain copy per
    * file (non-local FS, cross-device). */
  private def copyIndexDir(s: org.apache.spark.sql.SparkSession,
      src: String, dst: String): Unit = {
    val conf = s.sessionState.newHadoopConf()
    val sp = new org.apache.hadoop.fs.Path(src)
    val dp = new org.apache.hadoop.fs.Path(dst)
    val fs = dp.getFileSystem(conf)
    fs.delete(dp, true)
    val srcDir = java.nio.file.Paths.get(src)
    val dstDir = java.nio.file.Paths.get(dst)
    try {
      val walk = java.nio.file.Files.walk(srcDir)
      try {
        val it = walk.iterator()
        while (it.hasNext) {
          val p = it.next()
          val q = dstDir.resolve(srcDir.relativize(p))
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(q)
          else
            try java.nio.file.Files.createLink(q, p)
            catch { case _: UnsupportedOperationException |
                         _: java.nio.file.FileSystemException =>
              java.nio.file.Files.copy(p, q)
            }
        }
      } finally walk.close()
    } catch {
      case _: java.io.IOException =>
        // non-NIO-reachable FS: the original byte copy
        fs.delete(dp, true)
        if (!org.apache.hadoop.fs.FileUtil.copy(fs, sp, fs, dp, false, conf))
          throw new java.io.IOException(s"copy $src -> $dst failed")
    }
  }

  private def pqIndexPath(d: String): String = idxPath("pq_idx", d)

  /** Same build-once contract as pqIndexPath, for the BM25 index. */
  private def bm25IndexPath(d: String): String = idxPath("bm25_idx", d)

  private val sqlToks =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
  private val stopList = TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")

  /** DuckDB replay of [[graft.ops.TextAnalysis.bpeTrain]]: the k merge
    * steps unrolled as chained CTEs — step i counts pairs over w(i-1),
    * b(i) is the argmax (freq desc, pair asc — ASCII order on both
    * engines), w(i) applies the merge as the same token-boundary-exact
    * replace (`replace(pair, '><', '')` turns `<l><l>` into `<ll>`). */
  /** The shared train chain: w0 (wrapped vocab) plus k unrolled
    * pair-count → argmax → replace steps, yielding scalars b1..bk and
    * vocab states w1..wk. Used by both the train and encode oracles. */
  private def bpeChainSteps(k: Int): String =
    (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS freq FROM (
         |    SELECT freq, '<' || toks[i] || '><' || toks[i + 1] || '>' AS pair FROM (
         |      SELECT freq, toks, unnest(generate_series(1, len(toks) - 1)) AS i
         |      FROM (SELECT freq, string_split(substring(w, 2, length(w) - 2), '><') AS toks
         |            FROM w${i - 1})))
         |  GROUP BY pair),
         |b$i AS (SELECT pair, freq FROM p$i ORDER BY freq DESC, pair LIMIT 1),
         |w$i AS (SELECT replace(w, (SELECT pair FROM b$i),
         |    (SELECT replace(pair, '><', '') FROM b$i)) AS w, freq FROM w${i - 1})""".stripMargin
    }.mkString(",\n")

  private def bpeTrainOracle(k: Int): String = {
    val steps = bpeChainSteps(k)
    val rows = (1 to k).map { i =>
      s"""SELECT $i AS step,
         |  regexp_extract(pair, '^<([a-z0-9]+)><', 1) AS "left",
         |  regexp_extract(pair, '><([a-z0-9]+)>$$', 1) AS "right", freq FROM b$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH w0 AS (
       |  SELECT regexp_replace(tok, '(.)', '<\\1>', 'g') AS w,
       |    CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
       |  WHERE regexp_full_match(tok, '[a-z0-9]+')
       |  GROUP BY 1),
       |$steps
       |SELECT * FROM (
       |$rows
       |) ORDER BY step""".stripMargin
  }

  /** Encode oracle: train (same chain), then replay the merge replaces
    * over each DISTINCT word (e0..ek carry the original token), zip
    * doc words with positions (DuckDB parallel unnest), join the
    * encoding, and aggregate per doc. LEFT JOIN keeps wordless docs
    * (md5('') / 0, matching Spark's empty-array concat_ws). */
  private def bpeEncodeOracle(k: Int): String = {
    val steps = bpeChainSteps(k)
    val encSteps = (1 to k).map { i =>
      s"""e$i AS (SELECT tok, replace(w, (SELECT pair FROM b$i),
         |    (SELECT replace(pair, '><', '') FROM b$i)) AS w FROM e${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT regexp_replace(tok, '(.)', '<\\1>', 'g') AS w,
       |    CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
       |  WHERE regexp_full_match(tok, '[a-z0-9]+')
       |  GROUP BY 1),
       |$steps,
       |e0 AS (
       |  SELECT DISTINCT tok, regexp_replace(tok, '(.)', '<\\1>', 'g') AS w
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
       |  WHERE regexp_full_match(tok, '[a-z0-9]+')),
       |$encSteps,
       |dw AS (
       |  SELECT doc_id,
       |    unnest(string_split(lower(text), ' ')) AS tok,
       |    unnest(generate_series(1, len(string_split(lower(text), ' ')))) AS pos
       |  FROM documents),
       |agg AS (
       |  SELECT d.doc_id,
       |    CAST(SUM(len(string_split(substring(e.w, 2, length(e.w) - 2), '><'))) AS BIGINT)
       |      AS n_tokens,
       |    string_agg(e.w, '|' ORDER BY d.pos) AS js
       |  FROM dw d JOIN e$k e USING (tok)
       |  GROUP BY d.doc_id)
       |SELECT doc_id,
       |  CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
       |  md5(COALESCE(js, '')) AS enc_md5
       |FROM documents LEFT JOIN agg USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared DSIR replay (dsir_weights; dsir_select wraps it): word
    * {1,2}-gram features over filtered split tokens, 4-nibble md5
    * bucket % 1024, add-one smoothed target/raw bucket models, the
    * three-division double ratio quantized to BIGINT. Expression
    * shapes mirror ops/TextAnalysis.dsirWeights operation-for-
    * operation so every IEEE rounding step coincides. */
  private val dsirOracleSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
      |  FROM documents),
      |bi0 AS (
      |  SELECT doc_id, lang, l,
      |    unnest(generate_series(1, len(l) - 1)) AS i
      |  FROM tok),
      |feats AS (
      |  SELECT doc_id, lang, unnest(l) AS f FROM tok
      |  UNION ALL
      |  SELECT doc_id, lang, l[i] || ' ' || l[i + 1] AS f FROM bi0),
      |fb AS (
      |  SELECT doc_id, lang,
      |    ((strpos('0123456789abcdef', substr(md5(f), 1, 1)) - 1) * 4096
      |     + (strpos('0123456789abcdef', substr(md5(f), 2, 1)) - 1) * 256
      |     + (strpos('0123456789abcdef', substr(md5(f), 3, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(md5(f), 4, 1)) - 1)) % 1024 AS b
      |  FROM feats),
      |cnt AS (
      |  SELECT b, COUNT(*) AS cr,
      |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
      |  FROM fb GROUP BY b),
      |tots AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM cnt),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(floor(((CAST(ct + 1 AS DOUBLE) / CAST(nt + 1024 AS DOUBLE))
      |      / (CAST(cr + 1 AS DOUBLE) / CAST(nr + 1024 AS DOUBLE)))
      |      * 1e12 + 0.5) AS BIGINT) AS q
      |  FROM fb JOIN cnt USING (b), tots),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_features,
      |    CAST(SUM(q) AS BIGINT) AS sum_q
      |  FROM scored GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(a.n_features, 0) AS BIGINT) AS n_features,
      |  a.sum_q,
      |  CAST(a.sum_q AS DOUBLE) / CAST(a.n_features AS DOUBLE) / 1e12 AS weight
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** curation_keep's DuckDB replay (also chained inside the
    * curation_mix oracle). */
  private val curationKeepSql: String =
    """WITH canon AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |      row_number() OVER (PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |lst AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(l[i:i+2], ' ')
        |                   for i in range(1, greatest(len(l)-2, 1)+1)]) AS sh,
        |    greatest(len(l)-2, 1) AS total
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS l
        |        FROM documents)),
        |ev AS (
        |  SELECT list_distinct(flatten(list(sh))) AS evs FROM lst WHERE doc_id < 10),
        |contaminated AS (
        |  SELECT l.doc_id
        |  FROM lst l, ev
        |  WHERE l.doc_id >= 10
        |    AND CAST(len(list_intersect(l.sh, ev.evs)) AS DOUBLE)
        |        / CAST(len(l.sh) AS DOUBLE) >= 0.08),
        |rep AS (
        |  SELECT doc_id,
        |    1.0 - CAST(len(sh) AS DOUBLE) / CAST(total AS DOUBLE) AS r
        |  FROM lst)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d
        |JOIN canon ON d.doc_id = canon.doc_id
        |LEFT JOIN contaminated ON d.doc_id = contaminated.doc_id
        |JOIN rep ON d.doc_id = rep.doc_id
        |WHERE contaminated.doc_id IS NULL AND d.doc_id >= 10 AND rep.r < 0.05
        |ORDER BY d.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // Same synthesis, same three regexes (Java regex and RE2 agree on
    // this restricted syntax), same placeholder order.
    "text_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
        |         || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |         || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_vocab_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents)
        |SELECT tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf
        |FROM tok WHERE tok <> ''
        |GROUP BY tok
        |ORDER BY df DESC, cf DESC, tok
        |LIMIT 50""".stripMargin,

    // Entropy replay: c·ln(c) terms through the staged 20-sqrt detLn
    // (integer arguments — the kernel's best-accuracy regime), summed
    // as DECIMAL(18,12), H = ln T − Σ/T assembled in double exactly
    // like the Spark side.
    "text_unigram_entropy" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, tok, COUNT(*) AS c FROM tok WHERE tok <> ''
         |  GROUP BY doc_id, tok),
         |t0 AS (
         |  SELECT doc_id, c, ${sqlSqrt20("CAST(c AS DOUBLE)")} - 1.0 AS tt
         |  FROM tf),
         |t1 AS (
         |  SELECT doc_id, c,
         |    (tt - tt*tt/2.0 + tt*tt*tt/3.0) * 1048576.0 AS lnc
         |  FROM t0),
         |e AS (
         |  SELECT doc_id, SUM(c) AS n_tokens,
         |    SUM(CAST(CAST(c AS DOUBLE) * lnc AS DECIMAL(38,12))) AS s
         |  FROM t1 GROUP BY doc_id),
         |e2 AS (
         |  SELECT doc_id, n_tokens, s,
         |    ${sqlSqrt20("CAST(n_tokens AS DOUBLE)")} - 1.0 AS tt
         |  FROM e)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  (tt - tt*tt/2.0 + tt*tt*tt/3.0) * 1048576.0
         |    - CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS entropy
         |FROM e2 ORDER BY doc_id""".stripMargin,

    // BM25 replay: generated from the SAME Bm25Terms as the Spark side
    // (see bm25OracleSql) — bitwise detLn, decimal-exact term addition.
    "text_bm25_topk" -> bm25OracleSql,

    // The persisted-index probe returns the identical top-20 (bitwise
    // scores), so it shares the ad-hoc query's oracle; the merged
    // (build-even + fold-odd) index probes identically because
    // df/N/token totals are additive over disjoint doc sets.
    "bm25_index_probe" -> bm25OracleSql,
    "retrieval_hybrid_rrf" -> hybridRrfOracleSql,
    "bm25_index_merge" -> bm25OracleSqlOver(
      "(SELECT * FROM documents WHERE doc_id < 300)"),

    // TF-IDF replay: same tf/df/N aggregation, idf's ln through the
    // staged sqrt-reduction (bitwise), same tie order (score desc, tok).
    "text_tfidf_keywords" ->
      s"""WITH tok0 AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents),
         |tok AS (SELECT doc_id, tok FROM tok0 WHERE tok <> ''),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok
         |       GROUP BY doc_id, tok),
         |dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         |nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
         |r AS (SELECT tok,
         |  ${sqlSqrt20("(CAST(n AS DOUBLE) / CAST(df AS DOUBLE))")} AS r
         |  FROM dft, nn),
         |t2 AS (SELECT tok, r - 1.0 AS tt FROM r),
         |idf AS (SELECT tok,
         |  (tt - tt*tt/2.0 + tt*tt*tt/3.0) * 1048576.0 AS idf FROM t2),
         |scored AS (
         |  SELECT tf.doc_id, tf.tok,
         |    CAST(tf.tf AS DOUBLE) * idf.idf AS score
         |  FROM tf JOIN idf USING (tok)),
         |ranked AS (
         |  SELECT doc_id, tok, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |                       ORDER BY score DESC, tok) AS rnk
         |  FROM scored)
         |SELECT doc_id, rnk, tok, score FROM ranked WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin,

    // Index-build replay: same (tok, doc_id) aggregation, same
    // 'b'+md5-prefix bucket assignment.
    "bm25_index_build" ->
      """WITH tok0 AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT tok, doc_id FROM tok0 WHERE tok <> ''
        |       GROUP BY tok, doc_id)
        |SELECT 'b' || substr(md5(tok), 1, 2) AS bucket,
        |  COUNT(DISTINCT tok) AS n_terms, COUNT(*) AS n_postings
        |FROM tf GROUP BY bucket ORDER BY bucket""".stripMargin,

    // DSIR replay: same tokenization (split + filter), same word
    // {1,2}-gram features, same 4-nibble md5 bucket, same smoothed
    // ratio as THREE double divisions in the same order, same
    // floor(rho*1e12 + 0.5) BIGINT quantization.
    "dsir_weights" -> dsirOracleSql,

    "dsir_select" ->
      s"""WITH w AS ($dsirOracleSql)
         |SELECT doc_id, weight FROM w
         |ORDER BY weight DESC, doc_id LIMIT 100""".stripMargin,

    // SemDeDup replay: md5-seeded clusters (same quantizer CTEs as the
    // IVF twins), within-cluster pair join bounded to clusters of
    // 2..1000 members, quantized-dot cosine >= 0.4 marks the higher id
    // a duplicate.
    "embed_semdedup" ->
      """WITH s AS (SELECT unnest(generate_series(1, 64)) AS i),
        |vd AS (
        |  SELECT e.vec_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(e.embedding[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dd
        |  FROM embeddings e, s GROUP BY e.vec_id),
        |cents AS (
        |  SELECT e.vec_id AS cent_id, e.embedding AS cv, vd.dd AS cdd
        |  FROM embeddings e JOIN vd USING (vec_id)
        |  ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id LIMIT 40),
        |qd AS (
        |  SELECT e.vec_id, c.cent_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(c.cv[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS qdot
        |  FROM embeddings e, cents c, s
        |  GROUP BY e.vec_id, c.cent_id),
        |scored AS (
        |  SELECT qd.vec_id, qd.cent_id, qd.qdot / sqrt(vd.dd * c.cdd) AS cos
        |  FROM qd JOIN vd USING (vec_id) JOIN cents c ON qd.cent_id = c.cent_id),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        |    FROM scored) WHERE rn = 1),
        |sized AS (
        |  SELECT cell_id FROM assign GROUP BY cell_id
        |  HAVING COUNT(*) BETWEEN 2 AND 1000),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM assign a JOIN sized USING (cell_id)
        |       JOIN assign b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id),
        |pdot AS (
        |  SELECT p.id_a, p.id_b,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[s.i] AS DOUBLE)*CAST(eb.embedding[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS qdot
        |  FROM pairs p
        |    JOIN embeddings ea ON ea.vec_id = p.id_a
        |    JOIN embeddings eb ON eb.vec_id = p.id_b, s
        |  GROUP BY p.id_a, p.id_b),
        |dups AS (
        |  SELECT DISTINCT pd.id_b AS vec_id
        |  FROM pdot pd
        |    JOIN vd va ON va.vec_id = pd.id_a
        |    JOIN vd vb ON vb.vec_id = pd.id_b
        |  WHERE pd.qdot / sqrt(va.dd * vb.dd) >= 0.4)
        |SELECT a.vec_id, a.cell_id, (d.vec_id IS NOT NULL) AS is_dup
        |FROM assign a LEFT JOIN dups d ON d.vec_id = a.vec_id
        |ORDER BY a.vec_id""".stripMargin,

    // Full IVF replay: md5-ordered seed quantizer, quantized-dot
    // cosine assignment (argmax = row_number over cos DESC, cent_id —
    // the SQL spelling of Spark's max(struct(cos, -cent_id))), probe
    // cells from the anchor's own scored rows, in-cell top-k.
    "embed_ivf_topk_md5" ->
      """WITH s AS (SELECT unnest(generate_series(1, 64)) AS i),
        |vd AS (
        |  SELECT e.vec_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(e.embedding[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dd
        |  FROM embeddings e, s GROUP BY e.vec_id),
        |cents AS (
        |  SELECT e.vec_id AS cent_id, e.embedding AS cv, vd.dd AS cdd
        |  FROM embeddings e JOIN vd USING (vec_id)
        |  ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id LIMIT 40),
        |qd AS (
        |  SELECT e.vec_id, c.cent_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(c.cv[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS qdot
        |  FROM embeddings e, cents c, s
        |  GROUP BY e.vec_id, c.cent_id),
        |scored AS (
        |  SELECT qd.vec_id, qd.cent_id, qd.qdot / sqrt(vd.dd * c.cdd) AS cos
        |  FROM qd JOIN vd USING (vec_id) JOIN cents c ON qd.cent_id = c.cent_id),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        |    FROM scored) WHERE rn = 1),
        |probe AS (
        |  SELECT cent_id AS cell_id FROM scored WHERE vec_id = 0
        |  ORDER BY cos DESC, cent_id LIMIT 2),
        |anch AS (
        |  SELECT e.embedding AS av, vd.dd AS a_dd
        |  FROM embeddings e JOIN vd USING (vec_id) WHERE e.vec_id = 0),
        |adot AS (
        |  SELECT e.vec_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(an.av[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS qdot
        |  FROM embeddings e, anch an, s GROUP BY e.vec_id)
        |SELECT a.vec_id, ad.qdot / sqrt(vd.dd * an.a_dd) AS cos_sim
        |FROM assign a
        |  JOIN probe USING (cell_id)
        |  JOIN adot ad ON ad.vec_id = a.vec_id
        |  JOIN vd ON vd.vec_id = a.vec_id, anch an
        |WHERE a.vec_id <> 0
        |ORDER BY cos_sim DESC, a.vec_id LIMIT 10""".stripMargin,

    // Merged-index replay: the embed_ivf_topk_md5 arithmetic with the
    // seed pool restricted to the even half (the standing index's
    // quantizer) — assignment over the WHOLE corpus against those
    // centroids IS the post-merge cell state, so this one query
    // hash-verifies build + incremental fold + probe.
    "embed_ivf_merge" ->
      """WITH emb AS (SELECT * FROM embeddings WHERE vec_id < 2000),
        |s AS (SELECT unnest(generate_series(1, 64)) AS i),
        |vd AS (
        |  SELECT e.vec_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(e.embedding[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dd
        |  FROM emb e, s GROUP BY e.vec_id),
        |cents AS (
        |  SELECT e.vec_id AS cent_id, e.embedding AS cv, vd.dd AS cdd
        |  FROM emb e JOIN vd USING (vec_id)
        |  WHERE e.vec_id % 2 = 0
        |  ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id LIMIT 40),
        |qd AS (
        |  SELECT e.vec_id, c.cent_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(c.cv[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS qdot
        |  FROM emb e, cents c, s
        |  GROUP BY e.vec_id, c.cent_id),
        |scored AS (
        |  SELECT qd.vec_id, qd.cent_id, qd.qdot / sqrt(vd.dd * c.cdd) AS cos
        |  FROM qd JOIN vd USING (vec_id) JOIN cents c ON qd.cent_id = c.cent_id),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        |    FROM scored) WHERE rn = 1),
        |probe AS (
        |  SELECT cent_id AS cell_id FROM scored WHERE vec_id = 0
        |  ORDER BY cos DESC, cent_id LIMIT 2),
        |anch AS (
        |  SELECT e.embedding AS av, vd.dd AS a_dd
        |  FROM emb e JOIN vd USING (vec_id) WHERE e.vec_id = 0),
        |adot AS (
        |  SELECT e.vec_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(an.av[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS qdot
        |  FROM emb e, anch an, s GROUP BY e.vec_id)
        |SELECT a.vec_id, ad.qdot / sqrt(vd.dd * an.a_dd) AS cos_sim
        |FROM assign a
        |  JOIN probe USING (cell_id)
        |  JOIN adot ad ON ad.vec_id = a.vec_id
        |  JOIN vd ON vd.vec_id = a.vec_id, anch an
        |WHERE a.vec_id <> 0
        |ORDER BY cos_sim DESC, a.vec_id LIMIT 10""".stripMargin,

    // The k-means twin: seeds → assignment → ONE integer-quantized
    // Lloyd mean update (sum of floor(x*1e7 + 0.5) as BIGINT per
    // (cell, dim), divided back, rounded to FLOAT) → re-scored
    // assignment/probe/top-k. Verifies the distributed mean update.
    "embed_ivf_kmeans_md5" ->
      """WITH s AS (SELECT unnest(generate_series(1, 64)) AS i),
        |vd AS (
        |  SELECT e.vec_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(e.embedding[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dd
        |  FROM embeddings e, s GROUP BY e.vec_id),
        |cents AS (
        |  SELECT e.vec_id AS cent_id, e.embedding AS cv, vd.dd AS cdd
        |  FROM embeddings e JOIN vd USING (vec_id)
        |  ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id LIMIT 40),
        |qd0 AS (
        |  SELECT e.vec_id, c.cent_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(c.cv[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS qdot
        |  FROM embeddings e, cents c, s
        |  GROUP BY e.vec_id, c.cent_id),
        |sc0 AS (
        |  SELECT qd0.vec_id, qd0.cent_id, qd0.qdot / sqrt(vd.dd * c.cdd) AS cos
        |  FROM qd0 JOIN vd USING (vec_id) JOIN cents c ON qd0.cent_id = c.cent_id),
        |asg0 AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        |    FROM sc0) WHERE rn = 1),
        |means AS (
        |  SELECT a.cell_id, s.i,
        |    CAST((CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE)) / 1e7 AS FLOAT) AS m
        |  FROM asg0 a JOIN embeddings e ON e.vec_id = a.vec_id, s
        |  GROUP BY a.cell_id, s.i),
        |cdd1 AS (
        |  SELECT cell_id,
        |    CAST(SUM(CAST(floor(CAST(m AS DOUBLE)*CAST(m AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS cdd
        |  FROM means GROUP BY cell_id),
        |qd1 AS (
        |  SELECT e.vec_id, mn.cell_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[mn.i] AS DOUBLE)*CAST(mn.m AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS qdot
        |  FROM embeddings e, means mn
        |  GROUP BY e.vec_id, mn.cell_id),
        |sc1 AS (
        |  SELECT qd1.vec_id, qd1.cell_id AS cent_id, qd1.qdot / sqrt(vd.dd * c.cdd) AS cos
        |  FROM qd1 JOIN vd USING (vec_id) JOIN cdd1 c ON c.cell_id = qd1.cell_id),
        |asg1 AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        |    FROM sc1) WHERE rn = 1),
        |probe AS (
        |  SELECT cent_id AS cell_id FROM sc1 WHERE vec_id = 0
        |  ORDER BY cos DESC, cent_id LIMIT 2),
        |anch AS (
        |  SELECT e.embedding AS av, vd.dd AS a_dd
        |  FROM embeddings e JOIN vd USING (vec_id) WHERE e.vec_id = 0),
        |adot AS (
        |  SELECT e.vec_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(an.av[s.i] AS DOUBLE)*1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS qdot
        |  FROM embeddings e, anch an, s GROUP BY e.vec_id)
        |SELECT a.vec_id, ad.qdot / sqrt(vd.dd * an.a_dd) AS cos_sim
        |FROM asg1 a
        |  JOIN probe USING (cell_id)
        |  JOIN adot ad ON ad.vec_id = a.vec_id
        |  JOIN vd ON vd.vec_id = a.vec_id, anch an
        |WHERE a.vec_id <> 0
        |ORDER BY cos_sim DESC, a.vec_id LIMIT 10""".stripMargin,

    // PQ twin replay: every distance is the integer-quantized L2
    // Σ floor((x−c)²·1e12 + 0.5) — argmin ties break on code id; the
    // Lloyd mean uses the same 1e7 quantization as the IVF k-means
    // twin; ADC scores are exact BIGINT sums.
    "embed_pq_topk_md5" ->
      """WITH sb AS (SELECT unnest(generate_series(0, 7)) AS sub),
        |js AS (SELECT unnest(generate_series(1, 8)) AS j),
        |seeds AS (
        |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |d0 AS (
        |  SELECT e.vec_id, sb.sub, c.cent_id,
        |    CAST(SUM(CAST(floor((CAST(e.embedding[sb.sub*8 + js.j] AS DOUBLE) - CAST(c.cv[sb.sub*8 + js.j] AS DOUBLE))
        |      * (CAST(e.embedding[sb.sub*8 + js.j] AS DOUBLE) - CAST(c.cv[sb.sub*8 + js.j] AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS d
        |  FROM embeddings e, sb, seeds c, js
        |  GROUP BY e.vec_id, sb.sub, c.cent_id),
        |asg0 AS (
        |  SELECT vec_id, sub, cent_id FROM (
        |    SELECT vec_id, sub, cent_id,
        |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cent_id) AS rn
        |    FROM d0) WHERE rn = 1),
        |means AS (
        |  SELECT a.sub, a.cent_id, js.j,
        |    CAST((CAST(SUM(CAST(floor(CAST(e.embedding[a.sub*8 + js.j] AS DOUBLE) * 1e7 + 0.5) AS BIGINT)) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE)) / 1e7 AS FLOAT) AS mval
        |  FROM asg0 a JOIN embeddings e ON e.vec_id = a.vec_id, js
        |  GROUP BY a.sub, a.cent_id, js.j),
        |d1 AS (
        |  SELECT e.vec_id, mn.sub, mn.cent_id,
        |    CAST(SUM(CAST(floor((CAST(e.embedding[mn.sub*8 + mn.j] AS DOUBLE) - CAST(mn.mval AS DOUBLE))
        |      * (CAST(e.embedding[mn.sub*8 + mn.j] AS DOUBLE) - CAST(mn.mval AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS d
        |  FROM embeddings e, means mn
        |  GROUP BY e.vec_id, mn.sub, mn.cent_id),
        |codes AS (
        |  SELECT vec_id, sub, cent_id FROM (
        |    SELECT vec_id, sub, cent_id,
        |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cent_id) AS rn
        |    FROM d1) WHERE rn = 1),
        |adc AS (
        |  SELECT mn.sub, mn.cent_id,
        |    CAST(SUM(CAST(floor((CAST(a.embedding[mn.sub*8 + mn.j] AS DOUBLE) - CAST(mn.mval AS DOUBLE))
        |      * (CAST(a.embedding[mn.sub*8 + mn.j] AS DOUBLE) - CAST(mn.mval AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS ad
        |  FROM means mn, (SELECT embedding FROM embeddings WHERE vec_id = 0) a
        |  GROUP BY mn.sub, mn.cent_id)
        |SELECT c.vec_id, CAST(SUM(adc.ad) AS BIGINT) AS adc_q
        |FROM codes c JOIN adc ON adc.sub = c.sub AND adc.cent_id = c.cent_id
        |WHERE c.vec_id <> 0
        |GROUP BY c.vec_id
        |ORDER BY adc_q, c.vec_id LIMIT 10""".stripMargin,

    // The srp-md5 pipeline (as embed_srp_topdups_md5) down to scored
    // pairs, thresholded into edges, then recursive min-label reach —
    // the same propagation oracle dedup_components uses.
    "embed_dedup_clusters" ->
      """WITH RECURSIVE planes AS (
        |  SELECT bs.b AS b, isq.i AS i,
        |    (CAST(SUM(CAST(strpos('0123456789abcdef',
        |        substr(md5(CAST(bs.b AS VARCHAR) || ':' || CAST(isq.i AS VARCHAR)), ps.p, 1)) - 1
        |        AS BIGINT) << (4 * (13 - ps.p))) AS DOUBLE) / 4503599627370496.0) * 2 - 1 AS w
        |  FROM (SELECT unnest(generate_series(0, 31)) AS b) bs,
        |       (SELECT unnest(generate_series(1, 64)) AS i) isq,
        |       (SELECT unnest(generate_series(1, 13)) AS p) ps
        |  GROUP BY bs.b, isq.i),
        |sd AS (
        |  SELECT e.vec_id, pl.b,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[pl.i] AS DOUBLE) * pl.w * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM embeddings e, planes pl
        |  WHERE e.vec_id < 2000
        |  GROUP BY e.vec_id, pl.b),
        |sig AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS sig
        |  FROM sd GROUP BY vec_id),
        |banded AS (
        |  SELECT vec_id, bd.band AS band,
        |    (sig >> (8 * bd.band)) & 255 AS chunk_val
        |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) bd),
        |sized AS (
        |  SELECT vec_id, band, chunk_val,
        |    COUNT(*) OVER (PARTITION BY band, chunk_val) AS bucket_n
        |  FROM banded),
        |prs AS (
        |  SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
        |    greatest(a.vec_id, b.vec_id) AS id_b
        |  FROM sized a JOIN sized b
        |    ON a.band = b.band AND a.chunk_val = b.chunk_val
        |      AND a.vec_id < b.vec_id
        |  WHERE a.bucket_n BETWEEN 2 AND 1000),
        |scored AS (
        |  SELECT p.id_a, p.id_b,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[s.i] AS DOUBLE)*CAST(eb.embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dab,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[s.i] AS DOUBLE)*CAST(ea.embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS daa,
        |    CAST(SUM(CAST(floor(CAST(eb.embedding[s.i] AS DOUBLE)*CAST(eb.embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dbb
        |  FROM prs p
        |    JOIN embeddings ea ON ea.vec_id = p.id_a
        |    JOIN embeddings eb ON eb.vec_id = p.id_b,
        |    generate_series(1, 64) AS s(i)
        |  GROUP BY p.id_a, p.id_b),
        |edges AS (
        |  SELECT id_a, id_b FROM scored
        |  WHERE dab / sqrt(daa * dbb) >= 0.35),
        |sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
        |reach(id, lab) AS (
        |  SELECT vec_id, vec_id FROM embeddings WHERE vec_id < 2000
        |  UNION
        |  SELECT s.src, r.lab FROM reach r JOIN sym s ON r.id = s.dst)
        |SELECT id, MIN(lab) AS comp FROM reach GROUP BY id ORDER BY id""".stripMargin,

    "text_bpe_train" -> bpeTrainOracle(6),

    "text_bpe_encode" -> bpeEncodeOracle(6),

    "text_bpe_pairs" ->
      """WITH w AS (
        |  SELECT tok AS w, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
        |  WHERE tok <> '' GROUP BY tok),
        |p AS (
        |  SELECT substr(w, CAST(s.i AS INT), 2) AS pair, freq
        |  FROM w, (SELECT unnest(generate_series(1,
        |      (SELECT MAX(len(w)) FROM w) - 1)) AS i) s
        |  WHERE len(w) >= 2 AND s.i <= len(w) - 1)
        |SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
        |FROM p GROUP BY pair
        |ORDER BY pair_count DESC, pair
        |LIMIT 20""".stripMargin,

    "embed_knn_batch" ->
      """WITH dd AS (
        |  SELECT vec_id,
        |    CAST(SUM(CAST(floor(CAST(embedding[s.i] AS DOUBLE)*CAST(embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dd
        |  FROM embeddings, generate_series(1, 64) AS s(i)
        |  GROUP BY vec_id),
        |pairs AS (
        |  SELECT a.vec_id AS anchor_id, e.vec_id AS id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(a.embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dab
        |  FROM embeddings e, embeddings a, generate_series(1, 64) AS s(i)
        |  WHERE a.vec_id < 5 AND e.vec_id <> a.vec_id
        |  GROUP BY a.vec_id, e.vec_id),
        |scored AS (
        |  SELECT p.anchor_id, p.id, p.dab / sqrt(de.dd * da.dd) AS cos_sim
        |  FROM pairs p
        |    JOIN dd de ON de.vec_id = p.id
        |    JOIN dd da ON da.vec_id = p.anchor_id),
        |ranked AS (
        |  SELECT anchor_id, id, cos_sim,
        |    ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY cos_sim DESC, id) AS r
        |  FROM scored)
        |SELECT anchor_id, id, cos_sim FROM ranked WHERE r <= 10
        |ORDER BY anchor_id, cos_sim DESC, id""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "dedup_ngram" ->
      """WITH g AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct([array_to_string(lst[i:i+2], ' ')
        |                   for i in range(1, greatest(len(lst)-2, 1)+1)]) AS sh
        |  FROM (SELECT doc_id, lang, source,
        |          list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS lst
        |        FROM documents)
        |), p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |  FROM g a JOIN g b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "embed_quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    greatest(list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-30) AS scale
        |  FROM embeddings),
        |s AS (SELECT unnest(generate_series(1, 64)) AS i)
        |SELECT vec_id, scale,
        |  CAST(SUM(CAST(floor(CAST(embedding[s.i] AS DOUBLE) / scale + 0.5) AS BIGINT)) AS BIGINT) AS qsum,
        |  CAST(SUM(CAST(floor(CAST(embedding[s.i] AS DOUBLE) / scale + 0.5) AS BIGINT) * s.i) AS BIGINT) AS qdot
        |FROM e, s
        |GROUP BY vec_id, scale
        |ORDER BY vec_id""".stripMargin,

    "dedup_containment" ->
      """WITH g AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct([array_to_string(lst[i:i+2], ' ')
        |                   for i in range(1, greatest(len(lst)-2, 1)+1)]) AS sh
        |  FROM (SELECT doc_id, lang, source,
        |          list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS lst
        |        FROM documents)
        |), p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment
        |  FROM g a JOIN g b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id)
        |SELECT id_a, id_b, containment FROM p WHERE containment >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // 60-bit md5 SimHash replayed bit-by-bit: LSB-indexed bit j of the
    // 15-hex-digit value lives in digit 15-(j div 4) (1-based from the
    // left) at in-digit bit j%4 — mirrors SimHash64's (h >>> j) & 1.
    "dedup_simhash_md5" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |th AS (SELECT doc_id, md5(tok) AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, js.j AS j,
        |    CASE WHEN ((strpos('0123456789abcdef', substr(h, 15 - CAST(js.j // 4 AS INT), 1)) - 1)
        |               >> CAST(js.j % 4 AS INT)) & 1 = 1 THEN 1 ELSE -1 END AS v
        |  FROM th, (SELECT unnest(generate_series(0, 59)) AS j) js),
        |maj AS (
        |  SELECT doc_id, j, CASE WHEN SUM(v) > 0 THEN 1 ELSE 0 END AS bit
        |  FROM bits GROUP BY doc_id, j)
        |SELECT doc_id, CAST(SUM(CAST(bit AS BIGINT) << CAST(j AS INT)) AS BIGINT) AS sig
        |FROM maj GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_minhash_md5" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
        |SELECT doc_id, CAST(ss.s AS INT) AS seed,
        |  MIN(substr(md5(CAST(ss.s AS VARCHAR) || ':' || tok), 1, 15)) AS minhash
        |FROM tok, (SELECT unnest(generate_series(0, 15)) AS s) ss
        |GROUP BY doc_id, ss.s
        |ORDER BY doc_id, seed""".stripMargin,

    // Merged-index replay: the dedup_minhash_md5 signature algebra over
    // the bounded corpus, cross pairs (probe third × indexed two
    // thirds) sharing >= 8 of 16 seed-minima — DuckDB replays build,
    // merge, and probe because append-merge makes the standing index
    // row-identical to a single build over A ∪ B.
    "dedup_index_merge" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents WHERE doc_id < 600),
        |sig AS (
        |  SELECT doc_id, CAST(ss.s AS INT) AS seed,
        |    MIN(substr(md5(CAST(ss.s AS VARCHAR) || ':' || tok), 1, 15)) AS minhash
        |  FROM tok, (SELECT unnest(generate_series(0, 15)) AS s) ss
        |  GROUP BY doc_id, ss.s)
        |SELECT c.doc_id AS new_id, i.doc_id AS index_id,
        |  COUNT(*) AS shared
        |FROM sig c JOIN sig i ON c.seed = i.seed AND c.minhash = i.minhash
        |WHERE c.doc_id % 3 = 2 AND i.doc_id % 3 IN (0, 1)
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 8
        |ORDER BY new_id, index_id""".stripMargin,

    // Full SRP pipeline replay: 32-bit signatures, production 4×8-bit
    // banding, bucket-capped pair generation, decimal cosine, top-20.
    "embed_srp_topdups_md5" ->
      """WITH planes AS (
        |  SELECT bs.b AS b, isq.i AS i,
        |    (CAST(SUM(CAST(strpos('0123456789abcdef',
        |        substr(md5(CAST(bs.b AS VARCHAR) || ':' || CAST(isq.i AS VARCHAR)), ps.p, 1)) - 1
        |        AS BIGINT) << (4 * (13 - ps.p))) AS DOUBLE) / 4503599627370496.0) * 2 - 1 AS w
        |  FROM (SELECT unnest(generate_series(0, 31)) AS b) bs,
        |       (SELECT unnest(generate_series(1, 64)) AS i) isq,
        |       (SELECT unnest(generate_series(1, 13)) AS p) ps
        |  GROUP BY bs.b, isq.i),
        |sd AS (
        |  SELECT e.vec_id, pl.b,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[pl.i] AS DOUBLE) * pl.w * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM embeddings e, planes pl
        |  WHERE e.vec_id < 2000
        |  GROUP BY e.vec_id, pl.b),
        |sig AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS sig
        |  FROM sd GROUP BY vec_id),
        |banded AS (
        |  SELECT vec_id, bd.band AS band,
        |    (sig >> (8 * bd.band)) & 255 AS chunk_val
        |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) bd),
        |sized AS (
        |  SELECT vec_id, band, chunk_val,
        |    COUNT(*) OVER (PARTITION BY band, chunk_val) AS bucket_n
        |  FROM banded),
        |pairs AS (
        |  SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
        |    greatest(a.vec_id, b.vec_id) AS id_b
        |  FROM sized a JOIN sized b
        |    ON a.band = b.band AND a.chunk_val = b.chunk_val
        |      AND a.vec_id < b.vec_id
        |  WHERE a.bucket_n BETWEEN 2 AND 1000),
        |scored AS (
        |  SELECT p.id_a, p.id_b,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[s.i] AS DOUBLE)*CAST(eb.embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dab,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[s.i] AS DOUBLE)*CAST(ea.embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS daa,
        |    CAST(SUM(CAST(floor(CAST(eb.embedding[s.i] AS DOUBLE)*CAST(eb.embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dbb
        |  FROM pairs p
        |    JOIN embeddings ea ON ea.vec_id = p.id_a
        |    JOIN embeddings eb ON eb.vec_id = p.id_b,
        |    generate_series(1, 64) AS s(i)
        |  GROUP BY p.id_a, p.id_b)
        |SELECT id_a, id_b, dab / sqrt(daa * dbb) AS cos_sim
        |FROM scored
        |ORDER BY cos_sim DESC, id_a, id_b LIMIT 20""".stripMargin,

    // md5-plane SRP replay: rebuild each plane weight from 13 hex digits
    // (integer shifts — a double-pow sum would lose exactness past 2^53),
    // decimal-sum the dots, pack the sign bits.
    "embed_srp_md5" ->
      """WITH planes AS (
        |  SELECT bs.b AS b, isq.i AS i,
        |    (CAST(SUM(CAST(strpos('0123456789abcdef',
        |        substr(md5(CAST(bs.b AS VARCHAR) || ':' || CAST(isq.i AS VARCHAR)), ps.p, 1)) - 1
        |        AS BIGINT) << (4 * (13 - ps.p))) AS DOUBLE) / 4503599627370496.0) * 2 - 1 AS w
        |  FROM (SELECT unnest(generate_series(0, 15)) AS b) bs,
        |       (SELECT unnest(generate_series(1, 64)) AS i) isq,
        |       (SELECT unnest(generate_series(1, 13)) AS p) ps
        |  GROUP BY bs.b, isq.i),
        |d AS (
        |  SELECT e.vec_id, pl.b,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[pl.i] AS DOUBLE) * pl.w * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |  FROM embeddings e, planes pl
        |  WHERE e.vec_id < 2000
        |  GROUP BY e.vec_id, pl.b)
        |SELECT vec_id,
        |  CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS sig
        |FROM d GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // Component = min reachable doc_id. The recursive CTE enumerates
    // (node, reachable-label) pairs — bounded by Σ|component|² on this
    // corpus — and min-label per node must equal Spark's converged
    // propagation exactly.
    "dedup_components" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |mh0 AS (
        |  SELECT doc_id, CAST(ss.s AS INT) AS seed,
        |    MIN(substr(md5(CAST(ss.s AS VARCHAR) || ':' || tok), 1, 15)) AS minhash
        |  FROM tok, (SELECT unnest(generate_series(0, 15)) AS s) ss
        |  GROUP BY doc_id, ss.s),
        |mh AS (
        |  SELECT * FROM (
        |    SELECT doc_id, seed, minhash,
        |      COUNT(*) OVER (PARTITION BY seed, minhash) AS bucket_n
        |    FROM mh0)
        |  WHERE bucket_n <= 100),
        |edges AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM mh a JOIN mh b
        |    ON a.seed = b.seed AND a.minhash = b.minhash AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 8),
        |sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
        |reach(id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.src, r.lab FROM reach r JOIN sym s ON r.id = s.dst)
        |SELECT id, MIN(lab) AS comp FROM reach GROUP BY id ORDER BY id""".stripMargin,

    "sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE substr(md5('stratified:' || CAST(doc_id AS VARCHAR)), 1, 13) <
         |  CASE lang WHEN 'zh' THEN '${graft.ops.Sampling.hexThreshold(1.0)}'
         |            WHEN 'de' THEN '${graft.ops.Sampling.hexThreshold(1.0)}'
         |            WHEN 'en' THEN '${graft.ops.Sampling.hexThreshold(0.3)}'
         |            ELSE '' END
         |ORDER BY doc_id""".stripMargin,

    "dedup_substring" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, CAST(floor((length(text) - 1) / 10) AS BIGINT))) AS i
        |  FROM documents WHERE length(text) > 0),
        |w AS (
        |  SELECT doc_id, substr(text, CAST(i*10 + 1 AS INT), 50) AS chunk FROM c
        |  WHERE length(substr(text, CAST(i*10 + 1 AS INT), 50)) = 50),
        |d AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY chunk)
        |SELECT doc_id, COUNT(*) AS n_windows,
        |       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |FROM w JOIN d USING (chunk)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_chunk_overlap" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, CAST(floor((length(text) - 1) / 200) AS BIGINT))) AS i
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |       substr(text, CAST(i*200 + 1 AS INT), 256) AS chunk
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "sample_weighted" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE (('0x' || substr(md5('weighted:' || CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT)
        |        / 4503599627370496.0
        |      < LEAST(1.0, n_chars / 800.0)
        |ORDER BY doc_id""".stripMargin,

    "sample_temperature" ->
      """WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        |tot AS (SELECT SUM(n) AS ntot,
        |  CAST(SUM(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(28,10))) AS DOUBLE) AS z
        |  FROM counts),
        |rates AS (SELECT source,
        |  LEAST(CAST(1.0 AS DOUBLE),
        |    0.25 * CAST(ntot AS DOUBLE) * sqrt(CAST(n AS DOUBLE)) / z
        |      / CAST(n AS DOUBLE)) AS rate
        |  FROM counts, tot)
        |SELECT d.doc_id, d.source FROM documents d JOIN rates USING (source)
        |WHERE (('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 13))::UBIGINT)
        |        / 4503599627370496.0 < rate
        |ORDER BY d.doc_id""".stripMargin,

    "text_charlm_score" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(generate_series(1, length(text) - 1)) AS i
        |  FROM documents WHERE length(text) >= 2),
        |pairs AS (SELECT doc_id, substr(text, i, 1) AS a, substr(text, i, 2) AS ab
        |          FROM pos),
        |ctx AS (SELECT a, COUNT(*) AS cnt_a FROM pairs GROUP BY a),
        |bi AS (SELECT ab, COUNT(*) AS cnt_ab FROM pairs GROUP BY ab)
        |SELECT p.doc_id, COUNT(*) AS n_pairs,
        |  CAST(SUM(CAST(CAST(cnt_ab AS DOUBLE) / CAST(cnt_a AS DOUBLE)
        |                AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS avg_p
        |FROM pairs p JOIN bi USING (ab) JOIN ctx USING (a)
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,

    // CCNet buckets: the charlm replay + per-language NTILE(3) over
    // the identical total order (score desc, doc_id).
    "text_ccnet_buckets" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(generate_series(1, length(text) - 1)) AS i
        |  FROM documents WHERE length(text) >= 2),
        |pairs AS (SELECT doc_id, substr(text, i, 1) AS a, substr(text, i, 2) AS ab
        |          FROM pos),
        |ctx AS (SELECT a, COUNT(*) AS cnt_a FROM pairs GROUP BY a),
        |bi AS (SELECT ab, COUNT(*) AS cnt_ab FROM pairs GROUP BY ab),
        |scored AS (
        |  SELECT p.doc_id,
        |    CAST(SUM(CAST(CAST(cnt_ab AS DOUBLE) / CAST(cnt_a AS DOUBLE)
        |                  AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS avg_p
        |  FROM pairs p JOIN bi USING (ab) JOIN ctx USING (a)
        |  GROUP BY p.doc_id),
        |tiled AS (
        |  SELECT s.doc_id, d.lang, s.avg_p,
        |    ntile(3) OVER (PARTITION BY d.lang
        |                   ORDER BY s.avg_p DESC, s.doc_id) AS tercile
        |  FROM scored s JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, avg_p,
        |  CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |    ELSE 'tail' END AS bucket
        |FROM tiled ORDER BY doc_id""".stripMargin,

    // Same rule algebra: list ops + literal replaces + IEEE double
    // ratios over integer counts — engine-exact.
    "text_gopher_rules" ->
      """WITH w AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS words
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(length(words) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(words, x -> CAST(length(x) AS BIGINT))), 0) AS DOUBLE)
        |      / greatest(1, CAST(length(words) AS BIGINT)) AS mean_word_len,
        |    CAST(CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        |       + CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS DOUBLE)
        |      / greatest(1, CAST(length(words) AS BIGINT)) AS symbol_ratio,
        |    (CAST(list_contains(words, 'the') AS INT) + CAST(list_contains(words, 'be') AS INT)
        |     + CAST(list_contains(words, 'to') AS INT) + CAST(list_contains(words, 'of') AS INT)
        |     + CAST(list_contains(words, 'and') AS INT) + CAST(list_contains(words, 'that') AS INT)
        |     + CAST(list_contains(words, 'have') AS INT) + CAST(list_contains(words, 'with') AS INT)
        |    ) AS n_stopwords
        |  FROM w)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, n_stopwords,
        |  (n_words >= 50 AND n_words <= 100000) AS rule_words,
        |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_word_len,
        |  (symbol_ratio <= 0.1) AS rule_symbols,
        |  (n_stopwords >= 2) AS rule_stopwords,
        |  (n_words >= 50 AND n_words <= 100000
        |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |   AND symbol_ratio <= 0.1 AND n_stopwords >= 2) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // Same synthesis, same canonicalization algebra: split_part /
    // lower / RE2-safe regexes / list-filter — engine-exact strings.
    "dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.' || source || ':443/Articles/' || CAST(doc_id % 40 AS VARCHAR)
        |      || '/?utm_source=feed&id=' || CAST(doc_id % 200 AS VARCHAR)
        |      || '&utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR)
        |      || '#sec' || CAST(doc_id % 3 AS VARCHAR) AS url
        |  FROM documents),
        |p1 AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(split_part(url, '#', 1), '^([^:/?#]+)://', 1)) AS scheme,
        |    regexp_replace(split_part(url, '#', 1), '^[^:/?#]+://', '') AS rest
        |  FROM u),
        |p2 AS (
        |  SELECT doc_id, scheme,
        |    regexp_extract(rest, '^([^/?]*)', 1) AS hostport,
        |    substr(rest, length(regexp_extract(rest, '^([^/?]*)', 1)) + 1) AS pathq
        |  FROM p1),
        |p3 AS (
        |  SELECT doc_id, scheme,
        |    regexp_replace(lower(hostport), '^www\.', '') AS host0,
        |    split_part(pathq, '?', 1) AS path,
        |    CASE WHEN strpos(pathq, '?') > 0
        |         THEN substr(pathq, length(split_part(pathq, '?', 1)) + 2)
        |         ELSE '' END AS query
        |  FROM p2),
        |p4 AS (
        |  SELECT doc_id, scheme,
        |    CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
        |         WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
        |         ELSE host0 END AS host,
        |    regexp_replace(path, '/+$', '') AS cleanpath,
        |    array_to_string(list_filter(string_split(query, '&'),
        |      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z_]+|ref|fbclid|gclid)=')),
        |      '&') AS cleanquery
        |  FROM p3),
        |canon AS (
        |  SELECT doc_id,
        |    scheme || '://' || host || cleanpath ||
        |      CASE WHEN cleanquery = '' THEN '' ELSE '?' || cleanquery END AS canonical_url
        |  FROM p4)
        |SELECT canonical_url, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM canon GROUP BY canonical_url
        |ORDER BY canonical_url""".stripMargin,

    "sample_epoch_order" ->
      """SELECT doc_id, source, CAST(rk AS INT) AS rank_in_source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 13) ASC,
        |               doc_id ASC) AS rk
        |  FROM documents)
        |ORDER BY rank_in_source, md5('src:' || source), doc_id
        |LIMIT 500""".stripMargin,

    "sample_group_uniform" ->
      """SELECT source, doc_id, CAST(rk AS INT) AS rank FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substr(md5('grpsample:' || CAST(doc_id AS VARCHAR)), 1, 13) ASC,
        |               doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk <= 5
        |ORDER BY source, rank""".stripMargin,

    "sample_domain_quota" ->
      """SELECT source, doc_id, n_chars, CAST(rk AS INT) AS rank FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk <= 5
        |ORDER BY source, rank""".stripMargin,

    "sample_split_counts" ->
      s"""WITH s AS (SELECT CASE
         |    WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 13)
         |      < '${graft.ops.Sampling.hexThreshold(0.1)}' THEN 'val'
         |    WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 13)
         |      < '${graft.ops.Sampling.hexThreshold(0.2)}' THEN 'test'
         |    ELSE 'train' END AS split
         |  FROM documents)
         |SELECT split, COUNT(*) AS n FROM s GROUP BY split ORDER BY split""".stripMargin,

    "text_stats" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
         |  CAST(SUM(len($sqlToks)) AS BIGINT) AS total_words,
         |  CAST(SUM(len($sqlToks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_words
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    length(text) AS nc,
         |    CAST(len($sqlToks) AS INT) AS nw,
         |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS na,
         |    length(regexp_replace(text, '[^ ]', '', 'g')) AS ns,
         |    len(list_filter($sqlToks, t -> t IN ($stopList))) AS stop
         |  FROM documents)
         |SELECT doc_id, nw AS n_words,
         |  CAST(na AS DOUBLE) / CAST(nc AS DOUBLE) AS alpha_ratio,
         |  CAST(ns AS DOUBLE) / CAST(nc AS DOUBLE) AS space_ratio,
         |  CAST(stop AS DOUBLE) / CAST(nw AS DOUBLE) AS stopword_ratio,
         |  CAST(nc AS DOUBLE) / CAST(nw AS DOUBLE) AS avg_word_len
         |FROM q ORDER BY doc_id""".stripMargin,

    "text_langid" -> {
      val scores = TextAnalysis.langMarkers.map { case (l, ms) =>
        val in = ms.map(m => s"'$m'").mkString(", ")
        s"CAST(len(list_filter(tk, t -> t IN ($in))) AS INT) AS s_$l"
      }.mkString(",\n  ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val cases = langs.map(l => s"WHEN s_$l = best THEN '$l'").mkString(" ")
      s"""WITH toks AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |s AS (SELECT doc_id,
         |  $scores
         |FROM toks),
         |b AS (SELECT *, $best AS best FROM s)
         |SELECT doc_id,
         |  CASE WHEN best = 0 THEN 'und' $cases ELSE 'und' END AS lang_pred,
         |  best AS score
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "text_langid_accuracy" -> {
      val scores = TextAnalysis.langMarkers.map { case (l, ms) =>
        val in = ms.map(m => s"'$m'").mkString(", ")
        s"CAST(len(list_filter(tk, t -> t IN ($in))) AS INT) AS s_$l"
      }.mkString(",\n  ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val cases = langs.map(l => s"WHEN s_$l = best THEN '$l'").mkString(" ")
      s"""WITH toks AS (SELECT doc_id, lang, $sqlToks AS tk FROM documents),
         |s AS (SELECT doc_id, lang,
         |  $scores
         |FROM toks),
         |b AS (SELECT *, $best AS best FROM s),
         |p AS (SELECT lang,
         |  CASE WHEN (CASE WHEN best = 0 THEN 'und' $cases ELSE 'und' END) = lang
         |       THEN 1 ELSE 0 END AS hit
         |FROM b)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(hit) AS BIGINT) AS n_correct,
         |  CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
         |FROM p GROUP BY lang ORDER BY lang""".stripMargin
    },

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_contamination" ->
      """WITH lst AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(l[i:i+2], ' ')
        |                   for i in range(1, greatest(len(l)-2, 1)+1)]) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS l
        |        FROM documents)
        |), ev AS (
        |  SELECT list_distinct(flatten(list(sh))) AS evs FROM lst WHERE doc_id < 10
        |)
        |SELECT l.doc_id,
        |  CAST(len(list_intersect(l.sh, ev.evs)) AS DOUBLE)
        |    / CAST(len(l.sh) AS DOUBLE) AS contamination
        |FROM lst l, ev
        |WHERE l.doc_id >= 10
        |ORDER BY l.doc_id""".stripMargin,

    "text_length_quantiles" ->
      """WITH q AS (
        |  SELECT lang,
        |    quantile_cont(CAST(length(text) AS DOUBLE), [0.25, 0.5, 0.75, 0.9, 0.99]) AS qs
        |  FROM documents GROUP BY lang)
        |SELECT lang, qs[1] AS q25, qs[2] AS q50, qs[3] AS q75, qs[4] AS q90, qs[5] AS q99
        |FROM q ORDER BY lang""".stripMargin,

    "text_repetition" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS lst
        |  FROM documents)
        |SELECT doc_id,
        |  1.0 - CAST(len(list_distinct([array_to_string(lst[i:i+2], ' ')
        |                                for i in range(1, greatest(len(lst)-2, 1)+1)])) AS DOUBLE)
        |      / CAST(greatest(len(lst)-2, 1) AS DOUBLE) AS repetition
        |FROM l ORDER BY doc_id""".stripMargin,

    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |  /* The running SUM over BIGINT is HUGEINT in DuckDB, whose `//`
        |     yields DECIMAL(38,0); the cast pins pack_id back to BIGINT. */
        |  CAST(COALESCE(SUM(CAST(n_tokens AS BIGINT)) OVER (
        |    PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS pack_id
        |FROM t ORDER BY doc_id""".stripMargin,

    "layout_zorder" ->
      s"""SELECT doc_id,
         |  ${Layout.zorderSql(Seq("(n_chars % 4096)", "(doc_id % 4096)"), 12)} AS z
         |FROM documents
         |ORDER BY z, doc_id""".stripMargin,

    "curation_keep" -> curationKeepSql,

    // The full pipeline chained from the three replay fragments:
    // kept set -> DSIR weights join + top-200 -> epoch ordering.
    "curation_mix" ->
      s"""WITH w AS ($dsirOracleSql),
         |kept AS ($curationKeepSql),
         |sel AS (
         |  SELECT k.doc_id, k.source, w.weight
         |  FROM kept k JOIN w ON w.doc_id = k.doc_id
         |  ORDER BY w.weight DESC, k.doc_id LIMIT 200)
         |SELECT doc_id, source, weight, CAST(rk AS INT) AS rank_in_source FROM (
         |  SELECT doc_id, source, weight,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 13) ASC,
         |               doc_id ASC) AS rk
         |  FROM sel)
         |ORDER BY rank_in_source, md5('src:' || source), doc_id""".stripMargin,

        "mm_blob_meta" ->
      """SELECT doc_id,
        |  CASE WHEN length(coalesce(text, '')) % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
        |  CASE WHEN length(coalesce(text, '')) % 2 = 0
        |       THEN CAST(length(coalesce(text, '')) % 64 + 8 AS INT) END AS width,
        |  CASE WHEN length(coalesce(text, '')) % 2 = 0
        |       THEN CAST(length(coalesce(text, '')) % 48 + 8 AS INT) END AS height,
        |  CASE WHEN length(coalesce(text, '')) % 2 = 1 THEN CAST(16000 AS INT) END AS sample_rate,
        |  CASE WHEN length(coalesce(text, '')) % 2 = 1
        |       THEN CAST(length(coalesce(text, '')) % 512 + 64 AS BIGINT) END AS n_samples
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_audio_windows" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(length(coalesce(text, '')) % 512 + 64 AS BIGINT) AS n_samples
        |  FROM documents WHERE length(coalesce(text, '')) % 2 = 1),
        |w AS (
        |  SELECT doc_id, n_samples,
        |    unnest(generate_series(0, (n_samples - 64) // 32)) AS i
        |  FROM m WHERE n_samples >= 64)
        |SELECT doc_id, n_samples, CAST(i AS INT) AS window_idx,
        |       CAST(i * 32 AS BIGINT) AS start_sample
        |FROM w ORDER BY doc_id, window_idx""".stripMargin,

    "mm_frame_sample" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    CASE WHEN length(coalesce(text, '')) % 2 = 0
        |         THEN (length(coalesce(text, '')) % 64 + 8) * (length(coalesce(text, '')) % 48 + 8)
        |         ELSE length(coalesce(text, '')) % 512 + 64 END AS n
        |  FROM documents)
        |SELECT doc_id, CAST((n + 255) // 256 AS INT) AS n_frames
        |FROM n ORDER BY doc_id""".stripMargin,

    "mm_decode_batch" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    CASE WHEN length(coalesce(text, '')) % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
        |    CASE WHEN length(coalesce(text, '')) % 2 = 0
        |         THEN (length(coalesce(text, '')) % 64 + 8) * (length(coalesce(text, '')) % 48 + 8)
        |         ELSE length(coalesce(text, '')) % 512 + 64 END AS n
        |  FROM documents),
        |e AS (SELECT doc_id, format, n,
        |        unnest(generate_series(0, n - 1)) AS i FROM n),
        |s AS (SELECT doc_id, format, n,
        |        SUM((doc_id * 31 + 7 * i) % 256) AS checksum
        |      FROM e GROUP BY doc_id, format, n)
        |SELECT doc_id, format, CAST(n AS BIGINT) AS n_values,
        |       CAST(checksum AS BIGINT) AS decoded_checksum
        |FROM s ORDER BY doc_id""".stripMargin,

    // resize oracle: even-length docs are w×h gray PNGs of generator
    // values v(i) = (doc_id*31 + 7i) % 256; the NN grid picks
    // i = sy*w + sx with sy = y*h//12, sx = x*w//16 — all integer
    // arithmetic DuckDB computes directly
    "mm_resize_batch" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    length(coalesce(text, '')) % 64 + 8 AS w,
        |    length(coalesce(text, '')) % 48 + 8 AS h
        |  FROM documents WHERE length(coalesce(text, '')) % 2 = 0),
        |g AS (
        |  SELECT img.doc_id,
        |    ((y.i * h) // 12) * w + ((x.i * w) // 16) AS src_i
        |  FROM img, generate_series(0, 11) AS y(i), generate_series(0, 15) AS x(i))
        |SELECT doc_id, CAST(16 AS INT) AS resized_w, CAST(12 AS INT) AS resized_h,
        |  CAST(SUM((doc_id * 31 + 7 * src_i) % 256) AS BIGINT) AS resized_checksum
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "embed_knn_cosine" ->
      """WITH a AS (SELECT embedding AS av FROM embeddings WHERE vec_id = 0),
        |d AS (
        |  SELECT e.vec_id,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(a.av[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dab,
        |    CAST(SUM(CAST(floor(CAST(e.embedding[s.i] AS DOUBLE)*CAST(e.embedding[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS daa,
        |    CAST(SUM(CAST(floor(CAST(a.av[s.i] AS DOUBLE)*CAST(a.av[s.i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) AS dbb
        |  FROM embeddings e, a, generate_series(1, 64) AS s(i)
        |  GROUP BY e.vec_id)
        |SELECT vec_id, dab / sqrt(daa * dbb) AS cos_sim FROM d
        |WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin
  )
}
