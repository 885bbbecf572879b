package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{Dedup, Similarity}

/** Stage-split profiling for the SRP md5 pipeline: signatures vs
  * banding/bucketing vs pair scoring vs clustering. */
object ProfileSrp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings").filter(col("vec_id") < 2000)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm-up
    Similarity.srpCandidatePairsMd5(emb, "vec_id", "embedding", 32, 64, 4).count()

    time("sigs only") {
      emb.select(Similarity.srpSigMd5(col("embedding"), 32, 64)).count()
    }
    time("sigs+norms") {
      emb.select(Similarity.srpSigMd5(col("embedding"), 32, 64),
        Similarity.dotQuant(col("embedding"), col("embedding"))).count()
    }
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val sigs = vecs.select(col("id"),
      Similarity.srpSigMd5(col("v"), 32, 64).as("sig"))
    time("sigs collect") { sigs.count() }
    val banded = sigs.select(col("id"),
        posexplode(graft.functions.NativeExprs.chunkSplit(col("sig"), 4, 8)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk_val")
    banded.explain("formatted")
    time("banded only") { banded.count() }
    val counts = banded.groupBy(col("band"), col("chunk_val"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, 1000))
      .select(col("band"), col("chunk_val"))
    time("bucket counts") { counts.count() }
    val kept = banded.join(counts, Seq("band", "chunk_val"))
    time("kept join") { kept.count() }
    val a2 = kept.select(col("band"), col("chunk_val"), col("id").as("id_a"))
    val b2 = kept.select(col("band"), col("chunk_val"), col("id").as("id_b"))
    time("self join pairs") {
      a2.join(b2, Seq("band", "chunk_val"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b").count()
    }
    time("banded+bucketPairs") {
      Dedup.bucketPairs(banded, Seq("band", "chunk_val"), 1000).count()
    }
    time("full candidate pairs") {
      Similarity.srpCandidatePairsMd5(emb, "vec_id", "embedding", 32, 64, 4).count()
    }
    time("full topdups query (sorted limit 20)") {
      Similarity.srpCandidatePairsMd5(emb, "vec_id", "embedding", 32, 64, 4)
        .orderBy(col("cos_sim").desc, col("id_a"), col("id_b")).limit(20).count()
    }
    time("edges (scored+filtered)") {
      Similarity.srpCandidatePairsMd5(emb, "vec_id", "embedding", 32, 64, 4)
        .filter(col("cos_sim") >= 0.35)
        .select(col("id_a"), col("id_b")).count()
    }
    time("full clusters") {
      Dedup.connectedComponents(emb.select(col("vec_id").as("id")),
        Similarity.srpCandidatePairsMd5(emb, "vec_id", "embedding", 32, 64, 4)
          .filter(col("cos_sim") >= 0.35)
          .select(col("id_a"), col("id_b"))).count()
    }
    spark.stop()
  }
}
