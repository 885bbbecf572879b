package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the PQ codebook train: which part of the
  * Lloyd update costs the 0.7 s/iter the job profiler shows. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    // warmup the pieces
    emb.count(); emb.count()
    val m = 8; val ksub = 256; val dsub = 8
    val seeds = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").as("v"))
      .orderBy(xxhash64(col("id")), col("id")).limit(ksub)
      .collect().map(_.getSeq[Float](1))
    val books: Seq[Seq[(Long, Seq[Float])]] = (0 until m).map { s =>
      seeds.toSeq.zipWithIndex.map { case (v, i) =>
        (i.toLong, v.slice(s * dsub, (s + 1) * dsub).toSeq) }
    }
    (1 to 3).foreach { it =>
      val codesExpr = graft.functions.NativeExprs.pqCodes(col("embedding"), books)
      time(s"iter$it codes-only count") {
        emb.select(codesExpr.as("codes")).agg(sum(size(col("codes")))).head()
      }
      time(s"iter$it explode count") {
        emb.select(codesExpr.as("codes"),
            posexplode(array((0 until m).map(s =>
              slice(col("embedding"), s * dsub + 1, dsub)): _*)))
          .select(col("pos").as("sub"),
            element_at(col("codes"), col("pos") + 1).as("cell"),
            posexplode(col("col")))
          .agg(count(lit(1))).head()
      }
      time(s"iter$it full update collect") {
        emb.select(codesExpr.as("codes"),
            posexplode(array((0 until m).map(s =>
              slice(col("embedding"), s * dsub + 1, dsub)): _*)))
          .select(col("pos").as("sub"),
            element_at(col("codes"), col("pos") + 1).as("cell"),
            posexplode(col("col")))
          .groupBy(col("sub"), col("cell"), col("pos"))
          .agg((sum(col("col").cast(org.apache.spark.sql.types.DecimalType(28, 14)))
            .cast("double") / count(lit(1)).cast("double")).cast("float").as("mv"))
          .groupBy(col("sub"), col("cell"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
            t => t.getField("mv")).as("cv"))
          .collect()
      }
    }
    spark.stop()
  }
}
