package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Dedup

/** Ad-hoc profiling harness for the connected-components pipeline:
  * splits edge-derivation cost from label-propagation cost so bench
  * time is attributed to the right stage. Not wired into SparkEntry. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm-up
    Dedup.connectedComponents(docs.select(col("doc_id").as("id")),
      Dedup.minHashMd5Edges(docs, "doc_id", "text", 16, 8)).count()

    time("edges only") {
      Dedup.minHashMd5Edges(docs, "doc_id", "text", 16, 8).count()
    }
    time("full cc") {
      Dedup.connectedComponents(docs.select(col("doc_id").as("id")),
        Dedup.minHashMd5Edges(docs, "doc_id", "text", 16, 8)).count()
    }
    spark.stop()
  }
}
