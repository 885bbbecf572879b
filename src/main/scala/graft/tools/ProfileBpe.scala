package graft.tools

import org.apache.spark.sql.SparkSession

/** Before/after measurement for BPE training at realistic merge depth
  * (VERDICT r10 item 4): merges=200 on sf0.1. */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val merges = sys.env.getOrElse("SPARK_GRAFT_MERGES", "200").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.silenceWindowWarn()
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    docs.count() // warm the scan
    val t0 = System.nanoTime()
    val table = graft.ops.TextAnalysis.bpeTrain(docs, "text", merges)
    val n = table.count()
    println(f"BPE merges=$merges rows=$n took ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
