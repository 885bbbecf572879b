package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query from SparkEntry.queries N times and
  * print per-run wall seconds (first run includes planning + scan).
  * Usage: runMain graft.RunOne <name> [sfDir] [reps] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE initial shuffle-partition count: deployment config, NOT a
      // hardcoded 8x-cores — at local[32]/small SF that multiplier made
      // every shuffle write 256 reducer partitions and tripled the full
      // bench wall-clock (191.7s vs 68.0s measured at sf0.1). On a real
      // cluster, size it to the input via SPARK_GRAFT_INITIAL_PARTITIONS.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.silenceWindowWarn()
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[runone] $name rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
