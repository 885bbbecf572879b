package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Ad-hoc per-job wall-clock profiler for one bench query: prints every
  * Spark job's duration plus the gaps between jobs (= driver-side time:
  * planning, codegen compile, collect processing). Usage:
  *   SPARK_GRAFT_Q=embed_pq_topk_md5 sbt "runMain graft.tools.ProfileQuery"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_Q", "embed_pq_topk_md5")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.silenceWindowWarn()
    val jobs = collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val lines = collection.mutable.ArrayBuffer.empty[(Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("").take(60)
        jobs(js.jobId) = (js.time, desc)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.remove(je.jobId).foreach { case (t0, desc) =>
          lines.synchronized {
            lines += ((t0,
              f"job ${je.jobId}%3d start=$t0%d end=${je.time}%d ${(je.time - t0) / 1e3}%7.3fs  $desc"))
          }
        }
    })
    val fn = graft.SparkEntry.queries(qname)
    fn(spark, sfDir).count() // warmup
    lines.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"== $qname total ${total}%.3fs ==")
    lines.sortBy(_._1).foreach(l => println(l._2))
    spark.stop()
  }
}
