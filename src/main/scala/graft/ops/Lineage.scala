package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage cut that is cluster-safe by configuration: when the session's
  * SparkContext has a checkpoint directory set (HDFS/object store on a
  * real cluster), materialize through reliable `checkpoint()` — a
  * `localCheckpoint` stores its blocks on executors and the job dies
  * with the first lost executor, which is the wrong default for
  * long-running iterative work at 1000-executor scale. Without a
  * configured directory (the local[32] test/bench reality) it stays the
  * fast executor-storage `localCheckpoint`. One switch, set once at
  * session build, flips every iterative operator in the library
  * (connected components, LSH bucket pairs, Lloyd/PQ training) to the
  * hardened path — exercised end-to-end on a multi-executor
  * `local-cluster` master by [[graft.tools.ClusterSmoke]]. */
private[graft] object Lineage {
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager)
    else df.localCheckpoint(eager)
}
