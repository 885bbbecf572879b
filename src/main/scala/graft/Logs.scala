package graft

/** Shared log tuning for the harness mains. */
object Logs {
  /** The corpus-wide-scalar pattern (unpartitioned window over a tiny
    * aggregate — deliberate, see PlanAuditSpec) triggers a benign
    * WindowExec warning per run; at WARN level those lines flood the
    * driver's bounded stdout tail and can push the result line out. */
  def silenceWindowWarn(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
