package graft.security

import org.apache.spark.sql.SparkSession

/** Query attribution and impersonation, ported from the reference
  * (reference internal/trino/client.go:473-540,
  * internal/mcp/handlers.go:31-52). The reference carries the
  * authenticated user as X-Trino-User / X-Trino-Client-Tags/Info
  * headers; the embedded engine's equivalent is Spark local properties
  * on the executing thread — the job description and a graft.user tag
  * show up in the Spark UI/event log per job, giving the same
  * per-query accountability (no security engine behind it, same as the
  * reference's v0 posture).
  */
object Attribution {

  /** Authenticated principal fields (subset of the reference's
    * oauth.User the control plane reads). */
  final case class User(username: String = "", email: String = "", subject: String = "")

  /** Attribution identity: username > email > subject > none
    * (client.go:475-490; precedence pinned by client_test.go:448-498). */
  def queryUsername(user: Option[User]): String = user match {
    case None => ""
    case Some(u) =>
      if (u.username.nonEmpty) u.username
      else if (u.email.nonEmpty) u.email
      else if (u.subject.nonEmpty) u.subject
      else ""
  }

  /** Impersonation principal by configured field, defaulting to
    * username (handlers.go:33-43). Empty result = no impersonation. */
  def impersonationPrincipal(user: Option[User], field: String): String =
    user match {
      case None => ""
      case Some(u) => field match {
        case "email" => u.email
        case "subject" => u.subject
        case _ => u.username
      }
    }

  /** Tag the CURRENT THREAD's Spark jobs with the acting user — must be
    * called on the thread that runs the query (local properties are
    * thread-local, like the reference's per-request context). */
  def tagThread(spark: SparkSession, userName: String): Unit =
    if (userName.nonEmpty) {
      spark.sparkContext.setLocalProperty("spark.job.description", s"graft query [user=$userName]")
      spark.sparkContext.setLocalProperty("graft.user", userName)
    }

  def clearThread(spark: SparkSession): Unit = {
    spark.sparkContext.setLocalProperty("spark.job.description", null)
    spark.sparkContext.setLocalProperty("graft.user", null)
  }
}
