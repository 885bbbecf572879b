package graft.service

import graft.SparkSpec
import graft.config.EngineConfig
import graft.engine.Engine

/** SET SESSION / RESET SESSION over the live engine properties, plus
  * the transaction no-ops (Trino pass-through shapes). */
class SessionPropsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def qs(env: Map[String, String] = Map.empty): QueryService =
    new QueryService(new Engine(EngineConfig.fromEnv(env).toOption.get,
      Some(dir), Some(spark)))

  test("SET SESSION max_result_rows takes effect immediately; RESET restores") {
    val s = qs()
    assert(s.execute("SET SESSION max_result_rows = 3").toOption.get.rows ==
      Seq(Seq("SET SESSION")))
    val clipped = s.execute(
      "SELECT n_nationkey FROM nation ORDER BY n_nationkey").toOption.get
    assert(clipped.rows.size == 3 && clipped.truncated)
    // SHOW SESSION shows the live value; Default keeps the config seed
    val show = s.execute("SHOW SESSION LIKE 'max_result_rows'").toOption.get
    assert(show.rows.head(1).toString == "3")
    assert(show.rows.head(2).toString != "3")
    assert(s.execute("RESET SESSION max_result_rows").toOption.get.rows ==
      Seq(Seq("RESET SESSION")))
    val full = s.execute(
      "SELECT n_nationkey FROM nation ORDER BY n_nationkey").toOption.get
    assert(full.rows.size == 25 && !full.truncated)
  }

  test("SET SESSION query_timeout_seconds drives the deadline") {
    val s = qs()
    assert(s.execute("SET SESSION query_timeout_seconds = 1").isRight)
    // a deliberately slow query (cross join explosion) must hit the 1s cap
    val r = s.execute(
      "SELECT COUNT(*) AS n FROM lineitem a, lineitem b, lineitem c " +
        "WHERE a.l_orderkey + b.l_orderkey + c.l_orderkey < 0")
    assert(r.isLeft && r.swap.toOption.get.contains("timed out after 1s"), r)
    assert(s.execute("RESET SESSION query_timeout_seconds").isRight)
  }

  test("unknown / fixed properties get the Trino-shaped errors") {
    val s = qs()
    assert(s.execute("SET SESSION nope = 1") ==
      Left("Session property 'nope' does not exist"))
    assert(s.execute("RESET SESSION nope") ==
      Left("Session property 'nope' does not exist"))
    val r = s.execute("SET SESSION allow_write_queries = true")
    assert(r.isLeft && r.swap.toOption.get.contains("not settable"), r)
    assert(s.execute("SET SESSION max_result_rows = 0").isLeft)
    assert(s.execute("SET SESSION max_result_rows = abc").isLeft)
  }

  test("transaction statements are accepted no-ops with Trino shapes") {
    val s = qs()
    assert(s.execute("START TRANSACTION").toOption.get.rows ==
      Seq(Seq("START TRANSACTION")))
    assert(s.execute("START TRANSACTION ISOLATION LEVEL READ COMMITTED")
      .toOption.get.rows == Seq(Seq("START TRANSACTION")))
    assert(s.execute("COMMIT").toOption.get.rows == Seq(Seq("COMMIT")))
    assert(s.execute("COMMIT WORK").toOption.get.rows == Seq(Seq("COMMIT")))
    assert(s.execute("ROLLBACK").toOption.get.rows == Seq(Seq("ROLLBACK")))
    // queries still work mid-"transaction"
    s.execute("START TRANSACTION")
    assert(s.execute("SELECT COUNT(*) AS n FROM region").toOption.get
      .rows.head.head.toString == "5")
    assert(s.execute("COMMIT").isRight)
  }
}
