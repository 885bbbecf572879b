package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the as-of join's boundary and tie semantics, which the events
  * testdata cannot distinguish (no equal timestamps across types):
  * inclusive vs strict at an exactly-equal timestamp, the
  * largest-tie-break pick when several right rows share one (key, ts),
  * unmatched-left null padding, and key isolation.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), 5.0),   // exactly at a quote ts
    (1L, 11L, ts("2024-01-01 11:30:00"), 6.0),   // between quotes
    (2L, 20L, ts("2024-01-01 09:00:00"), 7.0),   // before any quote
    (3L, 30L, ts("2024-01-01 12:00:00"), 8.0)    // key with no quotes at all
  ).toDF("user_id", "event_id", "ts", "value")

  private lazy val quotes = Seq(
    (1L, 100L, ts("2024-01-01 09:00:00"), 1.0),
    (1L, 101L, ts("2024-01-01 10:00:00"), 2.0),  // tie candidate (equal ts)
    (1L, 102L, ts("2024-01-01 10:00:00"), 3.0),  // same ts, larger event_id
    (1L, 103L, ts("2024-01-01 11:00:00"), 4.0),
    (2L, 200L, ts("2024-01-01 10:00:00"), 9.0)
  ).toDF("user_id", "event_id", "ts", "value")

  private def run(inclusive: Boolean): Map[Long, (Option[Timestamp], Option[Double])] =
    AsofJoin.asofJoin(trades, quotes, Seq("user_id"), "ts", "ts",
        Seq("ts" -> "q_ts", "value" -> "q_value"), "event_id", inclusive)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Timestamp]("q_ts")), Option(r.getAs[Double]("q_value"))))
      .toMap

  test("inclusive: equal-ts quote matches; largest tie-break event_id wins") {
    val m = run(inclusive = true)
    assert(m(10L) === (Some(ts("2024-01-01 10:00:00")), Some(3.0)))
  }

  test("strict: equal-ts quote is invisible; prior quote matches") {
    val m = run(inclusive = false)
    assert(m(10L) === (Some(ts("2024-01-01 09:00:00")), Some(1.0)))
  }

  test("between quotes picks the latest prior, not the first or next") {
    val m = run(inclusive = true)
    assert(m(11L) === (Some(ts("2024-01-01 11:00:00")), Some(4.0)))
  }

  test("left rows with no eligible quote null-pad; keys never leak") {
    val m = run(inclusive = true)
    assert(m(20L) === (None, None)) // quote exists but is later
    assert(m(30L) === (None, None)) // key has no quotes at all
    assert(m.size === 4)            // every trade survives exactly once
  }

  test("randomized: matches a brute-force reference on 500 rows with heavy ties") {
    // small key/timestamp domains force equal-ts collisions on both
    // sides; seeded, so failures reproduce
    val rnd = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    def t0(i: Int) = new Timestamp(base + i * 1000L)
    val tradeRows = (0 until 300).map { i =>
      (rnd.nextInt(15).toLong, 1000L + i, t0(rnd.nextInt(40)), rnd.nextInt(100).toDouble)
    }
    val quoteRows = (0 until 200).map { i =>
      (rnd.nextInt(15).toLong, 2000L + i, t0(rnd.nextInt(40)), rnd.nextInt(100).toDouble)
    }
    val tDf = tradeRows.toDF("user_id", "event_id", "ts", "value")
    val qDf = quoteRows.toDF("user_id", "event_id", "ts", "value")
    for (inclusive <- Seq(true, false)) {
      val got = AsofJoin.asofJoin(tDf, qDf, Seq("user_id"), "ts", "ts",
          Seq("value" -> "q_value"), "event_id", inclusive)
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          (if (r.isNullAt(r.fieldIndex("q_value"))) None
           else Some(r.getAs[Double]("q_value"))))
        .toMap
      val want = tradeRows.map { case (k, id, tts, _) =>
        val eligible = quoteRows.filter { case (qk, _, qts, _) =>
          qk == k && (if (inclusive) !qts.after(tts) else qts.before(tts))
        }
        // latest ts wins; ties broken by LARGEST quote event_id
        id -> eligible.sortBy(q => (q._3.getTime, q._2)).lastOption.map(_._4)
      }.toMap
      assert(got === want, s"inclusive=$inclusive")
    }
  }

  test("plan shape: no range-join explosion — no cartesian/BNLJ operator") {
    val plan = AsofJoin.asofJoin(trades, quotes, Seq("user_id"), "ts", "ts",
      Seq("value" -> "q_value"), "event_id").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
