package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import QHelpers._

/** SURVEY.md §2b rows 29–35: window / analytic functions.
  *
  * Determinism: every window ORDER BY is a total order within its
  * partition (unique key appended) except where ties are deliberate
  * (rank/dense_rank, whose outputs depend only on key values). Windowed
  * double sums go through DECIMAL so frame-evaluation order (Spark
  * running accumulation vs DuckDB segment trees) cannot change bits.
  */
object Windows {

  private val dec = DecimalType(18, 4)

  val defs: Map[String, Q] = Map(
    // 29. ranking: rank/dense_rank over deliberate ties (priority), plus
    // row_number over a tie-broken total order.
    "win_rank_rownum" -> ((s, d) => {
      val wTies = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderpriority").asc)
      val wTotal = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderpriority").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          rank().over(wTies).as("rnk"),
          dense_rank().over(wTies).as("drnk"),
          row_number().over(wTotal).as("rn"))
        .orderBy(col("o_orderkey"))
    }),

    // 30. running sum (ROWS UNBOUNDED PRECEDING..CURRENT ROW).
    "win_agg_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          sum(col("o_totalprice").cast(dec)).over(w).cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // 31. sliding frame moving average (2 PRECEDING..CURRENT ROW).
    "win_sliding_rows" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(-2, 0)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(col("o_totalprice").cast(dec)).over(w).cast("double") /
            count(lit(1)).over(w)).as("moving_avg"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // 32. value-based RANGE frame over a numeric key.
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderkey").asc)
        .rangeBetween(-100L, 0L)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          count(lit(1)).over(w).as("n_in_range"),
          sum(col("o_totalprice").cast(dec)).over(w).cast("double").as("sum_in_range"))
        .orderBy(col("o_orderkey"))
    }),

    // 33. lead/lag with explicit default.
    "win_lead_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1, 0.0).over(w).as("prev_price"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // 34. ntile / percent_rank / cume_dist over a total order.
    "win_ntile_percent" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
        .orderBy(col("c_custkey"))
    }),

    // 35. first_value / last_value with an explicit full-partition frame
    // (default frame would make last_value = current row).
    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "win_rank_rownum" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |  RANK()       OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority ASC) AS rnk,
        |  DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority ASC) AS drnk,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |                     ORDER BY o_orderpriority ASC, o_orderkey ASC) AS rn
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "win_agg_running" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_sliding_rows" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS moving_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_range_frame" ->
      """SELECT o_orderkey, o_orderstatus,
        |  COUNT(*) OVER w AS n_in_range,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_in_range
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC
        |             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "win_lead_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice, 1, 0.0) OVER w AS prev_price,
        |  LEAD(o_orderkey, 1) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_ntile_percent" ->
      """SELECT c_custkey, c_mktsegment,
        |  NTILE(4)       OVER w AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST()    OVER w AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,

    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  LAST_VALUE(o_orderkey)  OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
