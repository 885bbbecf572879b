package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Tables
import QHelpers._

/** SURVEY.md §2b rows 36–44: set operations and query shapes (CTE,
  * subqueries, derived tables, inline VALUES). Shapes that are purely
  * SQL surface (CTE, VALUES, scalar subquery) run through `spark.sql`
  * so Catalyst's decorrelation / inlining rules are what's exercised.
  */
object Shapes {

  val defs: Map[String, Q] = Map(
    // 36. UNION ALL — no dedup, no shuffle beyond the final sort.
    "setop_union_all" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"), lit("cust").as("src"))
        .unionAll(
          t(s, d, "orders").select(col("o_custkey").as("k"), lit("ord").as("src")))
        .orderBy(col("k"), col("src"))),

    // 37. UNION (distinct) — HashAggregate dedup.
    "setop_union_distinct" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .union(t(s, d, "orders").select(col("o_custkey").as("k")))
        .distinct()
        .orderBy(col("k"))),

    // 38. INTERSECT (distinct semantics in Spark/DuckDB/Trino).
    "setop_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .intersect(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy(col("k"))),

    // 39. EXCEPT — customers that never ordered.
    "setop_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy(col("k"))),

    // 40. WITH CTE referenced twice (reference client_test.go:408 pins the
    // CTE shape as allowed read-only SQL).
    "cte_with" -> ((s, d) => Tables.sql(s, d,
      """WITH per_nation AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust
        |  FROM customer GROUP BY c_nationkey
        |)
        |SELECT a.c_nationkey AS nationkey, a.n_cust,
        |       CAST(a.n_cust AS BIGINT) + (SELECT MAX(n_cust) FROM per_nation) AS n_plus_max
        |FROM per_nation a
        |ORDER BY nationkey""".stripMargin)),

    // 41. scalar subquery in WHERE (uncorrelated; MAX is order-exact).
    "subquery_scalar" -> ((s, d) => Tables.sql(s, d,
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT MAX(c_acctbal) FROM customer) * 20.0
        |ORDER BY o_orderkey""".stripMargin)),

    // 42. IN (subquery) → Catalyst rewrites to left semi join.
    "subquery_in" -> ((s, d) => Tables.sql(s, d,
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        |ORDER BY c_custkey""".stripMargin)),

    // 43. derived table in FROM.
    "derived_table" -> ((s, d) => Tables.sql(s, d,
      """SELECT t.o_custkey, t.n_orders, c.c_name
        |FROM (SELECT o_custkey, COUNT(*) AS n_orders
        |      FROM orders GROUP BY o_custkey) t
        |JOIN customer c ON t.o_custkey = c.c_custkey
        |WHERE t.n_orders >= 10
        |ORDER BY t.o_custkey""".stripMargin)),

    // 44. inline VALUES table (LocalRelation).
    "values_inline" -> ((s, d) => Tables.sql(s, d,
      """SELECT t.id, t.name, n.n_name
        |FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS t(id, name)
        |JOIN nation n ON n.n_nationkey = t.id
        |ORDER BY t.id""".stripMargin)),

    // 44b. quantified subquery comparisons through the dialect rewrite
    // (TrinoFunctions.rewriteQuantified → exact 3VL min/max scalar
    // composition). Columns cover: ordered ALL/ANY over a nonempty set,
    // the vacuous empty set (ALL → TRUE, ANY → FALSE, even with a NULL
    // left operand), a NULL inside the subquery (TRUE demoted to
    // UNKNOWN, FALSE preserved), an arithmetic left operand, = ALL
    // with correlation, and <> ANY. DuckDB parses the quantifiers
    // natively with ANSI semantics — a direct oracle.
    "quantified_cmp" -> ((s, d) =>
      Tables.sql(s, d, graft.dialect.TrinoFunctions.preprocess(
        """SELECT n_nationkey,
          |  n_nationkey > ALL (SELECT r_regionkey FROM region) AS gt_all,
          |  n_nationkey >= ALL (SELECT r_regionkey FROM region) AS ge_all,
          |  n_nationkey < ALL (SELECT r_regionkey FROM region
          |                     WHERE r_regionkey > 99) AS lt_all_empty,
          |  n_nationkey < ANY (SELECT r_regionkey FROM region
          |                     WHERE r_regionkey > 99) AS lt_any_empty,
          |  n_nationkey < ANY (SELECT r_regionkey FROM region) AS lt_any,
          |  n_nationkey + 1 > ANY (SELECT r_regionkey FROM region) AS arith_gt_any,
          |  n_nationkey <= ALL (SELECT CASE WHEN r_regionkey = 4 THEN NULL
          |                                  ELSE r_regionkey END
          |                      FROM region) AS le_all_nulls,
          |  n_nationkey = ALL (SELECT r_regionkey FROM region
          |                     WHERE r_regionkey <= n_nationkey) AS eq_all_corr,
          |  n_nationkey <> ANY (SELECT r_regionkey FROM region) AS ne_any,
          |  (CASE WHEN n_nationkey >= 20 THEN NULL
          |        ELSE n_nationkey END) >= ALL
          |    (SELECT r_regionkey FROM region) AS null_x_ge_all
          |FROM nation
          |ORDER BY n_nationkey""".stripMargin)))
  )

  val oracles: Map[String, String] = Map(
    "setop_union_all" ->
      """SELECT c_custkey AS k, 'cust' AS src FROM customer
        |UNION ALL
        |SELECT o_custkey AS k, 'ord' AS src FROM orders
        |ORDER BY k, src""".stripMargin,

    "setop_union_distinct" ->
      """SELECT c_custkey AS k FROM customer
        |UNION
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,

    "setop_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,

    "setop_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,

    "cte_with" ->
      """WITH per_nation AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust
        |  FROM customer GROUP BY c_nationkey
        |)
        |SELECT a.c_nationkey AS nationkey, a.n_cust,
        |       CAST(a.n_cust AS BIGINT) + (SELECT MAX(n_cust) FROM per_nation) AS n_plus_max
        |FROM per_nation a
        |ORDER BY nationkey""".stripMargin,

    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT MAX(c_acctbal) FROM customer) * 20.0
        |ORDER BY o_orderkey""".stripMargin,

    "subquery_in" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        |ORDER BY c_custkey""".stripMargin,

    "derived_table" ->
      """SELECT t.o_custkey, t.n_orders, c.c_name
        |FROM (SELECT o_custkey, COUNT(*) AS n_orders
        |      FROM orders GROUP BY o_custkey) t
        |JOIN customer c ON t.o_custkey = c.c_custkey
        |WHERE t.n_orders >= 10
        |ORDER BY t.o_custkey""".stripMargin,

    "values_inline" ->
      """SELECT t.id, t.name, n.n_name
        |FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) AS t(id, name)
        |JOIN nation n ON n.n_nationkey = t.id
        |ORDER BY t.id""".stripMargin,

    "quantified_cmp" ->
      """SELECT n_nationkey,
        |  n_nationkey > ALL (SELECT r_regionkey FROM region) AS gt_all,
        |  n_nationkey >= ALL (SELECT r_regionkey FROM region) AS ge_all,
        |  n_nationkey < ALL (SELECT r_regionkey FROM region
        |                     WHERE r_regionkey > 99) AS lt_all_empty,
        |  n_nationkey < ANY (SELECT r_regionkey FROM region
        |                     WHERE r_regionkey > 99) AS lt_any_empty,
        |  n_nationkey < ANY (SELECT r_regionkey FROM region) AS lt_any,
        |  n_nationkey + 1 > ANY (SELECT r_regionkey FROM region) AS arith_gt_any,
        |  n_nationkey <= ALL (SELECT CASE WHEN r_regionkey = 4 THEN NULL
        |                                  ELSE r_regionkey END
        |                      FROM region) AS le_all_nulls,
        |  n_nationkey = ALL (SELECT r_regionkey FROM region
        |                     WHERE r_regionkey <= n_nationkey) AS eq_all_corr,
        |  n_nationkey <> ANY (SELECT r_regionkey FROM region) AS ne_any,
        |  (CASE WHEN n_nationkey >= 20 THEN NULL
        |        ELSE n_nationkey END) >= ALL
        |    (SELECT r_regionkey FROM region) AS null_x_ge_all
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin
  )
}
