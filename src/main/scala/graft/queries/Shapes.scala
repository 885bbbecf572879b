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
        |ORDER BY t.id""".stripMargin))
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
        |ORDER BY t.id""".stripMargin
  )
}
