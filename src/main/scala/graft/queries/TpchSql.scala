package graft.queries

import graft.engine.Tables

import QHelpers._

/** Classic TPC-H pricing/revenue queries run as SQL TEXT through the
  * engine (Tables.sql → spark.sql) — the reference's actual usage mode
  * is SQL strings over execute_query, so the inventory should exercise
  * the parser/analyzer path end-to-end, not only the DataFrame API.
  * (Adapted to the testdata schema: no o_shippriority column, so Q3
  * carries o_orderpriority.)
  *
  * Money aggregates follow the decimal-routing rule (QHelpers): the
  * double product is cast to DECIMAL(18,4) before SUM on both engines,
  * making the aggregation order-independent and hash-stable. The
  * 3-factor charge goes further: with 2-decimal discounts/taxes the
  * product has exactly 6 decimals, so a double→DECIMAL(18,4) cast lands
  * exactly halfway and the engines split (Spark HALF_UP, DuckDB
  * HALF_EVEN). Each factor is therefore cast to decimal FIRST —
  * (12,2)×(8,6)×(8,6) stays within precision 38 un-reduced on both
  * engines, every step is exact; the decimal sum is order-independent and
  * only its final value is cast out for output (the driver's checker
  * cannot compare DECIMAL columns consistently across its two readers).
  * The cast-out goes DECIMAL→STRING→DOUBLE, not DECIMAL→DOUBLE: DuckDB's
  * direct wide-decimal→double (int128 / 10^scale in float arithmetic) is
  * not correctly rounded at scale 14, while both engines' string→double
  * parse is — the round-trip makes the emitted double bit-identical.
  */
object TpchSql {

  private val q1 =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * CAST(1 - l_discount AS DECIMAL(8,6)) AS DECIMAL(28,8))
      |      * CAST(1 + l_tax AS DECIMAL(8,6))) AS STRING) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private val q3 =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  private val q5 =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  private val q6 =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.04 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  private val q18 =
    """SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250)
      |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin

  // Q7 adapted to the synthetic nation names: bilateral shipping volume
  // between NATION_1 and NATION_2 per ship year — the double-nation-join
  // + OR-pair predicate plan shape of the official Q7.
  private val q7 =
    """SELECT supp_nation, cust_nation, yr,
      |  CAST(SUM(vol) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS yr,
      |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS vol
      |  FROM supplier
      |    JOIN lineitem ON s_suppkey = l_suppkey
      |    JOIN orders ON o_orderkey = l_orderkey
      |    JOIN customer ON c_custkey = o_custkey
      |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') x
      |GROUP BY supp_nation, cust_nation, yr
      |ORDER BY supp_nation, cust_nation, yr""".stripMargin

  // Q4 adapted: the testdata lineitem has no commit/receipt dates, so
  // "late" = shipped more than 60 days after the order date — the same
  // correlated-EXISTS → semi-join plan shape as the official Q4.
  private val q4 =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  private val q10 =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  private val q14 =
    """SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
      |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
      |  AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""".stripMargin

  val defs: Map[String, Q] = Map(
    "tpch_q1" -> ((s, d) => Tables.sql(s, d, q1)),
    "tpch_q3" -> ((s, d) => Tables.sql(s, d, q3)),
    "tpch_q5" -> ((s, d) => Tables.sql(s, d, q5)),
    "tpch_q4" -> ((s, d) => Tables.sql(s, d, q4)),
    "tpch_q6" -> ((s, d) => Tables.sql(s, d, q6)),
    "tpch_q7" -> ((s, d) => Tables.sql(s, d, q7)),
    "tpch_q10" -> ((s, d) => Tables.sql(s, d, q10)),
    "tpch_q14" -> ((s, d) => Tables.sql(s, d, q14)),
    "tpch_q18" -> ((s, d) => Tables.sql(s, d, q18)))

  // The oracle SQL is the SAME text (both dialects accept it) — the
  // strongest possible parity statement for the SQL surface.
  val oracles: Map[String, String] = Map(
    "tpch_q1" -> q1,
    "tpch_q3" -> q3,
    "tpch_q5" -> q5,
    "tpch_q4" -> q4,
    "tpch_q6" -> q6,
    "tpch_q7" -> q7,
    "tpch_q10" -> q10,
    "tpch_q14" -> q14,
    "tpch_q18" -> q18)
}
