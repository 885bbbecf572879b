package graft.queries

import org.apache.spark.sql.functions._

import QHelpers._
import graft.config.EngineConfig
import graft.engine.{Engine, Tables}
import graft.service.{ExplainService, MetadataService}

/** SURVEY.md §2b rows 60–64: the metadata surface as inventory queries
  * (rows-only — environment-shaped output DuckDB can't oracle; the
  * behavior itself is pinned by ServicesSpec/StdioServerSpec unit
  * tests). Each query routes through the same services the MCP tools
  * use, so the driver exercises the real code path.
  */
object MetaOps {

  private def engine(s: org.apache.spark.sql.SparkSession, dir: String): Engine =
    new Engine(EngineConfig.fromEnv(Map.empty).toOption.get, Some(dir), Some(s))

  val defs: Map[String, Q] = Map(
    // 60. SHOW CATALOGS (reference client.go:641)
    "meta_show_catalogs" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.createDataFrame(
        new MetadataService(engine(s, d)).listCatalogs().map(Tuple1(_)))
        .toDF("catalog").orderBy(col("catalog"))
    }),

    // 61. SHOW SCHEMAS FROM c (client.go:672)
    "meta_show_schemas" -> ((s, d) =>
      s.createDataFrame(
        new MetadataService(engine(s, d)).listSchemas("").map(Tuple1(_)))
        .toDF("schema").orderBy(col("schema"))),

    // 62. SHOW TABLES FROM c.s (client.go:707)
    "meta_show_tables" -> ((s, d) =>
      s.createDataFrame(
        new MetadataService(engine(s, d)).listTables("", "").map(Tuple1(_)))
        .toDF("table").orderBy(col("table"))),

    // 63. DESCRIBE c.s.t with Trino type names (client.go:767;
    // docs/tools.md:113-157 shape)
    "meta_describe" -> ((s, d) =>
      s.createDataFrame(
        new MetadataService(engine(s, d)).getTableSchema("", "", "customer")
          .fold(err => throw new RuntimeException(err), identity)
          .map(m => (m("Column").toString, m("Type").toString,
            m("Extra").toString, m("Comment").toString)))
        .toDF("Column", "Type", "Extra", "Comment")),

    // 64. EXPLAIN (TYPE LOGICAL) (client.go:778-787)
    "meta_explain" -> ((s, d) =>
      s.createDataFrame(
        new ExplainService(engine(s, d))
          .explain("SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus", "LOGICAL")
          .fold(err => throw new RuntimeException(err), identity)
          .map(m => Tuple1(m("Query Plan").toString)))
        .toDF("plan")),

    // DESCRIBE tpch.tiny.customer — the second catalog's flagship shape
    // (reference docs/tools.md:113-157: custkey bigint … comment
    // varchar). Routed through the SAME 3-part resolution +
    // MetadataService path the MCP tool uses; the oracle is the
    // documented column list as a VALUES literal, so the driver
    // hash-verifies the V2 catalog's schema surface end to end.
    "meta_describe_tpch" -> ((s, d) => {
      graft.catalog.TpchTinyCatalog.register(s, d)
      s.createDataFrame(
        new MetadataService(engine(s, d))
          .getTableSchema("tpch", "tiny", "customer")
          .fold(err => throw new RuntimeException(err), identity)
          .map(m => (m("Column").toString, m("Type").toString,
            m("Extra").toString, m("Comment").toString)))
        .toDF("column_name", "column_type", "extra", "comment")
        .orderBy(col("column_name"))
    }),

    // Cross-catalog join: tpch.tiny dimensions (V2 in-memory catalog,
    // Trino's unprefixed names + synthesized columns) against the
    // default catalog's fact tables — the multi-catalog query shape the
    // reference serves by delegating to Trino's federation. The DuckDB
    // oracle replays the tiny tables' derivations (rename + cast +
    // synth) over the same parquet, so the whole catalog path is
    // hash-verified. Plan shape: both tiny sides broadcast (dimension
    // tables), one shuffle for the aggregate.
    "xcat_nation_acctbal" -> ((s, d) => {
      Tables.registerAll(s, d)
      graft.catalog.TpchTinyCatalog.register(s, d)
      s.sql(s"""
        SELECT r.name AS region_name, n.name AS nation_name,
               MIN(n.comment) AS nation_comment,
               COUNT(*) AS n_cust,
               ${"CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)"} AS total_bal
        FROM tpch.tiny.nation n
        JOIN tpch.tiny.region r ON n.regionkey = r.regionkey
        JOIN customer c ON c.c_nationkey = n.nationkey
        GROUP BY r.name, n.name
        ORDER BY region_name, nation_name""")
    })
  )

  val oracles: Map[String, String] = Map(
    "meta_describe_tpch" -> """
      SELECT * FROM (VALUES
        ('acctbal', 'double', '', ''),
        ('address', 'varchar', '', ''),
        ('comment', 'varchar', '', ''),
        ('custkey', 'bigint', '', ''),
        ('mktsegment', 'varchar', '', ''),
        ('name', 'varchar', '', ''),
        ('nationkey', 'bigint', '', ''),
        ('phone', 'varchar', '', ''))
        AS t(column_name, column_type, extra, comment)
      ORDER BY column_name""",
    "xcat_nation_acctbal" -> """
      WITH tiny_nation AS (
        SELECT CAST(n_nationkey AS BIGINT) AS nationkey, n_name AS name,
               CAST(n_regionkey AS BIGINT) AS regionkey,
               CONCAT('tiny nation ', CAST(n_nationkey AS VARCHAR)) AS comment
        FROM nation),
      tiny_region AS (
        SELECT CAST(r_regionkey AS BIGINT) AS regionkey, r_name AS name
        FROM region)
      SELECT r.name AS region_name, n.name AS nation_name,
             MIN(n.comment) AS nation_comment,
             COUNT(*) AS n_cust,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      FROM tiny_nation n
      JOIN tiny_region r ON n.regionkey = r.regionkey
      JOIN customer c ON c.c_nationkey = n.nationkey
      GROUP BY r.name, n.name
      ORDER BY region_name, nation_name""")
}
