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
        .toDF("plan"))
  )

  val oracles: Map[String, String] = Map.empty
}
