package graft.service

import org.apache.spark.sql.types._

import graft.engine.Engine
import graft.security.Allowlists

/** Metadata surface: list_catalogs / list_schemas / list_tables /
  * get_table_schema with allowlist filtering and Trino-style type
  * names, mirroring reference internal/trino/client.go:635-769 over
  * Spark's catalog (`SHOW CATALOGS` / `SHOW NAMESPACES` /
  * `SHOW TABLES` / schema inspection).
  *
  * Namespace mapping: the engine's registered parquet views are session
  * temp views, addressed as `<defaultCatalog>.<defaultSchema>.<name>`
  * (the embedded equivalent of the reference's memory.default).
  */
class MetadataService(engine: Engine) {

  private def cfg = engine.config
  private def spark = engine.spark

  /** SHOW CATALOGS → names, allowlist-filtered (client.go:635-659). */
  def listCatalogs(): Seq[String] = {
    val cats = spark.sql("SHOW CATALOGS").collect().map(_.getString(0)).toSeq
    engine.allowlists.filterCatalogs(cats)
  }

  /** SHOW NAMESPACES IN c → names, filtered (client.go:662-691). */
  def listSchemas(catalog: String): Seq[String] = {
    val c = if (catalog.isEmpty) engine.sessionCatalog else catalog
    val schemas = spark.sql(s"SHOW NAMESPACES IN ${quote(c)}")
      .collect().map(_.getString(0)).toSeq
    engine.allowlists.filterSchemas(schemas, c)
  }

  /** SHOW TABLES IN c.s (plus session temp views when targeting the
    * default namespace) → names, filtered (client.go:694-726). */
  def listTables(catalog: String, schema: String): Seq[String] = {
    val c = if (catalog.isEmpty) engine.sessionCatalog else catalog
    val s = if (schema.isEmpty) engine.sessionSchema else schema
    val rows = spark.sql(s"SHOW TABLES IN ${quote(c)}.${quote(s)}").collect()
    // SHOW TABLES emits (namespace, tableName, isTemporary); temp views
    // belong to the engine's default namespace.
    val names = rows.flatMap { r =>
      val name = r.getString(1)
      val isTemp = r.getBoolean(2)
      // graft_src_* are the engine's internal per-directory relation
      // caches (Tables.load) — implementation detail, not user tables
      if (name.startsWith("graft_src_")) None
      else if (!isTemp || (c.equalsIgnoreCase(cfg.catalog) && s.equalsIgnoreCase(cfg.schema)))
        Some(name)
      else None
    }.distinct.sorted.toSeq
    engine.allowlists.filterTables(names, c, s)
  }

  /** Resolve 3/2/1-part name, enforce the table allowlist AFTER
    * resolution, then describe with Trino-style type names
    * (client.go:729-769; shape of reference docs/tools.md:113-157). */
  def getTableSchema(catalog: String, schema: String, table: String):
      Either[String, Seq[Map[String, Any]]] = {
    val (c, s, t) = Allowlists.resolveTable(catalog, schema, table,
      engine.sessionCatalog, engine.sessionSchema)
    engine.allowlists.tableAccessError(c, s, t) match {
      case Some(err) => Left(err)
      case None =>
        val target =
          if (c.equalsIgnoreCase(cfg.catalog) && s.equalsIgnoreCase(cfg.schema) &&
            spark.catalog.tableExists(t)) quote(t) // session temp view
          else s"${quote(c)}.${quote(s)}.${quote(t)}"
        try {
          val df = spark.table(target)
          Right(df.schema.fields.toSeq.map(f =>
            scala.collection.immutable.ListMap[String, Any](
              "Column" -> f.name,
              "Type" -> TypeNames.trino(f.dataType),
              "Extra" -> "",
              "Comment" -> "")))
        } catch {
          case e: Throwable =>
            Left(s"failed to get table schema: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(2).mkString(" ")}")
        }
    }
  }

  private def quote(ident: String): String = s"`${ident.replace("`", "``")}`"
}

/** Spark → Trino type-name mapping (reference docs/tools.md:117-155
  * shows bigint/varchar/double; full lattice per public Trino docs). */
object TypeNames {
  def trino(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case StringType => "varchar"
    case BinaryType => "varbinary"
    case DateType => "date"
    case TimestampType => "timestamp(6)"
    case TimestampNTZType => "timestamp(6)"
    case t: TimeType => s"time(${t.precision})"
    case _: YearMonthIntervalType => "interval year to month"
    case _: DayTimeIntervalType => "interval day to second"
    case ArrayType(e, _) => s"array(${trino(e)})"
    case MapType(k, v, _) => s"map(${trino(k)}, ${trino(v)})"
    case StructType(fields) =>
      fields.map(f => s"${f.name} ${trino(f.dataType)}").mkString("row(", ", ", ")")
    case NullType => "unknown"
    case other => other.simpleString
  }
}
