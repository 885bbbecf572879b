package graft.security

/** Hierarchical catalog/schema/table allowlist filtering and 3/2/1-part
  * table-name resolution, ported from the reference
  * (reference internal/trino/client.go:736-757, 815-895). Case-insensitive
  * exact matching on `c`, `c.s`, `c.s.t`; an empty list means "allow
  * everything" at that level. The reference's README credits this
  * filtering with its 10-20x metadata-workflow speedup — the same
  * filters apply to our metadata listings (they scope listings, not
  * plans; Catalyst never sees them).
  */
final case class Allowlists(
    allowedCatalogs: Seq[String] = Nil,
    allowedSchemas: Seq[String] = Nil,
    allowedTables: Seq[String] = Nil) {

  def isCatalogAllowed(catalog: String): Boolean =
    allowedCatalogs.exists(_.equalsIgnoreCase(catalog))

  def isSchemaAllowed(catalog: String, schema: String): Boolean = {
    val full = s"$catalog.$schema"
    allowedSchemas.exists(_.equalsIgnoreCase(full))
  }

  def isTableAllowed(catalog: String, schema: String, table: String): Boolean = {
    val full = s"$catalog.$schema.$table"
    allowedTables.exists(_.equalsIgnoreCase(full))
  }

  def filterCatalogs(catalogs: Seq[String]): Seq[String] =
    if (allowedCatalogs.isEmpty) catalogs
    else catalogs.filter(isCatalogAllowed)

  def filterSchemas(schemas: Seq[String], catalog: String): Seq[String] =
    if (allowedSchemas.isEmpty) schemas
    else schemas.filter(isSchemaAllowed(catalog, _))

  def filterTables(tables: Seq[String], catalog: String, schema: String): Seq[String] =
    if (allowedTables.isEmpty) tables
    else tables.filter(isTableAllowed(catalog, schema, _))

  /** Table-allowlist gate for schema fetches: deny only when a table
    * allowlist is configured (client.go:760-764). */
  def tableAccessError(catalog: String, schema: String, table: String): Option[String] =
    if (allowedTables.nonEmpty && !isTableAllowed(catalog, schema, table))
      Some(s"table access denied: $catalog.$schema.$table not in allowlist")
    else None
}

object Allowlists {

  /** 3/2/1-part name resolution with defaults — the allowlist check must
    * run AFTER this (the reference fixed exactly that bug;
    * client_test.go:389). Returns (catalog, schema, table). */
  def resolveTable(catalog: String, schema: String, table: String,
      defaultCatalog: String, defaultSchema: String): (String, String, String) = {
    val parts = table.split("\\.", -1)
    if (parts.length == 3) (parts(0), parts(1), parts(2))
    else if (parts.length == 2) {
      val c = if (catalog.isEmpty) defaultCatalog else catalog
      (c, parts(0), parts(1))
    } else {
      val c = if (catalog.isEmpty) defaultCatalog else catalog
      val s = if (schema.isEmpty) defaultSchema else schema
      (c, s, table)
    }
  }
}
