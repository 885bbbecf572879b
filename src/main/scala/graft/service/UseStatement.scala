package graft.service

import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}

import graft.engine.Engine

/** Trino's `USE catalog.schema` / `USE schema` — sets the session's
  * default namespace for everything that resolves partial names: plain
  * SQL, the metadata tools' empty-catalog defaults, DESCRIBE/SHOW
  * statement routing, and the opt-in SQL allowlist resolution. The
  * reference passes USE through to Trino, where the session defaults
  * ride the X-Trino-Catalog/Schema headers; the embedded analog stores
  * them on the engine (one engine = one logical session, like the
  * prepared-statement store).
  *
  * Resolution mechanics: the engine's default-catalog tables are
  * session temp views, and Spark resolves an unqualified name to a
  * temp view BEFORE consulting the current catalog — so merely setting
  * Spark's current namespace would leave `USE tpch.tiny; SELECT * FROM
  * customer` reading the default catalog's view (the wrong table,
  * silently). Instead, when the session namespace differs from the
  * configured default, QueryService parses the SQL and QUALIFIES every
  * unresolved 1/2-part relation to the session namespace (3-part names
  * resolve as written) with the same scope-aware CTE walk the SQL
  * allowlist uses, then executes the rewritten plan — Trino's
  * resolution order, enforced at parse level.
  */
object UseStatement {

  private val UseRe =
    """(?is)^\s*USE\s+([A-Za-z_]\w*)(?:\s*\.\s*([A-Za-z_]\w*))?\s*$""".r

  /** Some((catalogOpt, schema)) for USE statements. */
  def matchUse(sql: String): Option[(Option[String], String)] = sql match {
    case UseRe(a, null) => Some((None, a))
    case UseRe(a, b) => Some((Some(a), b))
    case _ => None
  }

  /** Validate the target against the (allowlist-filtered) metadata
    * surface and update the engine session. Trino's error texts. */
  def apply(engine: Engine, catalogOpt: Option[String], schema: String):
      Either[String, Unit] = try {
    val meta = new MetadataService(engine)
    val catalog = catalogOpt.getOrElse(engine.sessionCatalog)
    if (!meta.listCatalogs().exists(_.equalsIgnoreCase(catalog)))
      Left(s"Catalog does not exist: $catalog")
    else if (!meta.listSchemas(catalog).exists(_.equalsIgnoreCase(schema)))
      Left(s"Schema does not exist: $catalog.$schema")
    else {
      engine.sessionCatalog = catalog
      engine.sessionSchema = schema
      Right(())
    }
  } catch {
    // same try/catch-to-Left rule as the SHOW routes: a throwing
    // catalog plugin must surface as a tool error, never a crash
    case e: Throwable =>
      Left(s"query execution failed: ${String.valueOf(e.getMessage).take(300)}")
  }

  /** Qualify unresolved 1/2-part relations to (catalog, schema) —
    * scope-aware: CTE-bound names stay as written where their defining
    * WITH is in scope (same walk as SqlAllowlist), and the engine's
    * internal `graft_*` shim views (information_schema rewrite targets)
    * are never qualified. */
  def qualify(plan: LogicalPlan, catalog: String, schema: String): LogicalPlan = {
    def rewName(parts: Seq[String], scope: Set[String]): Seq[String] =
      parts match {
        case Seq(t) if scope(t.toLowerCase) => parts
        case Seq(t) if t.toLowerCase.startsWith("graft_") => parts
        case Seq(t) => Seq(catalog, schema, t)
        case Seq(s1, _) if s1.equalsIgnoreCase("information_schema") => parts
        case Seq(s1, t) => Seq(catalog, s1, t)
        case _ => parts
      }
    def rew(p: LogicalPlan, scope: Set[String]): LogicalPlan = p match {
      case w: UnresolvedWith =>
        var s = scope
        val newRels = w.cteRelations.map { rel =>
          s = s + rel._1.toLowerCase
          rel.copy(_2 = rew(rel._2, s).asInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias])
        }
        val scopeAll = s
        w.copy(child = rew(w.child, scopeAll), cteRelations = newRels)
      case r: UnresolvedRelation =>
        val parts = rewName(r.multipartIdentifier, scope)
        if (parts == r.multipartIdentifier) r
        else UnresolvedRelation(parts, r.options, r.isStreaming)
      case other =>
        val withChildren = other.mapChildren(rew(_, scope))
        withChildren.transformExpressions {
          case sq: SubqueryExpression => sq.withNewPlan(rew(sq.plan, scope))
        }
    }
    rew(plan, Set.empty)
  }
}
