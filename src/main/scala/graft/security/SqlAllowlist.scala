package graft.security

import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedTableOrView}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
import org.apache.spark.sql.execution.command.ExplainCommand

/** OPT-IN allowlist enforcement inside arbitrary SQL — hardening BEYOND
  * the reference, which gates only the metadata tools (listings +
  * get_table_schema; `execute_query` SQL passes through unchecked, see
  * DIALECT.md "Allowlists inside arbitrary SQL"). When
  * `GRAFT_ENFORCE_SQL_ALLOWLISTS=true`, every relation a query
  * references is resolved with the reference's 3/2/1-part rules and
  * checked against the same catalog/schema/table allowlists the
  * metadata surface uses, BEFORE analysis — a denied query never
  * reaches the catalog.
  *
  * The walk runs on the PARSED (unresolved) tree: relation names are
  * judged as written, subqueries included, CTE-bound names excluded
  * (shadowing over-approximates: any name bound by any WITH clause in
  * the statement is exempt — a CTE named like a real table would mask
  * it, which is the CTE's behavior anyway). `information_schema`
  * references are exempt: the shim views are rebuilt allowlist-filtered
  * on every query. `EXPLAIN <q>` walks the explained query.
  */
object SqlAllowlist {

  /** First allowlist violation in the plan, or None when clean. */
  def check(plan: LogicalPlan, lists: Allowlists,
      defaultCatalog: String, defaultSchema: String): Option[String] = {
    // CTE definitions hang off UnresolvedWith as a FIELD (innerChildren),
    // not as children — collect misses them; walk them explicitly and
    // recursively so a denied table inside a CTE body is still judged.
    def withCteBodies(p: LogicalPlan): Seq[LogicalPlan] = {
      val bodies = p.collectWithSubqueries {
        case w: UnresolvedWith => w.cteRelations.map(_._2: LogicalPlan)
      }.flatten
      p +: bodies.flatMap(withCteBodies)
    }
    val plans = expand(plan).flatMap(withCteBodies)
    val cteNames: Set[String] = plans.flatMap(_.collectWithSubqueries {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
    }.flatten).toSet

    val names: Seq[Seq[String]] = plans.flatMap(_.collectWithSubqueries {
      case r: UnresolvedRelation => Seq(r.multipartIdentifier)
      case t: UnresolvedTableOrView => Seq(t.multipartIdentifier)
    }.flatten)

    names.iterator.flatMap { parts =>
      val lower = parts.map(_.toLowerCase)
      if (parts.length == 1 && cteNames(lower.head)) None
      else if (lower.contains("information_schema")) None
      else {
        val (c, s, t) = parts match {
          case Seq(t1) => (defaultCatalog, defaultSchema, t1)
          case Seq(s1, t1) => (defaultCatalog, s1, t1)
          case _ => (parts(0), parts(1), parts.drop(2).mkString("."))
        }
        if (lists.allowedCatalogs.nonEmpty && !lists.isCatalogAllowed(c))
          Some(s"catalog access denied: $c not in allowlist")
        else if (lists.allowedSchemas.nonEmpty && !lists.isSchemaAllowed(c, s))
          Some(s"schema access denied: $c.$s not in allowlist")
        else lists.tableAccessError(c, s, t)
      }
    }.take(1).toSeq.headOption
  }

  /** EXPLAIN wraps its query as a non-child field — surface it. */
  private def expand(plan: LogicalPlan): Seq[LogicalPlan] = plan match {
    case e: ExplainCommand => Seq(e, e.logicalPlan)
    case p => Seq(p)
  }
}
