package graft.mask

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** The `employees_masked` security view (ref: init-scripts/init-db.sql:74-89)
  * as a Catalyst resolution rule (SURVEY §7.3: "a thin rule injecting
  * when(...) projections over flagged columns") — the engine-level
  * alternative to the view-function [[Masking.maskedView]]: with the rule
  * installed, EVERY query path (spark.sql, DataFrame, a BI tool on top)
  * sees masked data for the BI role, not just code that remembered to call
  * the view.
  *
  * Session configuration:
  *   - `graft.mask.biuser`  — the session role; masking applies when true
  *     (the reference's `current_user = 'sportadvantagebiuser'` test)
  *   - `graft.mask.tables`  — comma-separated relation/view names to protect
  *   - `graft.mask.columns` — comma-separated column names to NULL out
  *
  * The injected Project replaces protected columns with typed NULL literals
  * at RESOLUTION time, so downstream pruning/pushdown still applies — a
  * masked column that is also filtered on folds to a constant predicate.
  * Installed via [[graft.functions.GraftExtensions]].
  */
case class MaskingRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def conf(key: String, default: String): String =
    spark.conf.getOption(key).getOrElse(default)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf("graft.mask.biuser", "false").toBoolean) return plan
    val tables = conf("graft.mask.tables", "").split(",").map(_.trim).filter(_.nonEmpty).toSet
    val columns = conf("graft.mask.columns", "first_name,last_name,address")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    if (tables.isEmpty) return plan

    plan.resolveOperatorsUp {
      case sa @ SubqueryAlias(ident, child)
          if child.resolved && tables.contains(ident.name) &&
            sa.getTagValue(MaskingRule.MaskedTag).isEmpty &&
            child.output.exists(a => columns.contains(a.name)) =>
        val projected = child.output.map { attr =>
          if (columns.contains(attr.name))
            // keep the original exprId: operators above this alias already
            // reference it, and a fresh id would orphan them
            Alias(Literal(null, attr.dataType), attr.name)(
              exprId = attr.exprId, qualifier = attr.qualifier)
          else attr
        }
        val masked = SubqueryAlias(ident, Project(projected, child))
        masked.setTagValue(MaskingRule.MaskedTag, true) // idempotency marker
        masked
    }
  }
}

object MaskingRule {
  /** Marks an alias already rewritten — the analyzer runs rules to fixpoint,
    * so the rewrite must not re-apply to its own output. */
  val MaskedTag: TreeNodeTag[Boolean] = new TreeNodeTag[Boolean]("graft.mask.applied")
}
