package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  AttributeReference,
  Expression,
  NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression,
  AggregateFunction,
  Count,
  Max,
  Min,
  Sum
}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Automatic materialized-view query rewrite — a Catalyst
  * `Rule[LogicalPlan]` (the engine's preference-order step (c):
  * whole-plan semantics the built-in operators cannot express).
  *
  * The engine already maintains aggregate state incrementally
  * ([[graft.operators.FeedView]] folds a table's change feed into a
  * groups-scaled state table), but consumers had to KNOW about the
  * view and query it directly. This rule makes the view transparent:
  * a query aggregating the BASE table — `scan(base) → [filter on
  * group columns] → groupBy(G) agg(count/sum/min/max)` — is rewritten
  * during optimization into the equivalent rollup over the view:
  * `scan(view) → [filter] → groupBy(G) agg(sum(cnt)/sum(sum_x)/
  * min(min_x)/max(max_x))`. At 100 TB that turns a corpus-wide scan +
  * shuffle into a groups-scaled one — the classic OLAP summary-table
  * rewrite (Gupta & Mumick's materialized-view literature; the same
  * contract Calcite's `MaterializedViewRule` and BigQuery/Redshift
  * "smart tuning" implement) — with Catalyst doing the matching where
  * a human would have to rewrite SQL.
  *
  * Soundness requirements, enforced structurally:
  *   - the rewritten aggregate re-aggregates PER GROUP, so it is exact
  *     whenever the view partitions the base rows by the view's group
  *     columns — count/sum/min/max decompose losslessly over any
  *     partition of their input; avg/count-distinct do NOT and are
  *     never matched (no mapping exists → the query keeps its base
  *     scan);
  *   - base-side filters may reference GROUP COLUMNS ONLY (a predicate
  *     over a non-group column would need row-level data the view no
  *     longer has → no rewrite);
  *   - GROUPED aggregates only: a global (group-less) aggregate over
  *     an EMPTY base returns one row (count = 0) where the empty view
  *     returns none — rather than special-case emptiness, group-less
  *     plans are left alone;
  *   - the rewritten expressions must reproduce the original output
  *     types EXACTLY (checked per expression; any mismatch abandons
  *     the rewrite) and keep the original expression IDs, so parent
  *     operators resolve against the rewritten aggregate unchanged.
  *
  * Freshness is the registrar's contract (same as every summary-table
  * system): [[register]] declares "this view IS the base's aggregate
  * as of now"; writers that change the base must refresh the view
  * (e.g. via FeedView's O(changes) fold) before re-registering, or
  * [[unregister]] first. The registry is empty by default, so the
  * rule is a no-op for every query that never opted in.
  */
object ViewRewrite {

  /** How one base-side aggregate call maps onto the view:
    * `fn` ∈ count|sum|min|max, `baseCol` the base column it aggregates
    * ("" for count), `viewCol` the view column holding the per-group
    * partial. */
  final case class ViewAgg(fn: String, baseCol: String, viewCol: String)

  private final case class ViewDef(
      rel: LogicalRelation,
      groupCols: Set[String],
      aggs: Seq[ViewAgg]
  )

  // keyed by the qualified base directory; ConcurrentHashMap because
  // registration happens on query threads while the optimizer reads
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ViewDef]()

  private def qualify(s: SparkSession, dir: String): String = {
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).makeQualified(p).toString
  }

  /** Declare `viewPath` as the materialization of
    * `SELECT groupCols, <aggs> FROM baseDir GROUP BY groupCols`,
    * enabling the rewrite for queries scanning `baseDir`. The view
    * relation is analyzed ONCE here; each rewrite instantiates fresh
    * attribute ids from it. */
  def register(
      s: SparkSession,
      baseDir: String,
      viewPath: String,
      groupCols: Seq[String],
      aggs: Seq[ViewAgg]
  ): Unit = {
    val analyzed = s.read.parquet(viewPath).queryExecution.analyzed.collectFirst {
      case l: LogicalRelation => l
    }
    require(analyzed.isDefined, s"view at $viewPath did not analyze to a file relation")
    val vCols = analyzed.get.output.map(_.name).toSet
    (groupCols ++ aggs.map(_.viewCol)).foreach(c =>
      require(vCols.contains(c), s"view at $viewPath is missing column $c")
    )
    registry.put(qualify(s, baseDir), ViewDef(analyzed.get, groupCols.toSet, aggs)): Unit
  }

  def unregister(s: SparkSession, baseDir: String): Unit =
    registry.remove(qualify(s, baseDir)): Unit

  def install(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RewriteRule)

  private object RewriteRule extends Rule[LogicalPlan] {
    def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else
        plan.transformDown { case agg: Aggregate =>
          tryRewrite(agg).getOrElse(agg)
        }
  }

  /** The scan shapes the rewrite accepts below the Aggregate: the base
    * relation, optionally under a pure column-pruning Project and/or a
    * group-column-only Filter (the optimizer pushes filters below
    * projects, so Filter sits closest to the scan). */
  private def decompose(
      plan: LogicalPlan
  ): Option[(LogicalRelation, Option[Expression])] = plan match {
    case l: LogicalRelation => Some((l, None))
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      decompose(child)
    case Filter(cond, child) =>
      decompose(child).flatMap {
        case (l, None) => Some((l, Some(cond)))
        case _         => None // two filters — let the optimizer fuse them first
      }
    case _ => None
  }

  private def baseDefOf(l: LogicalRelation): Option[ViewDef] = l.relation match {
    case fs: HadoopFsRelation =>
      import scala.jdk.CollectionConverters._
      val roots = fs.location.rootPaths.map(_.toString)
      // every root the scan reads must sit under the registered base
      registry.asScala.collectFirst {
        case (base, d)
            if roots.nonEmpty && roots.forall(r => r == base || r.startsWith(base + "/")) =>
          d
      }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = {
    if (agg.groupingExpressions.isEmpty) return None
    val (baseRel, cond) = decompose(agg.child) match {
      case Some(x) => x
      case None    => return None
    }
    val vdef = baseDefOf(baseRel) match {
      case Some(d) => d
      case None    => return None
    }
    // grouping must be plain attributes within the view's group set
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if vdef.groupCols.contains(a.name) => a
      case _                                                        => return None
    }
    // a filter may touch group columns only
    if (cond.exists(_.references.exists {
        case a: AttributeReference => !vdef.groupCols.contains(a.name)
        case _                     => true
      })) return None

    val vrel = vdef.rel.newInstance()
    val vOut = vrel.output.map(a => a.name -> a).toMap

    def mapFn(f: AggregateFunction): Option[AggregateFunction] = f match {
      case c: Count if c.children.forall(_.foldable) =>
        vdef.aggs.find(_.fn == "count").map(s => Sum(vOut(s.viewCol)))
      case Sum(a: AttributeReference, _) =>
        vdef.aggs.find(s => s.fn == "sum" && s.baseCol == a.name).map(s => Sum(vOut(s.viewCol)))
      case Min(a: AttributeReference) =>
        vdef.aggs.find(s => s.fn == "min" && s.baseCol == a.name).map(s => Min(vOut(s.viewCol)))
      case Max(a: AttributeReference) =>
        vdef.aggs.find(s => s.fn == "max" && s.baseCol == a.name).map(s => Max(vOut(s.viewCol)))
      case _ => None
    }

    // remap one output expression: every AggregateExpression swaps to
    // its view-side rollup, every remaining attribute (grouping
    // columns, possibly under collapsed-Project aliases or scalar
    // post-processing like casts) resolves by name against the view.
    // transformDown, so an aggregate's BASE-column children are
    // replaced wholesale with the mapped function before the
    // attribute case could reject them.
    var failed = false
    def remap(e: Expression): Expression = e.transformDown {
      case ae: AggregateExpression =>
        if (ae.isDistinct || ae.filter.nonEmpty) { failed = true; ae }
        else
          mapFn(ae.aggregateFunction) match {
            case Some(nf) if nf.dataType == ae.dataType => nf.toAggregateExpression()
            case _                                      => failed = true; ae
          }
      case a: AttributeReference =>
        vOut.getOrElse(a.name, { failed = true; a })
    }

    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      // a bare grouping attribute must keep its expression id — alias
      // the view attribute back to it
      case a: AttributeReference if vOut.contains(a.name) =>
        Alias(vOut(a.name), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      case al: Alias =>
        remap(al) match {
          case n: NamedExpression => n
          case _                  => failed = true; al
        }
      case _ => return None
    }

    val remappedCond = cond.map(remap)
    if (failed) return None
    val newChild = remappedCond match {
      case Some(c) => Filter(c, vrel)
      case None    => vrel
    }
    Some(Aggregate(groupAttrs.map(a => vOut(a.name)), newAggExprs, newChild))
  }
}
