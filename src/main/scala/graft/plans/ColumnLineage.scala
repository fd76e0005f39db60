package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Window}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** COLUMN-LEVEL LINEAGE from the analyzed plan — the metadata every
  * governed pipeline owes its catalog: for each output column of a
  * query, which (source table, source column) pairs feed it. Catalyst
  * already knows; this walks the plan and says it out loud.
  *
  * The walk is a bottom-up dataflow closure over expression ids:
  * file-scan leaves seed `ExprId → {(table, column)}`, every aliasing
  * operator (Project / Aggregate / Window) extends the map with the
  * union of the sources its expression references, and every other
  * operator (joins, filters, unions by position, generators) passes
  * attributes through unchanged. The result for an output attribute
  * is the TRANSITIVE source set — `sum(a*b) as x` over a join traces
  * x to both tables' columns, a key used only in the join condition
  * traces to nothing downstream (lineage is value-flow, not
  * provenance-of-filtering; control-flow lineage is a different
  * report and is named honestly in the scaladoc).
  *
  * Deterministic by construction — two runs of the same query yield
  * the same edges — so the report is oracle-checkable as data. Cost is
  * a driver-side plan walk: O(plan), no job runs.
  */
object ColumnLineage {

  /** (output column, source table, source column) edges, one row per
    * edge, table = the scan root's basename. */
  def edges(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val sources = scala.collection.mutable.HashMap[ExprId, Set[(String, String)]]()

    def tableName(l: LogicalRelation): String = l.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.nonEmpty =>
        new Path(fs.location.rootPaths.head.toString).getName
          .stripSuffix(".parquet")
      case _ => "unknown"
    }

    def srcOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Set[(String, String)] =
      e.references.toSeq.flatMap(a => sources.getOrElse(a.exprId, Set.empty)).toSet

    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p match {
        case l: LogicalRelation =>
          val t = tableName(l)
          l.output.foreach(a => sources(a.exprId) = Set((t, a.name)))
        case proj: Project =>
          proj.projectList.foreach(bind)
        case agg: Aggregate =>
          agg.aggregateExpressions.foreach(bind)
        case w: Window =>
          w.windowExpressions.foreach(bind)
        case other =>
          // generators, unions, etc.: any NamedExpression the node
          // produces binds; plain pass-through attributes already
          // resolve through their expr ids
          other.expressions.foreach {
            case ne: NamedExpression => bind(ne)
            case _                   => ()
          }
      }
    }

    def bind(ne: NamedExpression): Unit = ne match {
      case a: Alias        => sources(a.exprId) = srcOf(a.child)
      case a: Attribute    => if (!sources.contains(a.exprId)) sources(a.exprId) = Set.empty
      case _               => ()
    }

    walk(plan)
    plan.output
      .flatMap(a =>
        sources.getOrElse(a.exprId, Set.empty).toSeq.map { case (t, c) => (a.name, t, c) }
      )
      .distinct
      .sortBy(identity)
  }
}
