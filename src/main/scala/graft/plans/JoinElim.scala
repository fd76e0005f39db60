package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, countDistinct, lit}

/** Informational referential constraints + JOIN ELIMINATION — the
  * engine's second query-rewriting `Rule[LogicalPlan]` (ViewRewrite
  * answers aggregates from summaries; this removes provably-useless
  * joins).
  *
  * The pattern: normalized schemas join facts to dimensions even when
  * a query ultimately projects fact columns only — hand-written SQL,
  * view stacks, and generated BI queries do it constantly. When a
  * declared foreign key guarantees every fact row matches EXACTLY ONE
  * dimension row, the inner join neither filters nor duplicates, so
  *
  *   Project(cols ⊆ fact) ∘ Join_inner(fact.fk = dim.pk)  ==>  Project ∘ fact
  *
  * and a 100 TB fact table skips the dimension shuffle/broadcast
  * entirely. This is Snowflake/Oracle RELY-constraint join
  * elimination; Spark itself has no FK metadata, which is why it
  * cannot do this (Calcite does, via `RelMdUniqueKeys`).
  *
  * Soundness needs exactly three facts, all VALIDATED at declaration
  * time (one pass each, the ALTER TABLE ADD CONSTRAINT contract):
  *   - pk is UNIQUE in the dimension (join cannot duplicate),
  *   - fk is NON-NULL in the fact (inner join cannot drop null rows),
  *   - every fk value exists in pk (join cannot filter).
  * After declaration the constraint is informational — writers that
  * break it break the rewrite (the RELY model); re-declare after
  * loads, or don't declare volatile pairs.
  *
  * Structural guards: inner joins only, single-equality condition on
  * the declared pair, the dimension side must be its bare scan
  * (possibly column-pruned — a filtered dimension can drop rows and
  * the join becomes selective), the surviving output must reference
  * fact columns only, and the fk attribute must TRACE (by exprId,
  * through value-preserving, non-null-extending operators only) to
  * the declared fact relation's own scan output — a derived column
  * renamed to the fk, an fk surfaced from a different relation in a
  * multi-relation fact side, or an fk null-extended by an outer join
  * below all carry values the declaration never validated, and the
  * rule declines.
  */
object JoinElim {

  private final case class Fk(factDir: String, fkCol: String, dimDir: String, pkCol: String)

  private val registry = java.util.concurrent.ConcurrentHashMap.newKeySet[Fk]()

  private def qualify(s: SparkSession, dir: String): String = {
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).makeQualified(p).toString
  }

  /** Declare fact.fk → dim.pk after validating uniqueness, non-null
    * and referential integrity against the CURRENT data. */
  def declare(
      s: SparkSession,
      factDir: String,
      fkCol: String,
      dimDir: String,
      pkCol: String
  ): Unit = {
    val dim = s.read.parquet(dimDir)
    val fact = s.read.parquet(factDir)
    val u = dim.agg(count(lit(1)), countDistinct(col(pkCol)), count(col(pkCol))).head()
    require(
      u.getLong(0) == u.getLong(1) && u.getLong(0) == u.getLong(2),
      s"$dimDir.$pkCol is not a unique non-null key (${u.getLong(0)} rows, ${u.getLong(1)} distinct, ${u.getLong(2)} non-null)"
    )
    val nulls = fact.filter(col(fkCol).isNull).count()
    require(nulls == 0, s"$factDir.$fkCol holds $nulls NULLs — inner-join elimination unsound")
    val orphans = fact
      .select(col(fkCol))
      .join(dim.select(col(pkCol)), col(fkCol) === col(pkCol), "left_anti")
      .count()
    require(orphans == 0, s"$factDir.$fkCol has $orphans values missing from $dimDir.$pkCol")
    registry.add(Fk(qualify(s, factDir), fkCol, qualify(s, dimDir), pkCol)): Unit
  }

  def undeclare(s: SparkSession, factDir: String, fkCol: String): Unit = {
    val q = qualify(s, factDir)
    registry.removeIf(f => f.factDir == q && f.fkCol == fkCol): Unit
  }

  def install(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => EliminationRule)

  private def rootOf(l: LogicalRelation): Option[String] = l.relation match {
    case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
      Some(fs.location.rootPaths.head.toString)
    case _ => None
  }

  /** The dimension side must be its bare (possibly column-pruned)
    * scan — anything else (a filter, a subquery) can change the row
    * set and the join is no longer a no-op. */
  private def bareScan(plan: LogicalPlan): Option[LogicalRelation] = plan match {
    case l: LogicalRelation => Some(l)
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      bareScan(child)
    case _ => None
  }

  /** The scan that PRODUCES `attr` with its values unmodified — the
    * fk soundness anchor. Follows the attribute's exprId down the
    * fact side, admitting only operators that neither derive the
    * column nor null-extend its side: pass-through projections (the
    * attribute itself, or an alias of a bare attribute), filters,
    * subquery aliases, and joins where the attribute's side keeps its
    * rows non-null-extended (filtering/duplicating the fact side is
    * fine — surviving fk values remain a subset of the validated
    * ones). Anything else — a COMPUTED alias (`fk + 1` renamed back),
    * a union (rows from OTHER relations flow out under the first
    * child's attribute ids), an aggregate, the null-producing side of
    * an outer join — returns None and the rewrite declines. Returns
    * the scan AND its output attribute so the caller matches the
    * declared column by its SCAN-level name, not whatever the query
    * renamed it to. */
  private def producerScan(
      plan: LogicalPlan,
      attr: Attribute
  ): Option[(LogicalRelation, Attribute)] = plan match {
    case l: LogicalRelation =>
      if (l.outputSet.contains(attr)) Some((l, attr)) else None
    case p: Project =>
      p.projectList.find(_.exprId == attr.exprId).flatMap {
        case ar: AttributeReference => producerScan(p.child, ar)
        case al: Alias =>
          al.child match {
            case c: AttributeReference => producerScan(p.child, c)
            case _                     => None // derived column — not the scan's values
          }
        case _ => None
      }
    case f: Filter       => producerScan(f.child, attr)
    case a: SubqueryAlias => producerScan(a.child, attr)
    case j: Join =>
      val fromLeft = j.left.outputSet.contains(attr)
      val child = if (fromLeft) j.left else j.right
      if (!fromLeft && !j.right.outputSet.contains(attr)) None
      else {
        val notNullExtended = j.joinType match {
          case Inner | Cross                   => true
          case LeftOuter | LeftSemi | LeftAnti => fromLeft
          case RightOuter                      => !fromLeft
          case _                               => false // full outer etc.
        }
        if (notNullExtended) producerScan(child, attr) else None
      }
    case _ => None
  }

  private def declaredFor(
      factSide: LogicalPlan,
      dimScan: LogicalRelation,
      fkAttr: Attribute,
      pkAttr: Attribute
  ): Boolean = {
    val dimRoot = rootOf(dimScan)
    producerScan(factSide, fkAttr).exists { case (scan, scanAttr) =>
      rootOf(scan).exists { fr =>
        dimRoot.exists { dr =>
          registry
            .stream()
            .anyMatch(f =>
              f.dimDir == dr && f.pkCol == pkAttr.name &&
                f.fkCol == scanAttr.name && f.factDir == fr
            )
        }
      }
    }
  }

  /** The fact side, when the join is provably a per-row no-op for a
    * consumer referencing `refs` only. */
  private def surviving(
      j: Join,
      refs: org.apache.spark.sql.catalyst.expressions.AttributeSet
  ): Option[LogicalPlan] = j match {
    case Join(left, right, Inner, Some(EqualTo(a, b)), _) =>
      def tryElim(fact: LogicalPlan, dimPlan: LogicalPlan): Option[LogicalPlan] =
        if (!refs.subsetOf(fact.outputSet)) None
        else
          bareScan(dimPlan).flatMap { dim =>
            val ok = Seq((a, b), (b, a)).exists {
              case (fk: Attribute, pk: Attribute) =>
                fact.outputSet.contains(fk) && dim.outputSet.contains(pk) &&
                  declaredFor(fact, dim, fk, pk)
              case _ => false
            }
            if (ok) Some(fact) else None
          }
      tryElim(left, right).orElse(tryElim(right, left))
    case _ => None
  }

  private object EliminationRule extends Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else
        plan.transformUp {
          case p @ Project(pl, j: Join) =>
            surviving(j, AttributeSet(pl.flatMap(_.references)))
              .map(f => Project(pl, f))
              .getOrElse(p)
          case ag: Aggregate if ag.child.isInstanceOf[Join] =>
            surviving(
              ag.child.asInstanceOf[Join],
              AttributeSet(
                (ag.groupingExpressions ++ ag.aggregateExpressions).flatMap(_.references)
              )
            ).map(f => ag.withNewChildren(Seq(f)).asInstanceOf[Aggregate]).getOrElse(ag)
        }
  }
}
