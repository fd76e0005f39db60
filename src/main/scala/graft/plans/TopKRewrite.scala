package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  Attribute,
  AttributeSet,
  BoundReference,
  EqualTo,
  Expression,
  GenericInternalRow,
  GreaterThan,
  GreaterThanOrEqual,
  IntegerLiteral,
  JoinedRow,
  LessThan,
  LessThanOrEqual,
  RowNumber,
  SortOrder,
  UnsafeProjection,
  UnsafeRow,
  WindowExpression,
  WindowSpecDefinition
}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter,
  LogicalPlan,
  UnaryNode,
  Window,
  WindowGroupLimit
}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator — the engine's first full
  * preference-order-(c) extension: a custom `LogicalPlan` node, a
  * `Rule[LogicalPlan]` that plants it, a `SparkStrategy` that plans it,
  * and two `SparkPlan` operators that execute it, all registered via
  * `SparkSessionExtensions`.
  *
  * The pattern it targets is the most common anti-scale plan in
  * analytics code: `row_number().over(partitionBy(P).orderBy(O))`
  * filtered to `rn <= k`. Spark executes that as a FULL SORT of every
  * partition's rows (WindowExec requires sorted input; since 3.5
  * `WindowGroupLimitExec` pre-filters each task to its local top-k,
  * but the surviving rows are still sorted twice — once per shuffle
  * side — and the Window pass still runs). This engine's own PlanLint
  * bans that shape in ANN paths and every banned call site was
  * hand-converted to the `top_k_structs` bounded heap. The rule below
  * automates exactly that conversion inside the optimizer:
  *
  *   Filter(rn <= k, Window([rn := row_number() over (P, O)], child))
  *     ==>  TopKPerKey(P, O, k, rn, child)
  *
  * planned as
  *
  *   FinalTopKExec(P, O, k, rn)          per-key heap + rank emit
  *     <- hash exchange on P             (inserted by EnsureRequirements;
  *                                        elided when child is already
  *                                        hash-partitioned on P)
  *       <- PartialTopKExec(P, O, k)     map-side per-key heap
  *
  * Each side keeps one bounded heap per key (O(keys·k) state, never a
  * sort), so per-task work is O(n log k) versus the sort's O(n log n),
  * the exchange ships at most k rows per key per task (the same
  * map-side-combine contract as partial aggregation), and no Window
  * operator runs at all. Output — including the rank column, kept
  * under the original expression id so parent operators resolve
  * unchanged — is bit-identical to the window formulation whenever the
  * ordering O is total; under ties both formulations are
  * tie-arbitrary (WindowExec's sort is unstable), so the rewrite never
  * loses determinism the original plan had.
  *
  * Soundness guards: single row_number window expression only (rank()/
  * dense_rank() admit >k rows under ties — never matched), non-empty
  * partition spec (global top-k already plans as TakeOrderedAndProject),
  * the filter must be exactly one rank bound with k >= 1, and the
  * WindowGroupLimit node Spark may already have inserted below the
  * Window is absorbed (its work is subsumed by the partial heap).
  * Kill-switch: `spark.graft.topk.rewrite` (default on).
  *
  * Scale note: per-task heap state is O(distinct keys in task × k)
  * rows. That is the partial-aggregation memory contract, NOT the
  * window sort's O(task rows) — strictly smaller whenever k is small,
  * which is the only regime the pattern is written for.
  */
object TopKRewrite {

  val ConfKey = "spark.graft.topk.rewrite"

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteRule)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }

  /** The rank reference, possibly under the widening cast that
    * `row_number().cast("long")` pushes down with the filter
    * (order-preserving, so the bound transfers to the int rank). */
  private object RankRef {
    def unapply(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case c: org.apache.spark.sql.catalyst.expressions.Cast
          if c.dataType == org.apache.spark.sql.types.LongType =>
        c.child match {
          case a: Attribute => Some(a)
          case _            => None
        }
      case _ => None
    }
  }

  /** An int or long literal bound that fits in the int rank domain. */
  private object KLit {
    def unapply(e: Expression): Option[Int] = e match {
      case IntegerLiteral(k) => Some(k)
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, org.apache.spark.sql.types.LongType)
          if v >= Int.MinValue && v <= Int.MaxValue =>
        Some(v.toInt)
      case _ => None
    }
  }

  /** `rn <= k` in any of its spellings, normalized to the inclusive k. */
  private object RankBound {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(RankRef(a), KLit(k))    => Some((a, k))
      case LessThan(RankRef(a), KLit(k))           => Some((a, k - 1))
      case GreaterThanOrEqual(KLit(k), RankRef(a)) => Some((a, k))
      case GreaterThan(KLit(k), RankRef(a))        => Some((a, k - 1))
      case EqualTo(RankRef(a), KLit(1))            => Some((a, 1))
      case EqualTo(KLit(1), RankRef(a))            => Some((a, 1))
      case _                                       => None
    }
  }

  private object RewriteRule extends Rule[LogicalPlan] {
    def apply(plan: LogicalPlan): LogicalPlan =
      if (conf.getConfString(ConfKey, "true") != "true") plan
      else
        plan.transformUp {
          case f @ Filter(RankBound(rankRef, k), w: Window)
              if k >= 1 && w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty &&
                w.windowExpressions.size == 1 =>
            w.windowExpressions.head match {
              case alias @ Alias(
                    WindowExpression(RowNumber(), WindowSpecDefinition(ps, os, _)),
                    _
                  )
                  if rankRef.semanticEquals(alias.toAttribute) &&
                    ps == w.partitionSpec && os == w.orderSpec =>
                // absorb the local pre-filter Spark may already have planted;
                // the partial heap strictly subsumes it
                val child = w.child match {
                  case WindowGroupLimit(_, _, _, _, inner) => inner
                  case other                               => other
                }
                TopKPerKey(w.partitionSpec, w.orderSpec, k, alias.toAttribute, child)
              case _ => f
            }
        }
  }

  private object TopKStrategy extends SparkStrategy {
    def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKey(part, order, k, rankAttr, child) =>
        FinalTopKExec(part, order, k, rankAttr, PartialTopKExec(part, order, k, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Per-partition (keys × bounded-heap) pass shared by both exec
    * nodes: one hash map of per-key heaps holding each key's current
    * best ≤ k rows (worst-on-top so eviction is O(log k)).
    */
  private[plans] def heapsOf(
      iter: Iterator[InternalRow],
      partition: Seq[Expression],
      order: Seq[SortOrder],
      input: Seq[Attribute],
      k: Int
  ): java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(partition, input)
    val ord = new LazilyGeneratedOrdering(order, input)
    // worst of the kept k on top => reverse of the rank ordering
    val heapCmp = ord.reverse
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k.min(16).max(1), heapCmp)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll(): Unit
        heap.add(row.copy()): Unit
      }
    }
    heaps
  }
}

/** Logical per-key top-k. Output is the child's columns plus the rank
  * attribute of the window alias it replaced (same expression id, so
  * parents resolve unchanged). */
case class TopKPerKey(
    partition: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Map-side bounded heaps: emits each task's per-key top-k candidates
  * (no rank yet — ranks are only decidable after the exchange). */
case class PartialTopKExec(
    partition: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan
) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val (part, ord, in, kk) = (partition, order, child.output, k)
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      TopKRewrite.heapsOf(iter, part, ord, in, kk).values.asScala.iterator.flatMap(_.iterator.asScala)
    }, preservesPartitioning = true)
  }
}

/** Reduce-side heaps over the co-located candidates; emits each key's
  * rows in rank order with the rank column appended. */
case class FinalTopKExec(
    partition: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan
) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partition) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val (part, ordSpec, in, kk) = (partition, order, child.output, k)
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      val heaps = TopKRewrite.heapsOf(iter, part, ordSpec, in, kk)
      val ord = new LazilyGeneratedOrdering(ordSpec, in)
      val proj = UnsafeProjection.create(
        outAttrs.zipWithIndex.map { case (a, i) => BoundReference(i, a.dataType, a.nullable) }
      )
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      heaps.values.asScala.iterator.flatMap { heap =>
        val rows = heap.toArray(new Array[InternalRow](heap.size)).sorted(ord)
        rows.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, i + 1)
          proj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
}
