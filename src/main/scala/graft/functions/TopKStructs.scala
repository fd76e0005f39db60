package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `top_k_structs(s, k) -> ARRAY<STRUCT>` — the k SMALLEST input
  * structs under the struct type's natural (lexicographic, NULLS
  * FIRST, ascending) ordering, returned sorted ascending.
  *
  * This is the scale-correct top-k: a bounded heap per group with
  * map-side partial aggregation (ObjectHashAggregateExec), so each
  * input partition reduces to ≤ k rows per group BEFORE any exchange
  * and the shuffle carries heaps, never the scanned relation. The
  * `row_number().over(Window.partitionBy(anchor))`-then-filter
  * formulation it replaces in the ANN scan family
  * (q40/q147/q150/q152/q153/q154) hashes the full corpus×anchors
  * stream into ~|anchors| window partitions — a skew-by-construction
  * exchange plus a full local sort; Spark's InferWindowGroupLimit
  * bounds that shuffle (Partial mode) but keeps the O(n log n)
  * per-partition sort and never fires for exclusion filters like
  * q150's `nrank > 5`. The heap pass is one O(n log k) scan, no sort,
  * no corpus-scaled exchange, and works for any downstream slicing.
  *
  * Ordering is total as long as callers append a unique tie-breaker
  * field (every call site orders by (score, vec_id)); descending
  * score = negate the score in the struct (exact for IEEE doubles and
  * for the bounded integer scores used here). Determinism: merge of
  * partial heaps under a total order is order-independent, so results
  * are bit-stable across partitionings — the property that keeps
  * these queries oracle-hash-exact.
  *
  * NULL structs are ignored (never produced by the call sites, which
  * aggregate `struct(...)` of non-null fields); groups smaller than k
  * return all their rows.
  */
object TopKStructs {
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        new FunctionIdentifier("top_k_structs"),
        new ExpressionInfo(classOf[TopKStructsAgg].getName, "top_k_structs"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "top_k_structs takes (struct, k)")
          val k = children(1) match {
            case e if e.foldable && e.dataType == IntegerType =>
              e.eval().asInstanceOf[Int]
            case other =>
              throw new IllegalArgumentException(
                s"top_k_structs k must be an integer literal, got $other"
              )
          }
          TopKStructsAgg(children.head, k)
        }
      )
    )
}

case class TopKStructsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
    with UnaryLike[Expression] {

  require(k > 0, s"top_k_structs k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType =>
      TypeUtils.checkForOrderingExpr(s, prettyName)
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"top_k_structs requires a STRUCT argument, got ${other.simpleString}"
      )
  }

  private def elemType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_structs"

  /** Natural ascending ordering of the struct type; the buffer is a
    * MAX-heap of the k smallest seen (root = current worst kept), so
    * most rows cost one root comparison and no allocation churn.
    */
  @transient private lazy val asc: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(elemType).asInstanceOf[Ordering[InternalRow]]

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(asc)

  override def update(
      heap: mutable.PriorityQueue[InternalRow],
      input: InternalRow
  ): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (heap.size < k) {
        heap.enqueue(row.copy()) // eval rows are backed by reused buffers
      } else if (asc.lt(row, heap.head)) {
        heap.dequeue(): Unit
        heap.enqueue(row.copy())
      }
    }
    heap
  }

  override def merge(
      h1: mutable.PriorityQueue[InternalRow],
      h2: mutable.PriorityQueue[InternalRow]
  ): mutable.PriorityQueue[InternalRow] = {
    h2.foreach { row =>
      if (h1.size < k) h1.enqueue(row)
      else if (asc.lt(row, h1.head)) {
        h1.dequeue(): Unit
        h1.enqueue(row)
      }
    }
    h1
  }

  override def eval(heap: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(heap.toArray.sorted(asc).asInstanceOf[Array[Any]])

  // buffer wire format: [n][len, unsafeRowBytes]* — each element passed
  // through a single-field UnsafeProjection so any orderable struct
  // round-trips without a per-type codec
  @transient private lazy val proj = UnsafeProjection.create(Array[DataType](elemType))
  @transient private lazy val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(heap: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = heap.toArray
    val payloads = rows.map { r =>
      holder.update(0, r)
      proj(holder).copy().getBytes
    }
    val bb = ByteBuffer.allocate(4 + payloads.map(_.length + 4).sum)
    bb.putInt(rows.length)
    payloads.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    val nFields = elemType.length
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val payload = new Array[Byte](len)
      bb.get(payload)
      val row = new UnsafeRow(1)
      row.pointTo(payload, len)
      heap.enqueue(row.getStruct(0, nFields).copy())
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructsAgg =
    copy(child = newChild)
}
