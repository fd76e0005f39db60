package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `distinct_up_to(x: BIGINT, cap: INT) -> ARRAY<BIGINT>` — the
  * distinct values of a group as a SORTED array, or NULL as soon as the
  * group holds more than `cap` distinct values.
  *
  * This is the scale primitive behind document-frequency-capped
  * candidate generation: "give me the doc list per shingle / per LSH
  * bucket, unless the key is a non-discriminative hot key". The naive
  * formulations either pay extra full-data passes (count per key + semi
  * join + self-join — three exchanges of the whole index) or risk
  * unbounded state (`collect_set` materializes a hot key's entire
  * multi-million-row group before any filter can drop it). This
  * aggregate is both cheaper and bounded:
  *
  *  - ONE exchange: raw (key, value) rows groupBy(key) directly; the
  *    aggregate dedups, so no upstream `distinct` pass is needed.
  *  - O(cap) state per group, guaranteed: the buffer keeps at most
  *    `cap` values; the (cap+1)-th distinct value poisons the buffer to
  *    the overflow state, which drops its storage and absorbs all
  *    further input for free. Map-side partial aggregation applies, and
  *    overflow short-circuits there too — a hot key ships `cap`-bounded
  *    partials, never its full group.
  *
  * Overflow → NULL (not a truncated array): a silently clipped doc list
  * would produce silently missing candidate pairs; NULL makes the
  * "key was hot, excluded by policy" outcome explicit and filterable.
  */
case class DistinctUpTo(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[DistinctUpTo.Buf]
    with BinaryLike[Expression] {

  // evaluated, not pattern-matched: a foldable non-Literal (1+2 — the
  // analyzer runs before constant folding) or a NULL literal must fail
  // type-check cleanly, never throw out of analysis
  private lazy val capOpt: Option[Int] =
    if (right.foldable && right.dataType == IntegerType)
      Option(right.eval()).map(_.asInstanceOf[Int])
    else None
  private lazy val cap: Int = capOpt.get

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"distinct_up_to requires a BIGINT value, got ${left.dataType.simpleString}"
      )
    else if (!right.foldable || right.dataType != IntegerType || capOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure("distinct_up_to cap must be a non-NULL INT literal")
    else if (cap < 1)
      TypeCheckResult.TypeCheckFailure(s"distinct_up_to cap must be >= 1, got $cap")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "distinct_up_to"

  override def createAggregationBuffer(): DistinctUpTo.Buf = new DistinctUpTo.Buf(cap)

  override def update(buf: DistinctUpTo.Buf, input: InternalRow): DistinctUpTo.Buf = {
    val v = left.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: DistinctUpTo.Buf, b2: DistinctUpTo.Buf): DistinctUpTo.Buf = {
    b1.mergeFrom(b2)
    b1
  }

  override def eval(buf: DistinctUpTo.Buf): Any =
    if (buf.overflow) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.elems, buf.n))

  override def serialize(buf: DistinctUpTo.Buf): Array[Byte] = {
    if (buf.overflow) Array[Byte](1)
    else {
      val bb = ByteBuffer.allocate(1 + 4 + 8 * buf.n)
      bb.put(0: Byte)
      bb.putInt(buf.n)
      var i = 0
      while (i < buf.n) { bb.putLong(buf.elems(i)); i += 1 }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): DistinctUpTo.Buf = {
    val buf = new DistinctUpTo.Buf(cap)
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == (1: Byte)) buf.poison()
    else {
      val n = bb.getInt()
      var i = 0
      while (i < n) { buf.add(bb.getLong()); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctUpTo =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctUpTo =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): DistinctUpTo = copy(left = newLeft, right = newRight)
}

object DistinctUpTo {

  /** Sorted bounded distinct-set buffer. Insertion keeps `elems[0,n)`
    * sorted ascending (binary search + shift — groups are ≤ cap ≈
    * tens-to-hundreds, so the shift is cache-friendly and beats hashing
    * at this size), which makes eval's sorted-array contract free and
    * merge a linear zip. */
  final class Buf(val cap: Int) {
    var overflow: Boolean = false
    var n: Int = 0
    var elems: Array[Long] = new Array[Long](math.min(cap, 8))

    def poison(): Unit = {
      overflow = true
      elems = null
      n = 0
    }

    def add(v: Long): Unit = {
      if (overflow) return
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (elems(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < n && elems(lo) == v) return
      if (n == cap) { poison(); return }
      if (n == elems.length)
        elems = java.util.Arrays.copyOf(elems, math.min(cap, elems.length * 2))
      System.arraycopy(elems, lo, elems, lo + 1, n - lo)
      elems(lo) = v
      n += 1
    }

    def mergeFrom(other: Buf): Unit = {
      if (overflow) return
      if (other.overflow) { poison(); return }
      var i = 0
      while (i < other.n && !overflow) {
        add(other.elems(i))
        i += 1
      }
    }
  }

  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        new FunctionIdentifier("distinct_up_to"),
        new ExpressionInfo(classOf[DistinctUpTo].getName, "distinct_up_to"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "distinct_up_to takes (value BIGINT, cap INT)")
          DistinctUpTo(children.head, children(1))
        }
      )
    )
}
