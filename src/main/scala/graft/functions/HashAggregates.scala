package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst aggregates for the hash-signature dedup family.
  *
  * Both replace wide column-aggregate formulations that were correct but
  * pay per-row expression dispatch 64/32 times inside codegen'd
  * HashAggregate buffers:
  *
  *  - SimHash votes were 64 `SUM(CASE WHEN shiftright(h,i)&1 ...)`
  *    aggregate columns (one per bit) — 64 buffer slots, 64 predicate
  *    evaluations per row.
  *  - The MinHash signature was 32 `MIN(xxhash64(concat('i_', g)))`
  *    columns — 32 string concats + 32 full xxhash64 runs per row.
  *
  * Each is one `TypedImperativeAggregate` here: a single primitive-array
  * buffer updated in a tight loop per row (SimHash: 64 counter bumps
  * from one long; MinHash: 32 mins from one base hash + a cheap mix per
  * slot). They run under ObjectHashAggregateExec with map-side partial
  * aggregation and spill support — the same distributed-aggregation
  * contract as the built-ins, so the 100 TB posture is unchanged:
  * signatures reduce per partition before any shuffle.
  *
  * Registered as SQL functions via SparkSessionExtensions
  * (GraftSession), preference order (b) of the build brief: custom
  * Expressions where built-ins exist but cost more; no custom plan
  * nodes needed.
  */
object HashAggregates {

  /** 64-bit finalization mix (MurmurHash3 fmix64) — decorrelates the
    * per-slot MinHash streams derived from one base hash. */
  @inline private[functions] def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  val MinHashSlots = 32

  /** Per-slot seed: odd multiplier of the golden-ratio constant. */
  @inline private[functions] def slotSeed(i: Int): Long =
    0x9e3779b97f4a7c15L * (2 * i + 1)

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("simhash_agg"),
        new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "simhash_agg takes exactly 1 bigint argument")
          SimHashAgg(children.head)
        }
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "minhash_sig takes exactly 1 bigint argument")
          MinHashSig(children.head)
        }
      )
    )
  }
}

/** `simhash_agg(h: BIGINT) -> BIGINT` — 64-bit SimHash signature from
  * per-token hashes: bit i of the result is 1 iff more input hashes
  * have bit i set than clear (ties → 0, matching `SUM(±1) > 0`).
  * NULL inputs are ignored; an empty group yields signature 0.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"simhash_agg requires a BIGINT argument, got ${child.dataType.simpleString}"
      )

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  // Long counters: a single group can exceed 2^31 rows at the design
  // scale, and an Int vote counter would wrap silently and flip bits
  // of the signature; the buffer is 64 slots, so the cost is nil
  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var i = 0
    while (i < 64) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](64)
    var i = 0
    while (i < 64) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

/** `minhash_sig(h: BIGINT) -> ARRAY<BIGINT>` — 32-slot MinHash
  * signature from per-shingle base hashes. Slot i tracks
  * `min(fmix64(h XOR seed_i))` over the group: one full hash per row,
  * then a 5-op mix per slot, instead of 32 independent string hashes.
  * NULL inputs are ignored; empty-group slots stay Long.MaxValue.
  */
case class MinHashSig(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  import HashAggregates.{MinHashSlots, fmix64, slotSeed}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires a BIGINT argument, got ${child.dataType.simpleString}"
      )

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinHashSlots)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < MinHashSlots) {
        val hi = fmix64(h ^ slotSeed(i))
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < MinHashSlots) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(MinHashSlots * 8)
    var i = 0
    while (i < MinHashSlots) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](MinHashSlots)
    var i = 0
    while (i < MinHashSlots) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
