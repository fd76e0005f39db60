package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY.md §2.3 E16). */
object VectorAggregates {

  final case class MeanBuf(sums: Array[Double], n: Long)

  /** Element-wise mean of fixed-dim double arrays — the centroid
    * aggregate for embedding columns. A typed `Aggregator` keeps the
    * whole reduction map-side-combinable (partial sums merge
    * associatively), so computing K centroids over N vectors is one
    * shuffle of K×dim doubles — never a groupBy+collect_list.
    */
  final class ArrayMean(dim: Int)
      extends Aggregator[Seq[Double], MeanBuf, Seq[Double]] {

    override def zero: MeanBuf = MeanBuf(new Array[Double](dim), 0L)

    override def reduce(b: MeanBuf, v: Seq[Double]): MeanBuf = {
      // NULL vectors are skipped like avg() skips NULL scalars; a
      // wrong-dimension vector fails loudly — silently zero-padding or
      // truncating it would skew the centroid while masking embedding
      // corruption (same philosophy as cosine_sim's NULL on mismatch,
      // but an aggregate has no per-row NULL to emit)
      if (v == null) return b
      require(
        v.length == dim,
        s"ArrayMean(dim=$dim) got a vector of length ${v.length}"
      )
      var i = 0
      while (i < dim) { b.sums(i) += v(i); i += 1 }
      MeanBuf(b.sums, b.n + 1)
    }

    override def merge(a: MeanBuf, b: MeanBuf): MeanBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      MeanBuf(a.sums, a.n + b.n)
    }

    override def finish(b: MeanBuf): Seq[Double] =
      if (b.n == 0) Seq.fill(dim)(0.0) else b.sums.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  final case class LongSumBuf(sums: Array[Long], n: Long)

  /** Element-wise EXACT sum of fixed-dim integer arrays. Integer adds
    * are associative and commutative with no rounding, so the result
    * is bit-identical under any partitioning — which is what lets
    * queries built on it stay oracle-exact even though the reduction
    * order is nondeterministic. Same shuffle shape as ArrayMean: K
    * groups cost one exchange of K×dim longs.
    */
  final class ArraySumLong(dim: Int)
      extends Aggregator[Seq[Long], LongSumBuf, LongSumBuf] {

    override def zero: LongSumBuf = LongSumBuf(new Array[Long](dim), 0L)

    override def reduce(b: LongSumBuf, v: Seq[Long]): LongSumBuf = {
      if (v == null) return b
      require(
        v.length == dim,
        s"ArraySumLong(dim=$dim) got a vector of length ${v.length}"
      )
      var i = 0
      while (i < dim) { b.sums(i) += v(i); i += 1 }
      LongSumBuf(b.sums, b.n + 1)
    }

    override def merge(a: LongSumBuf, b: LongSumBuf): LongSumBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      LongSumBuf(a.sums, a.n + b.n)
    }

    override def finish(b: LongSumBuf): LongSumBuf = b

    override def bufferEncoder: Encoder[LongSumBuf] = Encoders.product[LongSumBuf]
    override def outputEncoder: Encoder[LongSumBuf] = Encoders.product[LongSumBuf]
  }

  final case class MomentBuf(upper: Array[Long], sums: Array[Long], n: Long)

  /** Exact integer second-moment accumulator: for dim-length integer
    * vectors, sums the upper triangle of the outer product v·vᵀ
    * (dim·(dim+1)/2 cells) plus the element sums and the row count —
    * everything a covariance/PCA pass needs, in one data pass. The
    * scale-correct alternative to exploding dim² (or even
    * dim·(dim+1)/2) rows per vector before aggregating: each map task
    * reduces its whole partition into ONE buffer, and the exchange
    * carries buffers, never per-cell rows. All-integer, so the result
    * is partitioning-independent and oracle-exact.
    *
    * Headroom: |v_i| ≤ B ⇒ each cell grows ≤ B² per row; int64 is
    * safe while n·B² < 2^63 (B=127 int8 codes ⇒ n < 5.7·10¹⁴ rows —
    * beyond that, shard the aggregation and combine in DECIMAL).
    */
  final class IntOuterProduct(dim: Int)
      extends Aggregator[Seq[Long], MomentBuf, MomentBuf] {

    private val cells = dim * (dim + 1) / 2

    override def zero: MomentBuf =
      MomentBuf(new Array[Long](cells), new Array[Long](dim), 0L)

    override def reduce(b: MomentBuf, v: Seq[Long]): MomentBuf = {
      if (v == null) return b
      require(
        v.length == dim,
        s"IntOuterProduct(dim=$dim) got a vector of length ${v.length}"
      )
      val a = v.toArray
      var i = 0
      var k = 0
      while (i < dim) {
        b.sums(i) += a(i)
        var j = i
        while (j < dim) { b.upper(k) += a(i) * a(j); k += 1; j += 1 }
        i += 1
      }
      MomentBuf(b.upper, b.sums, b.n + 1)
    }

    override def merge(x: MomentBuf, y: MomentBuf): MomentBuf = {
      var k = 0
      while (k < cells) { x.upper(k) += y.upper(k); k += 1 }
      var i = 0
      while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
      MomentBuf(x.upper, x.sums, x.n + y.n)
    }

    override def finish(b: MomentBuf): MomentBuf = b

    override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
    override def outputEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  }
}
