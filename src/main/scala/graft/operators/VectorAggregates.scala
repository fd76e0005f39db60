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
}
