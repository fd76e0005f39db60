package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** SQL surface for Spark's bloom-filter sketch expressions.
  *
  * Catalyst ships `BloomFilterAggregate` / `BloomFilterMightContain`
  * for its runtime-filter rewrite (InjectRuntimeFilter) but registers
  * neither as a public SQL function; exposing them lets a pipeline
  * build the same pre-filter EXPLICITLY — aggregate the join keys of
  * the filtered fact side into one bloom sketch, ship it as a scalar
  * subquery, and drop dimension rows before the exact join. The
  * might_contain argument must be a constant or scalar subquery (the
  * expression enforces this), which is precisely the broadcast-scalar
  * shape that scales: the sketch is one row, never a shuffled side.
  */
object BloomSketch {

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("bloom_filter_agg"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
        (children: Seq[Expression]) =>
          children match {
            case Seq(c)       => new BloomFilterAggregate(c)
            case Seq(c, n)    => new BloomFilterAggregate(c, n)
            case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
            case _ =>
              throw new IllegalArgumentException(
                "bloom_filter_agg(xxhash64_col[, est_items[, num_bits]])"
              )
          }
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("might_contain"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "might_contain(bloom_binary, xxhash64_value)")
          BloomFilterMightContain(children.head, children(1))
        }
      )
    )
  }
}
