package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.VectorAggregates

/** Custom-aggregate surface (SURVEY.md §2.3 E16): per-label embedding
  * centroids via a typed Aggregator registered as a udaf. Rows-only
  * (float centroid values are reduction-order-sensitive); exactness is
  * asserted against a brute-force computation in VectorAggregatesSpec.
  */
object Vectors {
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q43_label_centroids",
      (s, dir) => {
        val mean = udaf(new VectorAggregates.ArrayMean(64))
        Tables(s, dir, "embeddings")
          .select(col("label"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), mean(col("v")).as("centroid"))
          .select(
            col("label"),
            col("n"),
            size(col("centroid")).cast("long").as("dim"),
            element_at(col("centroid"), 1).as("c0"),
            element_at(col("centroid"), 2).as("c1"),
            sqrt(expr("aggregate(centroid, cast(0 AS double), (a, x) -> a + x*x)")).as("norm")
          )
          .orderBy("label")
      },
      None
    )
  )
}
