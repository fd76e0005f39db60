package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's public surface.
  *
  * @param fn      builds the Spark plan from (session, testdata dir)
  * @param oracle  equivalent ANSI SQL runnable by DuckDB over the same
  *                parquet tables; None for ops DuckDB can't express
  *                (those get the driver's weaker rows-only check and a
  *                dedicated ScalaTest spec instead)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  /** Merge query groups into the SparkEntry maps. */
  def toMaps(
      groups: Seq[QueryDef]*
  ): (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val all = groups.flatten
    require(all.map(_.name).distinct.size == all.size, "duplicate query names")
    (
      all.map(q => q.name -> q.fn).toMap,
      all.flatMap(q => q.oracle.map(q.name -> _)).toMap
    )
  }
}
