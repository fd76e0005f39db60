package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query; queries with exactly-reproducible SQL semantics also carry a
  * DuckDB oracle (see QueryDef). Query groups live under
  * `graft.queries.*`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-way join + broadcast dims + exact-cents aggregation is the
    * engine's most representative plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_join_multi")(spark, "/root/testdata/sf0.001")

  private lazy val (queryMap, oracleMap) = QueryDef.toMaps(
    graft.queries.Relational.defs,
    graft.queries.Extras.defs,
    graft.queries.Dbt.defs,
    graft.queries.TextOps.defs,
    graft.queries.Dedup.defs,
    graft.queries.Similarity.defs,
    graft.queries.Media.defs,
    graft.queries.Vectors.defs,
    graft.queries.MlText.defs,
    graft.queries.Ingest.defs,
    graft.queries.StreamGate.defs,
    graft.queries.Corpus.defs,
    graft.queries.PipelineOps.defs,
    graft.queries.Graph.defs,
    graft.queries.Entity.defs,
    graft.queries.Sketches.defs,
    graft.queries.Spectral.defs,
    graft.queries.Versioned.defs,
    graft.queries.Retrieval.defs,
    graft.queries.Views.defs
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleMap
}
