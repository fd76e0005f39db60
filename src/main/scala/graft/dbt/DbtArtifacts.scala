package graft.dbt

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import ArtifactSchemas._

/** Spark-native readers for dbt JSON artifacts — the reference engine's
  * entire product surface (/root/reference/explore.R).
  *
  * Design (SURVEY.md §3): wholetext read → `from_json` with explicit
  * map-keyed schemas → `explode(map_entries(...))` per section → typed
  * projections → `unionByName` → NULLS-LAST sort. All transforms are
  * built-in Catalyst expressions — nested-schema pruning, constant
  * folding and codegen apply end to end; a manifest file is one row, so
  * the only exchange in `readManifest` is the final ORDER BY.
  *
  * At fleet scale (thousands of manifests), the same plans run over a
  * directory glob instead of a single path — each file stays one row
  * and the explodes parallelize per file; nothing here is driver-side.
  */
object DbtArtifacts {

  /** One row per input file, column `value` = full JSON text. jsonlite's
    * whole-file parse (explore.R:38, :226) maps to wholetext+from_json —
    * NOT spark.read.json, whose per-line/inference behavior mis-handles
    * the map-keyed sections (SURVEY.md §1.1).
    *
    * Validates existence up front (SURVEY §2.1 S3/V1 — the reference's
    * `file.exists` + `stopifnot` dispatch, explore.R:37-41, :225-228)
    * so a typo'd path fails fast with a clear message instead of an
    * empty-glob analysis error.
    */
  private def rawJson(spark: SparkSession, path: String): DataFrame = {
    require(
      path.contains("://") || java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      s"dbt artifact not found: $path"
    )
    spark.read.option("wholetext", "true").text(path)
  }

  /** Top-level sections present in an artifact file (SURVEY §2.1 S4 —
    * the reference's `names(manifest)`, explore.R:269): ALL top-level
    * keys in document order, artifact-agnostic (`json_object_keys` on
    * the raw text — no schema assumption, so a manifest's `macros` or a
    * future artifact's sections surface exactly like R's `names()`).
    */
  def artifactSections(spark: SparkSession, path: String): Seq[String] =
    rawJson(spark, path)
      .select(explode(expr("json_object_keys(value)")).as("k"))
      .collect()
      .map(_.getString(0))
      .toSeq

  /** `{macros: [...], nodes: [...]}` → `ARRAY<STRUCT<type, unique_id>>`,
    * one element per referenced id, `type` recycled — the exact fan-out
    * of parse_depends_on (explore.R:105-138). Missing/empty input yields
    * a typed EMPTY array, not NULL (the :107-118 guard).
    */
  private def dependsOnCol(d: Column): Column = {
    def branch(arr: Column, typ: String): Column =
      transform(
        coalesce(arr, array().cast("array<string>")),
        x => struct(lit(typ).as("type"), x.as("unique_id"))
      )
    concat(branch(d.getField("macros"), "macros"), branch(d.getField("nodes"), "nodes"))
  }

  /** `columns` map → `ARRAY<STRUCT<name, description, data_type, meta,
    * tags>>` in map insertion order, dropping entries without a name and
    * defaulting missing input to a typed empty array (parse_columns,
    * explore.R:74-103).
    */
  private def manifestColumnsCol(m: Column): Column =
    coalesce(
      filter(
        transform(
          map_values(m),
          c =>
            struct(
              c.getField("name").as("name"),
              c.getField("description").as("description"),
              c.getField("data_type").as("data_type"),
              c.getField("meta").as("meta"),
              c.getField("tags").as("tags")
            )
        ),
        c => c.getField("name").isNotNull
      ),
      array().cast(manifestColumnsOutType)
    )

  private val emptyDependsOn: Column = array().cast(dependsOnOutType)
  private val emptyColumns: Column = array().cast(manifestColumnsOutType)
  private def nullStr: Column = lit(null).cast("string")

  /** The reference's presentation order (arrange, explore.R:251-257):
    * dplyr places NA last; Spark's bare asc is nulls-first. Optionally
    * prefixed by extra keys (source_file for the fleet glob variant). */
  private def presentationSort(df: DataFrame, prefix: String*): DataFrame =
    df.orderBy(
      (prefix ++ Seq("resource_type", "database", "schema", "name", "unique_id"))
        .map(asc_nulls_last): _*
    )

  /** `import_manifest_json` (explore.R:223-259): nodes ∪ sources ∪
    * macros as one table with the SURVEY §1.5 schema, in the reference's
    * presentation order.
    */
  def readManifest(spark: SparkSession, path: String): DataFrame =
    presentationSort(readManifestUnsorted(spark, path))

  /** The manifest view WITHOUT the presentation sort. Derived operators
    * (lineage edges, closure, diff, impact) are order-insensitive, and
    * the final ORDER BY is a RangePartitioning exchange that costs a
    * sampling job per call — callers that immediately explode or join
    * should start here. */
  def readManifestUnsorted(spark: SparkSession, path: String): DataFrame =
    manifestFromRaw(
      rawJson(spark, path).withColumn("source_file", input_file_name())
    ).drop("source_file")

  /** Dual-input convention (SURVEY §2.1 S3 — the reference importers
    * accept a path OR an already-parsed object, explore.R:37-41,
    * :225-228): the overload takes any DataFrame with one JSON document
    * per row in `value` (e.g. a Kafka payload column or a pre-read
    * text table) and applies the same normalization.
    */
  def readManifest(raw: DataFrame): DataFrame = {
    require(raw.columns.contains("value"), "expected a 'value' column holding manifest JSON")
    presentationSort(manifestFromRaw(raw.withColumn("source_file", lit(""))).drop("source_file"))
  }

  /** Dual-input overload for the catalog (explore.R:37-41). */
  def readCatalog(raw: DataFrame): DataFrame = {
    require(raw.columns.contains("value"), "expected a 'value' column holding catalog JSON")
    catalogFromParsed(raw.select(from_json(col("value"), catalogSchema).as("c")))
  }

  /** Fleet-scale variant: one call over a directory/glob of manifests
    * (e.g. one per project per run). Each file is still a single row
    * into `from_json`, so parsing parallelizes per file across
    * executors; output carries `source_file` provenance and sorts it
    * first so per-manifest blocks stay contiguous.
    */
  def readManifestAll(spark: SparkSession, glob: String): DataFrame =
    manifestFromRaw(
      spark.read
        .option("wholetext", "true")
        .text(glob)
        .withColumn("source_file", input_file_name())
)
      .transform(presentationSort(_, "source_file"))

  private def manifestFromRaw(raw: DataFrame): DataFrame = {
    val m = raw.select(from_json(col("value"), manifestSchema).as("m"), col("source_file"))

    // explore.R:140-169 — note unique_id comes from the FIELD (:144),
    // unlike the catalog where it is the map key.
    val nodes = m
      .select(col("source_file"), explode(map_entries(col("m.nodes"))).as("e"))
      .select(
        col("source_file"),
        col("e.value.unique_id").as("unique_id"),
        lit("nodes").as("manifest_group"),
        col("e.value.resource_type").as("resource_type"),
        col("e.value.database").as("database"),
        col("e.value.schema").as("schema"),
        coalesce(col("e.value.alias"), col("e.value.name")).as("name"), // :149
        col("e.value.description").as("description"),
        col("e.value.config.enabled").as("is_enabled"),
        col("e.value.config.materialized").as("materialized_as"),
        dependsOnCol(col("e.value.depends_on")).as("depends_on"),
        manifestColumnsCol(col("e.value.columns")).as("columns"),
        col("e.value.meta").as("meta"),
        col("e.value.tags").as("tags"),
        // checksum kept only when the algorithm is sha256 (:159-162)
        when(col("e.value.checksum.name") === "sha256", col("e.value.checksum.checksum"))
          .as("sha256")
      )

    // explore.R:171-197
    val sources = m
      .select(col("source_file"), explode(map_entries(col("m.sources"))).as("e"))
      .select(
        col("source_file"),
        col("e.value.unique_id").as("unique_id"),
        lit("sources").as("manifest_group"),
        col("e.value.resource_type").as("resource_type"),
        col("e.value.database").as("database"),
        col("e.value.schema").as("schema"),
        col("e.value.identifier").as("name"), // :180
        col("e.value.description").as("description"),
        col("e.value.config.enabled").as("is_enabled"),
        nullStr.as("materialized_as"), // :183
        emptyDependsOn.as("depends_on"), // :184-185
        manifestColumnsCol(col("e.value.columns")).as("columns"),
        col("e.value.meta").as("meta"),
        col("e.value.tags").as("tags"),
        nullStr.as("sha256") // :191
      )

    // explore.R:199-221
    val macros = m
      .select(col("source_file"), explode(map_entries(col("m.macros"))).as("e"))
      .select(
        col("source_file"),
        col("e.value.unique_id").as("unique_id"),
        lit("macros").as("manifest_group"),
        col("e.value.resource_type").as("resource_type"),
        nullStr.as("database"), // :206
        nullStr.as("schema"), // :207
        col("e.value.name").as("name"),
        col("e.value.description").as("description"),
        lit(null).cast("boolean").as("is_enabled"), // :210
        nullStr.as("materialized_as"), // :211
        dependsOnCol(col("e.value.depends_on")).as("depends_on"),
        emptyColumns.as("columns"), // :213
        col("e.value.meta").as("meta"),
        col("e.value.tags").as("tags"),
        // :216 — the reference hashes R's *serialization* of macro_sql
        // (digest::digest default), an R-specific value; we intentionally
        // diverge to the content hash of the raw bytes (SURVEY §2.1 X4).
        sha2(col("e.value.macro_sql"), 256).as("sha256")
      )

    nodes
      .unionByName(sources, allowMissingColumns = true) // bind_rows :246-250
      .unionByName(macros, allowMissingColumns = true)
  }

  /** `import_catalog_json` (explore.R:35-65): nodes ∪ sources (each
    * section optional, :43-45) with unique_id taken from the MAP KEY
    * (:12). No final sort — the reference's `arrange()` at :31 has zero
    * keys and is a deliberate no-op we don't reproduce (SURVEY §2.1 O2).
    */
  def readCatalog(spark: SparkSession, path: String): DataFrame =
    catalogFromParsed(
      rawJson(spark, path).select(from_json(col("value"), catalogSchema).as("c"))
    )

  private def catalogFromParsed(c: DataFrame): DataFrame = {
    def section(sectionCol: Column, group: String): DataFrame =
      c.select(explode(map_entries(sectionCol)).as("e")) // absent section → NULL map → 0 rows
        .select(
          col("e.key").as("unique_id"),
          lit(group).as("manifest_group"),
          col("e.value.metadata.database").as("database"),
          col("e.value.metadata.schema").as("schema"),
          col("e.value.metadata.name").as("name"),
          col("e.value.metadata.type").as("materialized_as"),
          coalesce(
            transform(
              map_values(col("e.value.columns")),
              x =>
                struct(
                  x.getField("name").as("column_name"),
                  x.getField("index").as("ordinal_position"),
                  x.getField("type").as("data_type")
                )
            ),
            array().cast(catalogColumnsOutType)
          ).as("columns")
        )

    section(col("c.nodes"), "nodes")
      .unionByName(section(col("c.sources"), "sources"))
  }

  /** Raw `sources.json` view (explore.R:279-282 loads it untransformed;
    * we expose the typed top-level row). */
  def readSourceFreshness(spark: SparkSession, path: String): DataFrame =
    rawJson(spark, path)
      .select(from_json(col("value"), sourceFreshnessSchema).as("s"))
      .select(
        col("s.metadata.generated_at").as("generated_at"),
        col("s.elapsed_time").as("elapsed_time"),
        col("s.results").as("results")
      )

  /** `sources.json` results exploded into one row per freshness check. */
  def sourceFreshnessResults(spark: SparkSession, path: String): DataFrame =
    readSourceFreshness(spark, path)
      .select(col("generated_at"), explode(col("results")).as("r"))
      .select(
        col("r.unique_id").as("unique_id"),
        col("r.status").as("status"),
        col("r.max_loaded_at").as("max_loaded_at"),
        col("r.snapshotted_at").as("snapshotted_at"),
        col("r.criteria.warn_after.count").as("warn_after_count"),
        col("r.criteria.warn_after.period").as("warn_after_period"),
        col("generated_at")
      )

  /** Raw `run_results.json` view (explore.R:286-289). */
  def readRunResults(spark: SparkSession, path: String): DataFrame =
    rawJson(spark, path)
      .select(from_json(col("value"), runResultsSchema).as("r"))
      .select(
        col("r.metadata.generated_at").as("generated_at"),
        col("r.elapsed_time").as("elapsed_time"),
        col("r.args").as("args"),
        col("r.results").as("results")
      )

  /** `run_results.json` results exploded into one row per executed node. */
  def runResultsResults(spark: SparkSession, path: String): DataFrame =
    readRunResults(spark, path)
      .select(col("generated_at"), explode(col("results")).as("r"))
      .select(
        col("r.unique_id").as("unique_id"),
        col("r.status").as("status"),
        col("r.execution_time").as("execution_time"),
        col("r.message").as("message"),
        col("r.adapter_response").as("adapter_response"),
        col("generated_at")
      )
}
