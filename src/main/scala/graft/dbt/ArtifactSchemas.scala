package graft.dbt

import org.apache.spark.sql.types._

/** Explicit schemas for the four dbt JSON artifacts (SURVEY.md §1.1).
  *
  * The interesting collections in every artifact are JSON objects keyed
  * by unique_id — maps, not arrays (reference iterates them with
  * `purrr::imap_dfr`, /root/reference/explore.R:10, :48, :121). Reading
  * such a file with schema inference would produce one StructField per
  * unique_id; declaring `MapType(String, entryStruct)` is the correct
  * Spark-native representation, and `explode(map_entries(...))`
  * recovers key+value rows.
  *
  * dbt `meta` is user-freeform; we type it `MAP<STRING,STRING>`
  * (SURVEY.md §1.2) — string-valued views of scalar meta entries.
  */
object ArtifactSchemas {

  /** Freeform user metadata objects. */
  val metaType: MapType = MapType(StringType, StringType)

  // -- manifest.json ---------------------------------------------------

  /** Per-column entry under a node/source `columns` map
    * (explore.R:92-100). */
  val manifestColumnStruct: StructType = StructType(
    Seq(
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("data_type", StringType),
      StructField("meta", metaType),
      StructField("tags", ArrayType(StringType))
    )
  )

  /** `depends_on` object `{macros: [ids], nodes: [ids]}`
    * (explore.R:153, :121-137). */
  val dependsOnStruct: StructType = StructType(
    Seq(
      StructField("macros", ArrayType(StringType)),
      StructField("nodes", ArrayType(StringType))
    )
  )

  val checksumStruct: StructType = StructType(
    Seq(StructField("name", StringType), StructField("checksum", StringType))
  )

  /** manifest node entry — fields read at explore.R:143-163. */
  val manifestNodeStruct: StructType = StructType(
    Seq(
      StructField("unique_id", StringType),
      StructField("resource_type", StringType),
      StructField("database", StringType),
      StructField("schema", StringType),
      StructField("name", StringType),
      StructField("alias", StringType),
      StructField("description", StringType),
      StructField(
        "config",
        StructType(
          Seq(
            StructField("enabled", BooleanType),
            StructField("materialized", StringType)
          )
        )
      ),
      StructField("depends_on", dependsOnStruct),
      StructField("columns", MapType(StringType, manifestColumnStruct)),
      StructField("meta", metaType),
      StructField("tags", ArrayType(StringType)),
      StructField("checksum", checksumStruct)
    )
  )

  /** manifest source entry — fields read at explore.R:174-192; `name`
    * comes from `identifier` (:180), no materialization/checksum. */
  val manifestSourceStruct: StructType = StructType(
    Seq(
      StructField("unique_id", StringType),
      StructField("resource_type", StringType),
      StructField("database", StringType),
      StructField("schema", StringType),
      StructField("name", StringType),
      StructField("identifier", StringType),
      StructField("description", StringType),
      StructField("config", StructType(Seq(StructField("enabled", BooleanType)))),
      StructField("columns", MapType(StringType, manifestColumnStruct)),
      StructField("meta", metaType),
      StructField("tags", ArrayType(StringType))
    )
  )

  /** manifest macro entry — fields read at explore.R:202-217. */
  val manifestMacroStruct: StructType = StructType(
    Seq(
      StructField("unique_id", StringType),
      StructField("resource_type", StringType),
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("depends_on", dependsOnStruct),
      StructField("meta", metaType),
      StructField("tags", ArrayType(StringType)),
      StructField("macro_sql", StringType)
    )
  )

  val manifestSchema: StructType = StructType(
    Seq(
      StructField("nodes", MapType(StringType, manifestNodeStruct)),
      StructField("sources", MapType(StringType, manifestSourceStruct)),
      StructField("macros", MapType(StringType, manifestMacroStruct))
    )
  )

  // -- catalog.json ----------------------------------------------------

  /** catalog node/source entry — fields read at explore.R:12-28. */
  val catalogEntryStruct: StructType = StructType(
    Seq(
      StructField(
        "metadata",
        StructType(
          Seq(
            StructField("type", StringType),
            StructField("database", StringType),
            StructField("schema", StringType),
            StructField("name", StringType)
          )
        )
      ),
      StructField(
        "columns",
        MapType(
          StringType,
          StructType(
            Seq(
              StructField("name", StringType),
              StructField("index", IntegerType),
              StructField("type", StringType)
            )
          )
        )
      )
    )
  )

  val catalogSchema: StructType = StructType(
    Seq(
      StructField("nodes", MapType(StringType, catalogEntryStruct)),
      StructField("sources", MapType(StringType, catalogEntryStruct))
    )
  )

  // -- sources.json (freshness) ---------------------------------------
  // Loaded raw by the reference (explore.R:279-282); we still type the
  // timestamps/floats it never touches (SURVEY.md §1.3).

  val sourceFreshnessSchema: StructType = StructType(
    Seq(
      StructField(
        "metadata",
        StructType(Seq(StructField("generated_at", TimestampType)))
      ),
      StructField(
        "results",
        ArrayType(
          StructType(
            Seq(
              StructField("unique_id", StringType),
              StructField("status", StringType),
              StructField("max_loaded_at", TimestampType),
              StructField("snapshotted_at", TimestampType),
              StructField(
                "criteria",
                StructType(
                  Seq(
                    StructField(
                      "warn_after",
                      StructType(
                        Seq(
                          StructField("count", LongType),
                          StructField("period", StringType)
                        )
                      )
                    ),
                    StructField(
                      "error_after",
                      StructType(
                        Seq(
                          StructField("count", LongType),
                          StructField("period", StringType)
                        )
                      )
                    )
                  )
                )
              )
            )
          )
        )
      ),
      StructField("elapsed_time", DoubleType)
    )
  )

  // -- run_results.json ------------------------------------------------

  val runResultsSchema: StructType = StructType(
    Seq(
      StructField(
        "metadata",
        StructType(Seq(StructField("generated_at", TimestampType)))
      ),
      StructField(
        "results",
        ArrayType(
          StructType(
            Seq(
              StructField("unique_id", StringType),
              StructField("status", StringType),
              StructField("execution_time", DoubleType),
              StructField("message", StringType),
              StructField("adapter_response", metaType)
            )
          )
        )
      ),
      StructField("elapsed_time", DoubleType),
      StructField("args", metaType)
    )
  )

  // -- output element types (SURVEY.md §1.5) ---------------------------

  val dependsOnOutType: ArrayType = ArrayType(
    StructType(
      Seq(StructField("type", StringType), StructField("unique_id", StringType))
    )
  )

  val manifestColumnsOutType: ArrayType = ArrayType(manifestColumnStruct)

  val catalogColumnsOutType: ArrayType = ArrayType(
    StructType(
      Seq(
        StructField("column_name", StringType),
        StructField("ordinal_position", IntegerType),
        StructField("data_type", StringType)
      )
    )
  )
}
