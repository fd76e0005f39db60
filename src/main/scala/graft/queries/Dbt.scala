package graft.queries

import graft.QueryDef
import graft.dbt.{DbtArtifacts, ManifestOps}

/** dbt-artifact ingestion exposed as named queries (SURVEY.md §2.1
  * S1-S4/F1-F4/P1-P5/X1-X5/N1-N2/A1-A2/O1/V1 — the reference-parity
  * surface). These read the golden fixtures, not the sf parquet dirs, so
  * they carry no DuckDB oracle; exact-row correctness is asserted by the
  * golden-fixture ScalaTest specs (DbtArtifactsSpec).
  */
object Dbt {

  /** Fixture dir is stable within the repo; FIXTURES.md §A documents the
    * shapes. */
  val fixtureDir = "/root/repo/src/test/resources/dbt"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dbt_manifest",
      (s, _) => DbtArtifacts.readManifest(s, s"$fixtureDir/manifest.json"),
      None
    ),
    QueryDef(
      "dbt_catalog",
      (s, _) => DbtArtifacts.readCatalog(s, s"$fixtureDir/catalog.json"),
      None
    ),
    QueryDef(
      "dbt_source_freshness",
      (s, _) => DbtArtifacts.sourceFreshnessResults(s, s"$fixtureDir/sources.json"),
      None
    ),
    QueryDef(
      "dbt_run_results",
      (s, _) => DbtArtifacts.runResultsResults(s, s"$fixtureDir/run_results.json"),
      None
    ),
    QueryDef(
      "dbt_lineage_edges",
      (s, _) =>
        ManifestOps
          .lineageEdges(DbtArtifacts.readManifest(s, s"$fixtureDir/manifest.json"))
          .orderBy("src", "dep_type", "dst"),
      // flat output → oracle-checkable even though the input is a JSON
      // fixture: DuckDB re-derives the edges with its JSON functions
      // (quoted paths because unique_ids contain dots; absent
      // depends_on arrays cast to NULL lists → unnest yields 0 rows)
      Some(s"""WITH t AS (SELECT content FROM read_text('$fixtureDir/manifest.json')),
        nk AS (SELECT unnest(json_keys(content, '$$.nodes')) AS key, content FROM t),
        mk AS (SELECT unnest(json_keys(content, '$$.macros')) AS key, content FROM t),
        edges AS (
          SELECT json_extract_string(content, '$$.nodes."' || key || '".unique_id') AS src,
                 'macros' AS dep_type,
                 unnest(CAST(json_extract(content, '$$.nodes."' || key || '".depends_on.macros') AS VARCHAR[])) AS dst
          FROM nk
          UNION ALL
          SELECT json_extract_string(content, '$$.nodes."' || key || '".unique_id'),
                 'nodes',
                 unnest(CAST(json_extract(content, '$$.nodes."' || key || '".depends_on.nodes') AS VARCHAR[]))
          FROM nk
          UNION ALL
          SELECT json_extract_string(content, '$$.macros."' || key || '".unique_id'),
                 'macros',
                 unnest(CAST(json_extract(content, '$$.macros."' || key || '".depends_on.macros') AS VARCHAR[]))
          FROM mk
          UNION ALL
          SELECT json_extract_string(content, '$$.macros."' || key || '".unique_id'),
                 'nodes',
                 unnest(CAST(json_extract(content, '$$.macros."' || key || '".depends_on.nodes') AS VARCHAR[]))
          FROM mk
        )
        SELECT src, dep_type, dst FROM edges ORDER BY src, dep_type, dst""")
    ),
    QueryDef(
      "dbt_lineage_closure",
      (s, _) =>
        ManifestOps
          .transitiveClosure(
            ManifestOps.lineageEdges(DbtArtifacts.readManifest(s, s"$fixtureDir/manifest.json"))
          )
          .orderBy("src", "dst", "hops"),
      None
    ),
    QueryDef(
      "dbt_manifest_diff",
      (s, _) =>
        ManifestOps.diff(
          DbtArtifacts.readManifest(s, s"$fixtureDir/manifest.json"),
          DbtArtifacts.readManifest(s, s"$fixtureDir/manifest_v2.json")
        ),
      None
    ),
    QueryDef(
      "dbt_impact",
      (s, _) =>
        ManifestOps.impacted(
          DbtArtifacts.readManifest(s, s"$fixtureDir/manifest.json"),
          DbtArtifacts.readManifest(s, s"$fixtureDir/manifest_v2.json")
        ),
      None
    )
  )
}
