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
      None
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
    )
  )
}
