package graft.dbt

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property-based invariants for manifest ingestion (SURVEY.md §5.3):
  * random manifests → row count = |nodes|+|sources|+|macros|, union
  * NULL-fill shape, NULLS-LAST total order, sha256 stability. Uses raw
  * ScalaCheck generators with pinned seeds (scalatestplus bridge is not
  * on the offline classpath), so failures are reproducible.
  */
class ManifestPropertySpec extends AnyFunSuite with SparkSpec {

  private def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")

  private val ident: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private case class N(id: String, alias: Option[String], name: String, sha: Boolean)
  private case class S(id: String, identifier: String)
  private case class M(id: String, sql: String)

  private val genNode: Gen[N] = for {
    id <- ident.map("model.p." + _)
    name <- ident
    alias <- Gen.option(ident)
    sha <- Gen.oneOf(true, false)
  } yield N(id, alias, name, sha)

  private val genSource: Gen[S] = for {
    id <- ident.map("source.p." + _)
    idf <- ident
  } yield S(id, idf)

  private val genMacro: Gen[M] = for {
    id <- ident.map("macro.p." + _)
    sql <- ident
  } yield M(id, sql)

  private def manifestJson(nodes: List[N], sources: List[S], macros: List[M]): String = {
    def nodeJson(n: N) =
      s""""${esc(n.id)}": {"unique_id": "${esc(n.id)}", "resource_type": "model",
          "database": "db", "schema": "s", "name": "${esc(n.name)}",
          "alias": ${n.alias.map(a => s""""${esc(a)}"""").getOrElse("null")},
          "description": "", "config": {"enabled": true, "materialized": "view"},
          "depends_on": {"macros": [], "nodes": []}, "columns": {}, "meta": {},
          "tags": [], "checksum": {"name": "${if (n.sha) "sha256" else "md5"}", "checksum": "c"}}"""
    def srcJson(s0: S) =
      s""""${esc(s0.id)}": {"unique_id": "${esc(s0.id)}", "resource_type": "source",
          "database": "db", "schema": "s", "name": "x", "identifier": "${esc(s0.identifier)}",
          "description": "", "config": {"enabled": true}, "columns": {}, "meta": {}, "tags": []}"""
    def macJson(m: M) =
      s""""${esc(m.id)}": {"unique_id": "${esc(m.id)}", "resource_type": "macro",
          "name": "n", "description": "", "depends_on": {"macros": []}, "meta": {},
          "macro_sql": "${esc(m.sql)}"}"""
    s"""{"nodes": {${nodes.map(nodeJson).mkString(",")}},
        "sources": {${sources.map(srcJson).mkString(",")}},
        "macros": {${macros.map(macJson).mkString(",")}}}"""
  }

  test("row count, sort order, and field rules hold for random manifests") {
    val gen = for {
      ns <- Gen.listOfN(3, genNode).map(_.distinctBy(_.id))
      ss <- Gen.listOfN(2, genSource).map(_.distinctBy(_.id))
      ms <- Gen.listOfN(2, genMacro).map(_.distinctBy(_.id))
    } yield (ns, ss, ms)

    val samples = (1 to 10).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(samples.size == 10)
    samples.foreach { case (ns, ss, ms) =>
      val f = Files.createTempFile("manifest", ".json")
      Files.writeString(f, manifestJson(ns, ss, ms))
      try {
        val rows = DbtArtifacts.readManifest(spark, f.toString).collect()

        // invariant 1: row count = |nodes| + |sources| + |macros|
        assert(rows.length == ns.length + ss.length + ms.length)

        // invariant 2: total order by (resource_type, database, schema,
        // name, unique_id) with nulls last — verified as monotone keys
        val keys = rows.map { r =>
          (
            Option(r.getAs[String]("resource_type")),
            Option(r.getAs[String]("database")),
            Option(r.getAs[String]("schema")),
            Option(r.getAs[String]("name")),
            Option(r.getAs[String]("unique_id"))
          )
        }
        implicit val nullsLast: Ordering[Option[String]] = (a, b) =>
          (a, b) match {
            case (None, None)       => 0
            case (None, _)          => 1 // nulls last
            case (_, None)          => -1
            case (Some(x), Some(y)) => x.compareTo(y)
          }
        assert(keys.sorted.toSeq == keys.toSeq)

        // invariant 3: union NULL-fill — every macro row has NULL
        // database/schema/is_enabled; every source has NULL sha256
        rows.filter(_.getAs[String]("manifest_group") == "macros").foreach { r =>
          assert(r.getAs[String]("database") == null)
          assert(r.isNullAt(r.fieldIndex("is_enabled")))
          assert(r.getAs[String]("sha256") != null) // sha2 of macro_sql
        }
        rows.filter(_.getAs[String]("manifest_group") == "sources").foreach { r =>
          assert(r.getAs[String]("sha256") == null)
        }

        // invariant 4: alias coalesce + checksum guard per node
        val byId = rows.map(r => r.getAs[String]("unique_id") -> r).toMap
        ns.foreach { n =>
          val r = byId(n.id)
          assert(r.getAs[String]("name") == n.alias.getOrElse(n.name))
          assert((r.getAs[String]("sha256") != null) == n.sha)
        }
      } finally Files.delete(f)
    }
  }
}
