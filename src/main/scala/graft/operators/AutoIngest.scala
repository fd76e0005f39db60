package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exactly-once incremental file ingestion (the Autoloader contract):
  * repeatedly sweep a landing zone and commit each new file into a
  * [[TableVersions]] table exactly once, across crashes, with NO
  * side-channel registry.
  *
  * The trick is that the registry IS the data: every ingested row
  * carries its landing-zone-relative source path in `__ingest_src`,
  * and a sweep's "seen" set is the distinct values of that one
  * dictionary-encoded column at the head. Data and provenance land in
  * ONE append commit, so the failure algebra collapses:
  *
  *   - crash BEFORE the commit → nothing landed, next sweep re-reads
  *     the same files (no loss);
  *   - crash AFTER the commit → the files are in the seen set BY
  *     BEING IN THE TABLE, next sweep skips them (no duplication).
  *
  * A two-phase side registry needs a transaction to get this; a
  * single-phase one picks loss or duplication. Redelivered files
  * under the SAME path are skipped (exactly-once is per path;
  * content-level dedup is the dedup family's job); a redelivery under
  * a new path ingests — correct, it is a new file.
  *
  * At 100 TB the seen-probe is one column-pruned distinct over a
  * dictionary page per file (not a table scan); sweeps are
  * O(listing + new data). Listing cost is the landing zone's problem
  * (object stores: use prefix partitioning by date, same as any
  * loader).
  */
object AutoIngest {

  private def fsOf(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def qualified(s: SparkSession, p: String): String = {
    val path = new Path(p)
    path.getFileSystem(s.sparkContext.hadoopConfiguration).makeQualified(path).toString
  }

  private def listParquetRec(s: SparkSession, dir: String): Seq[String] = {
    val fs = fsOf(s, dir)
    val root = new Path(dir)
    if (!fs.exists(root)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val stack = scala.collection.mutable.Stack[Path](root)
    while (stack.nonEmpty) {
      fs.listStatus(stack.pop()).foreach { st =>
        if (st.isDirectory) stack.push(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) out += st.getPath.toString
      }
    }
    out.toSeq.sorted
  }

  /** One sweep: ingest every landing-zone file not yet in the table.
    * Returns the number of files ingested (0 = no-op, no commit).
    *
    * Path normalization: `input_file_name()` renders URIs as
    * `scheme://host/path` while Hadoop's `makeQualified` renders
    * `scheme:/path` — both sides are reduced to the scheme-less
    * absolute path before the landing prefix is stripped, so the
    * stored provenance is the stable zone-relative path. */
  def discover(s: SparkSession, landingDir: String, storeDir: String): Long = {
    val prefixPath =
      new Path(qualified(s, landingDir)).toUri.getPath.stripSuffix("/") + "/"
    val files = listParquetRec(s, landingDir)
    val seen: Set[String] =
      if (TableVersions.currentVersion(s, storeDir) < 0) Set.empty
      else
        TableVersions
          .readVersion(s, storeDir, TableVersions.currentVersion(s, storeDir))
          .select("__ingest_src")
          .distinct()
          .collect()
          .map(_.getString(0))
          .toSet
    val fresh =
      files.filter(f => !seen.contains(new Path(f).toUri.getPath.stripPrefix(prefixPath)))
    if (fresh.isEmpty) return 0L
    // schema-drift guard: a landing file whose columns disagree with
    // the store refuses the WHOLE sweep loudly (nothing half-ingests;
    // the bad file is named) — silent unionByName would null-fill a
    // renamed column forever, the worst loader failure mode. Schema
    // evolution is an explicit store operation (TableVersions
    // add-column), not something a stray file gets to decide.
    if (TableVersions.currentVersion(s, storeDir) >= 0) {
      val want = TableVersions
        .readVersion(s, storeDir, TableVersions.currentVersion(s, storeDir))
        .schema
        .fieldNames
        .filterNot(_ == "__ingest_src")
        .sorted
        .toSeq
      fresh.foreach { f =>
        val got = s.read.parquet(f).schema.fieldNames.sorted.toSeq
        require(
          got == want,
          s"schema drift in $f: columns [${got.mkString(", ")}] vs store [${want.mkString(", ")}] — sweep refused"
        )
      }
    }
    // the landing prefix is stripped as an ANCHORED leading match,
    // quoted wholesale (Pattern.quote) — a `replace()` would substitute
    // the prefix anywhere in the path and mangle any path that embeds
    // it mid-string, and splicing the raw prefix into a SQL string
    // breaks on quotes/regex metacharacters in directory names. Column
    // arguments keep the prefix out of the SQL parser entirely, so the
    // stored provenance always equals the driver-side
    // `toUri.getPath.stripPrefix(prefixPath)` used for the seen-probe.
    val anchored = "^" + java.util.regex.Pattern.quote(prefixPath)
    val rows = s.read
      .parquet(fresh: _*)
      .withColumn(
        "__ingest_src",
        regexp_replace(
          regexp_replace(input_file_name(), lit("^[a-z0-9+.-]+:/+"), lit("/")),
          lit(anchored),
          lit("")
        )
      )
    TableVersions.commitAppend(rows, storeDir): Unit
    fresh.size.toLong
  }
}
